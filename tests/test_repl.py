"""exp evaluator / REPL (jsonschema_spark/repl.py, reference cmd/exp)."""

from __future__ import annotations

import json

from jsonschema_spark.repl import ExprSession, eval_per_line


def test_repl_session_state_and_expressions(spark, tmp_path):
    sess = ExprSession(spark, doc={"name": "bob", "n": 3})
    # bare expressions print values; document keys resolve via $
    assert sess.eval("$.name") == "bob"
    assert sess.eval("1 + 2") == "3"
    # assignments persist across lines
    assert sess.eval("x = $.n * 2") is None
    assert sess.eval("x + 1") == "7"
    # string interpolation sees both vars and document keys
    assert sess.eval("'${name}:${x}'") == "bob:6"
    # errors report without losing state
    assert sess.eval("no_such_fn(1)").startswith("error:")
    assert sess.eval("x") == "6"


def test_repl_read_and_import(spark, tmp_path):
    doc = tmp_path / "doc.json"
    doc.write_text(json.dumps({"v": 10}))
    lib = tmp_path / "lib.exp"
    lib.write_text("# doubles v\ndoubled = $.v * 2\n")
    sess = ExprSession(spark)
    sess.eval(f"read('{doc}')")
    sess.eval(f"import('{lib}')")
    assert sess.eval("doubled") == "20"


def test_repl_object_statement_for(spark):
    sess = ExprSession(spark, doc={"xs": [1, 2, 3]})
    assert sess.eval("s = 0") is None
    assert sess.eval('{"for": "i,x in $.xs", "do": ["s = s + x"]}') is None
    assert sess.eval("s") == "6"


def test_exp_per_line_mode(spark, tmp_path):
    f = tmp_path / "lines.jsonl"
    f.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    out = [r["out"] for r in eval_per_line(spark, str(f), "'${b}:${a + 1}'").collect()]
    assert sorted(out) == ["x:2", "y:3"]


def test_cli_exp_single(spark, capsys):
    from jsonschema_spark.cli import main

    rc = main(["exp", "-s", "1 + 2"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "3"


def test_repl_builtin_errors_do_not_crash(spark):
    """read/import/JSON errors report as 'error: ...' and keep state
    (review r2: they previously escaped the try block)."""
    sess = ExprSession(spark, doc={"v": 1})
    assert sess.eval("x = 5") is None
    assert sess.eval("read('/no/such/file.json')").startswith("error:")
    assert sess.eval("import('/no/such/lib')").startswith("error:")
    assert sess.eval("{not json").startswith("error:")
    assert sess.eval("x") == "5"
