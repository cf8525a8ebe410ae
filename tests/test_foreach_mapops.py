"""foreach (__key/__val bindings) and dynamic-key map ops
(setMap/delMap/del/setExpr)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import jsonschema_spark as js


@pytest.fixture()
def arr_df(spark):
    return spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", [-1, 5]), ("c", None)],
        "id string, nums array<int>",
    )


def test_foreach_array_assertion(spark, arr_df):
    plan = js.compile_schema({"foreach": {"nums": {"gte": {"__val": 0}}}})
    res = plan.validate(arr_df, keys=["id"])
    viols = res.violations.collect()
    assert len(viols) == 1
    assert viols[0]["id"] == "b"  # only the -1 element fails; null array skips


def test_foreach_key_binding(spark, arr_df):
    # __key is the element index (reference foreach.go:23)
    plan = js.compile_schema({"foreach": {"nums": {"lt": {"__key": 10}}}})
    assert plan.validate(arr_df, keys=["id"]).violations.count() == 0


def test_foreach_map_values(spark):
    df = spark.createDataFrame(
        [("a", {"x": 1, "y": -2})], "id string, m map<string,int>"
    )
    plan = js.compile_schema({"foreach": {"m": {"gte": {"__val": 0}}}})
    v = plan.validate(df, keys=["id"]).violations.collect()
    assert len(v) == 1


@pytest.fixture()
def map_df(spark):
    return spark.createDataFrame(
        [("u1", "admin", {"seen": "1"}), ("u2", "guest", None)],
        "user string, role string, attrs map<string,string>",
    )


def test_set_map(spark, map_df):
    plan = js.compile_schema({"setMap": {"key": "role_tag", "val": "${role}"}})
    out = {r["user"]: r["attrs"] for r in plan.transform(map_df).collect()}
    assert out["u1"] == {"seen": "1", "role_tag": "admin"}
    assert out["u2"] == {"role_tag": "guest"}  # null map auto-initialized


def test_del_map(spark, map_df):
    plan = js.compile_schema({"delMap": {"key": "seen"}})
    out = {r["user"]: r["attrs"] for r in plan.transform(map_df).collect()}
    assert out["u1"] == {}
    assert out["u2"] == {}


def test_set_expr_dynamic_key(spark, map_df):
    plan = js.compile_schema({"setExpr": {"${user}:${role}": "true"}})
    out = {r["user"]: r["attrs"] for r in plan.transform(map_df).collect()}
    assert out["u1"]["u1:admin"] == "true"
    assert out["u2"]["u2:guest"] == "true"


def test_set_map_overwrites_existing_key(spark, map_df):
    plan = js.compile_schema({"setMap": {"key": "seen", "val": "2"}})
    out = {r["user"]: r["attrs"] for r in plan.transform(map_df).collect()}
    assert out["u1"] == {"seen": "2"}


def test_map_op_requires_map_column(spark):
    df = spark.createDataFrame([("a",)], "id string")
    plan = js.compile_schema({"setMap": {"key": "k", "val": "v"}})
    with pytest.raises(js.SchemaError, match="map_column"):
        plan.transform(df)


def test_indirect_jsonpath_key(spark):
    """${var} indirect map key (reference jsonpath.go:452-481)."""
    df = spark.createDataFrame(
        [("u1", "color", {"color": "red", "size": "L"}),
         ("u2", "size", {"color": "blue", "size": "XL"})],
        "user string, want string, attrs map<string,string>",
    )
    plan = js.compile_schema({"eq": {"attrs.${want}": "red"}})
    v = plan.validate(df, keys=["user"]).violations.collect()
    assert [(r["user"], r["path"]) for r in v] == [("u2", "$.attrs.${want}")]


def test_indirect_key_on_scalar_is_missing(spark):
    df = spark.createDataFrame([("u1", "x")], "user string, want string")
    # dynamic key on a SCALAR parent: nil in the reference too; eq
    # compares StringOf(nil)="" vs "red" and FAILS, like the reference
    # (keyMatch coercing equal, validator_logic.go:257-335)
    plan = js.compile_schema({"eq": {"user.${want}": "red"}})
    assert plan.validate(df, keys=["user"]).violations.count() == 1


def test_indirect_key_on_fixed_struct(spark):
    """${var} indirect key on a fixed-STRUCT parent: the struct is
    re-encoded as a Variant object (to_variant_object) so the lookup
    gets the reference's interface{} runtime dispatch
    (jsonpath.go:452-481 indexes any map value)."""
    df = spark.createDataFrame(
        [("u1", "color", ("red", "L")), ("u2", "size", ("blue", "XL"))],
        "user string, want string, attrs struct<color:string, size:string>",
    )
    plan = js.compile_schema({"eq": {"attrs.${want}": "red"}})
    v = plan.validate(df, keys=["user"]).violations.collect()
    assert [(r["user"], r["path"]) for r in v] == [("u2", "$.attrs.${want}")]


def test_indirect_key_on_root_row(spark):
    """${var} as a top-level segment indexes the ROOT row's fixed
    columns (the reference's document root is map[string]interface{})."""
    df = spark.createDataFrame(
        [("u1", "color", "red", "L"), ("u2", "size", "blue", "XL")],
        "user string, want string, color string, size string",
    )
    plan = js.compile_schema({"eq": {"${want}": "red"}})
    v = plan.validate(df, keys=["user"]).violations.collect()
    assert [(r["user"], r["path"]) for r in v] == [("u2", "$.${want}")]


def test_indirect_key_numeric_runtime_kind(spark):
    """A numeric struct field fetched through the Variant re-encode
    keeps its runtime kind: gt compares numerically, not as string."""
    df = spark.createDataFrame(
        [("u1", "n", (5, "x")), ("u2", "n", (11, "y"))],
        "user string, want string, attrs struct<n:int, s:string>",
    )
    plan = js.compile_schema({"gt": {"attrs.${want}": 10}})
    v = plan.validate(df, keys=["user"]).violations.collect()
    assert [r["user"] for r in v] == ["u1"]


def test_foreach_set_accumulation_nested(spark):
    """The reference's TestForeach shape (benchmark_test.go:411-423):
    nested foreach + set accumulating a top-level key across elements
    compiles to ONE nested F.aggregate fold."""
    import jsonschema_spark as js

    df = spark.read.json(spark.sparkContext.parallelize(
        ['{"ws":[{"w":[{"c":"ni"},{"c":"hao"}]},{"w":[{"c":"hello"},{"c":"world"}]}]}'], 1))
    doc = {"foreach": {"ws": {"foreach": {"__val.w": {
        "set": {"line": "${line}${__val.c}"}}}}}}
    out = js.compile_schema(doc).transform(df)
    assert out.select("line").collect()[0][0] == "nihaohelloworld"
    # plan stays codegen: no Exchange, no Python
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "BatchEvalPython" not in p


def test_foreach_set_numeric_and_map(spark):
    """add() dispatches numerically when the accumulator starts nil
    (funcs.go:72-86); maps iterate entries with __key/__val."""
    import jsonschema_spark as js

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], {"a": "5", "b": "7"})],
        "xs array<double>, m map<string,string>",
    )
    d_num = {"foreach": {"xs": {"set": {"total": ["add()", "${total}", "${__val}"]}}}}
    assert js.compile_schema(d_num).transform(df).select("total").collect()[0][0] == 6.0
    d_map = {"foreach": {"m": {"set": {"pairs": "${pairs}${__key}=${__val};"}}}}
    assert (
        js.compile_schema(d_map).transform(df).select("pairs").collect()[0][0]
        == "a=5;b=7;"
    )


def test_foreach_unsupported_mutation_rejected(spark):
    import jsonschema_spark as js
    import pytest

    with pytest.raises(js.SchemaError, match="not columnar"):
        js.compile_schema({"foreach": {"xs": {"delete": ["a"]}}})


def test_foreach_mutation_does_not_leak_unbound(spark):
    """A set inside foreach must NOT also run as a global transform
    with __val unbound (the r1 silent-empty-result bug)."""
    import jsonschema_spark as js

    df = spark.createDataFrame([([1.0],)], "xs array<double>")
    doc = {"foreach": {"xs": {"set": {"acc": "${acc}${__val}"}}}}
    plan = js.compile_schema(doc)
    assert len(plan.ctx.transforms) == 1  # one fold op, nothing leaked
    assert plan.transform(df).select("acc").collect()[0][0] == "1"


def test_foreach_nested_conditional_mutation_rejected(spark):
    """set nested under if/then inside foreach would be silently
    discarded — must fail at compile time (review r2)."""
    import jsonschema_spark as js
    import pytest

    with pytest.raises(js.SchemaError, match="not columnar"):
        js.compile_schema({"foreach": {"xs": {
            "if": {"gt": {"__val": 0}},
            "then": {"set": {"n": ["add()", "${n}", 1]}},
        }}})
    with pytest.raises(js.SchemaError, match="not columnar"):
        js.compile_schema({"foreach": {"xs": {
            "properties": {"w": {"formatVal": "upper"}},
        }}})


def test_foreach_element_field_write(spark):
    """Per-element mutation (reference foreach binds __val to the
    element object; jsonpath writes through it mutate in place,
    foreach.go:21-33): compiled to ONE F.transform rewriting the
    array, with sequential write visibility."""
    df = spark.createDataFrame(
        [(1, [(2.0, None), (3.0, None)]), (2, []), (3, None)],
        "id int, ws array<struct<w double, lab string>>",
    )
    plan = js.compile_schema({"foreach": {"ws": {"set": {
        "__val.w": ["add()", "${__val.w}", "${__val.w}"],
        # second write sees the FIRST write's value (sequential, like
        # the reference's in-place mutation): lab = index:doubled-w
        "__val.lab": "i${__key}:${__val.w}",
    }}}})
    rows = {r["id"]: r["ws"] for r in plan.transform(df).collect()}
    assert [(e["w"], e["lab"]) for e in rows[1]] == [
        (4.0, "i0:4"), (6.0, "i1:6")
    ]
    assert rows[2] == [] and rows[3] is None


def test_foreach_element_whole_replace_and_setnn(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id int, xs array<double>")
    p = js.compile_schema(
        {"foreach": {"xs": {"setVal": {"__val": ["add()", "${__val}", "1"]}}}}
    )
    assert p.transform(df).collect()[0]["xs"] == [2.0, 3.0]
    # setNN: nil template result leaves the element value unchanged
    df3 = spark.createDataFrame([(1, [(None,), (5.0,)])],
                                "id int, ys array<struct<v double>>")
    p3 = js.compile_schema({"foreach": {"ys": {"setNN": {"__val.v": "${__val.v}"}}}})
    got = p3.transform(df3).collect()[0]["ys"]
    assert [e["v"] for e in got] == [None, 5.0]


def test_foreach_element_write_plan_no_python(spark):
    df = spark.createDataFrame([(1, [(2.0,)])], "id int, ws array<struct<w double>>")
    plan = js.compile_schema({"foreach": {"ws": {"set": {"__val.w": "${__key}"}}}})
    out = plan.transform(df)
    txt = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in txt and "Exchange" not in txt


def test_foreach_mix_acc_and_element_write_rejected(spark):
    import pytest as _pytest

    from jsonschema_spark.plans.compiler import SchemaError

    with _pytest.raises(SchemaError, match="order-dependent"):
        js.compile_schema({"foreach": {"xs": {"set": {
            "total": ["add()", "${total}", "${__val}"],
            "__val": "1",
        }}}})


def test_foreach_setnn_adds_null_field_for_new_name(spark):
    """setNN writing a field the element struct LACKS must not crash
    at analysis (getField on an absent field raises): the field is
    added, NULL where the template was nil — the documented static
    divergence from Go's skip-the-write."""
    df = spark.createDataFrame(
        [(1, [(2.0,), (None,)])], "id int, ws array<struct<w double>>"
    )
    plan = js.compile_schema(
        {"foreach": {"ws": {"setNN": {"__val.lab": "v${__val.w}"}}}}
    )
    got = plan.transform(df).collect()[0]["ws"]
    assert [(e["w"], e["lab"]) for e in got] == [(2.0, "v2"), (None, "v")]
