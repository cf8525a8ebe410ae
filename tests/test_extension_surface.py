"""Extension surface (§2.8): custom keywords, value functions, formats,
expr functions — mirroring RegisterValidator / SetFunc /
AddFormatValidateFunc / expr.RegisterFunc."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import jsonschema_spark as js
from jsonschema_spark.core.errors import viol_when
from jsonschema_spark.plans.compiler import FnRule


def test_register_custom_keyword(spark):
    """RegisterValidator analog (README.md:389-404 example shape)."""

    @js.register_keyword("evenLength")
    def kw_even_length(operand, path, siblings, ctx):
        def fn(ref):
            ln = F.octet_length(ref.col.cast("string"))
            return viol_when(
                ref.present() & (F.pmod(ln, 2) != (0 if operand else 1)),
                ref.path,
                "length parity is wrong",
            )

        return FnRule(fn)

    df = spark.createDataFrame([(1, "ab"), (2, "abc")], "id int, s string")
    plan = js.compile_schema({"properties": {"s": {"evenLength": True}}})
    v = plan.validate(df, keys=["id"]).violations.collect()
    assert [r["id"] for r in v] == [2]
    assert v[0]["info"] == "length parity is wrong"


def test_register_custom_value_function(spark):
    """SetFunc analog (example_test.go:12-14 redis_get shape — but
    pure: a lookup against a broadcast literal map)."""
    from jsonschema_spark.functions.values import Bound

    table = {"a": "alpha", "b": "beta"}

    @js.register_func("dict.lookup")
    def fn_lookup(args, root):
        m = F.create_map(*[F.lit(x) for kv in table.items() for x in kv])
        return Bound(F.try_element_at(m, args[0].col.cast("string")), T.StringType())

    df = spark.createDataFrame([("a",), ("z",)], "k string")
    plan = js.compile_schema({"set": {"v": ["dict.lookup()", "${k}"]}})
    out = {r["k"]: r["v"] for r in plan.transform(df).collect()}
    assert out == {"a": "alpha", "z": None}


def test_register_custom_format(spark):
    @js.register_format("even-number-string")
    def f_even(c):
        return c.rlike("^[0-9]+$") & (F.pmod(c.cast("long"), 2) == 0)

    df = spark.createDataFrame([(1, "42"), (2, "7"), (3, "x")], "id int, s string")
    plan = js.compile_schema({"properties": {"s": {"format": "even-number-string"}}})
    v = sorted(r["id"] for r in plan.validate(df, keys=["id"]).violations.collect())
    assert v == [2, 3]


def test_register_custom_expr_function(spark):
    from jsonschema_spark.functions.expr_lang import CVal, compile_expr

    def fn_double(env, a):
        v = compile_expr(a, env)
        return CVal(v.num() * 2, T.DoubleType())

    js.register_expr_fn("double", fn_double)
    df = spark.createDataFrame([("a", 5.0), ("b", 30.0)], "id string, x double")
    plan = js.compile_schema({"script": ["if(double($.x) > 20, return('big'))"]})
    v = plan.validate(df, keys=["id"]).violations.collect()
    assert [r["id"] for r in v] == ["b"]


def test_add_ignore_key(spark):
    js.add_ignore_key("x-meta")
    plan = js.compile_schema({"x-meta": {"anything": 1}, "required": ["id"]})
    df = spark.createDataFrame([(1,)], "id int")
    assert plan.validate(df).violations.count() == 0


def test_unknown_keyword_rejected(spark):
    with pytest.raises(js.SchemaError, match="unknown validator keyword"):
        js.compile_schema({"definitelyNotAKeyword": 1})
