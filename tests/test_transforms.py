"""Transformation keywords -> withColumn pipeline
(reference validator_magics.go; applied validator_core.go:439-481)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonschema_spark import compile_schema


def transformed(spark, schema, data, ddl):
    df = spark.createDataFrame(data, ddl)
    plan = compile_schema(schema)
    return {r["id"]: r.asDict() for r in plan.transform(df).collect()}


def test_const_val(spark):
    out = transformed(
        spark,
        {"properties": {"v": {"constVal": "forced"}}},
        [(1, "x")],
        "id int, v string",
    )
    assert out[1]["v"] == "forced"


def test_default_val(spark):
    out = transformed(
        spark,
        {"properties": {"v": {"defaultVal": "dflt"}}},
        [(1, "x"), (2, None)],
        "id int, v string",
    )
    assert out[1]["v"] == "x"
    assert out[2]["v"] == "dflt"


def test_default_val_validates_filled_value(spark):
    # reference fills then re-validates (validator_core.go:443-453):
    # a default satisfying the rule must NOT produce a violation
    df = spark.createDataFrame([(1, None)], "id int, v string")
    plan = compile_schema(
        {"properties": {"v": {"minLength": 2, "defaultVal": "dd"}}}
    )
    assert plan.annotate(df).collect()[0]["violations"] == []


def test_default_vals_bulk(spark):
    out = transformed(
        spark,
        {"defaultVals": {"a": "x", "b": 7}},
        [(1, None, None)],
        "id int, a string, b double",
    )
    assert out[1]["a"] == "x"
    assert out[1]["b"] == 7.0


def test_replace_key(spark):
    out = transformed(
        spark,
        {"properties": {"old": {"replaceKey": "new"}}},
        [(1, "v1", None), (2, "v2", "keep")],
        "id int, old string, new string",
    )
    # copies unless target exists (validator_magics.go:40-47)
    assert out[1]["new"] == "v1"
    assert out[2]["new"] == "keep"


def test_format_val(spark):
    out = transformed(
        spark,
        {"properties": {"s": {"formatVal": "upper"}, "n": {"formatVal": "string"}}},
        [(1, "abc", 3.0)],
        "id int, s string, n double",
    )
    assert out[1]["s"] == "ABC"
    assert out[1]["n"] == "3"


def test_set_with_interpolation_and_funcs(spark):
    out = transformed(
        spark,
        {"set": {"sig": ["md5.hex()", "${user}:${ip}"], "tag": "u=${user}"}},
        [(1, "alice", "10.0.0.1")],
        "id int, user string, ip string",
    )
    import hashlib

    assert out[1]["sig"] == hashlib.md5(b"alice:10.0.0.1").hexdigest()
    assert out[1]["tag"] == "u=alice"


def test_set_nn_skips_null(spark):
    out = transformed(
        spark,
        {"setNN": {"a": "${missing_col}"}},
        [(1, "orig")],
        "id int, a string",
    )
    assert out[1]["a"] == "orig"


def test_delete(spark):
    df = spark.createDataFrame([(1, "x", "y")], "id int, keep string, gone string")
    plan = compile_schema({"delete": ["gone"]})
    res = plan.transform(df)
    assert "gone" not in res.columns
    assert "keep" in res.columns


def test_conditional_set_in_switch_case(spark):
    # the TestMagic pattern (all_test.go:100-139): switch on a key,
    # case branch assigns a computed value
    schema = {
        "switch": "role",
        "case": {
            "tool": {"set": {"label": "tool:${tool}"}},
            "user": {"set": {"label": "u"}},
        },
        "defaults": {"set": {"label": "other"}},
    }
    out = transformed(
        spark,
        schema,
        [(1, "tool", "t9", None), (2, "user", None, None), (3, "sys", None, None)],
        "id int, role string, tool string, label string",
    )
    assert out[1]["label"] == "tool:t9"
    assert out[2]["label"] == "u"
    assert out[3]["label"] == "other"


def test_conditional_set_in_if_then(spark):
    schema = {
        "if": {"gt": {"score": 0.5}},
        "then": {"set": {"grade": "high"}},
        "else": {"set": {"grade": "low"}},
    }
    out = transformed(
        spark,
        schema,
        [(1, 0.9, None), (2, 0.1, None)],
        "id int, score double, grade string",
    )
    assert out[1]["grade"] == "high"
    assert out[2]["grade"] == "low"


def test_transform_sequencing_sees_prior_columns(spark):
    out = transformed(
        spark,
        {"set": {"a2": "${a}!", "b2": "${a2}?"}},
        [(1, "x")],
        "id int, a string",
    )
    assert out[1]["a2"] == "x!"
    assert out[1]["b2"] == "x!?"


def test_map_value_functions(spark):
    """map.get/map.set/map.del value functions (funcs.go:249-259,
    198-207) — pure map expressions usable inside `set`."""
    import jsonschema_spark as js

    df = spark.createDataFrame(
        [("u1", {"a": "1", "b": "2"})], "user string, attrs map<string,string>"
    )
    plan = js.compile_schema({"set": {
        "got": ["map.get()", "${attrs}", "a"],
        "attrs": ["map.set()", "${attrs}", "c", "3"],
    }})
    out = plan.transform(df).collect()[0]
    assert out["got"] == "1"
    assert dict(out["attrs"]) == {"a": "1", "b": "2", "c": "3"}

    plan2 = js.compile_schema({"set": {"attrs": ["map.del()", "${attrs}", "a"]}})
    out2 = plan2.transform(df).collect()[0]
    assert dict(out2["attrs"]) == {"b": "2"}
