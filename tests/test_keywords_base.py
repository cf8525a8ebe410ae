"""Keyword-level unit tests: one tiny DataFrame per keyword, asserting
both pass rows and violation structs — the assertion discipline the
reference's own tests lack (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark import SchemaError, compile_schema


def viols(spark, schema, data, ddl, keys=("id",)):
    df = spark.createDataFrame(data, ddl)
    return {
        tuple(r[k] for k in keys): [(v["path"], v["info"]) for v in r["violations"]]
        for r in compile_schema(schema).annotate(df).collect()
    }


def test_required(spark):
    out = viols(
        spark,
        {"required": ["name", "role"]},
        [(1, "a", "user"), (2, None, "user"), (3, "b", None)],
        "id int, name string, role string",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.name", "field is required")]
    assert out[(3,)] == [("$.role", "field is required")]


def test_required_missing_column_statically(spark):
    out = viols(
        spark, {"required": ["ghost"]}, [(1, "a")], "id int, name string"
    )
    assert out[(1,)] == [("$.ghost", "field is required")]


def test_enum_string(spark):
    out = viols(
        spark,
        {"properties": {"role": {"enum": ["user", "assistant"]}}},
        [(1, "user"), (2, "robot"), (3, None)],
        "id int, role string",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.role", "value is invalid , shoule be one of [user assistant]")]
    assert out[(3,)] == []  # null skips (validator_base.go:461-463)


def test_enum_numeric_coercion(spark):
    # coercing Equal keyed on LHS type (common.go:142-154):
    # int column vs string "2" matches numerically
    out = viols(
        spark,
        {"properties": {"n": {"enum": [1, "2"]}}},
        [(1, 1), (2, 2), (3, 3)],
        "id int, n int",
    )
    assert out[(1,)] == []
    assert out[(2,)] == []
    assert out[(3,)] != []


def test_min_max_length_bytes(spark):
    out = viols(
        spark,
        {"properties": {"t": {"minLength": 2, "maxLength": 4}}},
        [(1, "ab"), (2, "a"), (3, "abcde"), (4, "日本")],  # 日本 = 6 bytes
        "id int, t string",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.t", "length must be larger or equal than 2")]
    assert out[(3,)] == [("$.t", "length must be less or equal than 4")]
    # Go len() counts bytes (validator_base.go:258-264)
    assert out[(4,)] == [("$.t", "length must be less or equal than 4")]


def test_maximum_minimum(spark):
    out = viols(
        spark,
        {"properties": {"v": {"minimum": 0, "maximum": 10}}},
        [(1, 5.0), (2, -1.0), (3, 11.0), (4, 10.0), (5, 0.0)],
        "id int, v double",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.v", "value must be larger or equal than 0")]
    assert out[(3,)] == [("$.v", "value must be <= than 10")]
    assert out[(4,)] == []
    assert out[(5,)] == []


def test_exclusive_bounds_bool_form(spark):
    out = viols(
        spark,
        {
            "properties": {
                "v": {
                    "minimum": 0,
                    "exclusiveMinimum": True,
                    "maximum": 10,
                    "exclusiveMaximum": True,
                }
            }
        },
        [(1, 0.0), (2, 10.0), (3, 5.0)],
        "id int, v double",
    )
    assert out[(1,)] == [("$.v", "value must be larger than 0")]
    assert out[(2,)] == [("$.v", "value must be  < 10")]
    assert out[(3,)] == []


def test_exclusive_bounds_number_form(spark):
    out = viols(
        spark,
        {"properties": {"v": {"exclusiveMaximum": 10, "exclusiveMinimum": 0}}},
        [(1, 10.0), (2, 0.0), (3, 5.0)],
        "id int, v double",
    )
    assert ("$.v", "value should be < 10") in out[(1,)]
    assert ("$.v", "value should be > 0") in out[(2,)]
    assert out[(3,)] == []


def test_type_integer_on_double(spark):
    out = viols(
        spark,
        {"properties": {"v": {"type": "integer"}}},
        [(1, 3.0), (2, 3.5)],
        "id int, v double",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.v", "type should be integer, but float:3.5")]


def test_type_union(spark):
    out = viols(
        spark,
        {"properties": {"v": {"type": "string|number"}}},
        [(1, "x")],
        "id int, v string",
    )
    assert out[(1,)] == []
    out2 = viols(
        spark,
        {"properties": {"v": {"type": "boolean|number"}}},
        [(1, "x")],
        "id int, v string",
    )
    assert out2[(1,)] == [("$.v", "type should be one of boolean|number")]


def test_type_static_mismatch(spark):
    out = viols(
        spark,
        {"properties": {"v": {"type": "string"}}},
        [(1, 1.0)],
        "id int, v double",
    )
    assert out[(1,)] == [("$.v", "Invalid type, expected: string , given: double")]


def test_pattern(spark):
    out = viols(
        spark,
        {"properties": {"c": {"pattern": "^c[0-9]{8}$"}}},
        [(1, "c00000001"), (2, "x1"), (3, None)],
        "id int, c string",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.c", "x1 ,value does not match pattern: ^c[0-9]{8}$")]
    assert out[(3,)] == []


def test_const(spark):
    out = viols(
        spark,
        {"properties": {"k": {"const": "v1"}}},
        [(1, "v1"), (2, "v2")],
        "id int, k string",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.k", "value is invalid , expected: v1")]


def test_multiple_of(spark):
    out = viols(
        spark,
        {"properties": {"v": {"multipleOf": 3}}},
        [(1, 9.0), (2, 10.0)],
        "id int, v double",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.v", "value must be multipleOf 3,but:10, divide:3.3333333333333335")]


def test_items_and_bounds(spark):
    out = viols(
        spark,
        {
            "properties": {
                "a": {
                    "items": {"type": "string", "minLength": 1},
                    "minItems": 1,
                    "maxItems": 3,
                    "uniqueItems": True,
                }
            }
        },
        [
            (1, ["x", "y"]),
            (2, []),
            (3, ["a", "b", "c", "d"]),
            (4, ["x", "x"]),
            (5, ["ok", ""]),
        ],
        "id int, a array<string>",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.a", " min length is 1")]
    assert out[(3,)] == [("$.a", " max length is 3")]
    assert out[(4,)] == [("$.a", " items should be unique")]
    assert out[(5,)] == [("$.a[*]", "length must be larger or equal than 1")]


def test_dependencies(spark):
    out = viols(
        spark,
        {"dependencies": {"credit_card": ["billing_address"]}},
        [(1, "4111", "addr"), (2, "4111", None), (3, None, None)],
        "id int, credit_card string, billing_address string",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.billing_address", "is required")]
    assert out[(3,)] == []


def test_compare_singles(spark):
    out = viols(
        spark,
        {"properties": {"s": {"startWith": "ab", "endWith": "yz", "contains": "m"}}},
        [(1, "abmyz"), (2, "xx")],
        "id int, s string",
    )
    assert out[(1,)] == []
    assert set(out[(2,)]) == {
        ("$.s", " should start with ab"),
        ("$.s", " should end with yz"),
        ("$.s", " should contains m"),
    }


def test_compare_map_gt_lt_column_rhs(spark):
    # RHS can reference another column via ${path}
    out = viols(
        spark,
        {"gt": {"end_ts": "${start_ts}"}},
        [(1, 10.0, 5.0), (2, 3.0, 5.0)],
        "id int, end_ts double, start_ts double",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.end_ts", "should greater than ${start_ts}")]


def test_in_notin(spark):
    out = viols(
        spark,
        {"in": {"role": ["user", "assistant"]}},
        [(1, "user"), (2, "robot")],
        "id int, role string",
    )
    assert out[(1,)] == []
    assert out[(2,)] == [("$.role", "should be one of  [user assistant]")]
    out2 = viols(
        spark,
        {"notin": {"role": ["banned"]}},
        [(1, "ok"), (2, "banned")],
        "id int, role string",
    )
    assert out2[(1,)] == []
    assert out2[(2,)] == [("$.role", "is not valid")]


def test_ip_in(spark):
    out = viols(
        spark,
        {"ipIn": {"ip": ["10.0.0.0/8", "192.168.1.1"]}},
        [(1, "10.1.2.3"), (2, "192.168.1.1"), (3, "8.8.8.8"), (4, "not-an-ip")],
        "id int, ip string",
    )
    assert out[(1,)] == []
    assert out[(2,)] == []
    assert out[(3,)] == [("$.ip", " ip should be within [10.0.0.0/8 192.168.1.1]")]
    assert out[(4,)] == [("$.ip", " ip should be within [10.0.0.0/8 192.168.1.1]")]


def test_b64_len(spark):
    out = viols(
        spark,
        {"properties": {"b": {"maxB64DLen": 6, "minB64DLen": 3}}},
        [(1, "YWJjZGVm"), (2, "YWJjZGVmZ2hp"), (3, "YWI="), (4, "")],
        "id int, b string",
    )
    assert out[(1,)] == []  # DecodedLen = 6
    assert out[(2,)] == [("$.b", "length is invalid, max length is  6")]
    # Go DecodedLen(4) = 3 (upper bound, validator_base.go:692-760)
    assert out[(3,)] == []
    assert out[(4,)] == [("$.b", "length is invalid ,min length is  3")]


def test_unknown_keyword_rejected(spark):
    with pytest.raises(SchemaError):
        compile_schema({"nosuchkeyword": 1})


def test_ignored_keys(spark):
    plan = compile_schema({"title": "x", "description": "y", "required": ["id"]})
    df = spark.createDataFrame([(1,)], "id int")
    assert plan.annotate(df).collect()[0]["violations"] == []


def test_strict_udf_formats(spark):
    """'-strict' formats run the real Python parser as an Arrow-batched
    pandas UDF (the documented slow path, SURVEY §2.4)."""
    import jsonschema_spark as js

    df = spark.createDataFrame(
        [(1, "a@b.com"), (2, "not an email"), (3, None), (4, "1.2.3.4")],
        "id int, e string",
    )
    plan = js.compile_schema({"properties": {"e": {"format": "email-strict"}}})
    bad = sorted(r["id"] for r in plan.validate(df, keys=["id"]).violations.collect())
    assert bad == [2, 4]  # null skips, like every non-required keyword
    plan2 = js.compile_schema({"properties": {"e": {"format": "regex-strict"}}})
    df2 = spark.createDataFrame([(1, "a(b"), (2, "a.*b")], "id int, e string")
    bad2 = sorted(r["id"] for r in plan2.validate(df2, keys=["id"]).violations.collect())
    assert bad2 == [1]


def test_items_object_subschema_on_struct_elements(spark):
    """items with a full object sub-schema per element (the reference's
    nested-document case): required/enum/bounds on struct fields."""
    import jsonschema_spark as js

    df = spark.createDataFrame(
        [
            (1, [{"role": "user", "n": 1}, {"role": "assistant", "n": 2}]),
            (2, [{"role": "narrator", "n": -1}]),
            (3, None),
        ],
        "id int, turns array<struct<role:string,n:int>>",
    )
    plan = js.compile_schema(
        {
            "properties": {
                "turns": {
                    "type": "array",
                    "items": {
                        "required": ["role"],
                        "properties": {
                            "role": {"enum": ["user", "assistant"]},
                            "n": {"minimum": 0},
                        },
                    },
                }
            }
        }
    )
    v = plan.validate(df, keys=["id"]).violations.collect()
    got = sorted((r["id"], r["path"]) for r in v)
    assert (2, "$.turns[*].role") in got and (2, "$.turns[*].n") in got
    assert all(i != 1 and i != 3 for i, _ in got)  # valid + null skip
