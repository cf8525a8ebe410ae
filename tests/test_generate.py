"""Schema generation from table schema + named registry
(reference GenerateSchema/RegisterSchema, reflect.go:30-53,
schema.go:174-202)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from jsonschema_spark.core.generate import (
    generate_schema,
    generate_schema_doc,
    get_schema,
    register_schema,
    validate,
)


def _schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False,
                          metadata={"pattern": "^c[0-9]{8}$"}),
            T.StructField("turn_idx", T.IntegerType(), False,
                          metadata={"minimum": 0}),
            T.StructField("role", T.StringType(), True,
                          metadata={"enum": ["user", "assistant"], "required": True}),
            T.StructField("score", T.DoubleType(), True,
                          metadata={"maximum": 1.0}),
        ]
    )


def test_generate_schema_doc_tags_and_required():
    doc = generate_schema_doc(_schema())
    assert sorted(doc["required"]) == ["conv_id", "role", "turn_idx"]
    assert doc["properties"]["conv_id"] == {"type": "string", "pattern": "^c[0-9]{8}$"}
    assert doc["properties"]["turn_idx"] == {"type": "integer", "minimum": 0}
    assert doc["properties"]["role"]["enum"] == ["user", "assistant"]
    assert doc["properties"]["score"] == {"type": "number", "maximum": 1.0}


def test_generated_plan_validates(spark):
    df = spark.createDataFrame(
        [("c00000001", 0, "user", 0.5), ("bad", -1, "narrator", 2.0)],
        "conv_id string, turn_idx int, role string, score double",
    )
    plan = generate_schema(_schema())
    res = plan.validate(df, keys=["conv_id"])
    paths = {r["path"] for r in res.violations.collect()}
    assert paths == {"$.conv_id", "$.turn_idx", "$.role", "$.score"}


def test_registry_roundtrip(spark):
    register_schema("turns", _schema())
    df = spark.createDataFrame(
        [("c00000001", 0, "user", 0.5)],
        "conv_id string, turn_idx int, role string, score double",
    )
    assert get_schema("turns") is get_schema("turns")
    assert validate("turns", df).violations.count() == 0
    with pytest.raises(KeyError):
        get_schema("nope")
