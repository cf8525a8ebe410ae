"""The reference's flagship benchmark rule (exampleSchema,
benchmark_test.go:49-217: an API-gateway rule combining set/sprintf/
append, and[...], if/neq/error, md5-signature check, and scalar
property keywords) adapted to the columnar engine — the end-to-end
shape the reference's own performance story is built on.

Adaptations (documented): the md5 signature concatenates via append()
(the reference's md5.hex2 variadic form); the time-window check uses a
fixed literal clock so the fixture is deterministic (SURVEY §7.4
item 7 — injectable clock instead of time.now())."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

import jsonschema_spark as js

NOW = 1_700_000_000  # fixed clock

GATEWAY_SCHEMA = {
    "set": {
        "userinfo": ["append()", "${name}", ":", "${age}"],
        "user_info": ["sprintf()", "name:%s  age:%s", "${name}", "${age}"],
    },
    "and": [
        {
            "if": {"neq": {"school": "wh"}},
            "then": {"set": {"skip_it": True}},
            "else": {"error": ["sprintf()", "invalid school '%v'", "${school}"]},
        },
        {
            "if": {
                "not": {
                    "eq": {
                        "sig": [
                            "md5.hex()",
                            ["append()", "${name}", "${timestamp}", "secret1"],
                        ]
                    }
                }
            },
            "then": {"error": "sig not match"},
        },
        {
            "if": {
                "not": {
                    "lt": {"timestamp": NOW + 300},
                    "gt": {"timestamp": NOW - 300},
                }
            },
            "then": {"error": "time is valid"},  # sic — reference message
        },
    ],
    "properties": {
        "age": {"type": "number", "maximum": 100, "minimum": 0},
        "hobby": {
            "type": "array",
            "items": {"type": "string", "enum": ["ball", "game", "music"]},
        },
        "name": {"type": "string", "startWith": "b", "maxLength": 32},
    },
}


def _sig(name: str, ts: int) -> str:
    # append() stringifies the number the Go way (no trailing .0)
    return hashlib.md5(f"{name}{ts}secret1".encode()).hexdigest()


@pytest.fixture(scope="module")
def requests_df(spark):
    rows = [
        # name, age, school, hobby, timestamp, sig
        ("bob", 30.0, "xx", ["ball"], NOW, _sig("bob", NOW)),           # valid
        ("bob2", 20.0, "wh", ["game"], NOW, _sig("bob2", NOW)),         # bad school
        ("bad", 30.0, "xx", ["ball"], NOW, "wrong-sig"),                # bad sig
        ("bob4", 30.0, "xx", ["ball"], NOW - 4000, _sig("bob4", NOW - 4000)),  # stale
        ("alice", 130.0, "xx", ["knitting"], NOW, _sig("alice", NOW)),  # props
    ]
    return spark.createDataFrame(
        rows,
        "name string, age double, school string, hobby array<string>, "
        "timestamp long, sig string",
    )


def test_gateway_rule_violations(spark, requests_df):
    plan = js.compile_schema(GATEWAY_SCHEMA)
    res = plan.validate(requests_df, keys=["name"])
    by_name: dict = {}
    for r in res.violations.collect():
        by_name.setdefault(r["name"], []).append(r["info"])

    assert "bob" not in by_name  # fully valid request
    assert by_name["bob2"] == ["invalid school 'wh'"]
    assert by_name["bad"] == ["sig not match"]
    assert by_name["bob4"] == ["time is valid"]
    infos = set(by_name["alice"])
    assert "value must be <= than 100" in infos            # age maximum
    assert any("shoule be one of" in i for i in infos)     # hobby enum
    assert any("should start with" in i for i in infos)    # name startWith


def test_gateway_rule_transforms(spark, requests_df):
    plan = js.compile_schema(GATEWAY_SCHEMA)
    out = {r["name"]: r for r in plan.transform(requests_df).collect()}
    assert out["bob"]["userinfo"] == "bob:30"
    assert out["bob"]["user_info"] == "name:bob  age:30"
    assert out["bob"]["skip_it"] is True       # school != wh branch
    assert out["bob2"]["skip_it"] is None      # else branch: no set


def test_gateway_rule_plan_stays_narrow(spark, requests_df):
    plan = js.compile_schema(GATEWAY_SCHEMA)
    p = plan.annotate(requests_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "BatchEvalPython" not in p
