"""Schema-migration impact analysis (plans/migration.py): newly
violating rows under a tightened schema, both rule sets fused over one
scan."""

from __future__ import annotations

from jsonschema_spark import migration_impact, migration_summary

OLD = {
    "required": ["role"],
    "properties": {
        "role": {"enum": ["system", "user", "assistant", "tool"]},
        "score": {"maximum": 100},
    },
}
# tightened: narrower enum, lower maximum, new required field
NEW = {
    "required": ["role", "text"],
    "properties": {
        "role": {"enum": ["user", "assistant"]},
        "score": {"maximum": 10},
    },
}


def _df(spark):
    return spark.createDataFrame(
        [
            # id, role, text, score
            (1, "user", "ok", 5),        # clean under both
            (2, "system", "ok", 5),      # enum narrowed -> newly violating
            (3, "user", None, 5),        # new required field -> newly violating
            (4, "user", "ok", 50),       # maximum lowered -> newly violating
            (5, "robot", "ok", 5),       # already violating OLD -> excluded
            (6, "robot", None, 500),     # already violating OLD -> excluded
        ],
        "id int, role string, text string, score int",
    )


def test_migration_impact_rows(spark):
    got = sorted(
        tuple(r)
        for r in migration_impact(_df(spark), OLD, NEW, keys=["id"]).collect()
    )
    ids = sorted({r[0] for r in got})
    assert ids == [2, 3, 4], "only newly-violating rows, dirt excluded"
    by_id = {}
    for i, path, info in got:
        by_id.setdefault(i, []).append((path, info))
    # reference message templates ("shoule" typo preserved)
    assert by_id[2] == [("$.role", "value is invalid , shoule be one of [user assistant]")]
    assert by_id[3] == [("$.text", "field is required")]
    assert by_id[4] == [("$.score", "value must be <= than 10")]


def test_migration_summary_counts(spark):
    rows = {
        (r["path"], r["info"]): (r["newly_violating"], r["already_violating"])
        for r in migration_summary(_df(spark), OLD, NEW).collect()
    }
    # role-enum site: rows 2 (was clean) and 5,6 (already dirty under OLD)
    enum_sites = {
        k: v for k, v in rows.items() if k[0].endswith("role")
    }
    assert sum(n for n, _ in enum_sites.values()) == 1
    assert sum(a for _, a in enum_sites.values()) == 2
    # every count is attributed somewhere
    assert sum(n for n, _ in rows.values()) >= 3


def test_migration_impact_accepts_compiled_plans(spark):
    import jsonschema_spark as js

    old = js.compile_schema(OLD)
    new = js.compile_schema(NEW)
    n = migration_impact(_df(spark), old, new, keys=["id"]).count()
    assert n == migration_impact(_df(spark), OLD, NEW, keys=["id"]).count()


def test_migration_plan_single_scan_no_shuffle(spark):
    df = _df(spark)
    plan = (
        migration_impact(df, OLD, NEW, keys=["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # map-only: scan -> fused Project -> Filter -> Generate; one scan,
    # no Exchange, no Python
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert plan.count("Scan ExistingRDD") == 1

    splan = (
        migration_summary(df, OLD, NEW)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # summary: exactly one (partial-aggregable) shuffle on the site key
    assert splan.count("Exchange") == 1
    assert splan.count("Scan ExistingRDD") == 1


def test_migration_impact_json_one_parse(spark):
    from jsonschema_spark import migration_impact_json

    old = {"properties": {"user": {"properties": {"id": {"minimum": 1}}}}}
    new = {
        "required": ["tag"],
        "properties": {"user": {"properties": {"id": {"minimum": 10}}}},
    }
    df = spark.createDataFrame(
        [
            (1, '{"user": {"id": 50}, "tag": "a"}'),   # clean both
            (2, '{"user": {"id": 5}, "tag": "a"}'),    # min raised -> new
            (3, '{"user": {"id": 50}}'),               # tag now required -> new
            (4, '{"user": {"id": 0}}'),                # already dirty -> excluded
            (5, 'not json at all'),                    # malformed -> both -> excluded
            (6, '{"user": {"id": "abc"}, "tag": "a"}'),# wrong-typed -> both -> excluded
        ],
        "id int, payload string",
    )
    got = sorted(
        tuple(r)
        for r in migration_impact_json(df, old, new, "payload", keys=["id"]).collect()
    )
    by_id = {}
    for i, path, info in got:
        by_id.setdefault(i, []).append((path, info))
    assert sorted(by_id) == [2, 3]
    assert by_id[2] == [("$.user.id", "value must be larger or equal than 10")]
    assert by_id[3] == [("$.tag", "field is required")]

    plan = (
        migration_impact_json(df, old, new, "payload", keys=["id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one scan, one parse (both rule sets share it), no shuffle/Python
    assert plan.count("Exchange") == 0
    assert "Python" not in plan
    assert plan.count("Scan ExistingRDD") == 1
    assert plan.count("parse_json") <= 2  # the parse + the malformed re-check


def test_migration_impact_json_rejects_static(spark):
    import pytest as _pytest

    from jsonschema_spark import SchemaError, compile_schema, migration_impact_json

    df = spark.createDataFrame([(1, "{}")], "id int, payload string")
    old = compile_schema(
        {"properties": {"a": {"minimum": 1}}}, options={"json_types": "static"}
    )
    new = compile_schema({"properties": {"a": {"minimum": 2}}})
    with _pytest.raises(SchemaError):
        migration_impact_json(df, old, new, "payload", keys=["id"])
