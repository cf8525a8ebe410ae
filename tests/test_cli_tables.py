"""CLI run/validate + table IO round trip."""

from __future__ import annotations

import json

import pytest

from jsonschema_spark.sources.fixtures import dim_roles, transcripts
from jsonschema_spark.sources.tables import read_table, write_output


@pytest.fixture()
def data_dir(spark, tmp_path):
    d = tmp_path / "data"
    transcripts(spark, n_convs=100).write.parquet(str(d / "transcripts"))
    dim_roles(spark).write.parquet(str(d / "dim_roles"))
    return d


def test_cli_run_with_manifest_resume(spark, data_dir, tmp_path, capsys):
    from jsonschema_spark.cli import main

    cfg = {
        "source": str(data_dir / "transcripts"),
        "schema": {
            "required": ["conv_id", "role"],
            "properties": {"turn_idx": {"minimum": 0}},
        },
        "keys": ["conv_id", "turn_idx"],
        "checks": {
            "uniqueness": {"keys": ["conv_id", "turn_idx"]},
            "referential": [
                {"name": "ri_role", "fact_key": "role",
                 "dim": str(data_dir / "dim_roles"), "dim_key": "role"}
            ],
            "stats": {"columns": ["role", "text"], "approx": True},
        },
        "output": {
            "verdicts": str(tmp_path / "verdicts"),
            "violations": str(tmp_path / "violations"),
            "manifest": str(tmp_path / "manifest"),
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    rc = main(["run", str(cfg_path)])
    assert rc == 0
    verdicts = spark.read.parquet(str(tmp_path / "verdicts"))
    assert {r["check"] for r in verdicts.collect()} == {
        "schema", "uniqueness", "ri_role", "column_stats",
    }
    viols = spark.read.parquet(str(tmp_path / "violations"))
    assert viols.count() > 0
    assert set(viols.columns) == {"conv_id", "turn_idx", "path", "info"}

    # resume: second run sees the manifest and re-runs nothing
    n_viols = viols.count()
    rc2 = main(["run", str(cfg_path)])
    assert rc2 == 0
    manifest = spark.read.parquet(str(tmp_path / "manifest"))
    # 4 check rows + 1 schema:violations completion row, not doubled
    assert manifest.count() == 5
    assert manifest.filter("check = 'schema:violations'").count() == 1
    # the violations sink must NOT accumulate duplicates on resume
    # (ADVICE r1: the append sink re-wrote the full table every run)
    assert spark.read.parquet(str(tmp_path / "violations")).count() == n_viols


def test_cli_violations_crash_window(spark, data_dir, tmp_path):
    """A run that appended the schema check's manifest rows but crashed
    BEFORE the violations write (while the sink already exists from an
    earlier run) must not lose those partitions' violations on the next
    run — the skip is scoped to partitions whose schema:violations
    completion row is present, not to the schema check's own rows
    (ADVICE r2 medium)."""
    from jsonschema_spark.checkpoint import CheckpointManifest, ResumableRun
    from jsonschema_spark.cli import build_suite, main
    from jsonschema_spark.operators.checks import CheckSuite

    cfg = {
        "source": str(data_dir / "transcripts"),
        "schema": {
            "required": ["conv_id", "role"],
            "properties": {"turn_idx": {"minimum": 0}},
        },
        "keys": ["conv_id", "turn_idx"],
        "partition_by": ["role"],
        "checks": {"uniqueness": {"keys": ["conv_id", "turn_idx"]}},
        "output": {
            "verdicts": str(tmp_path / "verdicts"),
            "violations": str(tmp_path / "violations"),
            "manifest": str(tmp_path / "manifest"),
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    # simulate the crashed run: verdict/manifest rows land ...
    df = read_table(spark, cfg["source"])
    run = ResumableRun(
        suite=CheckSuite(build_suite(spark, cfg)),
        manifest=CheckpointManifest(cfg["output"]["manifest"]),
        partition_by=["role"],
        source_id=cfg["source"],
    )
    run.run(df)
    # ... the sink exists (earlier runs) but THIS data's violations were
    # never written
    spark.createDataFrame(
        [], "conv_id string, turn_idx int, path string, info string"
    ).write.parquet(str(tmp_path / "violations"))

    rc = main(["run", str(cfg_path)])
    assert rc == 0
    viols = spark.read.parquet(str(tmp_path / "violations"))
    n = viols.count()
    assert n > 0  # the old last_ran scoping dropped these forever

    # and a further resume does not duplicate them
    rc2 = main(["run", str(cfg_path)])
    assert rc2 == 0
    assert spark.read.parquet(str(tmp_path / "violations")).count() == n


def test_read_table_pushdown(spark, data_dir):
    df = read_table(
        spark, str(data_dir / "transcripts"),
        where="turn_idx >= 0", columns=["conv_id", "turn_idx"],
    )
    assert df.columns == ["conv_id", "turn_idx"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(turn_idx), GreaterThanOrEqual(turn_idx,0)]" in plan
    assert "ReadSchema: struct<conv_id:string,turn_idx:int>" in plan


def test_write_output_partitioned(spark, data_dir, tmp_path):
    df = read_table(spark, str(data_dir / "transcripts"))
    write_output(df.limit(50), str(tmp_path / "out"), partition_by=["role"])
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 50


def test_cli_drift_baseline_cycle(spark, data_dir, tmp_path):
    """Run N saves the drift sketch; run N+1 consumes it via
    baseline_path — the continuous-drift operational loop."""
    import json

    from jsonschema_spark.cli import main

    qpath = str(tmp_path / "drift_q")
    cfg = {
        "source": str(data_dir / "transcripts"),
        "checks": {
            "uniqueness": {"keys": ["conv_id", "turn_idx"]},
            "drift": {"column": "turn_idx", "baseline": str(data_dir / "transcripts"),
                       "save_baseline_to": qpath},
        },
        "output": {"verdicts": str(tmp_path / "v1")},
    }
    p1 = tmp_path / "c1.json"
    p1.write_text(json.dumps(cfg))
    assert main(["run", str(p1)]) == 0

    cfg2 = dict(cfg)
    cfg2["checks"] = {"drift": {"column": "turn_idx", "baseline_path": qpath}}
    cfg2["output"] = {"verdicts": str(tmp_path / "v2")}
    p2 = tmp_path / "c2.json"
    p2.write_text(json.dumps(cfg2))
    assert main(["run", str(p2)]) == 0
    v2 = spark.read.parquet(str(tmp_path / "v2"))
    row = [r for r in v2.collect() if r["check"] == "drift"][0]
    assert row["pass"] is True  # same distribution vs stored sketch


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with the same bucket count
    must join with NO Exchange on either side — the co-located layout
    that amortizes the shuffle of repeated corpus-scale joins."""
    from pyspark.sql import functions as F

    from jsonschema_spark.sources.tables import write_bucketed

    facts = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    dims = spark.range(0, 1_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("w")
    )
    write_bucketed(facts, "bt_facts", ["k"], 8,
                   path=str(tmp_path / "bt_facts"))
    write_bucketed(dims, "bt_dims", ["k"], 8,
                   path=str(tmp_path / "bt_dims"))
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bt_facts").join(spark.table("bt_dims"), "k")
            p = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in p, p
            assert j.count() == 1_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_facts")
        spark.sql("DROP TABLE IF EXISTS bt_dims")


def test_cli_run_json_col(spark, tmp_path):
    """End-to-end CLI run over a JSON-string column (the reference's
    actual input domain): schema verdicts + violations via
    cfg["json_col"], with manifest resume and doc-change invalidation."""
    from jsonschema_spark.cli import main

    src = str(tmp_path / "json_src")
    spark.createDataFrame(
        [("d1", 1, '{"id": 1, "name": "ok"}'),
         ("d1", 2, '{"id": "x", "name": "ok"}'),
         ("d2", 3, '{"id": ')],
        "day string, k int, payload string",
    ).write.partitionBy("day").parquet(src)

    cfg = {
        "source": src,
        "schema": {"required": ["id"],
                   "properties": {"id": {"type": "integer"}}},
        "json_col": "payload",
        "keys": ["k"],
        "partition_by": ["day"],
        "output": {
            "verdicts": str(tmp_path / "jv"),
            "violations": str(tmp_path / "jviol"),
            "manifest": str(tmp_path / "jm"),
        },
    }
    cfg_path = tmp_path / "jcfg.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main(["run", str(cfg_path)]) == 0
    verdicts = spark.read.parquet(str(tmp_path / "jv"))
    got = {r["partition_id"]: r["metrics"]["bad_rows"] for r in verdicts.collect()}
    assert got == {"day=d1": "1", "day=d2": "1"}
    viols = {(r["k"], r["path"]) for r in
             spark.read.parquet(str(tmp_path / "jviol")).collect()}
    assert viols == {(2, "$.id"), (3, "$")}

    # resume: nothing re-runs (verdict sink unchanged row count)
    assert main(["run", str(cfg_path)]) == 0
    assert spark.read.parquet(str(tmp_path / "jv")).count() == 2

    # switching the parse mode changes semantics -> lineage must
    # invalidate and the run re-appends fresh verdicts
    cfg["json_types"] = "static"
    cfg_path.write_text(json.dumps(cfg))
    assert main(["run", str(cfg_path)]) == 0
    assert spark.read.parquet(str(tmp_path / "jv")).count() == 4


def test_cli_run_sequence_check(spark, data_dir, tmp_path):
    """cfg["checks"]["sequence"] runs SequenceIntegrity over the
    transcript table inside the same suite as schema/uniqueness."""
    from jsonschema_spark.cli import main

    cfg = {
        "source": str(data_dir / "transcripts"),
        "schema": {"required": ["conv_id"]},
        "keys": ["conv_id", "turn_idx"],
        "checks": {
            "sequence": {
                "order_by": ["turn_idx", "ts", "text"],
                # the fixture corpus has no role FSM; check ordering only
                "transitions": None,
                "first_roles": None,
            },
        },
        "output": {"verdicts": str(tmp_path / "sv")},
    }
    cfg["checks"]["sequence"] = {
        k: v for k, v in cfg["checks"]["sequence"].items() if v is not None
    } or {}
    # transitions/first_roles omitted -> engine defaults apply
    cfg_path = tmp_path / "cfg_seq.json"
    cfg_path.write_text(json.dumps(cfg))
    rc = main(["run", str(cfg_path)])
    assert rc == 0
    verdicts = spark.read.parquet(str(tmp_path / "sv"))
    rows = {r["check"]: r for r in verdicts.collect()}
    assert "sequence_integrity" in rows
    sq = rows["sequence_integrity"]
    assert sq["metrics"]["conversations"] is not None
    # the fixture plants ~0.5% duplicate (conv_id, turn_idx) pairs ->
    # duplicate turn indices trip turn_sequence
    assert sq["violation_count"] > 0 and sq["pass"] is False


def test_cli_functional_dependency_config(spark, data_dir):
    """The 'functional' config block builds FunctionalDependency checks
    whose verdicts run in the suite."""
    from jsonschema_spark.cli import build_suite
    from jsonschema_spark.operators.checks import (
        CheckSuite,
        FunctionalDependency,
    )

    cfg = {
        "source": str(data_dir / "transcripts"),
        "partition_by": ["role"],
        "checks": {
            "functional": [
                {"name": "fd_tool", "determinant": ["conv_id"],
                 "dependent": "tool", "max_examples": 2}
            ]
        },
    }
    suite = build_suite(spark, cfg)
    fds = [c for c in suite if isinstance(c, FunctionalDependency)]
    assert len(fds) == 1 and fds[0].name == "fd_tool"
    assert fds[0].max_examples == 2
    df = read_table(spark, cfg["source"])
    v = CheckSuite(fds).run(df)
    assert {r["check"] for r in v.collect()} == {"fd_tool"}
