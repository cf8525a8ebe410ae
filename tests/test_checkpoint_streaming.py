"""Checkpoint/resume manifest + structured-streaming validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import jsonschema_spark as js
from jsonschema_spark.checkpoint import CheckpointManifest, ResumableRun
from jsonschema_spark.operators import checks
from jsonschema_spark.streaming.validate import (
    stateful_dedup_stream,
    windowed_verdicts,
)


@pytest.fixture()
def part_df(spark):
    rows = [
        ("2025-01-01", "c1", 0), ("2025-01-01", "c1", 0),   # dup in day1
        ("2025-01-02", "c2", 0), ("2025-01-02", "c2", 1),
    ]
    return spark.createDataFrame(rows, "day string, conv_id string, turn_idx int")


def test_resumable_run_skips_completed(spark, part_df, tmp_path):
    manifest = CheckpointManifest(str(tmp_path / "manifest"))
    suite = checks.CheckSuite(
        [checks.Uniqueness(keys=["conv_id", "turn_idx"], partition_by=["day"])]
    )
    run = ResumableRun(suite=suite, manifest=manifest,
                       partition_by=["day"], source_id="test")

    first = run.run(part_df).collect()
    assert {r["partition_id"] for r in first} == {"day=2025-01-01", "day=2025-01-02"}

    # second run: everything checkpointed -> nothing re-executed
    second = run.run(part_df).collect()
    assert second == []

    # a NEW partition arrives -> only it runs
    more = part_df.union(
        spark.createDataFrame([("2025-01-03", "c3", 0)], part_df.schema)
    )
    third = run.run(more).collect()
    assert {r["partition_id"] for r in third} == {"day=2025-01-03"}

    # manifest carries lineage + metrics rows
    m = manifest.read(spark)
    assert m.count() == 3
    cols = set(m.columns)
    assert {"partition_id", "check", "completed_at", "lineage", "metrics"} <= cols


def test_resume_invalidated_by_config_change(spark, part_df, tmp_path):
    manifest = CheckpointManifest(str(tmp_path / "manifest2"))
    s1 = checks.CheckSuite([checks.Uniqueness(keys=["conv_id", "turn_idx"],
                                              partition_by=["day"])])
    ResumableRun(suite=s1, manifest=manifest, partition_by=["day"],
                 source_id="test").run(part_df)
    # different check config (different keys) => different lineage => re-runs
    s2 = checks.CheckSuite([checks.Uniqueness(keys=["conv_id"],
                                              partition_by=["day"])])
    out = ResumableRun(suite=s2, manifest=manifest, partition_by=["day"],
                       source_id="test").run(part_df).collect()
    assert len(out) == 2


PLAN_DOC = {
    "required": ["conv_id", "role"],
    "properties": {"role": {"enum": ["user", "assistant"]}},
}


@pytest.fixture()
def stream_src(spark, tmp_path):
    rows = [
        ("c1", 0, "user", "2025-01-01 00:00:10"),
        ("c1", 1, "assistant", "2025-01-01 00:00:20"),
        ("c1", 1, "assistant", "2025-01-01 00:00:21"),  # dup key
        ("c2", 0, "narrator", "2025-01-01 00:01:10"),   # enum violation
        ("c2", 1, None, "2025-01-01 00:01:30"),         # required violation
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    path = str(tmp_path / "stream_src")
    df.coalesce(1).write.parquet(path)
    return spark.readStream.schema(
        "conv_id string, turn_idx int, role string, ts timestamp"
    ).parquet(path)


def _drain(q):
    q.processAllAvailable()
    q.stop()


def test_windowed_verdicts_stream(spark, stream_src):
    plan = js.compile_schema(PLAN_DOC)
    out = windowed_verdicts(stream_src, plan, window="1 minute")
    # complete mode: append would only emit windows already sealed by
    # the watermark, which never happens within one availableNow batch
    q = (
        out.writeStream.format("memory")
        .queryName("verdicts_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = {str(r["window_start"]): (r["rows"], r["bad_rows"], r["pass"])
            for r in spark.sql("select * from verdicts_t").collect()}
    assert rows["2025-01-01 00:00:00"] == (3, 0, True)
    assert rows["2025-01-01 00:01:00"] == (2, 2, False)


def test_stateful_dedup_stream(spark, stream_src):
    out = stateful_dedup_stream(stream_src, keys=["conv_id", "turn_idx"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.sql("select conv_id, turn_idx from dedup_t").collect()
    keys = sorted((r["conv_id"], r["turn_idx"]) for r in got)
    assert keys == [("c1", 0), ("c1", 1), ("c2", 0), ("c2", 1)]


def test_ks_grouped_udaf(spark):
    from jsonschema_spark.operators.sketches import ks_grouped

    base = spark.range(0, 4000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    same = spark.range(0, 2000).selectExpr(
        "'same' AS part", "CAST(id % 100 AS DOUBLE) AS v"
    )
    shifted = spark.range(0, 2000).selectExpr(
        "'shift' AS part", "CAST(id % 100 + 75 AS DOUBLE) AS v"
    )
    cur = same.union(shifted)
    out = {r["partition_id"]: r for r in
           ks_grouped(cur, base, "v", partition_by=["part"]).collect()}
    assert out["part=same"]["drifted"] is False
    assert out["part=shift"]["drifted"] is True
    assert out["part=shift"]["ks"] > 0.5


def test_stateful_conversation_progress(spark, tmp_path):
    import jsonschema_spark as js
    from jsonschema_spark.streaming.stateful import conversation_progress

    rows = [
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, None),
        ("c2", 0, "narrator"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    src = str(tmp_path / "state_src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "conv_id string, turn_idx int, role string"
    ).parquet(src)
    plan = js.compile_schema(
        {"required": ["role"], "properties": {"role": {"enum": ["user", "assistant"]}}}
    )
    out = conversation_progress(plan.annotate(stream), timeout_ms=0)
    q = (
        out.writeStream.format("memory").queryName("conv_state_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["conv_id"]: r for r in spark.sql("select * from conv_state_t").collect()}
    assert got["c1"]["n_turns"] == 3 and got["c1"]["max_turn"] == 2
    assert got["c1"]["bad"] == 1      # null role
    assert got["c2"]["bad"] == 1      # enum violation
    assert got["c1"]["complete"] is False


def test_resume_prunes_partition_files(spark, tmp_path):
    """The resume filter must reach the scan as a partition filter —
    completed partitions' files are never read."""
    from jsonschema_spark.checkpoint import CheckpointManifest, ResumableRun

    src = str(tmp_path / "parts")
    spark.createDataFrame(
        [("2025-01-01", "c1", 0), ("2025-01-01", "c1", 0),
         ("2025-01-02", "c2", 0), ("2025-01-03", "c3", 1)],
        "day string, conv_id string, turn_idx int",
    ).write.partitionBy("day").parquet(src)
    df = spark.read.parquet(src)

    manifest = CheckpointManifest(str(tmp_path / "m"))
    suite = checks.CheckSuite(
        [checks.Uniqueness(keys=["conv_id", "turn_idx"], partition_by=["day"])]
    )
    run = ResumableRun(suite=suite, manifest=manifest,
                       partition_by=["day"], source_id="t")
    first = run.run(df)
    assert {r["partition_id"] for r in first.collect()} == {
        "day=2025-01-01", "day=2025-01-02", "day=2025-01-03"
    }

    # add a new partition; the re-run's scan must carry a partition
    # filter on `day` (raw column, prunable), not a computed string
    spark.createDataFrame(
        [("2025-01-04", "c4", 0)], "day string, conv_id string, turn_idx int"
    ).write.mode("append").partitionBy("day").parquet(src)
    df2 = spark.read.parquet(src)
    out = run.run(df2)
    assert {r["partition_id"] for r in out.collect()} == {"day=2025-01-04"}

    # the pruning predicate shape reaches the scan as PartitionFilters
    pruned = df2.filter(F.col("day").isin(["2025-01-04"]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "2025-01-04" in pf


def test_resume_null_and_bool_partitions(spark, tmp_path):
    """NULL and boolean partition values must checkpoint AND resume:
    pids are derived from the Spark-side _partition_id expression (not
    a driver '/'.join that renders True/None differently), and the
    pruning predicate carries an isNull disjunct (ADVICE r1)."""
    rows = [
        ("2025-01-01", True, "c1", 0),
        ("2025-01-01", True, "c1", 0),   # dup
        (None, False, "c2", 0),
        (None, False, "c2", 1),
    ]
    df = spark.createDataFrame(
        rows, "day string, flagged boolean, conv_id string, turn_idx int"
    )
    manifest = CheckpointManifest(str(tmp_path / "mnull"))
    suite = checks.CheckSuite(
        [checks.Uniqueness(keys=["conv_id", "turn_idx"],
                           partition_by=["day", "flagged"])]
    )
    run = ResumableRun(suite=suite, manifest=manifest,
                       partition_by=["day", "flagged"], source_id="t")
    first = run.run(df)
    pids = {r["partition_id"] for r in first.collect()}
    assert pids == {
        "day=2025-01-01/flagged=true",
        "day=__HIVE_DEFAULT_PARTITION__/flagged=false",
    }

    # full resume: nothing re-runs (pid match must hold for bool/null)
    assert run.run(df).collect() == []

    # add one partition: ONLY it runs, and the null partition is
    # neither silently re-run nor excluded
    more = df.union(spark.createDataFrame(
        [("2025-01-02", False, "c3", 0)], df.schema))
    out = run.run(more).collect()
    assert {r["partition_id"] for r in out} == {"day=2025-01-02/flagged=false"}

    # the pruning helper keeps NULL-partition rows when they are todo
    from jsonschema_spark.checkpoint import prune_to_partitions
    kept = prune_to_partitions(df, ["day", "flagged"], [(None, False)])
    assert kept.count() == 2
    kept1 = prune_to_partitions(df, ["day"], [(None,)])
    assert kept1.count() == 2


def test_lineage_tracks_dataframe_inputs(spark, part_df, tmp_path):
    """A changed RI dimension table must invalidate old manifest rows:
    the lineage fingerprints DataFrame-valued config content (ADVICE
    r1: scalar-only lineage skipped re-runs after the dim changed)."""
    manifest = CheckpointManifest(str(tmp_path / "mdim"))
    dim1 = spark.createDataFrame([("c1",)], "conv_id string")
    s1 = checks.CheckSuite([checks.ReferentialIntegrity(
        dim=dim1, fact_key="conv_id", dim_key="conv_id",
        partition_by=["day"], name="ri_conv")])
    out1 = ResumableRun(suite=s1, manifest=manifest, partition_by=["day"],
                        source_id="t").run(part_df).collect()
    assert len(out1) == 2

    # same config, same dim content -> fully checkpointed
    dim1b = spark.createDataFrame([("c1",)], "conv_id string")
    s1b = checks.CheckSuite([checks.ReferentialIntegrity(
        dim=dim1b, fact_key="conv_id", dim_key="conv_id",
        partition_by=["day"], name="ri_conv")])
    assert ResumableRun(suite=s1b, manifest=manifest, partition_by=["day"],
                        source_id="t").run(part_df).collect() == []

    # changed dim CONTENT (same schema/config) -> lineage differs -> re-runs
    dim2 = spark.createDataFrame([("c1",), ("c2",)], "conv_id string")
    s2 = checks.CheckSuite([checks.ReferentialIntegrity(
        dim=dim2, fact_key="conv_id", dim_key="conv_id",
        partition_by=["day"], name="ri_conv")])
    out2 = ResumableRun(suite=s2, manifest=manifest, partition_by=["day"],
                        source_id="t").run(part_df).collect()
    assert len(out2) == 2


def test_resumable_fresh_run_uses_fused_suite_with_drift(spark, part_df, tmp_path):
    """Fresh-run fast path: ResumableRun delegates to the fused suite
    (schema-shaped checks + drift share one scan) and still writes one
    manifest row per (partition, check); the resume then skips all."""
    import jsonschema_spark as js

    manifest = CheckpointManifest(str(tmp_path / "mfused"))
    plan = js.compile_schema({"required": ["conv_id"]})
    suite = checks.CheckSuite([
        checks.SchemaCheck(plan=plan, partition_by=["day"], name="schema"),
        checks.ColumnStats(columns=["conv_id"], approx=False,
                           partition_by=["day"], name="stats"),
        checks.Drift(column="turn_idx", baseline=part_df,
                     partition_by=["day"], approx=False),
    ])
    run = ResumableRun(suite=suite, manifest=manifest,
                       partition_by=["day"], source_id="t")
    first = run.run(part_df).collect()
    assert {(r["partition_id"], r["check"]) for r in first} == {
        (p, c)
        for p in ("day=2025-01-01", "day=2025-01-02")
        for c in ("schema", "stats", "drift")
    }
    # full resume: nothing re-runs
    assert run.run(part_df).collect() == []
    assert manifest.read(spark).count() == 6


def test_resume_partition_listing_is_metadata_only(spark, tmp_path):
    """Enumerating the input's partitions must not scan the fact table
    (checkpoint._partition_tuples_from_files): on a hive-partitioned
    read the listing comes from the file paths (the local analog of an
    Iceberg partitions metadata table), and a fully-checkpointed
    resume therefore reads ZERO fact-table bytes — proven here by
    corrupting every data file after the first run and resuming
    anyway."""
    import pathlib

    from jsonschema_spark.checkpoint import CheckpointManifest, ResumableRun

    src = str(tmp_path / "meta_parts")
    spark.createDataFrame(
        [("2025-01-01", 1, "c1", 0), ("2025-01-01", 1, "c1", 0),
         (None, 2, "c2", 0), ("2025-01-03", 3, "c3", 1)],
        "day string, bucket int, conv_id string, turn_idx int",
    ).write.partitionBy("day", "bucket").parquet(src)
    df = spark.read.parquet(src)

    manifest = CheckpointManifest(str(tmp_path / "meta_m"))
    suite = checks.CheckSuite(
        [checks.Uniqueness(keys=["conv_id", "turn_idx"],
                           partition_by=["day", "bucket"])]
    )
    run = ResumableRun(suite=suite, manifest=manifest,
                       partition_by=["day", "bucket"], source_id="t")
    first = run.run(df)
    # the listing came from file metadata, not a distinct scan, and
    # yields the exact pid rendering (typed int, NULL partition)
    assert run.partition_source == "files"
    assert {r["partition_id"] for r in first.collect()} == {
        "day=2025-01-01/bucket=1",
        "day=__HIVE_DEFAULT_PARTITION__/bucket=2",
        "day=2025-01-03/bucket=3",
    }

    # corrupt every data file: any attempt to read fact bytes now fails
    schema = df.schema
    for p in pathlib.Path(src).rglob("*.parquet"):
        p.write_bytes(b"corrupt")
    df2 = spark.read.schema(schema).parquet(src)
    out = run.run(df2)  # fully checkpointed -> must not touch the files
    assert run.partition_source == "files"
    assert out.collect() == []
    assert run.last_ran == {}


def test_resume_transformed_input_falls_back_to_scan(spark, tmp_path):
    """A filtered/transformed input can exclude whole partitions, which
    only a scan sees: the metadata route must refuse and fall back."""
    from jsonschema_spark.checkpoint import CheckpointManifest, ResumableRun

    src = str(tmp_path / "fb_parts")
    spark.createDataFrame(
        [("2025-01-01", "c1", 0), ("2025-01-02", "c2", 0)],
        "day string, conv_id string, turn_idx int",
    ).write.partitionBy("day").parquet(src)
    df = spark.read.parquet(src).filter(F.col("day") != "2025-01-02")

    manifest = CheckpointManifest(str(tmp_path / "fb_m"))
    suite = checks.CheckSuite(
        [checks.Uniqueness(keys=["conv_id", "turn_idx"], partition_by=["day"])]
    )
    run = ResumableRun(suite=suite, manifest=manifest,
                       partition_by=["day"], source_id="t")
    out = run.run(df)
    assert run.partition_source == "scan"
    assert {r["partition_id"] for r in out.collect()} == {"day=2025-01-01"}


def test_partition_listing_rejects_ancestor_lookalike(spark, tmp_path):
    """An ancestor directory that merely LOOKS like a partition dir
    (/data/env=prod/tbl with a data column `env`) must not shadow the
    real layout: the metadata route refuses and the scan fallback
    enumerates the true partition values."""
    from jsonschema_spark.checkpoint import _partition_tuples_from_files

    src = str(tmp_path / "env=prod" / "tbl")
    spark.createDataFrame(
        [("prod", "c1", 0), ("staging", "c2", 0), ("dev", "c3", 1)],
        "env string, conv_id string, turn_idx int",
    ).write.parquet(src)  # NOT partitioned by env
    df = spark.read.parquet(src)
    assert _partition_tuples_from_files(df, ["env"]) is None

    from jsonschema_spark.checkpoint import CheckpointManifest, ResumableRun

    manifest = CheckpointManifest(str(tmp_path / "env_m"))
    suite = checks.CheckSuite(
        [checks.Uniqueness(keys=["conv_id", "turn_idx"], partition_by=["env"])]
    )
    run = ResumableRun(suite=suite, manifest=manifest,
                       partition_by=["env"], source_id="t")
    out = run.run(df)
    assert run.partition_source == "scan"
    assert {r["partition_id"] for r in out.collect()} == {
        "env=prod", "env=staging", "env=dev"
    }


def test_partition_listing_rejects_extra_partition_levels(spark, tmp_path):
    """A table partitioned by MORE columns than requested must fall
    back: slicing by the requested subset from paths alone would
    enumerate duplicates with wrong pids."""
    from jsonschema_spark.checkpoint import _partition_tuples_from_files

    src = str(tmp_path / "extra_parts")
    spark.createDataFrame(
        [("a", 1, "c1"), ("a", 2, "c2"), ("b", 1, "c3")],
        "day string, bucket int, conv_id string",
    ).write.partitionBy("day", "bucket").parquet(src)
    df = spark.read.parquet(src)
    assert _partition_tuples_from_files(df, ["day"]) is None


def test_sideoutput_metadata_route_and_transitions(spark, tmp_path):
    """SideOutput.todo: (a) enumerates partitions scan-free on a bare
    hive read; (b) a MISSING sink voids completion rows (rebuild);
    (c) a present sink with no completion rows backfills the
    partitions the verdict run skipped instead of re-appending."""
    from jsonschema_spark.checkpoint import (CheckpointManifest, SideOutput,
                                             side_lineage)

    src = str(tmp_path / "so_parts")
    spark.createDataFrame(
        [("2025-01-01", "c1", 0), ("2025-01-02", "c2", 0)],
        "day string, conv_id string, turn_idx int",
    ).write.partitionBy("day").parquet(src)
    df = spark.read.parquet(src)
    manifest = CheckpointManifest(str(tmp_path / "so_m"))
    side = SideOutput(manifest=manifest, name="schema:violations",
                      lineage=side_lineage("t", {"x": 1}, "sink"),
                      partition_by=["day"])

    # fresh: everything todo, via the files route
    sub, todo, pid_of = side.todo(df, sink_present=False)
    assert side.partition_source == "files"
    assert len(todo) == 2 and sub is not None
    side.commit(spark, todo, pid_of)

    # confirmed: nothing todo, still no scan needed
    sub2, todo2, _ = side.todo(df)
    assert sub2 is None and todo2 == []

    # sink deleted: completion rows are void, everything rebuilds
    sub3, todo3, _ = side.todo(df, sink_present=False)
    assert len(todo3) == 2

    # pre-SideOutput manifest (different lineage -> zero completion
    # rows) + present sink: partitions NOT just run are backfilled
    side_legacy = SideOutput(manifest=manifest, name="schema:violations",
                             lineage=side_lineage("t", {"x": 2}, "sink"),
                             partition_by=["day"])
    # NOTE: partition-column inference reads "2025-01-01" back as a
    # DATE — just_ran must carry the TYPED values, exactly what
    # ResumableRun.last_ran holds (the cli passes those through)
    import datetime as _dt

    d1, d2 = _dt.date(2025, 1, 1), _dt.date(2025, 1, 2)
    sub4, todo4, pid4 = side_legacy.todo(
        df, sink_present=True, just_ran={(d2,)}
    )
    assert todo4 == [(d2,)]
    assert side_legacy.backfill == [(d1,)]


def test_windowed_verdicts_json_stream(spark, tmp_path):
    """Streaming JSON-string-column validation (the Kafka shape: a
    `value` column holding a JSON document) — both parse modes; the
    hoisted variant projection chain must be streaming-legal
    (stateless projections only)."""
    from jsonschema_spark.streaming.validate import windowed_verdicts

    rows = [
        ("2025-01-01 00:00:05", '{"id": 1, "name": "ok"}'),
        ("2025-01-01 00:00:30", '{"id": "x", "name": "ok"}'),   # type err
        ("2025-01-01 00:01:10", '{"name": "missing id"}'),      # required
        ("2025-01-01 00:01:40", '{"bad": '),                    # malformed
    ]
    df = spark.createDataFrame(rows, "ts_s string, value string").withColumn(
        "ts", F.to_timestamp("ts_s")
    ).drop("ts_s")
    path = str(tmp_path / "json_stream_src")
    df.coalesce(1).write.parquet(path)
    plan = js.compile_schema(
        {"required": ["id"], "properties": {"id": {"type": "integer"}}}
    )
    for i, mode in enumerate(("variant", "static")):
        src = spark.readStream.schema("value string, ts timestamp").parquet(path)
        out = windowed_verdicts(
            src, plan, window="1 minute", json_col="value", json_types=mode
        )
        q = (
            out.writeStream.format("memory")
            .queryName(f"jverdicts_{i}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            str(r["window_start"]): (r["rows"], r["bad_rows"])
            for r in spark.sql(f"select * from jverdicts_{i}").collect()
        }
        # variant mode flags the wrong-typed id; static degrades it to
        # a null field which `required` (field presence on the struct)
        # still reports — both windows carry 1 bad row in window 0
        assert got["2025-01-01 00:00:00"] == (2, 1), (mode, got)
        assert got["2025-01-01 00:01:00"] == (2, 2), (mode, got)


def test_resume_invalidated_by_schema_doc_change(spark, part_df, tmp_path):
    """The schema DOCUMENT is check config: editing it must invalidate
    cached schema verdicts (the compiled plan object itself is not a
    JSON-serializable field, so _lineage reads plan.doc)."""
    manifest = CheckpointManifest(str(tmp_path / "manifest_doc"))
    s1 = checks.CheckSuite([checks.SchemaCheck(
        plan=js.compile_schema({"required": ["conv_id"]}),
        partition_by=["day"])])
    ResumableRun(suite=s1, manifest=manifest, partition_by=["day"],
                 source_id="t").run(part_df)
    # same doc => fully checkpointed, nothing re-runs
    s1b = checks.CheckSuite([checks.SchemaCheck(
        plan=js.compile_schema({"required": ["conv_id"]}),
        partition_by=["day"])])
    out = ResumableRun(suite=s1b, manifest=manifest, partition_by=["day"],
                       source_id="t").run(part_df).collect()
    assert out == []
    # different doc => different lineage => re-runs
    s2 = checks.CheckSuite([checks.SchemaCheck(
        plan=js.compile_schema({"required": ["conv_id", "role"]}),
        partition_by=["day"])])
    out2 = ResumableRun(suite=s2, manifest=manifest, partition_by=["day"],
                        source_id="t").run(part_df).collect()
    assert len(out2) == 2


def test_schema_check_json_col(spark):
    """SchemaCheck over a JSON-string column: verdicts count malformed
    and invalid documents; violations carry the json-path errors."""
    df = spark.createDataFrame(
        [("p1", 1, '{"id": 1}'), ("p1", 2, '{"id": "x"}'),
         ("p2", 3, '{"id": '), ("p2", 4, None)],
        "part string, k int, payload string",
    )
    chk = checks.SchemaCheck(
        plan=js.compile_schema(
            {"required": ["id"], "properties": {"id": {"type": "integer"}}}
        ),
        partition_by=["part"], keys=["k"], json_col="payload",
    )
    v = {r["partition_id"]: (r["metrics"]["rows"], r["metrics"]["bad_rows"])
         for r in chk.verdicts(df).collect()}
    # p1: wrong-typed id (variant mode type error); p2: malformed doc +
    # NULL payload (validates as {} -> required fires)
    assert v == {"part=p1": ("2", "1"), "part=p2": ("2", "2")}
    viols = {(r["k"], r["path"]) for r in chk.violations(df).collect()}
    assert viols == {(2, "$.id"), (3, "$"), (4, "$.id")}


def test_stateful_sequence_state_matches_batch_operator(spark, tmp_path):
    """Streaming sequence integrity (conversation_sequence_state): a
    single availableNow drain over the planted corpus must count the
    SAME violations as the batch conversation_integrity operator."""
    import datetime as dt

    from jsonschema_spark.operators.transcripts import conversation_integrity
    from jsonschema_spark.streaming.stateful import (
        conversation_sequence_state,
    )

    def ts(m):
        return dt.datetime(2026, 1, 1, 12, m, 0)

    rows = [
        ("c1", 0, "user", ts(0)), ("c1", 1, "assistant", ts(1)),
        ("c2", 1, "assistant", ts(0)),        # bad first index + role
        ("c2", 3, "user", ts(2)),             # gap
        ("c2", 4, "user", ts(1)),             # ts regress + user>user
    ]
    schema = "conv_id string, turn_idx int, role string, ts timestamp"
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "seq_src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = conversation_sequence_state(stream)
    q = (
        out.writeStream.format("memory").queryName("seq_state_t")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["conv_id"]: r
        for r in spark.sql("select * from seq_state_t").collect()
    }
    batch = {
        r["conv_id"]: r["n"]
        for r in conversation_integrity(df, order_by=("turn_idx", "ts"))
        .groupBy("conv_id").count().withColumnRenamed("count", "n").collect()
    }
    assert got["c1"]["viol"] == batch.get("c1", 0) == 0
    assert got["c2"]["viol"] == batch["c2"] == 5
    assert got["c2"]["n_turns"] == 3


def test_stateful_sequence_state_across_batches(spark, tmp_path):
    """State carries the last (turn, ts, role) across micro-batches: a
    gap between the last turn of batch 1 and the first of batch 2 is a
    violation only the carried state can see."""
    import datetime as dt

    from jsonschema_spark.streaming.stateful import (
        conversation_sequence_state,
    )

    def ts(m):
        return dt.datetime(2026, 1, 1, 12, m, 0)

    schema = "conv_id string, turn_idx int, role string, ts timestamp"
    src = str(tmp_path / "seq_src2")
    ckpt = str(tmp_path / "seq_ck2")
    spark.createDataFrame(
        [("c1", 0, "user", ts(0)), ("c1", 1, "assistant", ts(1))], schema
    ).coalesce(1).write.mode("append").parquet(src)

    def drain(_qn):
        # memory sink cannot recover from a checkpoint; foreachBatch can
        rows = []
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            conversation_sequence_state(stream)
            .writeStream.foreachBatch(
                lambda bdf, _e: rows.extend(bdf.collect())
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.processAllAvailable()
        q.stop()
        return {r["conv_id"]: r for r in rows}

    got1 = drain("seq_b1")
    assert got1["c1"]["viol"] == 0 and got1["c1"]["n_turns"] == 2
    # batch 2: turn 5 follows turn 1 -> ONE violation, visible only via state
    spark.createDataFrame(
        [("c1", 5, "user", ts(2))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    got2 = drain("seq_b2")
    assert got2["c1"]["n_turns"] == 3
    assert got2["c1"]["viol"] == 1


def test_bounded_state_partitions_caps_and_restores(spark):
    """r4: the bound caps the conf at 2x defaultParallelism for the
    stream's start, never raises an already-lower setting, and always
    restores (state-store partition count is a durable property of a
    streaming checkpoint, so the cap must be deliberate)."""
    from jsonschema_spark.streaming import bounded_state_partitions

    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    try:
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set(key, "4096")
        with bounded_state_partitions(spark):
            assert int(spark.conf.get(key)) == max(2 * cores, 8)
        assert spark.conf.get(key) == "4096"
        spark.conf.set(key, "2")  # lower than the bound: untouched
        with bounded_state_partitions(spark):
            assert spark.conf.get(key) == "2"
        assert spark.conf.get(key) == "2"
        with bounded_state_partitions(spark, n=6):
            assert spark.conf.get(key) == "2"  # min(cur, n)
        spark.conf.set(key, "512")
        with bounded_state_partitions(spark, n=6):
            assert spark.conf.get(key) == "6"
    finally:
        spark.conf.set(key, orig)
