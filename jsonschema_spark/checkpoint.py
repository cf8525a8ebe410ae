"""Per-partition checkpoint/resume for table-level check runs.

North-rule requirement: validation runs over a 10^12-turn corpus must
be resumable — a failed/preempted run re-submits and skips every
(partition, check) pair already recorded, with lineage + metrics rows
carried in the manifest (SURVEY.md §4 item 4; FIXTURES.md §3
``checkpoints`` schema).

Design (no Spark primitive does this — it is driver logic):

  * The manifest is an append-only parquet directory (at production
    scale: an Iceberg table appended transactionally).  Each completed
    (partition_id, check) writes one row::

        checkpoints(partition_id string, check string,
                    completed_at timestamp, lineage string,
                    metrics map<string,string>)

  * ``lineage`` fingerprints the inputs: source identifier + check
    configuration hash, so a manifest row only matches a re-run with
    identical inputs and rules.

  * Resume = anti-join the table's partition list against the
    manifest (both driver-small: one row per partition × check), then
    run the suite ONLY over the missing partitions — the data-side
    filter is a partition-pruning predicate, so Spark never reads
    completed partitions' files on an Iceberg/hive-partitioned table.

Writes are atomic at file granularity (parquet append of one run's
rows); a crash mid-run loses at most the in-flight partitions, never
corrupts prior rows.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.checks import Check, CheckSuite, _partition_id

CHECKPOINT_SCHEMA = (
    "partition_id string, check string, completed_at timestamp, "
    "lineage string, metrics map<string,string>"
)


def _df_fingerprint(df: DataFrame) -> str:
    """Content fingerprint of a DataFrame-valued check input (RI dim,
    drift baseline): row count + order-insensitive xxhash64 sum.  One
    cheap agg job over a table that is small by contract (dim/baseline
    << fact); makes the lineage change when the dim content changes."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: ANSI-safe (a long sum of xxhash64 overflows)
        F.sum(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).cast(
                "decimal(38,0)"
            )
        ).alias("h"),
    ).collect()[0]
    return f"{row['n']}:{row['h']}"


def _lineage(source_id: str, check: Check) -> str:
    """Stable fingerprint of (input, check config): same lineage ⇒ the
    cached verdict is valid for this re-run.  DataFrame-valued config
    (e.g. ReferentialIntegrity.dim, Drift.baseline) contributes a
    content fingerprint so a changed dim invalidates old manifest rows."""
    cfg = {}
    for k, v in sorted(vars(check).items()):
        if isinstance(v, (str, int, float, bool, list, tuple, dict, type(None))):
            cfg[k] = v
        elif isinstance(v, DataFrame):
            cfg[k] = _df_fingerprint(v)
        elif isinstance(getattr(v, "doc", None), (dict, list)):
            # compiled schema plan: the DOCUMENT is the config — a
            # changed schema must invalidate cached schema verdicts
            cfg[k] = v.doc
    blob = json.dumps({"source": source_id, "check": check.name, "cfg": cfg},
                      sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


@dataclass
class CheckpointManifest:
    """The manifest directory + the resume/append operations."""

    path: str

    def read(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.parquet(self.path)
        except Exception:
            return spark.createDataFrame([], CHECKPOINT_SCHEMA)

    def completed(self, spark: SparkSession, lineages: dict[str, str]) -> set[tuple[str, str]]:
        """(partition_id, check) pairs already recorded with a matching
        lineage.  Driver-small: one row per partition × check."""
        m = self.read(spark)
        rows = (
            m.select("partition_id", "check", "lineage")
            .distinct()
            .collect()
        )
        return {
            (r["partition_id"], r["check"])
            for r in rows
            if lineages.get(r["check"]) == r["lineage"]
        }

    def append(self, spark: SparkSession, verdicts: list, lineages: dict[str, str]) -> None:
        now = time.time()
        rows = [
            (
                v["partition_id"],
                v["check"],
                None,  # completed_at set below via expression (no driver clock skew)
                lineages[v["check"]],
                dict(v["metrics"] or {}),
            )
            for v in verdicts
        ]
        df = spark.createDataFrame(rows, CHECKPOINT_SCHEMA).withColumn(
            "completed_at", F.timestamp_seconds(F.lit(now))
        )
        df.coalesce(1).write.mode("append").parquet(self.path)


def _partition_tuples_from_files(df: DataFrame, cols: Sequence[str]):
    """Enumerate the table's partitions WITHOUT scanning it: parse the
    hive-style ``col=val`` directory segments out of the scan's file
    listing (driver-side metadata — the local analog of reading an
    Iceberg ``.partitions`` metadata table or ``SHOW PARTITIONS``).

    Returns a sorted list of raw STRING tuples, or None when the
    metadata route does not apply and the caller must fall back to a
    distinct scan:

      * the plan is not a bare relation (a filter/transform above the
        scan could exclude whole partitions, which only a scan sees)
      * any file path lacks a ``col=`` segment for some partition
        column (table not physically partitioned by ``cols``)
    """
    try:
        plan = df._jdf.queryExecution().analyzed().toString().strip()
    except Exception:
        return None
    if len(plan.splitlines()) != 1 or not plan.startswith("Relation"):
        return None
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    from urllib.parse import unquote

    # only segments BELOW the table root are partition directories: an
    # ancestor directory that merely LOOKS like one (/data/env=prod/tbl
    # with a data column `env`) must not shadow the real layout.  The
    # root is the common directory prefix of all files; when only one
    # partition exists, its own col=val segments end up in that prefix,
    # so trailing segments matching the requested columns are peeled
    # back off into shared values.
    dirs = [f.split("/")[:-1] for f in files]
    common = dirs[0]
    for d in dirs[1:]:
        i = 0
        while i < len(common) and i < len(d) and common[i] == d[i]:
            i += 1
        common = common[:i]
    shared: dict[str, str] = {}
    colset = set(cols)
    while common and "=" in common[-1]:
        key, _, v = common[-1].partition("=")
        if key not in colset or key in shared:
            break
        shared[key] = v
        common = common[:-1]
    depth = len(common)

    tuples = set()
    for d in dirs:
        vals = dict(shared)
        for seg in d[depth:]:
            if "=" not in seg:
                return None  # non-hive layout below the root
            key, _, v = seg.partition("=")
            if key not in colset:
                return None  # partitioned by OTHER columns too
            vals[key] = v
        if set(vals) != colset:
            return None  # table not physically partitioned by `cols`
        t = tuple(
            None
            if unquote(vals[c]) == "__HIVE_DEFAULT_PARTITION__"
            else unquote(vals[c])
            for c in cols
        )
        tuples.add(t)
    return sorted(
        tuples, key=lambda t: tuple("" if x is None else str(x) for x in t)
    )


def _enumerate_partitions(df: DataFrame, cols: Sequence[str]):
    """(collected rows of __pid + partition cols, route): the metadata
    route when the input is a bare hive-partitioned scan (zero
    fact-table bytes), else one distinct scan.  pids always come from
    the SAME Spark _partition_id expression the verdicts use — a
    driver-side '/'.join would diverge on booleans/NULLs."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    cols = list(cols)
    str_tuples = _partition_tuples_from_files(df, cols)
    if str_tuples is not None:
        tiny = spark.createDataFrame(
            str_tuples,
            T.StructType([T.StructField(c, T.StringType(), True) for c in cols]),
        )
        typed = tiny.select(
            *[F.col(c).cast(df.schema[c].dataType).alias(c) for c in cols]
        )
        raw = typed.select(_partition_id(cols).alias("__pid"), *cols).collect()
        return raw, "files"
    raw = (
        df.select(_partition_id(cols).alias("__pid"), *cols)
        .distinct()
        .collect()
    )
    return raw, "scan"


def prune_to_partitions(
    df: DataFrame, cols: Sequence[str], todo_tuples: Sequence[tuple]
) -> DataFrame:
    """OR-of-equalities on the partition columns — the form Catalyst
    turns into PartitionFilters, so completed partitions' files are
    never read.  NULL partition values get an explicit isNull disjunct:
    isin/== are never true for NULL and would silently exclude those
    rows from the re-run."""
    from functools import reduce

    cols = list(cols)
    if len(cols) == 1:
        vals = [t[0] for t in todo_tuples if t[0] is not None]
        pred = F.col(cols[0]).isin(vals) if vals else F.lit(False)
        if any(t[0] is None for t in todo_tuples):
            pred = pred | F.col(cols[0]).isNull()
        return df.filter(pred)
    preds = [
        reduce(
            lambda a, b: a & b,
            [
                F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
                for c, v in zip(cols, t)
            ],
        )
        for t in todo_tuples
    ]
    return df.filter(reduce(lambda a, b: a | b, preds))


@dataclass
class ResumableRun:
    """Run a CheckSuite over a partitioned table with skip/resume.

    After ``run``, ``last_ran`` maps each check name to the partition
    tuples it actually executed this invocation (missing key = the
    check was fully checkpointed and skipped) — callers use it to scope
    secondary outputs (e.g. the CLI's violation sink) to the work that
    was really (re)done."""

    suite: CheckSuite
    manifest: CheckpointManifest
    partition_by: Sequence[str] | None = None
    source_id: str = ""

    def run(self, df: DataFrame) -> DataFrame:
        """Execute only the (partition, check) pairs missing from the
        manifest; append new checkpoint rows; return the verdicts of
        THIS run (empty if everything was already done)."""
        spark = df.sparkSession
        lineages = {c.name: _lineage(self.source_id, c) for c in self.suite.checks}
        done = self.manifest.completed(spark, lineages)
        self.last_ran: dict[str, list[tuple]] = {}

        # all partitions present in the input (driver-small): keep the
        # RAW column values — the pruning predicate must be on the
        # partition columns themselves, a computed pid string would
        # defeat partition pruning
        if self.partition_by:
            # pids come from the SAME Spark expression the verdicts use
            # (_partition_id) — a driver-side '/'.join would diverge on
            # booleans (Python 'True' vs Spark 'true') and NULLs, making
            # completed() never match and silently re-running everything.
            # metadata route when available: enumerate partitions from
            # the file listing (no scan, no shuffle — a fully-
            # checkpointed resume touches ZERO fact-table bytes), with
            # typed values + pids re-derived by one Spark job over
            # n_partitions driver-local rows
            raw, self.partition_source = _enumerate_partitions(
                df, self.partition_by
            )
            tuples = [tuple(r[c] for c in self.partition_by) for r in raw]
            pid_of = {t: r["__pid"] for t, r in zip(tuples, raw)}
            pids = [r["__pid"] for r in raw]
        else:
            self.partition_source = "none"
            tuples, pid_of, pids = [()], {(): "ALL"}, ["ALL"]

        all_new: DataFrame | None = None
        new_rows: list = []
        todo_by_check = {
            c.name: [t for t in tuples if (pid_of[t], c.name) not in done]
            for c in self.suite.checks
        }
        if all(len(todo_by_check[c.name]) == len(tuples) for c in self.suite.checks):
            # fresh run (nothing checkpointed): the fused suite shares
            # ONE scan across all agg-shaped checks — the common case
            # for the first pass over a 10^12-row corpus
            for c in self.suite.checks:
                self.last_ran[c.name] = todo_by_check[c.name]
            all_new = self.suite.run(df)
            new_rows = all_new.collect()
        else:
            for check in self.suite.checks:
                todo_t = todo_by_check[check.name]
                if not todo_t:
                    continue
                self.last_ran[check.name] = todo_t
                if self.partition_by and len(todo_t) < len(tuples):
                    sub = prune_to_partitions(df, self.partition_by, todo_t)
                else:
                    sub = df
                v = check.verdicts(sub)
                rows = v.collect()
                new_rows.extend(rows)
                all_new = v if all_new is None else all_new.unionByName(v)

        if new_rows:
            self.manifest.append(spark, new_rows, lineages)
        if all_new is None:
            from .operators.checks import VERDICT_SCHEMA

            return spark.createDataFrame([], VERDICT_SCHEMA)
        return spark.createDataFrame(new_rows, all_new.schema)

@dataclass
class SideOutput:
    """Per-partition completion tracking for a secondary sink (e.g. the
    CLI's violation rows) in the same manifest, INDEPENDENT of the
    check verdict rows.

    Closes the crash window where the schema check's manifest rows
    landed but the sink write did not (the verdict append and the sink
    write are two non-atomic steps): the sink write is only skipped for
    partitions whose completion row — written strictly AFTER the sink
    write — is present with a matching lineage.  A crash between the
    sink write and ``commit`` re-runs those partitions: at-least-once,
    so an append sink (parquet OR iceberg) may carry duplicate rows
    for the re-run partitions — the recoverable failure mode, vs. the
    silent loss it replaces.  Exactly-once needs a sink that can
    overwrite by partition (an Iceberg violations table partitioned by
    the pid columns + overwritePartitions), which the CLI does not
    assume about user sinks.

    Sink-state transitions the caller must handle (cli.cmd_run does):
    a MISSING sink invalidates all completion rows (rebuild
    everything); a present sink with zero completion rows at this
    lineage is ambiguous (legacy-complete vs crashed-before-write) and
    defaults to re-append — the legacy backfill is an explicit opt-in
    (``just_ran``, cli: output.violations_backfill)."""

    manifest: CheckpointManifest
    name: str  # pseudo-check name, e.g. "schema:violations"
    lineage: str  # fingerprint of (source, schema doc, sink)
    partition_by: Sequence[str] | None = None
    # populated by todo(): pre-SideOutput-manifest partitions to
    # commit without rewriting, and the enumeration route used
    backfill: list = field(default_factory=list)
    partition_source: str = "unset"

    def todo(self, df: DataFrame, sink_present: bool = True,
             just_ran: Sequence[tuple] | None = None):
        """(pruned_df_or_None, todo_tuples, pid_of): the subset of the
        input whose sink write is not yet confirmed.

        ``sink_present=False`` (the sink was deleted/never created)
        invalidates every completion row: the rows they confirmed are
        gone, so everything is todo again.

        ``just_ran`` (EXPLICIT opt-in — pass None by default) handles
        the pre-SideOutput manifest: when the sink IS present but this
        lineage has NO completion rows at all, partitions NOT in
        ``just_ran`` are treated as already written by the older
        release and exposed via ``self.backfill`` for the caller to
        commit instead of being re-appended as duplicates.  This state
        is indistinguishable from a crash between the verdict append
        and the sink write, where assuming-done means SILENT LOSS —
        which is why the inference never runs unless the caller
        asserts the legacy-complete interpretation."""
        spark = df.sparkSession
        done = (
            self.manifest.completed(spark, {self.name: self.lineage})
            if sink_present
            else set()
        )
        if self.partition_by:
            # same metadata-first enumeration as ResumableRun.run: a
            # fully-confirmed sink must not cost a fact-table scan
            raw, self.partition_source = _enumerate_partitions(
                df, self.partition_by
            )
            tuples = [tuple(r[c] for c in self.partition_by) for r in raw]
            pid_of = {t: r["__pid"] for t, r in zip(tuples, raw)}
        else:
            self.partition_source = "none"
            tuples, pid_of = [()], {(): "ALL"}
        legacy = sink_present and not done and just_ran is not None
        assumed = (
            {t for t in tuples if t not in set(just_ran)} if legacy else set()
        )
        self.backfill = [t for t in tuples if t in assumed]
        todo_t = [
            t for t in tuples
            if (pid_of[t], self.name) not in done and t not in assumed
        ]
        if not todo_t:
            return None, [], pid_of
        if self.partition_by and len(todo_t) < len(tuples):
            sub = prune_to_partitions(df, self.partition_by, todo_t)
        else:
            sub = df
        return sub, todo_t, pid_of

    def commit(self, spark: SparkSession, todo_t, pid_of, metrics=None) -> None:
        """Record completion AFTER the sink write succeeded."""
        rows = [
            {
                "partition_id": pid_of[t],
                "check": self.name,
                "metrics": dict(metrics or {}),
            }
            for t in todo_t
        ]
        if rows:
            self.manifest.append(spark, rows, {self.name: self.lineage})


def side_lineage(source_id: str, *cfg_parts) -> str:
    """Lineage fingerprint for a SideOutput: source + every config
    object that determines the sink's content (schema doc, sink path)."""
    blob = json.dumps({"source": source_id, "cfg": cfg_parts},
                      sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]
