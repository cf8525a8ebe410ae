"""Stable output ordering — the north star's byte-match invariant:
"per-turn text equality under stable turn ordering via window-ranked
sort" (BASELINE.json input_hint; FIXTURES.md §1).

``window_ranked`` assigns each row its rank inside the conversation
(row_number over (conv_id) ordered by (turn_idx, ts, ...)) so two runs
over the same data — at any partitioning, any executor count — produce
identical row order after the final sort.  Ties beyond the given order
columns are broken by a content hash, making the ordering total.

Skew note: Window.partitionBy(conv_id) concentrates a hot conversation
on one task.  Ranking is O(turns in conv) and conversations are
bounded (~10^5 turns worst case), so unlike aggregation this needs no
salting; the heavy checks (uniqueness/stats) never use this window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_ranked(
    df: DataFrame,
    partition_by: Sequence[str] = ("conv_id",),
    order_by: Sequence[str] = ("turn_idx", "ts"),
    rank_col: str = "turn_rank",
) -> DataFrame:
    """df + total-order rank within each partition group."""
    order_cols = [F.col(c) for c in order_by if c in df.columns]
    # total order: final tie-break on a content hash of the whole row
    tie = F.xxhash64(*[F.col(c) for c in df.columns])
    w = Window.partitionBy(*partition_by).orderBy(*order_cols, tie)
    return df.withColumn(rank_col, F.row_number().over(w))


def stable_sorted(
    df: DataFrame,
    partition_by: Sequence[str] = ("conv_id",),
    order_by: Sequence[str] = ("turn_idx", "ts"),
) -> DataFrame:
    """Deterministic global ordering for byte-matched output/golden
    files: rank within conversation, then sort by (conv, rank)."""
    ranked = window_ranked(df, partition_by, order_by)
    return ranked.orderBy(*partition_by, "turn_rank")


def scalable_window_ranked(
    df: DataFrame,
    partition_by: Sequence[str] = ("conv_id",),
    order_by: Sequence[str] = ("turn_idx", "ts"),
    rank_col: str = "turn_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Skew-proof two-phase ranking: identical output to
    ``window_ranked`` but a hot conversation is spread over MANY range
    partitions instead of landing on one window task.

    Phase 1: ``repartitionByRange(group, order...)`` — rows of one
    group occupy a contiguous run of partitions, each bounded by
    partition size, then rank LOCALLY within (physical partition,
    group) — that window is bounded by the partition size regardless
    of group skew.
    Phase 2: per-(physical partition, group) row counts are tiny (one
    row per group-run per partition); collect, prefix-sum per group in
    partition order on the driver, broadcast back as a literal offset
    map joined in.  total_rank = offset + local_rank.

    The collect is O(num_partitions x groups-crossing-boundaries) — at
    10^12 rows with 10^5-turn conversations this is a few thousand
    rows, driver-trivial, while the naive window would put 10^5-row
    groups on single tasks.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 4
    group_cols = [F.col(c) for c in partition_by]
    order_cols = [F.col(c) for c in order_by if c in df.columns]
    tie = F.xxhash64(*[F.col(c) for c in df.columns])

    ranged = df.repartitionByRange(n, *group_cols, *order_cols, tie)
    # materialize the physical partition id as a COLUMN before the
    # window's own hash exchange moves rows; the window then ranks
    # within (pid, group) — bounded by partition size, skew-immune
    local = ranged.withColumn("__pid", F.spark_partition_id())
    local_w = Window.partitionBy("__pid", *partition_by).orderBy(*order_cols, tie)
    local = local.withColumn("__lrank", F.row_number().over(local_w))
    # range-partition bounds come from SAMPLING: persist so the counts
    # job and the final join see the same physical partitioning instead
    # of recomputing lineage with fresh bounds
    local = local.persist()

    counts = (
        local.groupBy("__pid", *partition_by)
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    # prefix sums per group in pid order
    from collections import defaultdict

    runs: dict = defaultdict(list)
    for r in counts:
        key = tuple(r[c] for c in partition_by)
        runs[key].append((r["__pid"], r["__c"]))
    offset_rows = []
    for key, lst in runs.items():
        acc = 0
        for p, c in sorted(lst):
            offset_rows.append((*key, p, acc))
            acc += c
    spark = df.sparkSession
    off_schema = ", ".join(
        f"{c} {dict(df.dtypes)[c]}" for c in partition_by
    ) + ", __pid int, __off long"
    offsets = spark.createDataFrame(offset_rows, off_schema)
    out = (
        local.join(F.broadcast(offsets), [*partition_by, "__pid"])
        .withColumn(rank_col, (F.col("__off") + F.col("__lrank")).cast("int"))
        .drop("__pid", "__lrank", "__off")
    )
    return out
