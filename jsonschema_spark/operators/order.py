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
