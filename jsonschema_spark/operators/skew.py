"""Explicit skew handling (north rule: "explicit skew-aware salting on
hot conv_id partitions").

When is salting actually needed?  Spark's hash aggregation already does
map-side partial combine, so a COUNT/SUM over a hot key is fine — each
task emits one partial row.  The cases that genuinely skew:

  * aggregations whose per-key state is large or non-mergeable
    (collect_list of a hot conversation's turns),
  * joins where one key carries a large fraction of rows (AQE splits
    the big side of a sort-merge join, but not broadcast or bucketed
    plans),
  * Window.partitionBy(hot_key) — ranking a 10^7-turn conversation on
    one task.

These helpers implement the standard two-phase salted shapes for the
first two; for windows, cap or pre-split by a secondary key (see
operators.order docstring).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, keys: Sequence[str], buckets: int,
              salt_col: str = "__salt") -> DataFrame:
    """Uniform deterministic salt in [0, buckets) derived from the full
    row position hash — spreads a hot key over `buckets` reducers."""
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id(),
                       F.monotonically_increasing_id()),
            F.lit(buckets),
        ),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    merges: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) applying ``aggs``,
    then groupBy(keys) applying ``merges`` over the partial columns.

    ``aggs``  : output_col -> aggregate over the raw rows
    ``merges``: output_col -> aggregate over the phase-1 partials
                (reference the phase-1 output columns by name)

    Example — skew-safe turn counts + distinct roles per conversation::

        salted_agg(df, ["conv_id"],
                   aggs={"n": F.count(F.lit(1)),
                         "roles": F.collect_set("role")},
                   merges={"n": F.sum("n"),
                           "roles": F.array_distinct(F.flatten(F.collect_list("roles")))})
    """
    salted = with_salt(df, keys, buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merges.items()]
    )


def salted_collect_list(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    order_by: str | None = None,
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe collect_list: per-(key, salt) partial lists, then a
    flatten-merge per key (optionally sorted by a (order, value) struct
    so the result is deterministic regardless of bucketing)."""
    col = (
        F.struct(F.col(order_by).alias("o"), F.col(value).alias("v"))
        if order_by
        else F.col(value)
    )
    out = salted_agg(
        df,
        keys,
        aggs={"part": F.collect_list(col)},
        merges={"part": F.flatten(F.collect_list("part"))},
        buckets=buckets,
    )
    if order_by:
        out = out.select(
            *keys,
            F.transform(F.array_sort("part"), lambda s: s["v"]).alias(value + "s"),
        )
    else:
        out = out.select(*keys, F.array_sort("part").alias(value + "s"))
    return out


def key_histogram(df: DataFrame, keys: Sequence[str], top: int = 20) -> DataFrame:
    """Hot-key diagnostic: the heaviest keys and their row counts —
    what you run BEFORE deciding bucket counts."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy(F.col("rows").desc(), *[F.col(k) for k in keys])
        .limit(top)
    )


def skew_report(
    df: DataFrame, keys: Sequence[str], top: int = 10, target_ratio: float = 4.0
) -> DataFrame:
    """ONE-row key-concentration report — the quantitative form of the
    north rule's "explicit skew-aware salting on hot conv_id
    partitions" decision::

        (n_rows, n_keys, max_key_rows, p50_key_rows, p99_key_rows,
         top_share, hhi, suggested_salt)

    * ``top_share``  — fraction of all rows held by the ``top``
      heaviest keys (ties broken by key so the cut is deterministic);
    * ``hhi``        — Herfindahl concentration sum((cnt/total)^2),
      computed as the EXACT decimal sum of cnt^2 divided once at the
      end (a per-key double sum would be aggregation-order-dependent);
    * ``suggested_salt`` — buckets so the hottest key shrinks to
      ~``target_ratio``x the mean key size:
      ceil(max / max(1, target_ratio * mean)).

    Shape: one map-side-combinable per-key count, then two
    driver-small aggregates over the key table (global + top-k) joined
    by broadcast crossJoin.  Percentiles over key counts use Spark's
    exact ``percentile`` — the key table is vocabulary-sized, not
    corpus-sized."""
    cnts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    g = cnts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_key_rows"),
        F.round(F.expr("percentile(cnt, 0.5)"), 3).alias("p50_key_rows"),
        F.round(F.expr("percentile(cnt, 0.99)"), 3).alias("p99_key_rows"),
        F.sum(
            F.col("cnt").cast("decimal(19,0)") * F.col("cnt").cast("decimal(19,0)")
        ).alias("__sumsq"),
    )
    topk = (
        cnts.orderBy(F.col("cnt").desc(), *[F.col(k) for k in keys])
        .limit(top)
        .agg(F.sum("cnt").alias("__top"))
    )
    mean = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    return g.crossJoin(F.broadcast(topk)).select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        "p50_key_rows",
        "p99_key_rows",
        F.round(
            F.col("__top").cast("double") / F.col("n_rows").cast("double"), 6
        ).alias("top_share"),
        F.round(
            F.col("__sumsq").cast("double")
            / (F.col("n_rows").cast("double") * F.col("n_rows").cast("double")),
            9,
        ).alias("hhi"),
        F.ceil(
            F.col("max_key_rows").cast("double")
            / F.greatest(F.lit(1.0), F.lit(target_ratio) * mean)
        )
        .cast("long")
        .alias("suggested_salt"),
    )
