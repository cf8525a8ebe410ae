"""Structured Streaming validation — continuous constraint checking
over a transcript stream.

The reference is purely synchronous/in-memory (SURVEY.md §2.9:
streaming = none); this module is the engine-level addition: the SAME
compiled Column plan that validates a batch DataFrame annotates a
streaming DataFrame unchanged (it is a stateless projection), and the
table-level verdicts become watermarked windowed aggregations:

  * ``annotate_stream``  — violations column on a readStream source.
  * ``windowed_verdicts`` — per (event-time window, check) pass/fail
    counts with a watermark bounding late-data state.
  * ``stateful_dedup_stream`` — dropDuplicatesWithinWatermark on
    (conv_id, turn_idx): streaming uniqueness with bounded state.

Scale notes: stateless projection shards perfectly; the windowed agg
shuffles on (window) only; watermark eviction keeps state O(windows in
flight), which is what makes 10^12-turn continuous ingest viable.
"""

from __future__ import annotations

from contextlib import contextmanager as _contextmanager

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def annotate_stream(
    stream_df: DataFrame,
    plan,
    json_col: str | None = None,
    json_types: str | None = None,
) -> DataFrame:
    """Apply a compiled schema plan to a streaming DataFrame.  The plan
    is a pure Column expression — identical semantics to the batch
    path, no state.

    ``json_col`` validates a JSON *string* column instead of fixed
    columns — the Kafka-shaped input (``value`` holding a JSON
    document).  Both parse modes work on streams: the parse, the
    hoisted variant projection levels and the violations expression
    are all stateless deterministic projections."""
    if json_col is not None:
        return plan.annotate_json(stream_df, json_col, json_types=json_types)
    return plan.annotate(stream_df)


def windowed_verdicts(
    stream_df: DataFrame,
    plan,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
    json_col: str | None = None,
    json_types: str | None = None,
) -> DataFrame:
    """Per event-time window: rows, bad rows, violation total — the
    streaming analog of SchemaCheck.verdicts.  Late rows beyond the
    watermark are dropped (documented north-star late-data policy).
    With ``json_col`` the verdicts run over a streaming JSON-string
    column (see annotate_stream)."""
    ann = annotate_stream(stream_df, plan, json_col=json_col, json_types=json_types)
    return (
        ann.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.size("violations") > 0).cast("long")).alias("bad_rows"),
            F.sum(F.size("violations")).alias("violation_total"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "rows",
            "bad_rows",
            "violation_total",
            (F.col("bad_rows") == 0).alias("pass"),
        )
    )


def stateful_dedup_stream(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming uniqueness enforcement: keep the first row per key
    within the watermark horizon; duplicates beyond the horizon are
    out of contract (bounded state by design)."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def violation_rate_alert(
    stream_df: DataFrame,
    plan,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
    max_bad_ratio: float = 0.05,
) -> DataFrame:
    """Windows whose bad-row ratio exceeds the threshold — the
    continuous drift/quality alert feed."""
    v = windowed_verdicts(stream_df, plan, ts_col, window, watermark)
    return v.filter(
        (F.col("bad_rows") / F.greatest(F.col("rows"), F.lit(1))) > max_bad_ratio
    )


@_contextmanager
def bounded_state_partitions(spark, n: int | None = None):
    """Bound ``spark.sql.shuffle.partitions`` for a streaming query's
    start (restore after).

    Structured Streaming fixes its state-store partition count at
    query start from the session's shuffle-partition conf, and AQE
    NEVER coalesces micro-batch shuffles — so a batch-tuned high
    partition count silently multiplies per-micro-batch task count
    and state-store instances.  Measured (r4, local[32], sf0.1): at
    the batch-tuned 256 partitions the windowed-verdict stream took
    6.2s and the dedup stream 5.1s vs 2.7s / 1.6s at 64.  The bound
    defaults to 2x defaultParallelism (never raising an already-lower
    setting); at cluster scale pass ``n`` sized to the state volume —
    the partition count is a durable property of the checkpoint, so
    pick it for the STATE, not for batch shuffle ergonomics."""
    key = "spark.sql.shuffle.partitions"
    cur = spark.conf.get(key)
    cores = spark.sparkContext.defaultParallelism
    target = n if n is not None else max(2 * cores, 8)
    spark.conf.set(key, str(min(int(cur), int(target))))
    try:
        yield
    finally:
        spark.conf.set(key, cur)
