"""Temporal joins Spark lacks as built-ins: as-of join and keyed
range (interval) join, both expressed as shuffle-minimal compositions
of DataFrame ops (no reference analog — SURVEY.md §2.9; the reference
is a per-document validator with no table joins at all).

Scale notes (the reason these exist as named operators):

* ``asof_join`` is the big-big pattern: a naive "join on key +
  right_ts <= left_ts then argmax" materializes every (left, right)
  candidate pair before pruning — quadratic per hot key.  The
  union-tag + window carry-forward form below shuffles each input
  row exactly once (hash on the key), sorts within the key partition,
  and carries the latest right payload forward in one pass, so cost
  is O((|L|+|R|) log) with no pair blow-up.  Hot-key skew is bounded
  by the per-key sort, not by candidate fan-out.
* ``range_join`` avoids the inequality-only join Spark would plan as
  BroadcastNestedLoop/Cartesian: intervals explode into fixed-width
  time buckets (bounded fan-out = interval_span / bucket_width + 1),
  the probe side computes its single bucket, and the join is a plain
  hash equi-join on (keys..., bucket) with the range predicate left
  as a residual filter.  Each probe row lives in exactly ONE bucket,
  so matches are produced exactly once — no dedup pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    strict: bool = False,
    tolerance_sec: float | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the latest
    right row with equal ``on`` keys and ``right_ts <= left_ts``
    (``< left_ts`` when ``strict``).  Left rows keep their full width;
    matched right columns arrive as ``{prefix}{col}`` and are NULL
    when no right row qualifies (left-join semantics).

    Determinism: ties on ``right_ts`` are broken by ``tiebreak``
    (max wins; defaults to the first of ``right_cols``), so the result
    is a pure function of the inputs regardless of partitioning.

    ``tolerance_sec`` drops matches older than the tolerance (the
    match columns become NULL), mirroring pandas ``merge_asof``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    if tiebreak is None:
        tiebreak = right_cols[0] if right_cols else right_ts

    payload_fields = [right_ts] + [c for c in right_cols if c != right_ts]
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tie"),
        F.struct(*[F.col(c) for c in payload_fields]).alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # Right rows sort BEFORE left rows at equal ts for inclusive
    # semantics (a right row at exactly left_ts is visible), AFTER for
    # strict; among equal-(key, ts) right rows ascending __tie makes
    # F.last pick the max tiebreak.
    side_order = F.col("__side") if not strict else (1 - F.col("__side"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), side_order.asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r.unionByName(l)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_sec is not None:
        too_old = (
            F.col("__ts").cast("timestamp").cast("double")
            - F.col("__m").getField(right_ts).cast("timestamp").cast("double")
        ) > F.lit(float(tolerance_sec))
        carried = carried.withColumn(
            "__m", F.when(too_old, F.lit(None)).otherwise(F.col("__m"))
        )
    return carried.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[
            F.col("__m").getField(c).alias(f"{prefix}{c}")
            for c in payload_fields
        ],
    )


def bucket_of(ts: Column, bucket_sec: int) -> Column:
    """Fixed-width time bucket id of a timestamp (floor of epoch
    seconds / width) — codegen arithmetic, no UDF."""
    return F.floor(
        ts.cast("timestamp").cast("double") / F.lit(float(bucket_sec))
    ).cast("long")


def interval_buckets(start: Column, end: Column, bucket_sec: int) -> Column:
    """All bucket ids an interval ``[start, end)`` overlaps.  Fan-out
    is span/bucket_width + 1 — choose ``bucket_sec`` near the typical
    interval span so the explode stays O(1) per interval."""
    return F.sequence(bucket_of(start, bucket_sec), bucket_of(end, bucket_sec))


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    left_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: list[str] | None = None,
    bucket_sec: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Keyed interval join: pair each left row with every interval
    sharing its ``on`` keys whose ``[start, end)`` contains
    ``left_ts``.  Planned as a hash equi-join on (keys..., bucket)
    with the range check as a residual filter — never an
    inequality-only (nested-loop) join.

    ``how="right"`` keeps unmatched intervals (left columns NULL) so
    callers can aggregate "0 events in this window" without a second
    pass.  Each left row computes exactly one bucket, so every
    qualifying (row, interval) pair appears exactly once.
    """
    keys = list(on or [])
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            interval_buckets(F.col(start_col), F.col(end_col), bucket_sec)
        ),
    )
    lf = left.withColumn("__bucket", bucket_of(F.col(left_ts), bucket_sec))
    in_range = (F.col(left_ts) >= F.col(start_col)) & (
        F.col(left_ts) < F.col(end_col)
    )
    if how == "inner":
        return lf.join(iv, keys + ["__bucket"]).filter(in_range).drop(
            "__bucket"
        )
    if how != "right":
        raise ValueError(f"how must be inner or right, got {how!r}")
    # right-outer with a residual predicate can't ride the same
    # equi-join (the residual would drop null-extended rows), so:
    # inner match first, then add back never-matched intervals.
    matched = lf.join(iv, keys + ["__bucket"]).filter(in_range).drop(
        "__bucket"
    )
    iv_key = keys + [start_col, end_col]
    unmatched = (
        intervals.join(
            matched.select(*iv_key).distinct(), iv_key, "left_anti"
        )
    )
    null_left = [
        F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in left.columns
        if c not in keys
    ]
    return matched.unionByName(
        unmatched.select(*[F.col(c) for c in unmatched.columns], *null_left),
        allowMissingColumns=False,
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: (user, steps_completed) — how far each
    user progressed through ``steps`` in order, each step strictly
    AFTER the previous one in event time (the minimal-timestamp chain:
    t1 = min ts of step 1, t2 = min ts of step 2 with ts > t1, ...).

    Spark shape: filter to step-relevant event types FIRST (the scan
    predicate pushes down; everything else sees only funnel events),
    ONE shuffle on the user key collecting the per-user (ts, type)
    array, then the chain match is a single columnar ``F.aggregate``
    fold over the ts-sorted array — no self-joins, no window
    per step.  The per-user array holds only that user's step-typed
    events (bounded by user activity, not corpus size; a hot-user cap
    belongs upstream with the sessionizer's).  Strict ``>`` between
    steps makes same-timestamp events unable to satisfy two steps, so
    the fold is order-independent across equal timestamps and the
    result is deterministic and SQL-replayable."""
    if not steps:
        raise ValueError("funnel: empty steps")
    step_arr = F.array(*[F.lit(s) for s in steps])
    e = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(type_col).alias("et")
        ).alias("ev"),
    )
    per_user = e.groupBy(user_col).agg(
        F.sort_array(F.collect_list("ev")).alias("evs")
    )
    init = F.struct(
        F.lit(0).alias("idx"),
        F.lit(None).cast("timestamp").alias("last"),
    )
    n = len(steps)
    acc = F.aggregate(
        F.col("evs"),
        init,
        lambda a, ev: F.when(
            (a["idx"] < n)
            & (ev["et"] == F.element_at(step_arr, a["idx"] + 1))
            & (a["last"].isNull() | (ev["ts"] > a["last"])),
            F.struct((a["idx"] + 1).alias("idx"), ev["ts"].alias("last")),
        ).otherwise(a),
    )
    return per_user.select(
        F.col(user_col), acc["idx"].alias("steps_completed")
    )


def rolling_window(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    lookback_sec: int,
    aggs: dict[str, Column],
) -> DataFrame:
    """Per-key rolling time-interval aggregates: for EVERY event row,
    aggregate the same key's rows within ``[ts - lookback, ts]`` — the
    velocity/feature form (rolling 7-day activity counts, rolling spend)
    that tumbling windows can't express because each row anchors its
    own frame.

    Spark-first: one RANGE window frame over ``unix_micros(ts)``
    (``rangeBetween(-lookback_us, 0)``) — ONE hash shuffle on the key,
    one sort within each key partition, and the sliding frame is
    maintained incrementally by the window operator (each row enters
    and leaves the frame once: O(n log n) per key, not O(n·frame)).
    No self-join: the naive ``e1 JOIN e2 ON key AND ts BETWEEN`` form
    materializes every in-window pair — quadratic on hot keys — and
    plans as a range join at best.  Skew is bounded by the per-key
    sort (same argument as ``asof_join``).

    ``aggs`` maps output name → aggregate Column (e.g.
    ``F.count(F.lit(1))``, ``F.sum(...)``).  RANGE frames include ALL
    ts-peers of the current row on both engines, so results on tied
    timestamps are well-defined; keep float sums exact (scaled-long)
    if the result must value-hash across engines.

    Returns the input columns plus one column per agg.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-lookback_sec * 1_000_000, 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out
