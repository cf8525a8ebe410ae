"""Corpus curation operators: deterministic splits, stratified
sampling, token-budget selection, and sequence packing.

The last pipeline stage before training: decide WHICH documents train
and HOW they are laid out into fixed-length training sequences.  The
reference engine is a per-document validator with no dataset-level
operators (SURVEY.md §2.9); these are engine-level additions, all
built from deterministic md5-derived hashing (oracle-reproducible,
dedup.md5_long) so every sampling decision is a pure function of the
row — re-running the pipeline, at any parallelism, yields the same
split/sample/packing.

Scale notes (100 TB):

* ``hash_split`` / ``stratified_sample`` decisions are per-row Column
  expressions — map-only passes that ride the ingest scan; no state,
  no shuffle (stratified needs one window shuffle on the stratum for
  EXACT counts; the approximate variant is shuffle-free).
* ``token_budget_take`` shuffles once on the group column — the same
  hash partitioning any per-group aggregate needs; within a group the
  cumulative sum is a bounded window (groups = sources/langs, few and
  fat — for skewed groups see ``prefix_sum``'s two-phase trick, which
  ``pack_sequences`` uses for the fully-global case).
* ``pack_sequences`` needs a GLOBAL running sum of token counts — the
  classic distributed prefix-sum: range-partition by the deterministic
  order key, local cumulative sums per physical partition, per-
  partition totals (num_partitions rows) prefix-summed on the driver
  and broadcast back as offsets.  No single-task global window, no
  skew exposure; the only collect is O(num_partitions).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_long

# unit-interval resolution for hash->fraction decisions
_RES = 1_000_000_000


def _unit_hash(col, seed: int = 0):
    """Deterministic integer in [0, _RES) from md5 (oracle-
    reproducible).  Kept as an INTEGER — fraction thresholds are
    compared as ``hash < round(f * _RES)`` so split decisions are
    exact integer comparisons in every engine, never float-boundary
    coin flips."""
    return md5_long(col, seed) % _RES


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: each row's label is a pure
    function of its id — stable across runs, executors, and data
    order, and membership survives corpus growth (new rows never move
    old rows between splits, unlike randomSplit)."""
    weights = dict(weights or {"train": 0.9, "val": 0.05, "test": 0.05})
    total = sum(weights.values())
    u = _unit_hash(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bound = int(round(acc * _RES))
        branch = F.when(u < bound, F.lit(name))
        expr = branch if expr is None else expr.when(u < bound, F.lit(name))
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, label)


def stratified_sample(
    df: DataFrame,
    fraction: float,
    strata: Sequence[str] = ("lang",),
    id_col: str = "doc_id",
    seed: int = 0,
    exact: bool = True,
) -> DataFrame:
    """Deterministic stratified sample.

    ``exact=False``: keep rows with unit-hash < fraction — map-only,
    shuffle-free, per-stratum size is binomial around the target.
    ``exact=True``: rank rows inside each stratum by unit-hash and
    keep the first ``round(fraction * stratum_size)`` — exactly the
    target count per stratum at the cost of one window shuffle on the
    strata columns.
    """
    u = _unit_hash(F.col(id_col), seed)
    if not exact:
        return df.filter(u < int(round(fraction * _RES)))
    w = Window.partitionBy(*[F.col(c) for c in strata])
    order_w = w.orderBy(u, F.col(id_col))
    return (
        df.withColumn("__n", F.count(F.lit(1)).over(w))
        .withColumn("__r", F.row_number().over(order_w))
        .filter(F.col("__r") <= F.round(F.lit(fraction) * F.col("__n")))
        .drop("__n", "__r")
    )


def token_budget_take(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    quality_col: str = "quality_score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group token-budget selection: take documents best-quality
    first until the group's token budget is filled (the document that
    crosses the budget line is the last one in).  The mixture-weights
    stage of a pretraining pipeline: each source/domain gets a token
    quota, quality decides who spends it.

    One window shuffle on ``group_col``; cumulative sum ordered by
    (quality desc, id) — deterministic under ties.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return (
        df.withColumn("__cum", cum)
        .filter((F.col("__cum") - F.col(token_col)) < budget)
        .drop("__cum")
    )


def prefix_sum(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """GLOBAL inclusive running sum of ``value_col`` in ``order_by``
    order — the distributed prefix-sum (same two-phase shape as
    order.scalable_window_ranked):

    1. ``repartitionByRange(order_by)`` — global order becomes
       (partition index, within-partition order); local cumulative sum
       per physical partition (bounded window, skew-immune).
    2. per-partition totals — ``num_partitions`` rows — are collected,
       exclusive-prefix-summed on the driver in partition order, and
       broadcast back as literal offsets.

    A naive ``Window.orderBy(...)`` with no partitionBy puts the whole
    table on ONE task; this version's largest single-task state is one
    range partition.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 4
    order_cols = [F.col(c) for c in order_by]

    ranged = df.repartitionByRange(n, *order_cols)
    local = ranged.withColumn("__pid", F.spark_partition_id())
    lw = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = local.withColumn(
        "__lcum", F.sum(F.col(value_col).cast("long")).over(lw)
    ).persist()

    totals = (
        local.groupBy("__pid")
        .agg(F.sum(F.col(value_col).cast("long")).alias("__t"))
        .collect()
    )
    acc = 0
    offset_rows = []
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offset_rows.append((r["__pid"], acc))
        acc += r["__t"] or 0
    offsets = df.sparkSession.createDataFrame(
        offset_rows, "__pid int, __off long"
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__lcum"))
        .drop("__pid", "__lcum", "__off")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Concat-and-chunk sequence packing — lay the corpus out as one
    deterministic token stream and cut it into fixed ``seq_len``
    training sequences (the GPT-style packing recipe; no padding, a
    document may straddle a boundary).

    Output: one row per input document —
    ``(doc_id, n_tokens, begin_seq, begin_offset, end_seq)``: the
    document's tokens occupy stream positions ``[cum - n, cum)``, so
    it starts in sequence ``begin_seq`` at ``begin_offset`` and ends
    in ``end_seq``.  Stream order is the unit-hash of the id (the
    deterministic global shuffle training wants), tie-broken by id.

    Cost: the two-phase global prefix sum (one range exchange + a
    num_partitions-row collect); everything else is arithmetic.
    """
    ordered = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        _unit_hash(F.col(id_col), seed).alias("__u"),
    )
    cum = prefix_sum(
        ordered, "n_tokens", order_by=("__u", "doc_id"), out_col="__cum"
    )
    start = F.col("__cum") - F.col("n_tokens")
    return cum.select(
        "doc_id",
        "n_tokens",
        F.floor(start / seq_len).cast("long").alias("begin_seq"),
        (start % seq_len).cast("long").alias("begin_offset"),
        F.floor((F.col("__cum") - 1) / seq_len).cast("long").alias("end_seq"),
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    tau: float = 2.0,
    total: int | None = None,
    seed: int = 7,
    max_reps: int = 16,
) -> DataFrame:
    """Temperature-based mixture resampling (the multilingual /
    data-mixing recipe: sample source i proportionally to
    p_i^(1/tau), tau>1 upweights small sources).

    Returns (id, group, n_reps): how many times each document appears
    in the resampled corpus.  Per-group repeat factor
    r_g = total * q_g / n_g where q_g = n_g^(1/tau) / sum_h n_h^(1/tau);
    each document gets floor(r_g) copies plus one more iff its unit
    hash falls under frac(r_g) — a pure function of the row, so the
    expected group sizes hit the targets exactly and the decision
    replays identically at any parallelism (and in the oracle).
    ``max_reps`` caps pathological upweighting of tiny sources (the
    standard repetition-harm guard).

    Scale: ONE tiny groupBy(group) count (map-side partial, rows =
    distinct groups) broadcast back; the per-row decision is codegen.
    Emitting physical copies is the consumer's explode — kept OUT of
    this operator so the heavy row-multiplication happens exactly
    where the pipeline wants it."""
    if tau <= 0:
        raise ValueError("temperature_mixture: tau must be positive")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__gn"))
    # q_g numerators and the normalizer, all driver-free: one more
    # tiny agg over the counts table, crossed back in
    powed = counts.select(
        F.col(group_col),
        F.col("__gn"),
        F.pow(F.col("__gn").cast("double"), F.lit(1.0 / tau)).alias("__w"),
    )
    norm = powed.agg(
        F.sum("__w").alias("__Z"), F.sum("__gn").alias("__NT")
    )
    factors = powed.crossJoin(F.broadcast(norm)).select(
        F.col(group_col),
        F.least(
            (
                F.coalesce(F.lit(total).cast("double"), F.col("__NT").cast("double"))
                * (F.col("__w") / F.col("__Z"))
                / F.col("__gn").cast("double")
            ),
            F.lit(float(max_reps)),
        ).alias("__r"),
    )
    out = df.join(F.broadcast(factors), group_col)
    frac9 = F.round((F.col("__r") - F.floor(F.col("__r"))) * _RES, 0).cast("long")
    extra = (
        _unit_hash(F.col(id_col).cast("string"), seed=seed) < frac9
    ).cast("int")
    return out.select(
        F.col(id_col),
        F.col(group_col),
        (F.floor(F.col("__r")).cast("int") + extra).alias("n_reps"),
    )


def best_of_n(
    cands: DataFrame,
    group_cols: Sequence[str],
    score_col: str = "score",
    tiebreak_cols: Sequence[str] = (),
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Best-of-n selection: one row per group — the highest-scoring
    candidate (rejection sampling's keep step; RLHF/eval pipelines run
    it over n sampled responses per prompt).

    Ordering is (score DESC, tiebreaks ASC) via ``row_number``, so the
    winner is DETERMINISTIC given unique tiebreaks — never ``max_by``,
    whose tie choice is arrival-order (= partition-layout) dependent
    and would differ run to run and engine to engine.

    Scale: ONE hash shuffle on the group columns (the window's
    partitioning); the filter is a codegen predicate over the ranked
    stream.  Adds ``n_candidates`` (group size) from the same window —
    no second aggregation.
    """
    group_cols = list(group_cols)
    keep = list(keep_cols) if keep_cols is not None else [
        c for c in cands.columns if c not in group_cols
    ]
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    wall = Window.partitionBy(*group_cols)
    ranked = cands.select(
        *group_cols,
        *keep,
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wall).alias("n_candidates"),
    )
    return ranked.filter(F.col("__rn") == 1).drop("__rn")


def preference_pairs(
    cands: DataFrame,
    group_cols: Sequence[str],
    score_col: str = "score",
    tiebreak_cols: Sequence[str] = (),
    text_col: str = "text",
    min_margin: float = 0.0,
) -> DataFrame:
    """Preference-pair mining: for every group with >= 2 candidates,
    the (chosen, rejected) = (best, worst) pair by score — the row
    shape DPO/RLHF reward-model training consumes.

    Output: ``(group_cols..., chosen_text, chosen_score, rejected_text,
    rejected_score, margin)`` with ``margin = chosen_score -
    rejected_score``; pairs under ``min_margin`` are dropped (small
    margins are label noise in preference data).  Both ends are picked
    by deterministic (score, tiebreaks) ranking — best = rank 1 of
    (DESC, asc), worst = rank n of the SAME ordering — so the pair
    replays identically at any parallelism.

    Scale: the window's ONE hash shuffle on the group columns, then a
    groupBy over the already-partitioned stream (Catalyst reuses the
    exchange — no second shuffle); output rows = number of groups.
    """
    group_cols = list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    wall = Window.partitionBy(*group_cols)
    ranked = cands.select(
        *group_cols,
        F.col(text_col).alias("__txt"),
        F.col(score_col).alias("__s"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wall).alias("__n"),
    ).filter(F.col("__n") >= 2)
    agg = ranked.groupBy(*group_cols).agg(
        F.max(F.when(F.col("__rn") == 1, F.col("__txt"))).alias("chosen_text"),
        F.max(F.when(F.col("__rn") == 1, F.col("__s"))).alias("chosen_score"),
        F.max(
            F.when(F.col("__rn") == F.col("__n"), F.col("__txt"))
        ).alias("rejected_text"),
        F.max(
            F.when(F.col("__rn") == F.col("__n"), F.col("__s"))
        ).alias("rejected_score"),
    )
    return agg.select(
        *group_cols,
        "chosen_text",
        "chosen_score",
        "rejected_text",
        "rejected_score",
        (F.col("chosen_score") - F.col("rejected_score")).alias("margin"),
    ).filter(F.col("margin") >= F.lit(min_margin))
