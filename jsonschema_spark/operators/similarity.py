"""Approximate-nearest-neighbor similarity search over an embedding
column (array<float>) — training-data-pipeline operator, no reference
analog (the reference is per-document, SURVEY.md §2.9).

Two paths:
  * brute_force_topk — exact cosine top-k per query via broadcast join
    of the (small) query set against the corpus + window ranking.  The
    correctness baseline; corpus side streams, queries broadcast, so it
    scales to any corpus size at O(|corpus| * |queries|) work.
  * ivf_topk — IVF-style: k-means-lite centroids assign each corpus
    vector to a cell (one pass, deterministic seeded centroid choice);
    queries probe the `nprobe` nearest cells only, so the scan touches
    |corpus| * nprobe / n_cells vectors.  The scale path.

All arithmetic is double-precision sequential folds (dedup.dot_double)
so results are reproducible and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine, dot_double


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact top-k by cosine.

    Physical plan: BroadcastNestedLoopJoin (query side broadcast — it is
    the small side by construction) → per-query window top-k.  The
    window partitions by query_id (bounded cardinality ⇒ no skew
    concern) and orders by (cosine desc, neighbor_id) for deterministic
    tie-breaks.  ``dims`` switches the per-pair cosine to the
    bit-identical unrolled codegen fold (dedup.dot_unrolled).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    if dims is not None:
        from .dedup import dot_unrolled

        # hoist self-norms to one per-row sqrt(dot(v,v)) on each side
        # (identical input bits -> identical norm bits, so bit-equal to
        # the 3-dot form); keeps the join-side codegen method small —
        # three inlined 64-term dots overflow Janino's 64 KB limit
        q = q.withColumn(
            "__nq", F.sqrt(dot_unrolled("qv", "qv", dims))
        )
        c = c.withColumn(
            "__nc", F.sqrt(dot_unrolled("cv", "cv", dims))
        )
        cos = dot_unrolled("qv", "cv", dims) / (
            F.col("__nq") * F.col("__nc")
        )
    else:
        cos = cosine(F.col("qv"), F.col("cv"))
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cos.alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _cell_scores_arr(vec_name: str, centroids: list[list[float]]) -> Column:
    """array<double>: dot product of the vector column against every
    centroid, as ONE SQL-string unrolled codegen chain (same fold order
    and per-dim products as dedup.dot_double, so bit-identical values —
    multiplication operand order is IEEE-commutative).  Same build
    rationale as _km_scores_arr: py4j Column chains cost seconds of
    driver time, HOF lambdas evaluate interpreted per element."""
    scores = []
    for cent in centroids:
        terms = " + ".join(
            f"(cast(element_at({vec_name}, {d + 1}) as double) * "
            f"cast('{float(c)!r}' as double))"
            for d, c in enumerate(cent)
        )
        scores.append(f"(cast('0.0' as double) + {terms})")
    return F.expr("array(" + ", ".join(scores) + ")")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: deterministic seeded centroids (a hash-strided sample of
    the corpus, one tiny collect), cell assignment for every corpus
    vector, query probes its `nprobe` best cells, exact re-rank inside.

    Scale: the corpus is scanned once to assign cells (narrow), the
    search join is an equality join on `cell` — at 1000 executors the
    per-cell partitions are independent; recall is tunable via nprobe.
    """
    # deterministic centroid sample: smallest n_cells md5_long(id) rows
    # (md5-derived so the DuckDB oracle rebuilds the identical centroid
    # set; was xxhash64, which no other engine implements)
    from .dedup import md5_long

    sample = (
        corpus.select(
            F.col(id_col).alias("sid"), F.col(vec_col).alias("sv"),
            md5_long(F.col(id_col), seed).alias("h"),
        )
        .orderBy("h")
        .limit(n_cells)
        .collect()
    )
    centroids = [list(r["sv"]) for r in sample]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _cell_scores_arr(vec_col, centroids).alias("__cs"),
    ).select(
        "neighbor_id",
        "cv",
        (
            F.array_position(F.col("__cs"), F.array_max("__cs")).cast("int")
            - 1
        ).alias("cell"),
    )
    cents = F.array(*[
        F.array(*[F.lit(float(x)) for x in cc]) for cc in centroids
    ])
    # per-query: nprobe best cells by centroid dot product
    scores = F.transform(cents, lambda cc: dot_double(F.col("qv"), cc))
    idx_sorted = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    scores,
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda s, i: F.struct((-s).alias("neg"), i.alias("i")),
                )
            ),
            lambda st: st["i"],
        ),
        1,
        min(nprobe, len(centroids)),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("cell", F.explode(idx_sorted))
    scored = c.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------
# int8 symmetric quantization — the memory-scale path for ANN.  At
# 100 TB of float32 embeddings the quantized table is 4x smaller (and
# the coarse-scan dot products are exact integer arithmetic); the
# full-precision vectors are touched only for the per-query candidate
# re-rank, an equality join on a set of k*rerank ids per query.
# No reference analog (SURVEY.md §2.9).
# ---------------------------------------------------------------------


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """``(id, scale, qv array<tinyint>)`` — per-vector symmetric int8.

    scale = max|x| / 127 (per vector, so every vector uses the full
    int8 range); qv_d = round(x_d / scale) in [-127, 127].  Rounding is
    half-away-from-zero on both Spark and DuckDB, and every input is
    the same IEEE double on both — the quantized table is therefore
    bit-identical across engines, which keeps the ANN path under the
    value-hash oracle.  Pure Column expressions; one narrow projection.
    """
    v = F.col(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(absmax > 0, absmax / 127.0).otherwise(F.lit(1.0))
    with_scale = df.select(
        F.col(id_col), v.alias("__v"), scale.alias("scale")
    )
    qv = F.transform(
        F.col("__v"),
        lambda x: F.round(x.cast("double") / F.col("scale"), 0).cast(
            "tinyint"
        ),
    )
    return with_scale.select(id_col, "scale", qv.alias("qv"))


def _dot_int(a: Column, b: Column) -> Column:
    """Exact integer dot product of two int8 arrays (fits long at any
    realistic dim count: 127*127*dims)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_cosine(a: Column, b: Column) -> Column:
    """Cosine over int8 vectors.  The per-vector scale cancels in
    cosine (direction is preserved up to rounding), so no float state
    rides with the quantized table at all."""
    return _dot_int(a, b).cast("double") / (
        F.sqrt(_dot_int(a, a).cast("double"))
        * F.sqrt(_dot_int(b, b).cast("double"))
    )


def ann_topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage ANN: coarse scan over the int8 table, exact re-rank of
    the survivors — the standard memory-bounded production shape.

    Stage 1 streams ONLY (id, qv) — 1/4 the float32 footprint — against
    the broadcast quantized queries and keeps the top k*rerank
    neighbors per query by quantized cosine (exact integer dots, one
    double division; deterministic ties on neighbor_id).
    Stage 2 joins that candidate set (k*rerank rows per query —
    driver-tiny) back to the full-precision corpus by id and re-ranks
    by exact cosine.  The full-precision table is never scanned beyond
    the candidate equality join.
    """
    qz_c = quantize_embeddings(corpus, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("qv").alias("cqv")
    )
    qz_q = quantize_embeddings(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"), F.col("qv").alias("qqv")
    )
    coarse = qz_c.crossJoin(F.broadcast(qz_q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        quantized_cosine(F.col("qqv"), F.col("cqv")).alias("qcos"),
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id")
    )
    cand = (
        coarse.withColumn("crank", F.row_number().over(w1))
        .filter(F.col("crank") <= k * rerank)
        .select("query_id", "neighbor_id")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvv")
    )
    exact = (
        cand.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvv"), F.col("cv")).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------
# Deterministic Lloyd's k-means over the embedding column — topic
# clustering for diversity-aware curation (cluster-stratified sampling,
# IVF centroid refinement).  No reference analog (SURVEY.md §2.9).
# ---------------------------------------------------------------------

def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    dims: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over the embedding column:
    ``(id, canonical_id, is_duplicate)``.

    Pipeline: deterministic k-means topic assignment
    (``kmeans_embeddings``) → WITHIN-CLUSTER cosine pairs (the
    candidate join is an EQUALITY join on the cluster id, never
    all-pairs: at 100 TB the quadratic term is bounded by the largest
    topic cluster, and n_clusters is the knob that caps it) →
    connected components over the pair graph
    (``dedup.duplicate_clusters``: min-label propagation + pointer
    jumping, every round an equality join) → canonical = minimum
    reachable id; rows outside any pair keep themselves.

    Everything is deterministic (quantized k-means, fixed fold-order
    cosine, min-label canon), so the full pipeline sits under the
    value-hash oracle.

    ``dims`` (the embedding width — statically known in any real
    pipeline) swaps the interpreted zip_with/aggregate dot product for
    ``dedup.dot_unrolled``: the same left-associated IEEE fold as a
    flat codegen expression, bit-identical values, ~10× cheaper inside
    the pair join.  Self-norms are hoisted to ONE sqrt(dot(v,v)) per
    ROW before the join (pure common-subexpression motion — identical
    input bits give identical norm bits, so the pair predicate is
    unchanged), leaving each candidate pair exactly one dot product
    instead of three.
    """
    from .dedup import dot_double, dot_unrolled, duplicate_clusters

    # dot receives column NAMES: the unrolled form builds ONE parsed
    # SQL expression (py4j chains cost ~0.5-1s of driver time per call,
    # per build); the HOF fallback wraps them back into Columns
    dot = (
        (lambda x, y: dot_unrolled(x, y, dims))
        if dims is not None
        else (lambda x, y: dot_double(F.col(x), F.col(y)))
    )
    assign = kmeans_embeddings(
        corpus, n_clusters, iters, vec_col, id_col, seed
    ).select(F.col(id_col), F.col("cluster"))
    withc = (
        corpus.select(id_col, vec_col)
        .join(assign, id_col)
        .withColumn("__norm", F.sqrt(dot(vec_col, vec_col)))
        # materialize ONCE and truncate lineage: the self-join below
        # consumes this twice, and without the cut each branch carries
        # the full k-means plan — Catalyst re-analyzes two copies of
        # that tree per downstream action (measured 65s of driver time
        # to count 317 pairs).  At cluster scale this is the same
        # persist-the-projected-input step SemDeDup needs anyway;
        # localCheckpoint is local-mode's stand-in for a reliable
        # checkpoint dir.
        .localCheckpoint(eager=True)
    )
    a = withc.select(
        F.col(id_col).alias("id_a"), "cluster",
        F.col(vec_col).alias("va"), F.col("__norm").alias("na"),
    )
    b = withc.select(
        F.col(id_col).alias("id_b"), "cluster",
        F.col(vec_col).alias("vb"), F.col("__norm").alias("nb"),
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot("va", "vb") / (F.col("na") * F.col("nb")))
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )
    comp = duplicate_clusters(pairs)
    out = corpus.select(F.col(id_col)).join(
        comp.select(F.col("id").alias(id_col), "cluster_id"),
        id_col,
        "left",
    )
    canonical = F.coalesce(F.col("cluster_id"), F.col(id_col))
    return out.select(
        id_col,
        canonical.alias("canonical_id"),
        (canonical != F.col(id_col)).alias("is_duplicate"),
    )


_KM_SCALE = 1_000_000  # fixed-point quantum: 1e-6 per unit


def _km_quantize(v: Column) -> Column:
    """Element-wise fixed-point quantization to scaled longs.

    The whole reason this k-means is oracle-comparable: centroid
    updates sum LONGS, and integer sums are exact and order-independent
    — Spark's partial-aggregation order can never perturb a centroid
    the way a floating-point sum would.  Everything downstream (scores,
    means, distances) is derived from those exact integers with a fixed
    evaluation order, so any engine replaying the recipe lands on
    bit-identical centroids and assignments.
    """
    return F.transform(
        v, lambda x: F.round(x.cast("double") * _KM_SCALE, 0).cast("long")
    )


def _dlit(x: float) -> str:
    """Exact double literal for SQL: repr() is Python's shortest
    round-trip form and CAST(string AS DOUBLE) parses it back to the
    identical bits, so the JVM sees the same doubles the driver
    computed (constant-folded at plan time)."""
    return f"cast('{float(x)!r}' as double)"


def _km_scores_arr(vq_name: str, cents: list[list[float]]) -> Column:
    """array<double>: the _km_score fold against every centroid, the
    UNROLLED codegen chain built as ONE SQL string.

    Why this form (both alternatives were measured and rejected):
    * building it as k x dims Python Column objects costs thousands of
      py4j round-trips and a duplicated ~4000-node tree that Catalyst
      re-walks for seconds PER ACTION (15.3s driver time vs 2.1s of
      execution at k=8, dims=64);
    * compiling it as transform/aggregate higher-order functions keeps
      the tree small but HOF lambdas are INTERPRETED per element —
      ~14ms/row (28s for 2,000 rows), a ~100x tax over codegen that
      would be fatal at corpus scale.
    One F.expr parse is ~ms on the driver, the flat arithmetic stays
    in whole-stage codegen (each array element is its own expression,
    well under Janino's method limit), and the chain is term-for-term
    identical to the original fold — the DuckDB oracle replays it
    bit-exactly."""
    scores = []
    for cent in cents:
        terms = " + ".join(
            f"({_dlit(c * c)} - {_dlit(2.0 * c)} "
            f"* cast(element_at({vq_name}, {d + 1}) as double))"
            for d, c in enumerate(float(x) for x in cent)
        )
        scores.append(f"({_dlit(0.0)} + {terms})")
    return F.expr("array(" + ", ".join(scores) + ")")


def _km_d2_arr(vq_name: str, cents: list[list[float]]) -> Column:
    """array<double>: squared L2 to every centroid (scaled space), same
    left-assoc fold as _km_scores_arr and the same SQL-string build
    rationale."""
    d2s = []
    for cent in cents:
        terms = " + ".join(
            f"((cast(element_at({vq_name}, {d + 1}) as double) - {_dlit(c)}) "
            f"* (cast(element_at({vq_name}, {d + 1}) as double) - {_dlit(c)}))"
            for d, c in enumerate(float(x) for x in cent)
        )
        d2s.append(f"({_dlit(0.0)} + {terms})")
    return F.expr("array(" + ", ".join(d2s) + ")")


def kmeans_embeddings(
    corpus: DataFrame,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic Lloyd's k-means: ``(vec_id, cluster, dist)``.

    * **Init** — the ``n_clusters`` corpus vectors with the smallest
      md5-derived hash of their id (same seeded-sample recipe as
      ``ivf_topk``; one tiny collect).
    * **Assign** — nearest centroid by squared L2; since ||v||^2 is
      constant per row the score is sum_d (c_d^2 - 2 v_d c_d), a pure
      codegen fold; ties break to the lowest cluster index.
    * **Update** — element-wise mean of assigned vectors via
      ``posexplode`` + groupBy(cluster, dim): map-side partial
      aggregation reduces the shuffle to (#partitions x clusters x
      dims) long rows — metadata-sized at any corpus scale; the
      (clusters x dims) result is a driver-small collect.  Empty
      clusters keep their previous centroid.

    Scale (100 TB): each iteration is one corpus scan (inherent to
    Lloyd's — persist the projected input upstream if iterating many
    times) with a metadata-sized shuffle; centroids ride into the next
    iteration as codegen literals, never a join.  Output ``dist`` is
    the true L2 distance in original (unscaled) units, rounded to 6
    decimals.

    Determinism contract: vectors are fixed-point-quantized
    (``_km_quantize``) so centroid sums are EXACT integers regardless
    of partition order; every derived double is computed with a fixed
    fold order.  Two runs — or two engines — produce identical
    clusters, which is what makes the DuckDB oracle able to replay the
    full iteration history.
    """
    from .dedup import md5_long

    vq_corpus = corpus.select(
        F.col(id_col).alias("vid"), _km_quantize(F.col(vec_col)).alias("vq")
    )
    sample = (
        vq_corpus.select(
            "vid", "vq", md5_long(F.col("vid"), seed).alias("h")
        )
        .orderBy("h")
        .limit(n_clusters)
        .collect()
    )
    centroids: list[list[float]] = [
        [float(x) for x in r["vq"]] for r in sample
    ]

    def assign_df(cents: list[list[float]]) -> DataFrame:
        """(vid, vq, cluster): scores materialized as ONE named column
        so argmin references an attribute, not a re-inlined tree."""
        return vq_corpus.select(
            "vid", "vq", _km_scores_arr("vq", cents).alias("__sc")
        ).select(
            "vid",
            "vq",
            (
                F.array_position(F.col("__sc"), F.array_min("__sc")).cast("int")
                - 1
            ).alias("cluster"),
        )

    for _ in range(iters):
        assigned = assign_df(centroids).select(
            "cluster", F.posexplode("vq")
        )
        sums = (
            assigned.groupBy("cluster", "pos")
            .agg(
                F.sum("col").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = (
                r["s"], r["n"],
            )
        centroids = [
            [
                float(by_cluster[j][d][0]) / float(by_cluster[j][d][1])
                for d in sorted(by_cluster[j])
            ]
            if j in by_cluster
            else centroids[j]  # empty cluster keeps its centroid
            for j in range(n_clusters)
        ]

    # true L2 in unscaled units: sqrt(sum_d (v_d - c_d)^2) / SCALE,
    # same left-assoc chain per cluster as the score fold; the d2 array
    # is its own named column for the same tree-duplication reason
    return (
        assign_df(centroids)
        .select(
            F.col("vid").alias(id_col),
            "cluster",
            _km_d2_arr("vq", centroids).alias("__d2"),
        )
        .select(
            id_col,
            "cluster",
            F.round(
                F.sqrt(F.element_at(F.col("__d2"), F.col("cluster") + 1))
                / F.lit(float(_KM_SCALE)),
                6,
            ).alias("dist"),
        )
    )
