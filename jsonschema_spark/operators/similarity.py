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
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact top-k by cosine.

    Physical plan: BroadcastNestedLoopJoin (query side broadcast — it is
    the small side by construction) → per-query window top-k.  The
    window partitions by query_id (bounded cardinality ⇒ no skew
    concern) and orders by (cosine desc, neighbor_id) for deterministic
    tie-breaks.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
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


def _assign_cell(v: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (max dot product; centroids are a
    compile-time literal array-of-arrays, codegen'd inline)."""
    cents = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids
    ])
    scores = F.transform(cents, lambda c: dot_double(v, c))
    return F.array_position(scores, F.array_max(scores)).cast("int") - 1


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
        _assign_cell(F.col(vec_col), centroids).alias("cell"),
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
