"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The standard web-scale pretraining hygiene step (the GPT-3 paper's
13-gram filter is the canonical recipe): any training document whose
text overlaps an eval/benchmark document on enough n-grams is
contaminated and must be dropped before training, or the benchmark
stops measuring generalization.  The reference engine
(seeadoog/jsonschema) has no cross-document operators (SURVEY.md §2.9);
this is an engine-level addition for the 100 TB corpus case.

Scale design (100 TB corpus, ~10^4-10^6 benchmark docs):

* The benchmark side is always tiny relative to the corpus — its
  distinct n-gram set is **broadcast**, so the corpus is never
  shuffled for the join: each scan task streams its documents,
  explodes n-grams map-side, and probes the broadcast hash table.
* Only MATCHED (doc, bench, ngram) rows survive the probe; the ONE
  shuffle in the whole plan is the groupBy on (doc_id, bench_id) over
  that filtered stream — proportional to contamination volume (rare),
  not corpus volume.
* The per-document n-gram total is a per-row scalar (``size(grams)``)
  computed BEFORE the explode and carried through the probe into the
  grouping key — no second corpus aggregation, no doc_id join back.
  (The naive formulation — count totals in a separate groupBy and join
  them on — re-shuffles the entire corpus a second time and
  sort-merge-joins it; at 100 TB that join IS the query cost.)

The n-gram build itself is an Arrow-batched kernel
(``kernels.ngram_distinct``): the pure-Column form pays the
interpreted-HOF tax per element (transform lambdas run outside
whole-stage codegen) and is re-built per consumer by Catalyst's
generator pruning; the kernel materializes count + distinct grams
once per row, one Arrow exchange per batch.  Tokenization stays
JVM-side (``dedup.tokens``), the join is a broadcast hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import kernels
from .dedup import normalize_text, tokens


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Distinct word n-grams from an ALREADY-MATERIALIZED token-array
    column.

    The token array must be a bound column, not an inline
    ``split(regexp_replace(...))`` expression: higher-order-function
    lambdas are interpreted (outside whole-stage codegen) and inline
    their argument expression into EVERY ``element_at`` — an inline
    tokenizer gets re-run ~3n times per row (measured 20x slowdown on
    the decontamination scan).  Callers materialize ``tokens(text)``
    in a projection first; CollapseProject keeps that level because
    the expression is non-cheap and multiply referenced.

    Guarded for short texts: fewer than ``n`` tokens yields an empty
    array (``sequence(1, 0)`` would count DOWN, so the guard is
    mandatory, not cosmetic).
    """
    cnt = F.size(toks) - F.lit(n - 1)
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(
        cnt >= 1, F.array_distinct(F.transform(F.sequence(F.lit(1), cnt), gram))
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams of normalized text.  Convenience form for
    single-use contexts; hot paths should materialize ``tokens(col)``
    and use ``ngrams_from_tokens`` (see its docstring)."""
    return ngrams_from_tokens(tokens(col), n)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str | None = None,
) -> DataFrame:
    """Contaminated (corpus doc, benchmark doc) pairs with overlap
    counts.

    Returns ``(doc_id, bench_id, overlap, doc_ngrams, contamination)``
    where ``overlap`` is the number of distinct word n-grams the pair
    shares, ``doc_ngrams`` the corpus document's distinct n-gram count
    and ``contamination = overlap / doc_ngrams``.  Pairs below
    ``min_overlap`` are dropped.

    The benchmark n-gram table is broadcast — the corpus-side scan is
    shuffle-free up to the final (doc_id, bench_id) count, which only
    carries matched rows.
    """
    bench_id_col = bench_id_col or id_col

    # The n-gram build runs as ONE Arrow-batched kernel pass per side
    # (kernels.ngram_distinct).  The previous pure-Column form —
    # size(array_distinct(transform(...))) + explode(same) — paid the
    # interpreted-HOF tax per element AND built the array twice per
    # row (Catalyst generator pruning inlines the expression into both
    # consumers); the ArrowEvalPython operator materializes the struct
    # exactly once at plan level.  Measured at sf0.1: 8.2s -> see
    # BENCH/BASELINE.md.  Gram content/order are identical
    # (first-occurrence distinct, single-space join).
    ng = kernels.ngram_distinct(F.col("__toks"), n)
    corpus_ng = corpus.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("__toks"),
    ).select("doc_id", ng.alias("__ng")).select(
        "doc_id",
        F.col("__ng.cnt").alias("doc_ngrams"),
        F.explode("__ng.grams").alias("ng"),
    )
    # inline(array(struct)) barrier: without it the generator
    # nested-column rewrite clones the kernel call for the .grams
    # extraction and the kernel evaluates twice per benchmark row
    # (two stacked ArrowEvalPython nodes; found by the r4 plan audit)
    bench_ng = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        tokens(F.col(text_col)).alias("__toks"),
    ).select("bench_id", F.inline(F.array(ng))).select(
        "bench_id", F.explode("grams").alias("ng")
    )

    return (
        corpus_ng.join(F.broadcast(bench_ng), "ng")
        # doc_ngrams is functionally dependent on doc_id — keying on it
        # costs nothing and saves the join back to a totals table
        .groupBy("doc_id", "bench_id", "doc_ngrams")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .filter(F.col("overlap") >= min_overlap)
        .select(
            "doc_id",
            "bench_id",
            "overlap",
            "doc_ngrams",
            (F.col("overlap") / F.col("doc_ngrams")).alias("contamination"),
        )
    )


def contaminated_ids(pairs: DataFrame) -> DataFrame:
    """Distinct corpus doc_ids to drop — the actionable output: a
    driver-small (or at worst contamination-sized) id list consumed by
    a left-anti join at the next pipeline stage."""
    return pairs.select("doc_id").distinct()


# --------------------------------------------------------------------
# Semantic (embedding-level) decontamination
# --------------------------------------------------------------------
# The n-gram filter above misses PARAPHRASED benchmark leakage — a
# training document that restates an eval item in different words.
# The standard countermeasure is embedding-similarity decontamination:
# flag any training vector whose cosine against ANY benchmark vector
# clears a (high) threshold.


def semantic_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int | None = None,
) -> DataFrame:
    """(id, max_cosine) of corpus vectors with cosine >= threshold
    against at least one benchmark vector.

    Scale shape — same as the n-gram path: the benchmark side is tiny
    relative to the corpus, so it is **broadcast** and the corpus
    streams through one scan (BroadcastNestedLoopJoin doing
    |corpus| x |bench| dot products map-side); only matches survive
    into the ONE aggregation, which is proportional to contamination
    volume.  Self-norms are hoisted to one sqrt per row per side.
    ``dims`` switches the |corpus|×|bench| pair dot to the unrolled
    whole-stage-codegen chain (dedup.dot_unrolled — same left-assoc
    IEEE fold, bit-identical; see similarity.py's kernel-choice rule:
    the r3 Arrow-kernel form evaluated each kernel TWICE per pair
    under the filter and was the ann_topk regression class); norms
    use the compact per-row fold.  max() over doubles is order-free,
    so the output sits under the value-hash oracle."""
    from .dedup import cosine, dot_double, dot_unrolled

    c = corpus.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("cv")
    )
    b = bench.select(F.col(vec_col).alias("bv"))
    if dims is not None:
        c = c.withColumn("__nc", F.sqrt(dot_double(F.col("cv"), F.col("cv"))))
        b = b.withColumn("__nb", F.sqrt(dot_double(F.col("bv"), F.col("bv"))))
        cos = dot_unrolled("cv", "bv", dims) / (F.col("__nc") * F.col("__nb"))
    else:
        cos = cosine(F.col("cv"), F.col("bv"))
    return (
        c.crossJoin(F.broadcast(b))
        .select(F.col("__cid"), cos.alias("__cos"))
        .filter(F.col("__cos") >= threshold)
        .groupBy("__cid")
        .agg(F.round(F.max("__cos"), 6).alias("max_cosine"))
        .select(F.col("__cid").alias(id_col), "max_cosine")
    )


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Cross-source contamination matrix:
    ``(src_a, src_b, shared, n_a, n_b, overlap)`` — for every source
    pair, how many distinct word-n-grams they share, and the overlap
    coefficient ``shared / min(n_a, n_b)``.  The data-governance view
    of duplication: which ingest feeds are re-crawling each other.

    Scale shape: the corpus reduces to the DISTINCT (source, n-gram)
    set first — one aggregation whose output is vocabulary-sized per
    source, not corpus-sized — and the pair join is an equality join
    on the n-gram; fanout per n-gram is bounded by the SOURCE count
    (not document frequency), so the join cannot blow up the way a
    doc-level all-pairs join would.  Per-source totals are a
    source-count-sized broadcast."""
    toks = df.select(
        F.col(group_col).alias("src"), tokens(F.col(text_col)).alias("__t")
    )
    sh = (
        toks.select("src", F.explode(ngrams_from_tokens(F.col("__t"), n)).alias("ng"))
        .distinct()
    )
    per = sh.groupBy("src").agg(F.count(F.lit(1)).alias("ng_cnt"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, "ng")
        .filter(F.col("a.src") < F.col("b.src"))
        .groupBy(
            F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    pa = per.select(F.col("src").alias("src_a"), F.col("ng_cnt").alias("n_a"))
    pb = per.select(F.col("src").alias("src_b"), F.col("ng_cnt").alias("n_b"))
    return (
        pairs.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared",
            "n_a",
            "n_b",
            F.round(
                F.col("shared").cast("double") / F.least("n_a", "n_b"), 6
            ).alias("overlap"),
        )
    )
