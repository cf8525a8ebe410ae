"""End-to-end corpus curation: compose dedup, decontamination,
quality filtering, PII redaction, and splitting into one auditable
pipeline.

A training-data pipeline does not run its hygiene operators in
isolation — it needs ONE decision per document, an auditable reason
for every drop, and a curated output table.  ``curate_flags`` computes
a boolean flag column per drop reason (exact duplicate, benchmark
contamination, low quality) plus the final ``keep`` verdict;
``curate`` applies the verdict, redacts PII, and assigns the
deterministic train/val/test split; ``curation_report`` is the one-row
audit summary.

Scale design (100 TB):

* All flag joins key on ``doc_id`` against tables that are sized by
  the PROBLEM (duplicate volume, contamination volume), not the
  corpus; AQE picks broadcast when they are small.  The quality flag
  is pure per-row arithmetic on the scan.
* Near-dup (MinHash-LSH) flagging is deliberately composed OUTSIDE
  this module (`dedup.duplicate_clusters` → drop list) because cluster
  resolution is iterative; ``drop_ids`` lets callers feed any drop
  list (near-dup clusters, manual blocklists) into the same verdict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .decontam import contaminated_ids, decontaminate
from .dedup import normalize_text, span_dup_stats
from .text import pii_redact, quality_score
from .sampling import hash_split


def curate_flags(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    quality_min: float | None = 0.5,
    ngram: int = 3,
    min_overlap: int = 2,
    drop_ids: DataFrame | None = None,
    span_dup_max: float | None = None,
    span_width: int = 8,
    span_winnow: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document drop flags and the final keep verdict.

    Adds: ``is_exact_dup`` (a lower-id document has identical
    normalized text), ``contaminated`` (shares ≥ ``min_overlap`` word
    n-grams with a benchmark document), ``low_quality``
    (quality_score < ``quality_min``), ``is_listed`` (appears in
    ``drop_ids``), ``boilerplate`` (``span_dup_max`` set and the
    document's winnowed duplicated-span fraction exceeds it —
    substring-level shared boilerplate, dedup.span_dup_stats), and
    ``keep`` (none of the above).
    """
    scored = quality_score(docs, text_col)

    # exact dup: keep the min id per normalized-text hash; one shuffle
    # on the hash, then a doc_id-keyed join back (dup table is one row
    # per distinct text — corpus-sized only in the no-dup worst case,
    # where is_exact_dup is all-false anyway)
    h = F.md5(normalize_text(F.col(text_col))).alias("__h")
    keepers = (
        docs.select(h, F.col(id_col))
        .groupBy("__h")
        .agg(F.min(id_col).alias("__keep_id"))
    )
    flagged = (
        scored.withColumn("__h", F.md5(normalize_text(F.col(text_col))))
        .join(keepers, "__h")
        .withColumn("is_exact_dup", F.col(id_col) != F.col("__keep_id"))
        .drop("__h", "__keep_id")
    )

    if benchmark is not None:
        cont = contaminated_ids(
            decontaminate(
                docs, benchmark, n=ngram, min_overlap=min_overlap,
                text_col=text_col, id_col=id_col,
            )
        ).withColumn("__cont", F.lit(True))
        flagged = flagged.join(
            cont, flagged[id_col] == cont["doc_id"], "left"
        ).drop(cont["doc_id"])
        flagged = flagged.withColumn(
            "contaminated", F.coalesce(F.col("__cont"), F.lit(False))
        ).drop("__cont")
    else:
        flagged = flagged.withColumn("contaminated", F.lit(False))

    if quality_min is not None:
        flagged = flagged.withColumn(
            "low_quality", F.col("quality_score") < quality_min
        )
    else:
        flagged = flagged.withColumn("low_quality", F.lit(False))

    if drop_ids is not None:
        listed = drop_ids.select(
            F.col(drop_ids.columns[0]).alias("__drop_id"),
            F.lit(True).alias("__listed"),
        ).distinct()
        flagged = (
            flagged.join(
                listed, flagged[id_col] == listed["__drop_id"], "left"
            )
            .withColumn("is_listed", F.coalesce(F.col("__listed"), F.lit(False)))
            .drop("__drop_id", "__listed")
        )
    else:
        flagged = flagged.withColumn("is_listed", F.lit(False))

    if span_dup_max is not None:
        spans = span_dup_stats(
            docs, text_col=text_col, id_col=id_col,
            width=span_width, winnow=span_winnow,
        ).select(
            F.col(id_col).alias("__span_id"),
            (F.col("dup_frac") > span_dup_max).alias("__bp"),
        )
        flagged = (
            flagged.join(
                spans, flagged[id_col] == spans["__span_id"], "left"
            )
            .withColumn("boilerplate", F.coalesce(F.col("__bp"), F.lit(False)))
            .drop("__span_id", "__bp")
        )
    else:
        flagged = flagged.withColumn("boilerplate", F.lit(False))

    return flagged.withColumn(
        "keep",
        ~(
            F.col("is_exact_dup")
            | F.col("contaminated")
            | F.col("low_quality")
            | F.col("is_listed")
            | F.col("boilerplate")
        ),
    )


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    quality_min: float | None = 0.5,
    ngram: int = 3,
    min_overlap: int = 2,
    drop_ids: DataFrame | None = None,
    span_dup_max: float | None = None,
    split_weights: dict[str, float] | None = None,
    redact: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
    flagged: DataFrame | None = None,
) -> DataFrame:
    """The curated corpus: kept documents only, PII redacted, split
    assigned.  Columns: the input columns (text redacted in place when
    ``redact``) + ``quality_score`` + ``split``.  Pass a precomputed
    ``flagged`` (from ``curate_flags``) to share one flag pass between
    the report and the curated output."""
    if flagged is None:
        flagged = curate_flags(
            docs, benchmark, quality_min=quality_min, ngram=ngram,
            min_overlap=min_overlap, drop_ids=drop_ids,
            span_dup_max=span_dup_max, text_col=text_col, id_col=id_col,
        )
    kept = flagged.filter("keep").select(
        *docs.columns, F.round("quality_score", 6).alias("quality_score")
    )
    if redact:
        kept = kept.withColumn(text_col, pii_redact(F.col(text_col)))
    return hash_split(kept, split_weights, id_col=id_col)


def curation_report(flagged: DataFrame) -> DataFrame:
    """One-row audit: total, per-reason drop counts (a document may
    carry several flags), kept count, kept fraction.  Map-side
    combinable single aggregation."""
    b = lambda c: F.sum(F.col(c).cast("long"))
    return flagged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        b("is_exact_dup").alias("n_exact_dup"),
        b("contaminated").alias("n_contaminated"),
        b("low_quality").alias("n_low_quality"),
        b("is_listed").alias("n_listed"),
        b("boilerplate").alias("n_boilerplate"),
        b("keep").alias("n_kept"),
        (b("keep") / F.count(F.lit(1))).alias("kept_frac"),
    )
