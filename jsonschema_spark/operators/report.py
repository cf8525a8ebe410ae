"""Corpus data-card report: multi-grain summary in ONE scan.

The first artifact of any 100 TB curation run is the data card — how
many documents, how many tokens, what the source / language mix looks
like, how much exact duplication each slice carries.  Computing the
total row, the per-source rows, and the per-language rows as three
jobs reads the corpus three times; ``GROUPING SETS`` computes all the
grains in one aggregation — one scan, one (partially aggregated)
shuffle, grain disambiguated by ``grouping_id``.

The reference engine (seeadoog/jsonschema) has no corpus-level analog;
this is part of the engine's table-level check surface (SURVEY.md §2
"beyond the reference": training-data pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def transcript_report(
    df: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    dims: tuple[str, ...] = ("role", "tool"),
) -> DataFrame:
    """Data card for the transcript table (the north rule's input):
    ``(section, key, n_turns, n_convs, n_chars, null_text_turns,
    avg_chars)`` — one ``total`` row plus one row per value of each
    dim (role, tool), all from ONE scan via GROUPING SETS.

    ``n_convs`` is the number of distinct conversations touching the
    slice — "how many conversations have tool turns at all" falls out
    of the ``tool`` grain.  Distinct conv_ids are counted through
    Spark's two-phase expand-distinct, partially aggregated map-side;
    the shuffle never carries turn text.  A hot conversation is not a
    hot KEY here (the grouping keys are the low-cardinality dims plus
    the hashed distinct expansion), so no salting is needed.
    """
    base = df.select(
        *[F.col(d).cast("string").alias(d) for d in dims],
        F.col(conv_col).alias("__conv"),
        F.length(F.col(text_col)).alias("__nc"),
        F.col(text_col).isNull().alias("__tnull"),
    )
    sets = [[]] + [[d] for d in dims]
    agg = base.groupingSets(sets, *[F.col(d) for d in dims]).agg(
        F.grouping_id().alias("__gid"),
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.countDistinct("__conv").cast("long").alias("n_convs"),
        F.sum(F.coalesce(F.col("__nc"), F.lit(0))).cast("long").alias("n_chars"),
        F.sum(F.col("__tnull").cast("long")).cast("long").alias("null_text_turns"),
    )
    all_bits = (1 << len(dims)) - 1
    section = F.when(F.col("__gid") == all_bits, F.lit("total"))
    key = F.when(F.col("__gid") == all_bits, F.lit("*"))
    for i, d in enumerate(dims):
        gid = all_bits ^ (1 << (len(dims) - 1 - i))
        section = section.when(F.col("__gid") == gid, F.lit(d))
        key = key.when(F.col("__gid") == gid, F.col(d))
    return (
        agg.where(section.isNotNull())
        .select(
            section.alias("section"),
            F.coalesce(key, F.lit("(null)")).alias("key"),
            "n_turns",
            "n_convs",
            "n_chars",
            "null_text_turns",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_turns").cast("double"),
                6,
            ).alias("avg_chars"),
        )
    )


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    dims: tuple[str, ...] = ("source", "lang"),
    short_tokens: int = 5,
) -> DataFrame:
    """One-scan corpus data card:
    ``(section, key, n_docs, n_tokens, n_chars, distinct_texts,
    dup_docs, pct_short)`` with one ``section='total'`` row plus one
    row per value of each dimension in ``dims``.

    * ``n_tokens`` — normalized whitespace tokens (``text.tokens``).
    * ``distinct_texts`` / ``dup_docs`` — exact-duplicate accounting
      per slice via ``count(DISTINCT md5(text))``; a document counts
      as a duplicate when another doc in the SAME slice shares its
      digest.
    * ``pct_short`` — fraction of docs under ``short_tokens`` tokens
      (empty/null text counts as 0 tokens), rounded to 6 places.

    Scale shape: the per-row features (token count, digest) compute in
    the codegen projection; ``groupingSets`` expands each input row
    once per grain (len(dims)+1 ×) BEFORE the partial aggregation, so
    the shuffle still carries only group partials.  count(DISTINCT)
    adds Spark's standard two-phase expand-distinct plan — the
    distinct key (slice, digest) is corpus-cardinality but hashed and
    partially aggregated map-side; no row text ever shuffles.
    """
    toks = tokens(F.col(text_col))
    n_toks: Column = F.when(
        F.col(text_col).isNull() | (F.length(F.trim(F.col(text_col))) == 0),
        F.lit(0),
    ).otherwise(F.size(toks))
    base = docs.select(
        *[F.col(d).cast("string").alias(d) for d in dims],
        n_toks.alias("__nt"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("__nc"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__h"),
    )
    sets = [[]] + [[d] for d in dims]
    agg = base.groupingSets(sets, *[F.col(d) for d in dims]).agg(
        F.grouping_id().alias("__gid"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__nt").cast("long").alias("n_tokens"),
        F.sum("__nc").cast("long").alias("n_chars"),
        F.countDistinct("__h").cast("long").alias("distinct_texts"),
        F.round(
            F.avg((F.col("__nt") < short_tokens).cast("double")), 6
        ).alias("pct_short"),
    )
    # grouping_id bit i (MSB-first over dims) is SET when dims[i] is
    # aggregated away: total = all bits set, dims[i] grain = all but i.
    all_bits = (1 << len(dims)) - 1
    section = F.when(F.col("__gid") == all_bits, F.lit("total"))
    key = F.when(F.col("__gid") == all_bits, F.lit("*"))
    for i, d in enumerate(dims):
        gid = all_bits ^ (1 << (len(dims) - 1 - i))
        section = section.when(F.col("__gid") == gid, F.lit(d))
        key = key.when(F.col("__gid") == gid, F.col(d))
    return (
        agg.where(section.isNotNull())
        .select(
            section.alias("section"),
            F.coalesce(key, F.lit("(null)")).alias("key"),
            "n_docs",
            "n_tokens",
            "n_chars",
            "distinct_texts",
            (F.col("n_docs") - F.col("distinct_texts")).alias("dup_docs"),
            "pct_short",
        )
    )
