"""Streaming exact dedup: first-occurrence-only pass-through.

An ingest pipeline at transcript scale dedupes ON THE WAY IN — waiting
for a nightly batch dedup means a day of duplicated training rows.
This is the streaming face of operators/dedup.exact_dedup: the same
normalized-content hash, kept in Structured Streaming state.

Two modes:

* ``within=None`` (exact): ``dropDuplicates`` on the hash — state is
  one small row per DISTINCT document ever seen.  Exact and simple,
  but state never expires; at 10^12 turns this is only viable with a
  state store backed by disk (RocksDB state store in real clusters).
* ``within="24 hours"`` (bounded): ``dropDuplicatesWithinWatermark``
  — state is bounded by the watermark horizon; duplicates farther
  apart than the horizon are re-admitted.  This is the 100 TB knob:
  horizon = how far apart real duplicate submissions arrive.

The emitted row carries the content hash and the normalized text, both
deterministic for a given input SET (which physical duplicate row is
kept is not — callers that need a canonical keeper id use the batch
``exact_dedup`` aggregation instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import hash_long, normalize_text


def content_key(col: Column) -> Column:
    """The dedup key: 60-bit hash of the normalized text (md5-derived
    by default, oracle-replayable; set_hash_mode('xxhash64') swaps the
    production hash)."""
    return hash_long(normalize_text(col))


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    within: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """First occurrence of each distinct normalized text passes, later
    duplicates are dropped in-stream.  Append-mode legal (stateful
    dedup, no aggregation)."""
    out = stream.withColumn("__h", content_key(F.col(text_col))).withColumn(
        "__norm", normalize_text(F.col(text_col))
    )
    if within is not None:
        return out.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
            ["__h"]
        )
    return out.dropDuplicates(["__h"])
