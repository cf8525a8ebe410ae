"""Byte-stability golden tests (north star invariant): the synthetic
corpus, its window-ranked ordering, and the violation rows must be
byte-identical across runs, partitionings, and releases.  The digests
below are the committed golden values — a change means either the
generator or the engine's message/ordering semantics drifted."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

import jsonschema_spark as js
from jsonschema_spark.operators.order import stable_sorted, window_ranked
from jsonschema_spark.sources.fixtures import TRANSCRIPT_CORE_SCHEMA, transcripts

GOLDEN_CORPUS_DIGEST = "528ebeda52203e42b75e454638b18ec9"
GOLDEN_VIOLATIONS_DIGEST = "292c9777475498734108903eaf3c5372"
GOLDEN_COUNTS = (14296, 386)  # (rows, violation rows) at n_convs=1000


def _digest(rows) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update(("\x1f".join("" if v is None else str(v) for v in r) + "\n").encode())
    return h.hexdigest()


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts(spark, n_convs=1000).cache()


def test_corpus_window_ranked_text_digest(spark, corpus):
    """Per-turn text equality under stable turn ordering: the ordered
    (conv_id, turn_rank, text) stream is byte-stable."""
    ordered = stable_sorted(corpus).select("conv_id", "turn_rank", "text")
    rows = [tuple(r) for r in ordered.collect()]
    assert len(rows) == GOLDEN_COUNTS[0]
    assert _digest(rows) == GOLDEN_CORPUS_DIGEST


def test_corpus_digest_partitioning_invariant(spark):
    """Same corpus at a different generator partitioning -> same bytes."""
    alt = transcripts(spark, n_convs=1000, partitions=7)
    ordered = stable_sorted(alt).select("conv_id", "turn_rank", "text")
    assert _digest([tuple(r) for r in ordered.collect()]) == GOLDEN_CORPUS_DIGEST


def test_violations_digest(spark, corpus):
    plan = js.compile_schema(TRANSCRIPT_CORE_SCHEMA)
    viols = plan.validate(corpus, keys=["conv_id", "turn_idx"]).violations
    rows = sorted(tuple(r) for r in viols.collect())
    assert len(rows) == GOLDEN_COUNTS[1]
    assert _digest(rows) == GOLDEN_VIOLATIONS_DIGEST


def test_error_strings_reference_form(spark):
    df = spark.createDataFrame([(None, -1)], "conv_id string, turn_idx int")
    plan = js.compile_schema(
        {"required": ["conv_id"], "properties": {"turn_idx": {"minimum": 0}}}
    )
    errs = plan.validate(df).errors.collect()
    # errsToString concatenation 'path' info; (schema.go:161-172)
    assert errs[0]["error"] == (
        "'$.turn_idx' value must be larger or equal than 0; "
        "'$.conv_id' field is required; "
    )


def test_window_ranked_is_total_order(spark, corpus):
    ranked = window_ranked(corpus)
    # duplicates (conv_id, turn_idx) exist by construction; ranks must
    # still be unique within each conversation
    dups = (
        ranked.groupBy("conv_id", "turn_rank")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0
