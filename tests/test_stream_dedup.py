"""Streaming exact dedup (streaming/dedup.py)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from jsonschema_spark.streaming.dedup import content_key, stream_exact_dedup

_SINK = [0]


def _drain(out):
    _SINK[0] += 1
    name = f"t_stream_dedup_{_SINK[0]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    return out.sparkSession.table(name)


def test_stream_dedup_equals_batch_distinct(spark):
    rows = [
        (1, "the same text"),
        (2, "THE   same TEXT"),   # same after normalization
        (3, "something else"),
        (4, "the same text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema("doc_id long, text string").parquet(d)
        got = _drain(
            stream_exact_dedup(stream).select(F.col("__h").alias("h"))
        )
        want = df.select(content_key(F.col("text")).alias("h")).distinct()
        assert sorted(r["h"] for r in got.collect()) == sorted(
            r["h"] for r in want.collect()
        )
        assert got.count() == 2


def test_stream_dedup_within_watermark_mode(spark):
    # bounded-state mode: plan must carry the watermark + within-watermark
    # dedup operator; duplicates inside the horizon are dropped
    rows = [
        (1, "dup text", "2026-01-01 00:00:00"),
        (2, "dup text", "2026-01-01 00:05:00"),
        (3, "other", "2026-01-01 00:06:00"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string").select(
        "doc_id", "text", F.col("ts").cast("timestamp").alias("ts")
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(
            "doc_id long, text string, ts timestamp"
        ).parquet(d)
        got = _drain(stream_exact_dedup(stream, within="1 hour"))
        assert got.count() == 2
