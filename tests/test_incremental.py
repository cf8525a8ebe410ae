"""Incremental mergeable column stats
(jsonschema_spark/operators/incremental.py): partial build, merge
equivalence with a single pass, HLL estimate accuracy, and the
idempotent StatsStore ingest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.incremental import (
    StatsStore,
    merge_partials,
    stats_partials,
)

COLS = ["event_id", "user_id", "event_type", "value"]


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def _by_col(df):
    return {r["column"]: r for r in df.collect()}


def test_merge_of_batches_equals_single_pass_exact_fields(spark, events):
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = _by_col(
        merge_partials(
            stats_partials(a, COLS).unionByName(stats_partials(b, COLS))
        )
    )
    single = _by_col(merge_partials(stats_partials(events, COLS)))
    for c in COLS:
        for f in ("n_rows", "n_nulls", "min_num", "max_num",
                  "min_str", "max_str", "kind"):
            assert merged[c][f] == single[c][f], (c, f)


def test_hll_estimate_close_to_exact(spark, events):
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = _by_col(
        merge_partials(
            stats_partials(a, COLS).unionByName(stats_partials(b, COLS))
        )
    )
    for c in COLS:
        exact = events.select(
            F.count_distinct(F.col(c).cast("string"))
        ).first()[0]
        est = merged[c]["n_distinct_est"]
        assert abs(est - exact) <= max(2.0, 0.05 * exact), (c, est, exact)


def test_numeric_min_is_numeric_not_lexicographic(spark):
    # "9" > "10" lexicographically; the numeric slots must fold 9 < 10
    df = spark.createDataFrame([(9,), (10,)], "v long")
    a, b = df.filter("v = 9"), df.filter("v = 10")
    merged = _by_col(
        merge_partials(
            stats_partials(a, ["v"]).unionByName(stats_partials(b, ["v"]))
        )
    )
    assert merged["v"]["min_num"] == 9.0 and merged["v"]["max_num"] == 10.0
    assert merged["v"]["min_str"] is None  # numeric columns skip str slots


def test_store_ingest_idempotent_and_partition_scoped(spark, events, tmp_path):
    store = StatsStore(str(tmp_path / "store"))
    daily = events.withColumn("day", F.to_date("ts"))
    n1 = store.ingest(daily, COLS, ["day"])
    assert n1 > 0
    # re-ingesting the same partitions appends nothing
    assert store.ingest(daily, COLS, ["day"]) == 0
    cur = _by_col(store.current(spark))
    single = _by_col(merge_partials(stats_partials(events, COLS)))
    for c in COLS:
        assert cur[c]["n_rows"] == single[c]["n_rows"]
        assert cur[c]["min_num"] == single[c]["min_num"]


def test_store_new_partition_appends_only_batch_partials(spark, events, tmp_path):
    store = StatsStore(str(tmp_path / "store2"))
    daily = events.withColumn("day", F.to_date("ts"))
    days = sorted(r["day"] for r in daily.select("day").distinct().collect())
    head, tail = days[:-1], days[-1]
    n1 = store.ingest(daily.filter(F.col("day").isin(head)), COLS, ["day"])
    n2 = store.ingest(daily, COLS, ["day"])  # only the tail day is new
    assert n1 == len(head) * len(COLS)
    assert n2 == len(COLS)
    cur = _by_col(store.current(spark))
    single = _by_col(merge_partials(stats_partials(events, COLS)))
    assert all(
        cur[c]["n_rows"] == single[c]["n_rows"] for c in COLS
    )
