from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators import temporal


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture()
def quotes(spark):
    # (key, ts, px, qid) — two keys, interleaved updates, a ts tie
    return spark.createDataFrame(
        [
            ("a", _ts(0), 1.0, 10),
            ("a", _ts(5), 2.0, 11),
            ("a", _ts(5), 3.0, 12),  # tie on ts: qid 12 must win
            ("a", _ts(20), 4.0, 13),
            ("b", _ts(1), 9.0, 20),
        ],
        "sym string, ts timestamp, px double, qid long",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            ("a", _ts(0), 1),   # equal-ts match (inclusive)
            ("a", _ts(6), 2),   # after the tie pair -> qid 12
            ("a", _ts(30), 3),  # most recent = qid 13
            ("b", _ts(0), 4),   # before any quote -> no match
            ("c", _ts(9), 5),   # key never quoted -> no match
        ],
        "sym string, ts timestamp, tid long",
    )


class TestAsofJoin:
    def test_backward_inclusive(self, spark, quotes, trades):
        out = temporal.asof_join(
            trades, quotes, on="sym", right_cols=["px", "qid"],
            tiebreak="qid",
        )
        got = {r["tid"]: (r["asof_qid"], r["asof_px"]) for r in out.collect()}
        assert got[1] == (10, 1.0)      # right row at exactly left_ts
        assert got[2] == (12, 3.0)      # ts tie broken by max qid
        assert got[3] == (13, 4.0)
        assert got[4] == (None, None)   # no earlier quote for b
        assert got[5] == (None, None)   # unseen key
        # left-join semantics: every trade survives exactly once
        assert sorted(r["tid"] for r in out.collect()) == [1, 2, 3, 4, 5]

    def test_strict_excludes_equal_ts(self, spark, quotes, trades):
        out = temporal.asof_join(
            trades, quotes, on="sym", right_cols=["qid"],
            tiebreak="qid", strict=True,
        )
        got = {r["tid"]: r["asof_qid"] for r in out.collect()}
        assert got[1] is None           # equal ts no longer visible
        assert got[2] == 12

    def test_tolerance(self, spark, quotes, trades):
        out = temporal.asof_join(
            trades, quotes, on="sym", right_cols=["qid"],
            tiebreak="qid", tolerance_sec=599,
        )
        got = {r["tid"]: r["asof_qid"] for r in out.collect()}
        assert got[2] == 12             # 60s gap, inside tolerance
        assert got[3] is None           # 600s gap > 599s tolerance: dropped
        inclusive = temporal.asof_join(
            trades, quotes, on="sym", right_cols=["qid"],
            tiebreak="qid", tolerance_sec=600,
        )
        got600 = {r["tid"]: r["asof_qid"] for r in inclusive.collect()}
        assert got600[3] == 13          # gap == tolerance is kept (pandas)

    def test_single_shuffle_plan(self, spark, quotes, trades):
        plan = temporal.asof_join(
            trades, quotes, on="sym", right_cols=["qid"], tiebreak="qid"
        )._jdf.queryExecution().executedPlan().toString()
        # ONE exchange for the union (both sides hash on the key), no
        # join operator at all — the big-big scale shape
        assert plan.count("Exchange hashpartitioning") == 1
        for bad in ("SortMergeJoin", "BroadcastNestedLoop", "Cartesian"):
            assert bad not in plan

    def test_matches_pair_and_prune_oracle(self, spark):
        # randomized-ish dense fixture vs the quadratic definition
        n_r = 40
        right = spark.createDataFrame(
            [("k%d" % (i % 3), _ts(i % 25, i % 7), float(i), i)
             for i in range(n_r)],
            "k string, ts timestamp, v double, rid long",
        )
        left = spark.createDataFrame(
            [("k%d" % (i % 4), _ts(i % 27, (i * 3) % 11), i)
             for i in range(50)],
            "k string, ts timestamp, lid long",
        )
        fast = {
            r["lid"]: r["asof_rid"]
            for r in temporal.asof_join(
                left, right, on="k", right_cols=["rid"], tiebreak="rid"
            ).collect()
        }
        naive = (
            left.alias("l")
            .join(
                right.alias("r"),
                (F.col("l.k") == F.col("r.k"))
                & (F.col("r.ts") <= F.col("l.ts")),
                "left",
            )
            .groupBy("l.lid")
            .agg(F.max_by("r.rid", F.struct("r.ts", "r.rid")).alias("rid"))
        )
        slow = {r["lid"]: r["rid"] for r in naive.collect()}
        assert fast == slow


@pytest.fixture()
def pings(spark):
    return spark.createDataFrame(
        [
            ("u1", _ts(0), 100),
            ("u1", _ts(10), 101),
            ("u1", _ts(59), 102),
            ("u2", _ts(10), 200),
        ],
        "uid string, ts timestamp, pid long",
    )


@pytest.fixture()
def windows(spark):
    return spark.createDataFrame(
        [
            ("u1", _ts(0), _ts(11), 1),    # catches pid 100, 101 ([s,e))
            ("u1", _ts(11), _ts(12), 2),   # empty window
            ("u2", _ts(10), _ts(10, 1), 3),  # 1s window catching pid 200
            ("u3", _ts(0), _ts(59), 4),    # key with no pings
        ],
        "uid string, start timestamp, end timestamp, wid long",
    )


class TestRangeJoin:
    def test_inner(self, spark, pings, windows):
        out = temporal.range_join(
            pings, windows, on=["uid"], bucket_sec=300
        )
        got = sorted((r["wid"], r["pid"]) for r in out.collect())
        assert got == [(1, 100), (1, 101), (3, 200)]

    def test_half_open_boundaries(self, spark, pings, windows):
        # pid 101 at minute 10 is inside [0, 11) but a window ending
        # exactly at minute 10 must exclude it
        iv = windows.withColumn("end", F.expr("start + interval 10 minutes"))
        out = temporal.range_join(pings, iv, on=["uid"], bucket_sec=300)
        got = sorted((r["wid"], r["pid"]) for r in out.collect())
        assert (1, 100) in got and (1, 101) not in got

    def test_right_keeps_empty_windows(self, spark, pings, windows):
        out = temporal.range_join(
            pings, windows, on=["uid"], bucket_sec=300, how="right"
        )
        per_w = {}
        for r in out.collect():
            per_w.setdefault(r["wid"], []).append(r["pid"])
        assert sorted(per_w[1]) == [100, 101]
        assert per_w[2] == [None]
        assert per_w[3] == [200]
        assert per_w[4] == [None]

    def test_no_nested_loop_join(self, spark, pings, windows):
        plan = temporal.range_join(
            pings, windows, on=["uid"], bucket_sec=300
        )._jdf.queryExecution().executedPlan().toString()
        for bad in ("BroadcastNestedLoop", "Cartesian"):
            assert bad not in plan

    def test_exactly_once_across_buckets(self, spark):
        # interval spanning many buckets still yields each pair once
        iv = spark.createDataFrame(
            [("u", _ts(0), _ts(59), 1)],
            "uid string, start timestamp, end timestamp, wid long",
        )
        pts = spark.createDataFrame(
            [("u", _ts(m), m) for m in range(0, 59, 7)],
            "uid string, ts timestamp, pid long",
        )
        out = temporal.range_join(pts, iv, on=["uid"], bucket_sec=60)
        assert out.count() == len(range(0, 59, 7))
        assert out.select("pid").distinct().count() == out.count()


def test_funnel_partial_progress(spark):
    from jsonschema_spark.operators.temporal import funnel

    rows = [
        # u1 completes all three in order
        (1, "view", "2026-01-01 10:00:00"),
        (1, "click", "2026-01-01 10:01:00"),
        (1, "purchase", "2026-01-01 10:02:00"),
        # u2 clicks BEFORE viewing: click can't count, so only step 1
        (2, "click", "2026-01-01 09:00:00"),
        (2, "view", "2026-01-01 10:00:00"),
        # u3 same-timestamp view+click: strict > blocks the click
        (3, "view", "2026-01-01 10:00:00"),
        (3, "click", "2026-01-01 10:00:00"),
        # u4 only irrelevant events -> not in output at all
        (4, "error", "2026-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).selectExpr("user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts")
    got = {r["user_id"]: r["steps_completed"]
           for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_funnel_later_click_still_counts(spark):
    from jsonschema_spark.operators.temporal import funnel

    rows = [
        (1, "click", "2026-01-01 09:00:00"),   # too early, skipped
        (1, "view", "2026-01-01 10:00:00"),
        (1, "click", "2026-01-01 11:00:00"),   # this one matches step 2
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).selectExpr("user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts")
    got = funnel(df, ["view", "click"]).collect()
    assert got[0]["steps_completed"] == 2
