"""Skew utilities: salted two-phase aggregation correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonschema_spark.operators.skew import (
    key_histogram,
    salted_agg,
    salted_collect_list,
)


def _df(spark):
    rows = [("hot", i, f"t{i}") for i in range(500)] + [
        ("cold", i, f"c{i}") for i in range(5)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


def test_salted_agg_matches_plain(spark):
    df = _df(spark)
    plain = {r["conv_id"]: (r["n"], r["mx"]) for r in
             df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"),
                                       F.max("turn_idx").alias("mx")).collect()}
    salted = {r["conv_id"]: (r["n"], r["mx"]) for r in
              salted_agg(df, ["conv_id"],
                         aggs={"n": F.count(F.lit(1)), "mx": F.max("turn_idx")},
                         merges={"n": F.sum("n"), "mx": F.max("mx")},
                         buckets=8).collect()}
    assert salted == plain


def test_salted_collect_list_ordered(spark):
    df = _df(spark)
    out = {r["conv_id"]: r["texts"] for r in
           salted_collect_list(df, ["conv_id"], "text",
                               order_by="turn_idx", buckets=4).collect()}
    assert out["cold"] == ["c0", "c1", "c2", "c3", "c4"]
    assert out["hot"][:3] == ["t0", "t1", "t2"] and len(out["hot"]) == 500


def test_salted_agg_spreads_hot_key(spark):
    df = _df(spark)
    from jsonschema_spark.operators.skew import with_salt

    buckets = with_salt(df, ["conv_id"], 8).filter("conv_id = 'hot'") \
        .select("__salt").distinct().count()
    assert buckets >= 6  # hot key spread over (almost) all buckets


def test_key_histogram(spark):
    df = _df(spark)
    top = key_histogram(df, ["conv_id"], top=1).collect()
    assert top[0]["conv_id"] == "hot" and top[0]["rows"] == 500


def test_scalable_window_ranked_equals_plain(spark):
    from jsonschema_spark.operators.order import (
        scalable_window_ranked,
        window_ranked,
    )

    df = _df(spark)  # 'hot' conv with 500 turns, 'cold' with 5
    plain = {(r["conv_id"], r["turn_idx"]): r["turn_rank"]
             for r in window_ranked(df, order_by=("turn_idx",)).collect()}
    scal = {(r["conv_id"], r["turn_idx"]): r["turn_rank"]
            for r in scalable_window_ranked(
                df, order_by=("turn_idx",), num_partitions=13).collect()}
    assert scal == plain
    # the hot conversation really is spread over multiple range
    # partitions (the point of the rewrite)
    from pyspark.sql import functions as F
    ranged = df.repartitionByRange(13, F.col("conv_id"), F.col("turn_idx"))
    spread = (ranged.withColumn("p", F.spark_partition_id())
              .filter("conv_id = 'hot'").select("p").distinct().count())
    assert spread > 1


class TestSkewReport:
    def test_known_distribution(self, spark):
        from jsonschema_spark.operators.skew import skew_report

        # key 'hot' has 80 rows, 20 keys have 1 row each -> 100 rows
        rows = [("hot",)] * 80 + [(f"k{i}",) for i in range(20)]
        df = spark.createDataFrame(rows, "k string")
        r = skew_report(df, ["k"], top=5).collect()[0]
        assert r["n_rows"] == 100 and r["n_keys"] == 21
        assert r["max_key_rows"] == 80
        assert r["p50_key_rows"] == 1.0
        # top-5 = hot(80) + 4 singles = 84
        assert r["top_share"] == 0.84
        # hhi = (6400 + 20) / 10000
        assert r["hhi"] == 0.642
        # mean = 100/21 ≈ 4.76; target = 4*mean ≈ 19.05; ceil(80/19.05) = 5
        assert r["suggested_salt"] == 5

    def test_uniform_keys_salt_one(self, spark):
        from jsonschema_spark.operators.skew import skew_report

        df = spark.createDataFrame(
            [(f"k{i % 10}",) for i in range(100)], "k string"
        )
        r = skew_report(df, ["k"], top=3).collect()[0]
        assert r["suggested_salt"] == 1
        assert r["max_key_rows"] == 10 and r["n_keys"] == 10
