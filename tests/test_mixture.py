"""Temperature-based mixture resampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonschema_spark.operators.sampling import temperature_mixture


def _corpus(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_upweights_small_sources(spark):
    df = _corpus(spark, {"big": 900, "small": 100})
    out = temperature_mixture(df, tau=2.0)
    reps = (
        out.groupBy("source").agg(F.sum("n_reps").alias("got")).collect()
    )
    got = {r["source"]: r["got"] for r in reps}
    # tau=2: targets prop to sqrt(n) -> small gets 1000*[10/40]=250ish,
    # big 750ish; per-doc rounding is hash-driven so allow slack
    assert 200 <= got["small"] <= 300
    assert 700 <= got["big"] <= 800
    # total approximately preserved (total=None keeps corpus size)
    assert abs(sum(got.values()) - 1000) <= 50


def test_mixture_tau1_is_identity_rates(spark):
    df = _corpus(spark, {"a": 400, "b": 100})
    out = temperature_mixture(df, tau=1.0)
    # tau=1: q_g = n_g/N -> r_g = 1 exactly -> every doc once
    assert out.agg(F.sum("n_reps")).collect()[0][0] == 500
    assert out.filter(F.col("n_reps") != 1).count() == 0


def test_mixture_max_reps_cap(spark):
    df = _corpus(spark, {"huge": 2000, "tiny": 2})
    out = temperature_mixture(df, tau=100.0, max_reps=4)
    tiny = out.filter(F.col("source") == "tiny").collect()
    assert all(r["n_reps"] <= 4 for r in tiny)


def test_mixture_deterministic_across_parallelism(spark):
    df = _corpus(spark, {"a": 300, "b": 50})
    one = {
        r["doc_id"]: r["n_reps"]
        for r in temperature_mixture(df.coalesce(1)).collect()
    }
    eight = {
        r["doc_id"]: r["n_reps"]
        for r in temperature_mixture(df.repartition(8)).collect()
    }
    assert one == eight
