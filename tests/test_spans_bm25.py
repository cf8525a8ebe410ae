"""Cross-document duplicated spans (winnowing) and BM25 retrieval."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from jsonschema_spark.operators import dedup, text


def test_selected_spans_content_aligned(spark):
    # two docs sharing a long run select IDENTICAL window hashes
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    df = spark.createDataFrame(
        [(1, "xx yy " + shared), (2, shared + " zz qq")],
        "doc_id long, text string",
    )
    sel = df.select(
        "doc_id",
        F.explode(dedup.selected_spans(F.col("text"), width=4, winnow=3)).alias("s"),
    ).select("doc_id", "s.h")
    h1 = {r["h"] for r in sel.filter("doc_id = 1").collect()}
    h2 = {r["h"] for r in sel.filter("doc_id = 2").collect()}
    assert h1 & h2, "shared 12-token run must select at least one common window"


def test_duplicated_spans_hit_list(spark):
    shared = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, shared), (2, shared), (3, "totally different words here only once ever said")],
        "doc_id long, text string",
    )
    hits = dedup.duplicated_spans(df, width=4, winnow=2)
    rows = hits.collect()
    assert rows and all(r["n_docs"] == 2 for r in rows)
    assert {r["doc_id"] for r in rows} == {1, 2}
    # identical docs select identical (pos, h) pairs
    a = sorted((r["pos"], r["h"]) for r in rows if r["doc_id"] == 1)
    b = sorted((r["pos"], r["h"]) for r in rows if r["doc_id"] == 2)
    assert a == b


def test_span_dup_stats_fraction(spark):
    shared = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, shared), (2, shared), (3, "totally different words here only once ever said")],
        "doc_id long, text string",
    )
    st = {r["doc_id"]: r for r in dedup.span_dup_stats(df, width=4, winnow=2).collect()}
    assert st[1]["dup_frac"] == 1.0 and st[2]["dup_frac"] == 1.0
    assert st[3]["n_dup"] == 0 and st[3]["dup_frac"] == 0.0


def test_term_tf_adjacent_occurrences(spark):
    df = spark.createDataFrame([("a a a b",)], "text string")
    got = df.select(
        text._term_tf(dedup.normalize_text(F.col("text")), "a").alias("tf")
    ).collect()[0]["tf"]
    assert got == 3  # the non-overlapping-replace pitfall would say 2


def test_bm25_matches_hand_computation(spark):
    df = spark.createDataFrame(
        [(1, "spark window spark"), (2, "window join"), (3, "other words")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"] for r in text.bm25_scores(df, ["spark"]).collect()}
    # N=3, df=1, idf=ln(1 + 2.5/1.5); doc1: tf=2, dl=3, avgdl=7/3
    idf = math.log(1.0 + 2.5 / 1.5)
    tf, dl, avgdl, k1, b = 2.0, 3.0, 7.0 / 3.0, 1.2, 0.75
    c = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    expect = round(round(c * 1e9) / 1e9, 6)
    assert got == {1: expect}


def test_bm25_topk_deterministic_ties(spark):
    df = spark.createDataFrame(
        [(i, "common term") for i in range(20)], "doc_id long, text string"
    )
    top = text.bm25_topk(df, ["common"], k=5).collect()
    assert [r["doc_id"] for r in top] == [0, 1, 2, 3, 4]  # tie-break id asc


def test_bm25_topk_plan_is_take_ordered(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = text.bm25_topk(df, ["a"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
