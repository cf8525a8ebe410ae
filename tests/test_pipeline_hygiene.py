"""Training-data hygiene operators: decontamination, PII
scan/redaction, repetition features, transcript tool pairing."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators import decontam, text, transcripts


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "a completely original training document about spark"),
        (2, "short text"),
        (3, "quantum physics lectures for curious graduate students"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_set(spark):
    rows = [
        # shares 'the quick brown fox jumps over the lazy dog' with doc 0
        (100, "watch the quick brown fox jumps over the lazy dog"),
        (101, "held out benchmark question nobody trained on"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontaminate:
    def test_overlap_pairs(self, spark, corpus, bench_set):
        pairs = {
            (r["doc_id"], r["bench_id"]): (r["overlap"], r["contamination"])
            for r in decontam.decontaminate(
                corpus, bench_set, n=3, min_overlap=2
            ).collect()
        }
        assert set(pairs) == {(0, 100)}
        overlap, contamination = pairs[(0, 100)]
        # shared window has 9 tokens -> 7 shared 3-grams; doc 0 has 10
        # tokens -> 8 distinct 3-grams
        assert overlap == 7
        assert contamination == pytest.approx(7 / 8)

    def test_short_docs_yield_no_ngrams(self, spark):
        df = spark.createDataFrame([(0, "two words"), (1, "")],
                                   "doc_id long, text string")
        out = df.select(decontam.word_ngrams(F.col("text"), 3).alias("g")).collect()
        assert [r["g"] for r in out] == [[], []]

    def test_contaminated_ids(self, spark, corpus, bench_set):
        ids = decontam.contaminated_ids(
            decontam.decontaminate(corpus, bench_set, n=3, min_overlap=2)
        )
        assert [r["doc_id"] for r in ids.collect()] == [0]

    def test_benchmark_side_is_broadcast(self, spark, corpus, bench_set):
        plan = decontam.decontaminate(corpus, bench_set)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # the 100x-scale shape: the corpus shuffles exactly ONCE, on the
        # contamination-sized matched stream (no totals join back)
        assert plan.count("Exchange hashpartitioning") == 1


class TestPII:
    def test_counts_and_redaction(self, spark):
        df = spark.createDataFrame(
            [
                (0, "reach me at bob@example.com or 10.1.2.3"),
                (1, "call 15551234567 ssn 123-45-6789"),
                (2, "nothing sensitive here"),
            ],
            "doc_id long, text string",
        )
        feat = {r["doc_id"]: r for r in text.pii_features(df).collect()}
        assert feat[0]["pii_email"] == 1 and feat[0]["pii_ipv4"] == 1
        assert feat[0]["pii_total"] == 2
        assert feat[1]["pii_phone"] == 1 and feat[1]["pii_ssn"] == 1
        assert feat[2]["pii_total"] == 0
        red = {
            r["doc_id"]: r["red"]
            for r in df.select(
                "doc_id", text.pii_redact(F.col("text")).alias("red")
            ).collect()
        }
        assert red[0] == "reach me at <EMAIL> or <IPV4>"
        assert red[1] == "call <PHONE> ssn <SSN>"
        assert red[2] == "nothing sensitive here"

    def test_email_host_not_double_redacted(self, spark):
        df = spark.createDataFrame([(0, "x user@10.0.0.1.example.com y")],
                                   "doc_id long, text string")
        red = df.select(text.pii_redact(F.col("text")).alias("r")).first()["r"]
        assert red == "x <EMAIL> y"


class TestRepetition:
    def test_fractions(self, spark):
        df = spark.createDataFrame(
            [
                (0, "spam spam spam spam spam"),
                (1, "all words here are unique tokens"),
                (2, ""),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in text.repetition_features(df).collect()}
        # doc 0: 4 bigrams all 'spam spam' -> dup frac 3/4, top frac 1.0
        assert out[0]["dup_bigram_frac"] == pytest.approx(0.75)
        assert out[0]["top_bigram_frac"] == pytest.approx(1.0)
        assert out[0]["dup_trigram_frac"] == pytest.approx(2 / 3)
        assert out[1]["dup_bigram_frac"] == 0.0
        assert out[1]["top_bigram_frac"] == pytest.approx(1 / 5)
        assert out[2]["dup_bigram_frac"] == 0.0
        assert out[2]["top_bigram_frac"] == 0.0


class TestToolPairing:
    def test_violations(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            # well-formed: user -> assistant(call) -> tool(result)
            ("c1", 0, "user", None, t0),
            ("c1", 1, "assistant", "search", t0),
            ("c1", 2, "tool", "search", t0),
            # tool turn without a tool name
            ("c2", 0, "user", None, t0),
            ("c2", 1, "assistant", "search", t0),
            ("c2", 2, "tool", None, t0),
            # tool named on a user turn; tool result follows user
            ("c3", 0, "user", "search", t0),
            ("c3", 1, "tool", "search", t0),
            # conversation opens with a tool result
            ("c4", 0, "tool", "search", t0),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "tool string, ts timestamp"
        )
        out = {
            (r["conv_id"], r["turn_idx"], r["check"]): r["info"]
            for r in transcripts.tool_call_pairing(df).collect()
        }
        assert ("c1", 2, "tool_pairing") not in out
        assert not any(k[0] == "c1" for k in out)
        assert out[("c2", 2, "tool_name")] == "tool turn carries no tool name"
        assert out[("c3", 0, "tool_caller")] == "tool search named on role user"
        assert out[("c3", 1, "tool_pairing")] == "tool result follows role user"
        assert out[("c4", 0, "tool_pairing")] == "tool result follows role <none>"
        assert len(out) == 4


class TestLMScore:
    def test_counts_and_totals(self, spark, corpus):
        counts = {r["token"]: r["n"] for r in text.lm_counts(corpus).collect()}
        assert counts["the"] == 2  # both in doc 0
        assert counts["spark"] == 1
        assert "" not in counts

    def test_score_prefers_in_distribution_docs(self, spark, corpus):
        counts = text.lm_counts(corpus)
        out = {r["doc_id"]: r for r in text.lm_score(corpus, counts).collect()}
        assert set(out) == {0, 1, 2, 3}
        # every doc scored over its real token count
        assert out[2]["n_tokens"] == 2
        # ppl = exp(-avg_logp) for every scored doc (relative tolerance:
        # avg_logp is independently rounded to 6 dp, which perturbs
        # exp(-avg_logp) by up to ~5e-7 * ppl)
        import math
        for r in out.values():
            assert abs(r["ppl"] - math.exp(-r["avg_logp"])) < r["ppl"] * 2e-6 + 1e-6

    def test_unseen_tokens_take_alpha_mass(self, spark, corpus):
        counts = text.lm_counts(corpus)
        new = spark.createDataFrame(
            [(9, "zebra zebra zebra")], "doc_id long, text string"
        )
        seen = spark.createDataFrame(
            [(8, "the the the")], "doc_id long, text string"
        )
        s_new = text.lm_score(new, counts).first()
        s_seen = text.lm_score(seen, counts).first()
        # out-of-distribution doc scores strictly worse (higher ppl)
        assert s_new["ppl"] > s_seen["ppl"]
        assert s_new["n_tokens"] == 3 and s_new["avg_logp"] < 0

    def test_empty_doc_scores_null(self, spark, corpus):
        counts = text.lm_counts(corpus)
        empty = spark.createDataFrame(
            [(7, ""), (6, "   ")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in text.lm_score(empty, counts).collect()}
        for r in out.values():
            assert r["n_tokens"] == 0
            assert r["avg_logp"] is None and r["ppl"] is None


class TestSourceOverlap:
    def test_known_matrix(self, spark):
        from jsonschema_spark.operators.decontam import source_overlap

        rows = [
            (1, "alpha beta gamma delta", "s1"),   # grams: abg, bgd
            (2, "alpha beta gamma", "s2"),          # abg  (shared with s1)
            (3, "epsilon zeta eta", "s2"),          # eze
            (4, "unrelated words here", "s3"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {
            (r["src_a"], r["src_b"]): (r["shared"], r["n_a"], r["n_b"], r["overlap"])
            for r in source_overlap(df, n=3).collect()
        }
        # s1 has 2 distinct 3-grams, s2 has 2, they share 1
        assert got == {("s1", "s2"): (1, 2, 2, 0.5)}

    def test_short_docs_no_grams(self, spark):
        from jsonschema_spark.operators.decontam import source_overlap

        df = spark.createDataFrame(
            [(1, "one two", "a"), (2, "one two", "b")],
            "doc_id long, text string, source string",
        )
        assert source_overlap(df, n=3).count() == 0
