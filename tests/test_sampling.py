"""Corpus curation operators: hash split, stratified sampling,
token-budget selection, distributed prefix sum, sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from jsonschema_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"lang{i % 3}", f"src{i % 2}", 10 + (i * 7) % 50)
            for i in range(200)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_tokens int"
    )


class TestHashSplit:
    def test_deterministic_and_partitioning_invariant(self, spark, docs):
        a = {r["doc_id"]: r["split"]
             for r in sampling.hash_split(docs).collect()}
        b = {r["doc_id"]: r["split"]
             for r in sampling.hash_split(docs.repartition(7)).collect()}
        assert a == b

    def test_proportions(self, spark, docs):
        out = sampling.hash_split(docs).groupBy("split").count().collect()
        counts = {r["split"]: r["count"] for r in out}
        assert counts["train"] > 150  # ~180 expected of 200
        assert set(counts) <= {"train", "val", "test"}

    def test_growth_stability(self, spark, docs):
        """Adding rows never reassigns existing rows (the property
        randomSplit lacks)."""
        half = docs.filter(F.col("doc_id") < 100)
        a = {r["doc_id"]: r["split"]
             for r in sampling.hash_split(half).collect()}
        b = {r["doc_id"]: r["split"]
             for r in sampling.hash_split(docs).collect()}
        assert all(b[k] == v for k, v in a.items())


class TestStratifiedSample:
    def test_exact_counts_per_stratum(self, spark, docs):
        out = sampling.stratified_sample(docs, 0.25, strata=("lang",))
        counts = {r["lang"]: r["count"]
                  for r in out.groupBy("lang").count().collect()}
        # strata sizes: lang0=67, lang1=67, lang2=66
        assert counts == {"lang0": 17, "lang1": 17, "lang2": 17}

    def test_approx_is_subset_free_of_shuffle(self, spark, docs):
        out = sampling.stratified_sample(docs, 0.25, exact=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert 0 < out.count() < 200


class TestTokenBudget:
    def test_crossing_doc_is_kept(self, spark):
        df = spark.createDataFrame(
            [(1, "s", 0.9, 50), (2, "s", 0.8, 60), (3, "s", 0.7, 40)],
            "doc_id long, source string, q double, n_tokens int",
        )
        out = sampling.token_budget_take(
            df, budget=100, group_col="source",
            quality_col="q", token_col="n_tokens",
        )
        kept = sorted(r["doc_id"] for r in out.collect())
        # doc2 starts at 50 < 100 (kept, crosses the line); doc3
        # starts at 110 >= 100 (dropped)
        assert kept == [1, 2]

    def test_per_group_budgets_independent(self, spark, docs):
        out = sampling.token_budget_take(
            docs, budget=300, group_col="source",
            quality_col="n_tokens", token_col="n_tokens",
        )
        sums = {
            r["source"]: r["tok"]
            for r in out.groupBy("source")
            .agg(F.sum("n_tokens").alias("tok")).collect()
        }
        assert set(sums) == {"src0", "src1"}
        for tok in sums.values():
            # budget may be crossed by at most one document (<60 tokens)
            assert 300 <= tok < 360


class TestPrefixSum:
    def test_equals_naive_window(self, spark, docs):
        got = sampling.prefix_sum(
            docs, "n_tokens", order_by=("doc_id",), out_col="cum",
            num_partitions=8,
        )
        naive = docs.withColumn(
            "cum",
            F.sum("n_tokens").over(
                Window.orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        assert sorted((r["doc_id"], r["cum"]) for r in got.collect()) == \
               sorted((r["doc_id"], r["cum"]) for r in naive.collect())

    def test_no_single_task_window(self, spark, docs):
        got = sampling.prefix_sum(
            docs, "n_tokens", order_by=("doc_id",), num_partitions=8
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan.lower()
        # every Window node must be keyed (no global SinglePartition window)
        for line in plan.splitlines():
            if "Window [" in line:
                assert "__pid" in line


class TestPackSequences:
    def test_stream_layout_is_gapless(self, spark, docs):
        packed = sampling.pack_sequences(docs, seq_len=64).collect()
        total = sum(r["n_tokens"] for r in packed)
        # reconstruct stream positions: begin_seq*64 + begin_offset
        spans = sorted(
            (r["begin_seq"] * 64 + r["begin_offset"], r["n_tokens"], r)
            for r in packed
        )
        pos = 0
        for start, n, r in spans:
            assert start == pos  # gapless, no overlap
            end = start + n - 1
            assert r["end_seq"] == end // 64
            pos += n
        assert pos == total

    def test_deterministic_across_partitionings(self, spark, docs):
        a = sorted(map(tuple, sampling.pack_sequences(docs, 64).collect()))
        b = sorted(map(tuple, sampling.pack_sequences(
            docs.repartition(13), 64).collect()))
        assert a == b


class TestBestOfNAndPreferencePairs:
    @pytest.fixture(scope="class")
    def cands(self, spark):
        rows = [
            # group g1: scores 3.0, 5.0, 5.0 (tie broken by seq), 1.0
            ("g1", 0, "meh", 3.0),
            ("g1", 1, "best-low-seq", 5.0),
            ("g1", 2, "best-high-seq", 5.0),
            ("g1", 3, "worst", 1.0),
            # group g2: single candidate -> best_of_n yes, pairs no
            ("g2", 0, "only", 2.0),
            # group g3: margin below threshold when min_margin used
            ("g3", 0, "a", 2.0),
            ("g3", 1, "b", 1.5),
        ]
        return spark.createDataFrame(
            rows, "grp string, seq int, text string, score double"
        )

    def test_best_of_n_deterministic_ties(self, spark, cands):
        got = {
            r["grp"]: (r["text"], r["n_candidates"])
            for r in sampling.best_of_n(
                cands, ["grp"], score_col="score", tiebreak_cols=["seq"]
            ).collect()
        }
        assert got == {
            "g1": ("best-low-seq", 4),   # tie -> lowest seq wins
            "g2": ("only", 1),
            "g3": ("a", 2),
        }

    def test_preference_pairs_best_vs_worst(self, spark, cands):
        got = {
            r["grp"]: (r["chosen_text"], r["rejected_text"], r["margin"])
            for r in sampling.preference_pairs(
                cands, ["grp"], score_col="score", tiebreak_cols=["seq"]
            ).collect()
        }
        assert got["g1"] == ("best-low-seq", "worst", 4.0)
        assert "g2" not in got          # needs >= 2 candidates
        assert got["g3"] == ("a", "b", 0.5)

    def test_min_margin_filters(self, spark, cands):
        got = {
            r["grp"]
            for r in sampling.preference_pairs(
                cands, ["grp"], score_col="score", tiebreak_cols=["seq"],
                min_margin=1.0,
            ).collect()
        }
        assert got == {"g1"}

    def test_pairs_single_shuffle(self, spark, cands):
        plan = sampling.preference_pairs(
            cands, ["grp"], score_col="score", tiebreak_cols=["seq"]
        )._jdf.queryExecution().executedPlan().toString()
        # the groupBy must reuse the window's hash exchange
        assert plan.count("Exchange hashpartitioning") == 1

    def test_deterministic_across_partitionings(self, spark, cands):
        a = sorted(map(tuple, sampling.preference_pairs(
            cands, ["grp"], tiebreak_cols=["seq"]).collect()))
        b = sorted(map(tuple, sampling.preference_pairs(
            cands.repartition(7), ["grp"], tiebreak_cols=["seq"]).collect()))
        assert a == b
