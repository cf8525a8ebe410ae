"""Vocabulary-induction operators: BPE training/segmentation, PMI
collocations, vocab growth, and the blocklist phrase matcher."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators import text as T
from jsonschema_spark.operators import vocab as V


def _reference_bpe(word_counts: dict[str, int], merges: int):
    """Driver-side model: classic BPE on a word-frequency dict with
    leftmost-greedy merge application and (count desc, left, right)
    tie-break."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    rules = []
    for _ in range(merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((left, right, left + right, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return rules, vocab


class TestBpe:
    def test_train_matches_reference_model(self, spark):
        texts = [
            "low lower lowest", "low low newer", "newer newest wider",
            "wide wider widest low", "new newer lowest",
        ]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        got = V.bpe_train(df, merges=6).collect()
        wc: dict[str, int] = {}
        for t in texts:
            for w in t.split():
                wc[w] = wc.get(w, 0) + 1
        exp, _ = _reference_bpe(wc, 6)
        assert [(r["left"], r["right"], r["merged"], r["pair_count"]) for r in got] == exp

    def test_overlapping_merge_is_leftmost_greedy(self, spark):
        # 'aaaa' under rule (a,a): leftmost pairs -> ['aa','aa'], never
        # a second-pass merge into 'aaaa' within the same rule round
        df = spark.createDataFrame([(1, "aaaa aaa")], "doc_id long, text string")
        rules = V.bpe_train(df, merges=1)
        r = rules.collect()[0]
        assert (r["left"], r["right"], r["pair_count"]) == ("a", "a", 5)
        seg = df.select(V.bpe_segment(F.col("text"), [("a", "a")]).alias("s")).collect()[0]["s"]
        assert seg == ["aa", "aa", "aa", "a"]

    def test_segment_respects_rule_order(self, spark):
        df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        out = df.select(
            V.bpe_segment(F.col("text"), [("a", "b"), ("ab", "c")]).alias("s")
        ).collect()[0]["s"]
        assert out == ["abc"]

    def test_empty_and_separator_words(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "a|b ok"), (3, "   ")], "doc_id long, text string"
        )
        seg = df.select(
            F.size(V.bpe_segment(F.col("text"), [("o", "k")])).alias("n")
        ).collect()
        # '' and '   ' -> 0 tokens; 'a|b' dropped, 'ok' merges to one
        assert sorted(r["n"] for r in seg) == [0, 0, 1]

    def test_train_batched_disjoint_rollforward(self, spark):
        """batch>1 (r5): per round only symbol-disjoint pairs are
        accepted (here every pair shares 'a' or 'b', so each round
        accepts exactly one) and a conflict-starved round rolls its
        budget forward — the run still trains until the vocab drains,
        and on this fixture the batched sequence equals sequential
        BPE."""
        df = spark.createDataFrame(
            [(1, "aa ab aa ab ba")], "doc_id long, text string"
        )
        k1 = [tuple(r) for r in V.bpe_train(df, merges=4, batch=1).collect()]
        k4 = [tuple(r) for r in V.bpe_train(df, merges=4, batch=4).collect()]
        assert k4 == k1 == [
            (1, "a", "a", "aa", 2),
            (2, "a", "b", "ab", 2),
            (3, "b", "a", "ba", 1),
        ]

    def test_train_batched_accepts_disjoint_in_one_round(self, spark):
        """Disjoint top pairs merge in the same round with exact
        pre-round counts."""
        df = spark.createDataFrame(
            [(1, "ab ab cd cd cd")], "doc_id long, text string"
        )
        rules = [tuple(r) for r in V.bpe_train(df, merges=2, batch=2).collect()]
        assert rules == [(1, "c", "d", "cd", 3), (2, "a", "b", "ab", 2)]

    def test_train_stops_when_exhausted(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        assert V.bpe_train(df, merges=5).count() == 0  # no 2-symbol words


class TestCollocations:
    def test_pmi_known_corpus(self, spark):
        # 'x y' always adjacent; 'p q' never
        df = spark.createDataFrame(
            [(1, "x y p"), (2, "x y q"), (3, "q x y"), (4, "p x y"), (5, "x y p")],
            "doc_id long, text string",
        )
        rows = V.collocations(df, min_count=5, top_k=5).collect()
        assert rows[0]["left"] == "x" and rows[0]["right"] == "y"
        assert rows[0]["c_ab"] == 5
        # N=15 tokens, M=10 bigrams, c_x=c_y=5 -> pmi=ln(5*225/(10*25))
        import math
        assert rows[0]["pmi"] == pytest.approx(round(math.log(4.5), 6))


class TestVocabGrowth:
    def test_counts_and_cumulative(self, spark):
        df = spark.createDataFrame(
            [(i, "alpha beta" if i % 2 == 0 else "alpha gamma") for i in range(40)],
            "doc_id long, text string",
        )
        rows = V.vocab_growth(df, buckets=4).orderBy("bucket").collect()
        assert sum(r["new_tokens"] for r in rows) == 3  # alpha/beta/gamma
        assert rows[-1]["vocab_size"] == 3
        assert rows[-1]["cum_tokens"] == sum(r["bucket_tokens"] for r in rows) == 80
        # cumulative is monotone
        for a, b in zip(rows, rows[1:]):
            assert b["vocab_size"] >= a["vocab_size"]


class TestBlocklist:
    def test_overlap_counting(self, spark):
        docs = spark.createDataFrame(
            [(1, "a a a b"), (2, "b a a"), (3, "c d")], "doc_id long, text string"
        )
        phrases = spark.createDataFrame([("a a",)], "phrase string")
        got = {
            (r["doc_id"], r["phrase"]): r["hits"]
            for r in T.blocklist_hits(docs, phrases).collect()
        }
        # overlapping starts both count: 'a a a' has 2
        assert got == {(1, "a a"): 2, (2, "a a"): 1}

    def test_multiword_and_boundary(self, spark):
        docs = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "quick brown")],
            "doc_id long, text string",
        )
        phrases = spark.createDataFrame(
            [("quick brown fox",), ("brown fox jumps",)], "phrase string"
        )
        got = [
            (r["doc_id"], r["phrase"], r["hits"])
            for r in T.blocklist_hits(docs, phrases).collect()
        ]
        assert got == [(1, "quick brown fox", 1)]

    def test_no_shuffle_before_match(self, spark):
        """Plan shape: the corpus side reaches the phrase join without
        an Exchange (candidate generation is broadcast); the only
        shuffle is the final hit-count aggregation."""
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
        )
        phrases = spark.createDataFrame([("b c",)], "phrase string")
        plan = T.blocklist_hits(docs, phrases)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_phrase_normalization(self, spark):
        """Mixed-case / extra-whitespace phrases match normalized text."""
        docs = spark.createDataFrame(
            [(1, "The Quick  Brown fox")], "doc_id long, text string"
        )
        phrases = spark.createDataFrame(
            [("Quick   BROWN",), ("",), ("   ",)], "phrase string"
        )
        got = T.blocklist_hits(docs, phrases).collect()
        assert len(got) == 1
        assert got[0]["phrase"] == "Quick   BROWN" and got[0]["hits"] == 1


class TestBpeProperty:
    """Property-based pin of bpe_train/bpe_segment against the
    driver-side reference model on randomized corpora.  One Spark job
    per example is expensive, so Hypothesis generates a BATCH of
    corpora and one parametrized loop runs them (the
    test_coerce_properties batching pattern)."""

    def test_randomized_corpora_match_reference(self, spark):
        import random

        rng = random.Random(20260821)
        alphabet = "abcdef"
        for case in range(6):
            n_docs = rng.randint(1, 6)
            texts = [
                " ".join(
                    "".join(
                        rng.choice(alphabet)
                        for _ in range(rng.randint(1, 6))
                    )
                    for _ in range(rng.randint(1, 8))
                )
                for _ in range(n_docs)
            ]
            merges = rng.randint(1, 8)
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(texts)],
                "doc_id long, text string",
            )
            got = [
                (r["left"], r["right"], r["merged"], r["pair_count"])
                for r in V.bpe_train(df, merges=merges).collect()
            ]
            wc: dict[str, int] = {}
            for t in texts:
                for w in t.split():
                    wc[w] = wc.get(w, 0) + 1
            exp_rules, exp_vocab = _reference_bpe(wc, merges)
            assert got == exp_rules, (case, texts, merges)
            # segmentation under the trained rules matches the model's
            # final symbolization, word by word
            rules = [(l, r) for l, r, _, _ in exp_rules]
            seg = {
                r["doc_id"]: r["s"]
                for r in df.select(
                    "doc_id", V.bpe_segment(F.col("text"), rules).alias("s")
                ).collect()
            }
            model_syms: dict[str, list[str]] = {}
            for syms, _ in exp_vocab.items():
                model_syms["".join(syms)] = list(syms)
            for i, t in enumerate(texts):
                exp_flat = [s for w in t.split() for s in model_syms[w]]
                assert seg[i] == exp_flat, (case, t)


    def test_long_phrase_fails_loudly(self, spark):
        """A phrase longer than max_phrase_words can never match the
        truncated context window — the call must refuse up front
        (r3 advice: it used to return silent false negatives)."""
        import pytest

        docs = spark.createDataFrame(
            [(1, "a b c d e f")], "doc_id long, text string"
        )
        phrases = spark.createDataFrame([("a b c d e",)], "phrase string")
        with pytest.raises(ValueError, match="max_phrase_words"):
            T.blocklist_hits(docs, phrases, max_phrase_words=4)
        # raising the knob makes the same phrase match
        got = [
            (r["doc_id"], r["phrase"], r["hits"])
            for r in T.blocklist_hits(
                docs, phrases, max_phrase_words=5
            ).collect()
        ]
        assert got == [(1, "a b c d e", 1)]
