"""Corpus data-card report (operators/report.py): multi-grain
GROUPING SETS summary, one scan."""

from __future__ import annotations

from jsonschema_spark.operators.report import corpus_report


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta", "en", "web"),
            (1, "alpha beta gamma delta epsilon zeta", "en", "web"),  # exact dup
            (2, "short text", "en", "books"),
            (3, "", "de", "web"),           # empty -> 0 tokens, short
            (4, None, "de", "books"),       # null -> 0 tokens, short
            (5, "eins zwei drei vier funf sechs sieben", "de", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )


def test_corpus_report_grains(spark):
    rows = {
        (r["section"], r["key"]): r
        for r in corpus_report(_docs(spark)).collect()
    }
    total = rows[("total", "*")]
    assert total["n_docs"] == 6
    # null text digests as the empty string: docs 3 and 4 are exact
    # duplicates of each other, docs 0 and 1 of each other
    assert total["distinct_texts"] == 4
    assert total["dup_docs"] == 2
    assert total["n_tokens"] == 6 + 6 + 2 + 0 + 0 + 7
    assert abs(total["pct_short"] - 3 / 6) < 1e-9  # docs 2,3,4 under 5 tokens

    web = rows[("source", "web")]
    assert (web["n_docs"], web["dup_docs"]) == (4, 1)
    books = rows[("source", "books")]
    assert (books["n_docs"], books["dup_docs"]) == (2, 0)

    en = rows[("lang", "en")]
    de = rows[("lang", "de")]
    assert (en["n_docs"], en["dup_docs"]) == (3, 1)
    assert (de["n_docs"], de["n_tokens"], de["dup_docs"]) == (3, 7, 1)

    # exactly 1 total + 2 sources + 2 langs
    assert len(rows) == 5


def test_corpus_report_single_scan(spark):
    plan = (
        corpus_report(_docs(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") == 1
    assert "Python" not in plan
    # grouping-sets Expand + two-phase distinct: bounded at 2 exchanges
    assert plan.count("Exchange") <= 2


def test_transcript_report(spark):
    import datetime as dt

    from jsonschema_spark.operators.report import transcript_report

    ts = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "hi", None, ts),
            ("c1", 1, "assistant", "hello!", None, ts),
            ("c1", 2, "tool", "result", "search", ts),
            ("c2", 0, "user", None, None, ts),
            ("c2", 1, "assistant", "ok", None, ts),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    rows = {
        (r["section"], r["key"]): r for r in transcript_report(df).collect()
    }
    total = rows[("total", "*")]
    assert (total["n_turns"], total["n_convs"]) == (5, 2)
    assert total["null_text_turns"] == 1
    assert total["n_chars"] == 2 + 6 + 6 + 0 + 2
    user = rows[("role", "user")]
    assert (user["n_turns"], user["n_convs"], user["null_text_turns"]) == (2, 2, 1)
    assert rows[("tool", "search")]["n_convs"] == 1
    assert rows[("tool", "(null)")]["n_turns"] == 4
    assert abs(rows[("role", "assistant")]["avg_chars"] - 4.0) < 1e-9

    plan = transcript_report(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1
    assert "Python" not in plan
    assert plan.count("Exchange") <= 2
