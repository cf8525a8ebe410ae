"""Conversation-transcript sequence operators
(jsonschema_spark/operators/transcripts.py): integrity FSM, rollup,
skew-safe conversation text, conversation-level dedup, and the
SequenceIntegrity Check surface."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from jsonschema_spark.operators import transcripts
from jsonschema_spark.operators.transcripts import (
    SequenceIntegrity,
    conversation_dedup_pairs,
    conversation_integrity,
    conversation_rollup,
    conversation_text,
)


def rows(df, *order):
    if order:
        df = df.orderBy(*order)
    return [tuple(r) for r in df.collect()]


def _ts(m):
    return dt.datetime(2026, 1, 1, 12, m, 0)


def _corpus(spark):
    # c1: clean conversation.  c2: turn gap + duplicate turn, ts
    # regression, illegal transition (user after user) and a bad
    # opening role.
    data = [
        # conv, turn, role, text, tool, ts
        ("c1", 0, "user", "hi", None, _ts(0)),
        ("c1", 1, "assistant", "hello", None, _ts(1)),
        ("c1", 2, "tool", "result", "search", _ts(2)),
        ("c1", 3, "assistant", "done", None, _ts(3)),
        ("c2", 1, "assistant", "a", None, _ts(0)),  # opens at 1, bad role
        ("c2", 3, "user", "b", None, _ts(1)),       # gap 1->3
        ("c2", 3, "user", "c", None, _ts(0)),       # dup turn + ts regress + user>user
    ]
    return spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )


def test_integrity_violations(spark):
    out = conversation_integrity(
        _corpus(spark), order_by=("turn_idx", "text")
    )
    got = rows(out, "conv_id", "turn_idx", "check", "info")
    assert all(r[0] == "c2" for r in got), "clean conversation must be silent"
    kinds = {(r[1], r[2]) for r in got}
    assert (1, "turn_sequence") in kinds      # first turn is 1
    assert (1, "role_transition") in kinds    # opens with assistant
    assert (3, "turn_sequence") in kinds      # gap and duplicate
    assert (3, "ts_monotonic") in kinds       # ts regresses
    infos = {r[3] for r in got}
    assert "first turn index is 1 , expected 0" in infos
    assert "turn index 3 follows 1" in infos
    assert "turn index 3 follows 3" in infos
    assert "role user cannot follow user" in infos
    assert "conversation opens with role assistant" in infos


def test_integrity_single_shuffle(spark):
    out = conversation_integrity(
        _corpus(spark), order_by=("turn_idx", "text")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "PythonUDF" not in plan


def test_sequence_integrity_check_matches_violations(spark):
    df = _corpus(spark).withColumn(
        "day", F.to_date("ts")
    )
    chk = SequenceIntegrity(
        order_by=("turn_idx", "text"), partition_by=["day"]
    )
    verd = rows(chk.verdicts(df), "partition_id")
    viol = chk.violations(df).count()
    assert len(verd) == 1
    pid, name, ok, n, metrics = verd[0]
    assert pid == "day=2026-01-01"
    assert name == "sequence_integrity"
    assert ok is False and n == viol and n >= 5
    assert metrics["rows"] == "7"


def test_sequence_integrity_clean_passes(spark):
    clean = _corpus(spark).filter(F.col("conv_id") == "c1")
    verd = rows(SequenceIntegrity(order_by=("turn_idx", "text")).verdicts(clean))
    assert len(verd) == 1
    assert verd[0][2] is True and verd[0][3] == 0


def test_conversation_text_ordered_and_skew_safe(spark):
    df = _corpus(spark)
    out = rows(conversation_text(df, order_by=("turn_idx", "text")), "conv_id")
    assert out[0] == ("c1", "hi hello result done")
    # c2 ordered by (turn_idx, text): b(3) before c(3) -> "a b c"
    assert out[1] == ("c2", "a b c")


def test_conversation_rollup(spark):
    out = {r[0]: r for r in rows(conversation_rollup(_corpus(spark)))}
    c1 = out["c1"]
    # conv_id, n_turns, first, last, n_roles, n_tool_calls, n_chars,
    # duration_sec, contiguous
    assert c1[1:] == (4, 0, 3, 3, 1, 17, 180, True)
    c2 = out["c2"]
    assert c2[1] == 3 and c2[2] == 1 and c2[3] == 3
    # span == count (the dup and the gap cancel): the flag is contiguity
    # GIVEN uniqueness — duplicate turn detection is Uniqueness' job
    assert c2[8] is True
    only_gap = rows(
        conversation_rollup(
            _corpus(spark).filter(F.col("text") != "c")
        )
    )
    c2g = [r for r in only_gap if r[0] == "c2"][0]
    assert c2g[8] is False  # turns {1,3}: span 3 != count 2


def test_conversation_dedup_finds_near_dup_conversations(spark):
    base = "the quick brown fox jumps over the lazy dog. " * 4
    rows_in = []
    for conv, text in (
        ("a", base + "tail one."),
        ("b", base + "tail two."),
        ("c", "completely different content about spark plans. " * 5),
    ):
        for i, part in enumerate(text.split(". ")):
            rows_in.append((conv, i, part))
    df = spark.createDataFrame(
        rows_in, "conv_id string, turn_idx int, text string"
    )
    pairs = rows(conversation_dedup_pairs(df, k=16, bands=4, threshold=0.5))
    assert [(p[0], p[1]) for p in pairs] == [("a", "b")]


def test_default_transitions_frozen():
    assert ("user", "assistant") in transcripts.DEFAULT_TRANSITIONS
    assert ("user", "user") not in transcripts.DEFAULT_TRANSITIONS


def _runs_corpus(spark):
    # c1: user,user,assistant,assistant,assistant,tool,assistant —
    # chunked same-role runs with a tool call in the middle.
    data = [
        ("c1", 0, "user", "hi", None, _ts(0)),
        ("c1", 1, "user", "are you there", None, _ts(1)),
        ("c1", 2, "assistant", "yes", None, _ts(2)),
        ("c1", 3, "assistant", "how can I help", None, _ts(3)),
        ("c1", 4, "assistant", "today", None, _ts(4)),
        ("c1", 5, "tool", "result 42", "calc", _ts(5)),
        ("c1", 6, "assistant", "answer is 42", None, _ts(6)),
        ("c2", 0, "user", "lonely", None, _ts(0)),
    ]
    return spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )


def test_merge_consecutive_turns(spark):
    out = transcripts.merge_consecutive_turns(_runs_corpus(spark))
    got = rows(out, "conv_id", "turn_idx")
    assert got == [
        ("c1", 0, "user", "hi\nare you there", None, _ts(0), 2),
        ("c1", 1, "assistant", "yes\nhow can I help\ntoday", None, _ts(2), 3),
        ("c1", 2, "tool", "result 42", "calc", _ts(5), 1),
        ("c1", 3, "assistant", "answer is 42", None, _ts(6), 1),
        ("c2", 0, "user", "lonely", None, _ts(0), 1),
    ]
    # merged output is FSM-clean: no same-role transitions remain
    viol = conversation_integrity(
        out.withColumn("seq", F.col("turn_idx")), order_by=("turn_idx", "seq")
    )
    assert (
        viol.where(F.col("check") == "role_transition")
        .where(F.col("info").contains("cannot follow"))
        .count()
        == 0
    )


def test_merge_consecutive_turns_no_tool_no_ts(spark):
    out = transcripts.merge_consecutive_turns(
        _runs_corpus(spark), tool_col=None, ts_col=None, order_by=("turn_idx",)
    )
    assert out.columns == ["conv_id", "turn_idx", "role", "text", "n_merged"]
    assert out.count() == 5


def test_context_windows_budget_suffix(spark):
    out = transcripts.context_windows(
        _runs_corpus(spark), budget=6, target_role="assistant"
    )
    got = {
        (r.conv_id, r.turn_idx): (
            r.n_ctx_turns, r.ctx_tokens, r.context, r.target_text
        )
        for r in out.collect()
    }
    # history is the longest affordable suffix of prior turns
    assert got[("c1", 2)] == (
        2, 4, "user: hi\nuser: are you there", "yes"
    )
    assert got[("c1", 3)] == (
        3, 5, "user: hi\nuser: are you there\nassistant: yes",
        "how can I help",
    )
    # budget 6 cannot afford "how can I help" (4 tokens) plus older
    assert got[("c1", 4)] == (
        2, 5, "assistant: yes\nassistant: how can I help", "today"
    )
    assert got[("c1", 6)] == (
        2, 3, "assistant: today\ntool: result 42", "answer is 42"
    )
    # no user/tool targets, and no zero-history first-turn targets here
    assert set(got) == {("c1", 2), ("c1", 3), ("c1", 4), ("c1", 6)}


def test_context_windows_zero_budget_and_first_turn(spark):
    data = [
        ("c3", 0, "assistant", "opening", None, _ts(0)),
        ("c3", 1, "user", "q", None, _ts(1)),
        ("c3", 2, "assistant", "a b c", None, _ts(2)),
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    out = transcripts.context_windows(df, budget=0, target_role="assistant")
    got = {
        (r.conv_id, r.turn_idx): (r.n_ctx_turns, r.ctx_tokens, r.context)
        for r in out.collect()
    }
    # first-turn target exists with empty history; zero budget affords
    # no history anywhere
    assert got[("c3", 0)] == (0, 0, "")
    assert got[("c3", 2)] == (0, 0, "")


def test_render_chat_tagged_ordered(spark):
    from jsonschema_spark.operators.transcripts import render_chat

    out = {
        r["conv_id"]: r
        for r in render_chat(_corpus(spark), order_by=("turn_idx", "text")).collect()
    }
    c1 = out["c1"]
    assert c1["text"] == (
        "<|user|>hi<|eot|><|assistant|>hello<|eot|>"
        "<|tool:search|>result<|eot|><|assistant|>done<|eot|>"
    )
    assert c1["n_turns"] == 4
    assert c1["n_chars"] == len(c1["text"])
    # c2: duplicate turn 3 tie-broken by text ('b' before 'c')
    assert out["c2"]["text"] == (
        "<|assistant|>a<|eot|><|user|>b<|eot|><|user|>c<|eot|>"
    )


def test_render_chat_null_text_renders_empty(spark):
    from jsonschema_spark.operators.transcripts import render_chat

    df = spark.createDataFrame(
        [("c1", 0, "user", None, None, _ts(0))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    [r] = render_chat(df).collect()
    assert r["text"] == "<|user|><|eot|>"
    assert r["n_chars"] == len("<|user|><|eot|>")


def test_chunk_documents_overlap_and_tail(spark):
    from jsonschema_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, ""), (2, None), (3, "x")],
        "doc_id long, text string",
    )
    got = rows(
        chunk_documents(df, size=4, stride=3), "doc_id", "chunk_idx"
    )
    assert got == [
        (0, 0, 4, "a b c d"),
        (0, 1, 4, "d e f g"),
        (0, 2, 1, "g"),
        (3, 0, 1, "x"),
    ]


def test_chunk_documents_plan_map_only(spark):
    from jsonschema_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(df, size=2, stride=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1


def test_sft_mask_spans_align_with_render(spark):
    from jsonschema_spark.operators.transcripts import (
        render_chat,
        sft_mask_spans,
    )

    corpus = _corpus(spark)
    rendered = {
        r["conv_id"]: r["text"]
        for r in render_chat(corpus, order_by=("turn_idx", "text")).collect()
    }
    spans = sft_mask_spans(corpus, order_by=("turn_idx", "text")).collect()
    # every span slices exactly one rendered assistant part
    for s in spans:
        piece = rendered[s["conv_id"]][s["start_char"]:s["end_char"]]
        assert piece.startswith("<|assistant|>") and piece.endswith("<|eot|>")
    c1 = sorted(
        [s for s in spans if s["conv_id"] == "c1"], key=lambda s: s["span_idx"]
    )
    assert [(s["span_idx"], s["turn_idx"]) for s in c1] == [(0, 1), (1, 3)]
    assert rendered["c1"][c1[0]["start_char"]:c1[0]["end_char"]] == (
        "<|assistant|>hello<|eot|>"
    )
    assert rendered["c1"][c1[1]["start_char"]:c1[1]["end_char"]] == (
        "<|assistant|>done<|eot|>"
    )


def test_sft_mask_spans_text_only_and_empty(spark):
    from jsonschema_spark.operators.transcripts import (
        render_chat,
        sft_mask_spans,
    )

    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "hi", None, _ts(0)),
            ("c1", 1, "assistant", "yes", None, _ts(1)),
            ("c1", 2, "assistant", None, None, _ts(2)),  # empty payload
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    text = render_chat(df).collect()[0]["text"]
    got = rows(sft_mask_spans(df, include_tags=False), "span_idx")
    # payload-only spans: exactly the message text; empty turn -> zero-width
    assert [
        (s, text[st:en]) for (_c, s, _t, _r, st, en) in got
    ] == [(0, "yes"), (1, "")]


def test_sft_mask_spans_plan_single_exchange(spark):
    from jsonschema_spark.operators.transcripts import sft_mask_spans

    df = spark.createDataFrame(
        [("c1", 0, "assistant", "x", None, _ts(0))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    plan = (
        sft_mask_spans(df)._jdf.queryExecution().executedPlan().toString()
    )
    # one conv_id shuffle feeds both windows; no Python, no fold
    assert plan.count("Exchange") == 1
    assert "Python" not in plan


class TestToolLoops:
    def test_runs_and_breaks(self, spark):
        from jsonschema_spark.operators.transcripts import tool_loops

        rows = [
            # conv A: search x3 (loop), user break, search x1 + fetch x2
            ("A", 0, "user", None),
            ("A", 1, "assistant", "search"),
            ("A", 2, "tool", "search"),
            ("A", 3, "tool", "search"),
            ("A", 4, "user", None),
            ("A", 5, "tool", "search"),
            ("A", 6, "tool", "fetch"),
            ("A", 7, "tool", "fetch"),
            # conv B: alternation, no same-tool run
            ("B", 0, "tool", "a"),
            ("B", 1, "tool", "b"),
            ("B", 2, "tool", "a"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, tool string"
        )
        got = {
            (r["conv_id"], r["tool"], r["run_start"]): r["run_len"]
            for r in tool_loops(df, min_run=2).collect()
        }
        # the user turn at 4 breaks the search run even though the
        # tool name repeats right after
        assert got == {("A", "search", 1): 3, ("A", "fetch", 6): 2}

    def test_min_run_filter(self, spark):
        from jsonschema_spark.operators.transcripts import tool_loops

        df = spark.createDataFrame(
            [("C", 0, "tool", "x"), ("C", 1, "tool", "x"), ("C", 2, "tool", "x")],
            "conv_id string, turn_idx int, role string, tool string",
        )
        assert tool_loops(df, min_run=4).count() == 0
        assert tool_loops(df, min_run=3).collect()[0]["run_len"] == 3


class TestToolLatency:
    def test_adjacent_pairs_only(self, spark):
        import datetime

        from jsonschema_spark.operators.transcripts import tool_latency

        t0 = datetime.datetime(2026, 1, 1)
        ms = lambda k: t0 + datetime.timedelta(milliseconds=k)
        rows = [
            ("A", 0, "assistant", "search", ms(0)),
            ("A", 1, "tool", "search", ms(250)),     # pair: 250ms
            ("A", 2, "assistant", "fetch", ms(300)),
            ("A", 3, "user", None, ms(400)),         # fetch never answered
            ("A", 4, "tool", "fetch", ms(900)),      # prev is user -> no pair
            ("B", 0, "assistant", "search", ms(0)),
            ("B", 1, "tool", "search", ms(750)),     # pair: 750ms
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, tool string, ts timestamp",
        )
        got = {r["tool"]: r for r in tool_latency(df).collect()}
        assert set(got) == {"search"}
        s = got["search"]
        assert s["n_pairs"] == 2
        assert s["mean_us"] == 500000.0
        assert s["p50_us"] == 500000.0  # interpolated midpoint
        assert s["max_us"] == 750000
