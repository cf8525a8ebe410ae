"""Property-based alignment check: for ANY corpus, every
sft_mask_spans span must slice its conversation's render_chat string
to exactly the rendered turn part (tag fidelity, unicode lengths,
duplicate order keys, null text/tool)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from jsonschema_spark.operators.transcripts import render_chat, sft_mask_spans

_text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), blacklist_characters="\x00"
        ),
        max_size=12,
    ),
)
_turn = st.tuples(
    st.sampled_from(["c1", "c2"]),               # conv_id
    st.integers(min_value=0, max_value=5),        # turn_idx (dups allowed)
    st.sampled_from(["system", "user", "assistant", "tool"]),
    _text,                                        # text
    st.one_of(st.none(), st.sampled_from(["search", "exec"])),  # tool
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_turn, min_size=1, max_size=12))
def test_spans_slice_rendered_parts(spark, turns):
    # seq disambiguates duplicate (conv, turn_idx) pairs
    rows = [
        (c, t, role, text, tool, i) for i, (c, t, role, text, tool) in enumerate(turns)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, seq int",
    )
    rendered = {
        r["conv_id"]: r
        for r in render_chat(df, order_by=("turn_idx", "seq")).collect()
    }
    spans = sft_mask_spans(df, order_by=("turn_idx", "seq")).collect()

    n_assistant = sum(1 for r in rows if r[2] == "assistant")
    assert len(spans) == n_assistant
    for s in spans:
        conv = rendered[s["conv_id"]]
        piece = conv["text"][s["start_char"]:s["end_char"]]
        assert piece.startswith("<|assistant")
        assert piece.endswith("<|eot|>")
        assert 0 <= s["start_char"] < s["end_char"] <= conv["n_chars"]
    # whole render is the concatenation of ALL turn parts: n_chars
    # equals the sum of per-turn part lengths
    for conv_id, conv in rendered.items():
        expect = sum(
            len("<|%s%s|>%s<|eot|>" % (role, ":" + tool if tool else "", text or ""))
            for (c, _t, role, text, tool, _i) in rows
            if c == conv_id
        )
        assert conv["n_chars"] == expect
