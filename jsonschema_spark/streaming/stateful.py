"""Custom stateful streaming operator via applyInPandasWithState —
per-conversation running validation state over a transcript stream.

The windowed verdicts in streaming/validate.py cover time-bucketed
aggregation; this operator covers the KEYED-state shape the prompt's
streaming contract names (`applyInPandasWithState`): one state row per
conv_id tracking turn progress and violation counts, emitted every
trigger, evicted by processing-time timeout.

Scale: state is O(live conversations), one small struct per key;
shuffle is hash(conv_id); the timeout bounds state for abandoned
conversations.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_turns long, max_turn int, bad long"
OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, max_turn int, bad long, complete boolean"
)


def conversation_progress(
    annotated_stream: DataFrame,
    timeout_ms: int = 600_000,
) -> DataFrame:
    """``timeout_ms=0`` disables the idle-eviction timeout (then
    `complete` rows are never emitted and an availableNow drain
    terminates promptly — the batch-test mode)."""

    base = annotated_stream.select(
        "conv_id",
        "turn_idx",
        (F.size("violations") > 0).cast("long").alias("is_bad"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n, mx, bad = state.get
            state.remove()
            yield pd.DataFrame(
                [(conv_id, n, mx, bad, True)],
                columns=["conv_id", "n_turns", "max_turn", "bad", "complete"],
            )
            return
        n, mx, bad = state.get if state.exists else (0, -1, 0)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, int(pdf["turn_idx"].max()))
                bad += int(pdf["is_bad"].sum())
        state.update((n, mx, bad))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [(conv_id, n, mx, bad, False)],
            columns=["conv_id", "n_turns", "max_turn", "bad", "complete"],
        )

    return base.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms > 0
            else GroupStateTimeout.NoTimeout
        ),
    )


SEQ_STATE_SCHEMA = (
    "started boolean, last_turn int, last_ts double, last_role string, "
    "viol long, n_turns long"
)
SEQ_OUTPUT_SCHEMA = "conv_id string, n_turns long, viol long"


def conversation_sequence_state(
    stream: DataFrame,
    allowed_transitions=None,
    first_roles=None,
    first_index: int = 0,
    timeout_ms: int = 0,
) -> DataFrame:
    """Streaming sequence-integrity: the per-conversation FSM of
    operators/transcripts.conversation_integrity (turn contiguity, ts
    monotonicity, role transitions) carried ACROSS micro-batches as
    keyed state — each conversation's last (turn, ts, role) seeds the
    next batch's first comparison, so a violation spanning a batch
    boundary is still caught.  Emits running (n_turns, viol) per
    conversation every trigger.

    Per-batch work is vectorized pandas (shift + isin), never a Python
    row loop; state is one small row per live conversation; shuffle is
    hash(conv_id).  Rows inside a batch are ordered by (turn_idx, ts)
    before validation — the same total order the batch operator uses.
    """
    from jsonschema_spark.operators.transcripts import (
        DEFAULT_FIRST_ROLES,
        DEFAULT_TRANSITIONS,
    )

    if allowed_transitions is None:
        allowed_transitions = DEFAULT_TRANSITIONS
    if first_roles is None:
        first_roles = DEFAULT_FIRST_ROLES
    allowed = {f"{a}>{b}" for a, b in set(allowed_transitions)}
    firsts = set(first_roles)

    base = stream.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("role").alias("role"),
        F.col("ts").cast("timestamp").cast("double").alias("ts_s"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        started, last_turn, last_ts, last_role, viol, n_turns = (
            state.get
            if state.exists
            else (False, 0, float("nan"), None, 0, 0)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["turn_idx", "ts_s"], kind="mergesort")
            turns = pdf["turn_idx"].to_numpy()
            ts = pdf["ts_s"].to_numpy()
            roles = pdf["role"].astype(object).to_numpy()
            prev_turn = pd.Series(turns).shift(1).to_numpy()
            prev_ts = pd.Series(ts).shift(1).to_numpy()
            prev_role = pd.Series(roles).shift(1).to_numpy()
            if started:
                prev_turn[0], prev_ts[0], prev_role[0] = (
                    last_turn, last_ts, last_role,
                )
            pt = pd.to_numeric(pd.Series(prev_turn), errors="coerce")
            is_first = pt.isna().to_numpy()
            cont = ~is_first
            rl = pd.Series(roles, dtype=object)
            pr = pd.Series(prev_role, dtype=object)
            bad = int(((turns != first_index) & is_first).sum())
            bad += int(
                (
                    is_first
                    & rl.notna().to_numpy()
                    & ~rl.isin(firsts).to_numpy()
                ).sum()
            )
            bad += int((cont & (turns != (pt.to_numpy() + 1))).sum())
            pts = pd.to_numeric(pd.Series(prev_ts), errors="coerce").to_numpy()
            bad += int(
                (cont & ~pd.isna(pts) & ~pd.isna(ts) & (ts < pts)).sum()
            )
            pair_mask = cont & pr.notna().to_numpy() & rl.notna().to_numpy()
            pairs = pr.astype(str) + ">" + rl.astype(str)
            bad += int((pair_mask & ~pairs.isin(allowed).to_numpy()).sum())
            viol += bad
            n_turns += len(turns)
            started = True
            last_turn = int(turns[-1])
            last_ts = float(ts[-1])
            last_role = None if roles[-1] is None else str(roles[-1])
        state.update(
            (started, last_turn, last_ts, last_role, viol, n_turns)
        )
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [(conv_id, n_turns, viol)],
            columns=["conv_id", "n_turns", "viol"],
        )

    return base.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=SEQ_OUTPUT_SCHEMA,
        stateStructType=SEQ_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms > 0
            else GroupStateTimeout.NoTimeout
        ),
    )
