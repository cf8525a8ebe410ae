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
