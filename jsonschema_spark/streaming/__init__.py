"""Structured Streaming validation: stateless plan annotation,
watermarked windowed verdicts, bounded-state dedup, and
applyInPandasWithState conversation tracking."""

from .validate import (
    annotate_stream,
    bounded_state_partitions,
    stateful_dedup_stream,
    violation_rate_alert,
    windowed_verdicts,
)

__all__ = [
    "annotate_stream",
    "bounded_state_partitions",
    "stateful_dedup_stream",
    "violation_rate_alert",
    "windowed_verdicts",
]
