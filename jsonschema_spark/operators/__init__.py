"""Table-level operators: checks (stats/uniqueness/RI/drift), dedup,
similarity search, text analysis, multimodal plumbing."""

from .checks import (
    Check,
    CheckSuite,
    ColumnStats,
    Drift,
    ReferentialIntegrity,
    SchemaCheck,
    Uniqueness,
)

from . import dedup, multimodal, order, similarity, sketches, skew, text  # noqa: E402,F401

__all__ = [
    "Check",
    "CheckSuite",
    "ColumnStats",
    "Drift",
    "ReferentialIntegrity",
    "SchemaCheck",
    "Uniqueness",
    "dedup",
    "multimodal",
    "order",
    "similarity",
    "sketches",
    "skew",
    "text",
]
