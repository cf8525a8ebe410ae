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

__all__ = [
    "Check",
    "CheckSuite",
    "ColumnStats",
    "Drift",
    "ReferentialIntegrity",
    "SchemaCheck",
    "Uniqueness",
]
