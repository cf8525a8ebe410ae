"""Sketch/statistic operators that need the grouped-pandas (UDAF)
surface — the engine's `applyInPandas` pattern (SURVEY §2.9: "grouped
pandas UDFs (UDAF-like, e.g. KS statistic per partition)").

The default drift path (operators.checks.Drift) uses
``percentile_approx`` sketches — mergeable, tiny shuffle, the 100 TB
default.  ``ks_grouped`` here is the exact alternative: per partition
group, the full two-sample Kolmogorov-Smirnov statistic against a
driver-provided baseline sample, computed in one Arrow batch per
group.  Use when groups are bounded (10^5-10^6 rows) and exactness
matters more than a second pass.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KS_SCHEMA = "partition_id string, n long, ks double, drifted boolean"


def two_sample_ks(a: np.ndarray, b: np.ndarray) -> float:
    """Exact two-sample KS statistic (max CDF gap), O(n log n)."""
    a = np.sort(a[~np.isnan(a)])
    b = np.sort(b[~np.isnan(b)])
    if len(a) == 0 or len(b) == 0:
        return 0.0
    grid = np.concatenate([a, b])
    ca = np.searchsorted(a, grid, side="right") / len(a)
    cb = np.searchsorted(b, grid, side="right") / len(b)
    return float(np.max(np.abs(ca - cb)))


def ks_grouped(
    df: DataFrame,
    baseline: DataFrame,
    column: str,
    partition_by: Sequence[str] | None = None,
    threshold: float = 0.2,
    baseline_sample: int = 100_000,
) -> DataFrame:
    """Per-partition exact KS vs a baseline sample.

    The baseline collapses to a driver-side sample (bounded by
    ``baseline_sample``) serialized into the UDF closure — broadcast
    once per executor; the grouped current-side data arrives as one
    Arrow batch per partition group.
    """
    base_vals = np.array(
        [
            r[0]
            for r in baseline.select(F.col(column).cast("double"))
            .dropna()
            .limit(baseline_sample)
            .collect()
        ],
        dtype="float64",
    )

    from .checks import _partition_id

    keyed = df.select(
        _partition_id(partition_by).alias("partition_id"),
        F.col(column).cast("double").alias("v"),
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        ks = two_sample_ks(pdf["v"].to_numpy(dtype="float64"), base_vals)
        return pd.DataFrame(
            {
                "partition_id": [pdf["partition_id"].iloc[0]],
                "n": [len(pdf)],
                "ks": [round(ks, 6)],
                "drifted": [ks > threshold],
            }
        )

    return keyed.groupBy("partition_id").applyInPandas(per_group, KS_SCHEMA)
