"""Corpus snapshot maintenance operators: snapshot diff and cascading
key purge (right-to-be-forgotten).  No reference analog — the
reference (seeadoog/jsonschema) is a per-document validator
(SURVEY.md §2.9); these are the table-lifecycle operators a validation
engine needs once it owns a corpus: detect what changed between two
snapshot versions (regression-test a pipeline rerun) and delete every
row reachable from a set of root keys across the FK chain, with an
auditable count per table.

Scale notes:

* ``snapshot_diff`` reduces each side to ``(keys..., row_hash)``
  BEFORE the join — the shuffle payload is the key plus one 32-byte
  digest regardless of row width, and the parquet scan prunes to
  exactly ``keys + compare_cols`` (column pruning is visible in
  ReadSchema).  The full-outer join shuffles both sides once, on the
  key; with both snapshots bucket-written on the key
  (``sources.tables.write_bucketed``) it plans with no Exchange at
  all.  There is no driver-side collection: output is the
  changed/added/removed row stream, proportional to the drift, not to
  the corpus.
* ``purge_cascade`` broadcasts the root forget-list (user-supplied,
  small by construction) so the first table scans once with a
  broadcast hash join and no shuffle.  DERIVED key sets (e.g. the
  orderkeys of purged orders) are re-joined as plain equi-joins with
  the join strategy left to AQE: at 100 TB a derived set can exceed
  the broadcast threshold and forcing a broadcast would OOM the
  executors, while AQE upgrades to broadcast automatically whenever
  the runtime size allows.  Each table is scanned exactly once; the
  per-table audit row comes from the same scan's partial aggregation
  (flag + count), never a second pass.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Unit separator: cannot appear in the printable testdata columns and
# keeps concat_ws unambiguous for mixed-width values.
_SEP = "\x1f"
# Distinct NULL sentinel so (NULL, "x") never hashes like ("x", NULL)
# or ("", "x") — coalesce AFTER the cast, per column.
_NULL = "\x00N"


def row_digest(cols: Sequence[str]) -> F.Column:
    """md5 of the null-sentineled, separator-joined string rendering of
    ``cols`` — deterministic and engine-replayable (DuckDB's md5 of the
    same rendering is byte-identical, which is what puts
    ``snapshot_diff`` under the value-hash oracle).  Keep float columns
    out of ``cols`` (string renderings of doubles are engine-specific);
    hash a scaled-integer form instead."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Classify every key across two corpus snapshots:
    ``added`` (key only in ``new``), ``removed`` (only in ``old``),
    ``changed`` (both, digest differs).  Unchanged keys are filtered
    out before the result leaves the join, so the output is the drift
    stream, not the corpus.

    Returns ``(keys..., status)``.
    """
    keys = list(keys)
    o = old.select(*keys, row_digest(compare_cols).alias("__h_old"))
    n = new.select(*keys, row_digest(compare_cols).alias("__h_new"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """One row per status with its count — the regression-gate form
    (assert added/removed/changed within tolerances after a rerun)."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))


class PurgeStep(NamedTuple):
    """One table in the cascade.

    ``key_col``  — the column matched against the incoming key set.
    ``emit_col`` — column whose values (from the PURGED rows) become
                   the key set for the NEXT step; None ends the chain.
    """

    table: str
    df: DataFrame
    key_col: str
    emit_col: str | None = None


def purge_cascade(
    steps: Sequence[PurgeStep],
    root_keys: DataFrame,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Cascading delete: purge rows of ``steps[0]`` whose ``key_col``
    is in ``root_keys`` (single column), then purge each subsequent
    step by the previous step's emitted keys (FK chain), e.g.
    forget(custkey) → customer → orders → lineitem.

    Returns ``(audit, kept)``: ``audit`` has one row per table with
    exact ``rows_before`` / ``rows_purged`` / ``rows_after`` counts
    (each table contributes from ONE scan: a join-flag plus a partial
    aggregation); ``kept`` maps table name → the retained DataFrame
    (write these back as the purged snapshot).

    The root key set is broadcast (it is the user's forget list);
    derived key sets deliberately are NOT force-broadcast — see the
    module docstring.
    """
    key_df = F.broadcast(root_keys.distinct())
    first = True
    audits = []
    kept: dict[str, DataFrame] = {}
    for step in steps:
        kcol = root_keys.columns[0] if first else "__purge_key"
        keyed = key_df.select(
            F.col(kcol).alias("__k"), F.lit(True).alias("__hit")
        )
        flagged = step.df.join(
            keyed, step.df[step.key_col] == keyed["__k"], "left"
        )
        purged_flag = F.col("__hit").isNotNull()
        audits.append(
            flagged.agg(
                F.lit(step.table).alias("table"),
                F.count("*").alias("rows_before"),
                F.sum(purged_flag.cast("long")).alias("rows_purged"),
            )
        )
        kept[step.table] = flagged.filter(~purged_flag).drop(
            "__k", "__hit"
        )
        if step.emit_col is not None:
            key_df = (
                flagged.filter(purged_flag)
                .select(F.col(step.emit_col).alias("__purge_key"))
                .distinct()
            )
        first = False
    audit = audits[0]
    for a in audits[1:]:
        audit = audit.unionByName(a)
    return (
        audit.select(
            "table",
            "rows_before",
            F.coalesce(F.col("rows_purged"), F.lit(0)).alias(
                "rows_purged"
            ),
            (
                F.col("rows_before")
                - F.coalesce(F.col("rows_purged"), F.lit(0))
            ).alias("rows_after"),
        ),
        kept,
    )
