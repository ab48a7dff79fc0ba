"""Snapshot reconciliation: what changed between two versions of a table.

The nightly question every warehouse asks — "what did today's load add,
drop, or mutate vs yesterday?" — as one distributed plan: a full outer
join on the business key plus null-safe column comparison. No row hashes
travel anywhere (hashing is a lossy shortcut that can't name WHICH column
changed); the comparison is a per-column ``<=>`` disjunction that Catalyst
codegens inline.

Scale shape: one shuffle per side on the key — and zero shuffles if both
snapshots are written bucketed by the key (sinks.py::write_bucketed),
which is how a 100 TB nightly diff should store its inputs. Output is
narrow (key + change_type + changed column names), so downstream
aggregation is cheap.

Reference parity: the reference reconciles nothing (append-only loads,
load_to_postgres.py); this extends its keyed-upsert sink (S6) with the
audit view a mutable pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    *,
    keep_unchanged: bool = False,
) -> DataFrame:
    """Classify every key as added / removed / changed (/ unchanged).

    Returns ``keys..., change_type, changed_cols`` where ``changed_cols``
    is a sorted array of the differing column names (empty unless
    ``change_type == 'changed'``). Null-safe throughout: a column moving
    NULL→value or value→NULL counts as a change.
    """
    # presence flags are literal markers on each side — a present row whose
    # compare columns are all NULL must still count as present
    o = old.select(*keys, *compare_cols).withColumn("__present_o", F.lit(1))
    n = new.select(*keys, *compare_cols).withColumn("__present_n", F.lit(1))
    joined = o.alias("o").join(n.alias("n"), on=keys, how="full_outer")
    changed_cols = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change_type = (
        F.when(F.col("o.__present_o").isNull(), F.lit("added"))
        .when(F.col("n.__present_n").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *keys,
        change_type.alias("change_type"),
        F.when(change_type == "changed", changed_cols)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    if not keep_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out
