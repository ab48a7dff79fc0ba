"""Incremental materialized-view maintenance (counting algorithm).

Maintains a grouped aggregate view under a change batch WITHOUT
recomputing from the base table: each insert contributes (+1, +measure),
each delete (−1, −measure); the deltas collapse to one row per touched
group, merge into the prior view state by a union + re-aggregate, and
groups whose maintained row count reaches zero disappear — Gupta &
Mumick's counting algorithm for incremental view maintenance,
re-expressed as two Spark aggregations.

Reference parity: none (the reference recomputes its daily recap from
scratch each DAG run — `dags/transform_raw_weather.py` re-reads the day);
this is the engine's scale path for keeping derived aggregates fresh.

Scale notes (100 TB): the delta aggregation is sized by the CHANGE batch,
not the base table; the merge shuffles |view ∪ touched-groups| rows —
both partial-aggregate map-side before the shuffle. Maintained sums must
be EXACT under addition and subtraction, so money-like doubles are
carried as integer units (cents) in the view state and divided back only
at presentation time — float sums would drift from the recompute answer
after enough +x/−x churn.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delta_agg(
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    count_col: str = "n_rows",
    measures: dict[str, Column] | None = None,
) -> DataFrame:
    """Collapse a change batch (``op_col`` ∈ {'I','D'}) to per-group
    deltas: signed row count plus signed sums of each measure expression.
    Measure expressions should yield exact (integer-unit) values."""
    sign = F.when(F.col(op_col) == "D", F.lit(-1)).otherwise(F.lit(1))
    aggs = [F.sum(sign).cast("bigint").alias(count_col)]
    for name, expr in (measures or {}).items():
        aggs.append(F.sum(sign.cast("bigint") * expr).cast("bigint").alias(name))
    return changes.groupBy(*keys).agg(*aggs)


def merge_view(
    view: DataFrame,
    delta: DataFrame,
    keys: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Merge per-group deltas into the maintained view state: union the
    two states and re-aggregate (sums of counts and of every measure
    column), dropping groups whose maintained count reaches zero. A
    union + groupBy rather than a full-outer join: one shuffle, no
    null-handling asymmetry, and partial aggregation halves the traffic."""
    measure_cols = [c for c in view.columns if c not in keys]
    merged = view.unionByName(delta.select(*view.columns))
    aggs = [F.sum(c).cast("bigint").alias(c) for c in measure_cols]
    return (
        merged.groupBy(*keys).agg(*aggs).where(F.col(count_col) > 0)
    )


def build_agg_view(
    base: DataFrame,
    keys: list[str],
    count_col: str = "n_rows",
    measures: dict[str, Column] | None = None,
) -> DataFrame:
    """Initial view state from the base table (the one full scan the
    incremental path avoids from then on)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias(count_col)]
    for name, expr in (measures or {}).items():
        aggs.append(F.sum(expr).cast("bigint").alias(name))
    return base.groupBy(*keys).agg(*aggs)
