"""Single-pass data profiling for corpus/table quality audits.

Before a 100 TB training run, every input table gets profiled: per-column
null counts, distinct cardinalities, and value ranges drive schema checks,
skew planning (a join key with 3 distinct values needs a different
strategy than one with 3 billion), and data-quality gates. The naive
form — one ``SELECT count(distinct c) FROM t`` per column — scans the
table N times; this operator computes every column's stats in ONE scan.

Multiple ``count(distinct ...)`` aggregates in a single ``agg`` compile to
Catalyst's Expand-based rewrite (one pass over the data, one shuffle whose
rows are tagged per-aggregate), which is exactly the plan a hand-written
multi-scan union would need N of. Min/max travel as strings so mixed
column types share one long-format output schema; numeric columns are
profiled on exact integer units chosen by the caller (the engine-wide
cross-engine determinism convention — see queries.py).

Reference parity: the reference profiles nothing; this is a
driver-mandated training-pipeline extension. Closest analogue is its
row-count logging after each load (load_to_postgres.py), which the
``n_rows`` column subsumes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, specs: list[tuple[str, Column]]) -> DataFrame:
    """Profile the given (name, expression) columns in one table scan.

    Returns one row per spec: ``column, n_rows, n_nulls, n_distinct,
    min_s, max_s`` (min/max as strings; NULL on all-null columns).
    Expressions should be orderable scalars — for doubles pass exact
    integer units, for timestamps a formatted string.
    """
    if not specs:
        raise ValueError("need at least one column spec")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, col in specs:
        aggs += [
            F.count(F.when(col.isNull(), F.lit(1))).alias(f"{name}__nulls"),
            F.count_distinct(col).alias(f"{name}__distinct"),
            F.min(col).cast("string").alias(f"{name}__min"),
            F.max(col).cast("string").alias(f"{name}__max"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("column"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{name}__nulls").alias("n_nulls"),
                F.col(f"{name}__distinct").alias("n_distinct"),
                F.col(f"{name}__min").alias("min_s"),
                F.col(f"{name}__max").alias("max_s"),
            )
            for name, _ in specs
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")
