"""Single-pass data profiling for corpus/table quality audits.

Before a 100 TB training run, every input table gets profiled: per-column
null counts, distinct cardinalities, and value ranges drive schema checks,
skew planning (a join key with 3 distinct values needs a different
strategy than one with 3 billion), and data-quality gates. The naive
form — one ``SELECT count(distinct c) FROM t`` per column — scans the
table N times; this operator computes every column's stats in ONE scan.

Physical shape (chosen by measurement, 4× over the naive form): N
``count(distinct)`` aggregates in one ``agg`` compile to Catalyst's
Expand rewrite, but ``first()``/string-buffered min/max force
SortAggregate — two full sorts of the (N+1)× expanded WIDE rows. At 100
TB that sort is the whole job. Instead: (a) null counts + typed min/max
in one plain aggregate (no Expand, no distinct), and (b) distinct
cardinalities via ``posexplode`` to narrow ``(gid, value)`` pairs →
two-level HASH aggregation (string group KEYS hash fine; the pairs
collapse map-side). The two tiny results (N rows each) meet in a
broadcast join. Min/max compare on the TYPED column and only cast to
string for the long-format output schema; numeric columns are profiled
on exact integer units chosen by the caller (the engine-wide
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
            F.min(col).cast("string").alias(f"{name}__min"),
            F.max(col).cast("string").alias(f"{name}__max"),
        ]
    one = df.agg(*aggs)
    # exact distinct per column: narrow (gid, value) pairs, two hash aggs.
    # The string cast is for a shared pair schema only — injective per
    # column EXCEPT for float/double signed zeros: -0.0 and 0.0 are one
    # group to a typed count_distinct (Spark normalizes -0.0 in grouping
    # keys) but two strings, so float-typed expressions are canonicalized
    # with `+ 0.0` first (-0.0 + 0.0 == 0.0; every other value, NaN
    # included, is unchanged — all NaN payloads already cast to one "NaN"
    # string). count(distinct) ignores nulls.
    def _canon(c: Column) -> Column:
        dt = df.select(c).schema[0].dataType.simpleString()
        return c + F.lit(0.0) if dt in ("float", "double") else c

    pairs = df.select(
        F.posexplode(
            F.array(*[_canon(c).cast("string") for _, c in specs])
        ).alias("gid", "v")
    )
    dist = (
        pairs.where(F.col("v").isNotNull())
        .groupBy("gid", "v")
        .agg(F.lit(1))
        .groupBy("gid")
        .agg(F.count(F.lit(1)).alias("__nd"))
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("gid"),
                F.lit(name).alias("column"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{name}__nulls").alias("n_nulls"),
                F.col(f"{name}__min").alias("min_s"),
                F.col(f"{name}__max").alias("max_s"),
            )
            for i, (name, _) in enumerate(specs)
        ]
    )
    wide = one.select(F.explode(rows).alias("p")).select("p.*")
    return wide.join(F.broadcast(dist), "gid", "left").select(
        "column",
        "n_rows",
        "n_nulls",
        F.coalesce("__nd", F.lit(0)).alias("n_distinct"),
        "min_s",
        "max_s",
    )


def check_constraints(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Declarative data-quality audit: each rule is (name, boolean
    Column) asserting what SHOULD hold per row; returns one row per rule
    with (rule, n_rows, n_violations, pass_rate_ppm) — the
    expectation-suite primitive (uniqueness goes through a groupBy rule
    upstream; this is the row-local tier).

    ONE aggregation pass however many rules: each rule folds to a
    conditional count inside the same partial-aggregatable agg — no
    per-rule scan, no driver loop — and the per-rule rows come from
    exploding ONE array of structs over that single 1-row aggregate
    (a union of N selects would instantiate the aggregation subtree N
    times and rely on ReuseExchange to dedup it). NULL rule results
    count as violations (SQL three-valued logic would silently pass
    them). Rule names must be bare identifiers (they become column
    aliases); the ppm arithmetic runs in decimal so row counts past
    2^43 cannot wrap the ×10⁶ scaling.
    """
    import re as _re

    from ..functions.exact import floor_div

    if not rules:
        raise ValueError("check_constraints: at least one rule required")
    for name, _ in rules:
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(
                f"check_constraints: rule name {name!r} must be a bare "
                "identifier"
            )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules:
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, 1).otherwise(0)
            ).cast("bigint").alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{name}").alias("v"),
            )
            for name, _ in rules
        ]
    )
    exploded = one.select(
        F.col("__n"), F.explode(per_rule).alias("r")
    )
    passed = (F.col("__n") - F.col("r.v")).cast("decimal(38,0)")
    return exploded.select(
        F.col("r.rule").alias("rule"),
        F.col("__n").cast("bigint").alias("n_rows"),
        F.col("r.v").alias("n_violations"),
        floor_div(passed * 1000000, F.col("__n")).alias("pass_rate_ppm"),
    )
