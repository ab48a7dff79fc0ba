"""Exponentially-weighted smoothing over event streams, shuffle-minimal.

EWMA is the classic telemetry smoother, but its textbook recurrence
(``s_t = a*x_t + (1-a)*s_{t-1}``) is sequential per key and float-ordered
— useless as a distributed, cross-engine-verifiable operator. This module
uses the *dyadic* form (decay 1/2 per step over a bounded trailing
window): every weight is a power of two, so the whole computation is
exact 64-bit integer arithmetic on integer-unit measures, reproducible
bit-for-bit in any engine.

Execution shape: one window shuffle (partition by key, order by time)
collects the trailing frame as an array; the weighted sum is a zip_with +
aggregate higher-order function — JVM-side, codegen'd, no UDF. At 100 TB
the single shuffle is the floor for any ordered-per-key computation; the
bounded frame (default 8 rows) keeps per-row state O(1).

Reference parity: the reference's recap pipeline smooths nothing (raw
hourly means only, transform_recap.py); this is a driver-mandated
training-pipeline extension (feature engineering over event telemetry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import half_up_div


def dyadic_ewma(
    df: DataFrame,
    key: str,
    order: list[str | Column],
    units: Column,
    *,
    depth: int = 8,
    out_col: str = "ewma_units",
) -> DataFrame:
    """Append a dyadic-EWMA column over the trailing ``depth`` rows per key.

    The i-th newest row in the frame gets weight ``2**(n-i)`` (newest
    heaviest, halving per step back); the output is
    ``round_half_up(sum(w_i * x_i) / sum(w_i))`` in exact integers.
    ``units`` must be an exact integer-unit measure (bigint).
    """
    if not 1 <= depth <= 32:
        raise ValueError("depth must be in [1, 32] (weights fit in bigint)")
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-(depth - 1), Window.currentRow)
    )
    # Frame array is oldest->newest; weights [1, 2, 4, ...] align so the
    # newest row takes 2**(n-1). Products stay < 2**53 for unit values
    # < 2**(53 - depth).
    arr = F.collect_list(units).over(w)
    weights = F.slice(
        F.array(*[F.lit(2**j).cast("bigint") for j in range(depth)]),
        1,
        F.size(arr),
    )
    num = F.aggregate(
        F.zip_with(arr, weights, lambda x, wt: x * wt),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        weights, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return df.withColumn(out_col, half_up_div(num, den)).withColumn(
        "n_window", F.size(arr)
    )


def linear_interpolate(
    df: DataFrame,
    part_col: str,
    time_col: Column,
    tiebreak_col: str,
    value_units: Column,
    out_col: str = "filled_units",
) -> DataFrame:
    """Linear interpolation of missing readings between each key's
    neighboring observations — the step up from LOCF when the measure is
    continuous (sensor series, rates): a missing row at time t between
    observations (t0,v0) and (t1,v1) gets v0 + (v1−v0)·(t−t0)/(t1−t0),
    round-half-up in exact integer units so every engine lands on the
    same integer. Leading/trailing gaps (no neighbor on one side) stay
    NULL — interpolation is strictly interior, unlike LOCF. Equal
    timestamps degrade to the earlier observation (slope denominator
    would be 0).

    ``time_col`` must be an exact integer clock (e.g. unix_micros);
    ``value_units`` an integer-unit measure, NULL where missing.

    Scale: one shuffle on ``part_col``; the prev/next carriers are
    last/first IGNORE NULLS over growing/shrinking rows frames — O(1)
    state per row, no self-join against the observation set.
    """
    d = df.withColumn("__t", time_col).withColumn("__v", value_units)
    obs = F.when(
        F.col("__v").isNotNull(), F.struct(F.col("__t"), F.col("__v"))
    )
    order = [F.col("__t"), F.col(tiebreak_col)]
    w_prev = (
        Window.partitionBy(part_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(part_col)
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    d = d.withColumn("__p", F.last(obs, ignorenulls=True).over(w_prev))
    d = d.withColumn("__n", F.first(obs, ignorenulls=True).over(w_next))
    pt, pv = F.col("__p.__t"), F.col("__p.__v")
    nt, nv = F.col("__n.__t"), F.col("__n.__v")
    # value-delta × time-delta: promote to decimal BEFORE multiplying —
    # a large gap times a large swing exceeds 2^63 and would silently
    # wrap in bigint (non-ANSI) where the SQL twin (HUGEINT) is exact
    num = (nv - pv).cast("decimal(38,0)") * (F.col("__t") - pt)
    interp = F.when(
        nt > pt, pv + half_up_div(num, nt - pt)
    ).otherwise(pv)
    return d.withColumn(
        "__fill",
        F.when(
            F.col("__v").isNotNull(), F.col("__v")
        ).when(
            F.col("__p").isNotNull() & F.col("__n").isNotNull(), interp
        ),
    ).withColumnRenamed("__fill", out_col).drop("__t", "__v", "__p", "__n")
