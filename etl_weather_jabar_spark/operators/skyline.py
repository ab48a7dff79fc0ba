"""2-D skyline (Pareto frontier) under minimize-both dominance.

A row p is dominated when some q has ``x ≤ p.x AND y ≤ p.y`` with at
least one strict — the skyline is every non-dominated row (cheapest AND
smallest tradeoff set; equal points dominate neither, so duplicates of a
frontier point all survive).

Reference parity: none — this is an engine extension (the standard
multi-objective "best tradeoffs" query over catalog-like tables).

Scale design (100 TB): the naive formulation is a quadratic NOT EXISTS
self-join; the naive window formulation is a single-reducer global sort.
This implementation reduces the frontier test to per-x aggregates plus
ONE exclusive prefix-min over the distinct-x table:

    p is in the skyline  ⟺  p.y == min(y | x = p.x)
                             AND min(y | x < p.x) > p.y   (vacuous if none)

— correct because a same-x dominator must have smaller y, and any
smaller-x row with y ≤ p.y dominates. The distinct-x table is orders of
magnitude smaller than the data; its prefix min runs bucketed (the
:func:`~.windows._range_bucketed` one-shuffle form): local rows-frame
min inside each ordered bucket + an exclusive cross-bucket min over the
|buckets|-row aggregate, broadcast back. No global sort, no quadratic
join; the final membership test is a broadcast-friendly equi-join on x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .windows import _range_bucketed


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows of ``df`` on the minimize-(x, y) Pareto frontier. ``x_col``
    must be numeric (bucketed prefix min samples its quantiles); rows
    with NULL in either coordinate are excluded (NULL is incomparable
    under dominance)."""
    points = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    n = (
        num_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    per_x = points.groupBy(x_col).agg(F.min(y_col).alias("__my"))
    parted = _range_bucketed(per_x, [x_col], n)
    if parted is None:
        parted = (
            per_x.repartitionByRange(n, F.col(x_col))
            .sortWithinPartitions(x_col)
            .withColumn("__part", F.spark_partition_id())
        )
    # exclusive prefix min of __my over x order: local rows-frame min
    # (per_x is distinct on x, so rows == values) + exclusive bucket min
    w_local = (
        Window.partitionBy("__part")
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parted.withColumn("__lp", F.min("__my").over(w_local))
    bmins = parted.groupBy("__part").agg(F.min("__my").alias("__bm"))
    w_b = Window.orderBy("__part").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bmins.select(
        "__part", F.min("__bm").over(w_b).alias("__pb")
    )
    frontier_x = (
        local.join(F.broadcast(offsets), "__part")
        # least() skips NULLs (NULL only when both are): both-NULL means
        # no strictly-smaller x exists = vacuously non-dominated
        .withColumn("__prev", F.least(F.col("__lp"), F.col("__pb")))
        .where(F.col("__prev").isNull() | (F.col("__prev") > F.col("__my")))
        .select(x_col, "__my")
    )
    return (
        points.join(frontier_x, on=x_col)
        .where(F.col(y_col) == F.col("__my"))
        .drop("__my")
    )
