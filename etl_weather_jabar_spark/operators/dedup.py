"""Exact deduplication operators (SURVEY §2.4 A1-A3, §2.5 W1).

The reference's dedup job is a Mongo ``$group {ids:$push, count:$sum} →
$match {count>1}`` followed by deleting all but the first ``_id``
(dags/transform_raw_weather.py:78-97; run-once/delete_duplicate_on_raw.py:15-38).
Spark expresses "delete the dupes" as "rewrite without dupes": a window
keep-first. Survivor choice is deterministic (lowest order_by), matching the
reference's insertion-order ObjectId survivor — plain ``dropDuplicates``
would be unfaithful (SURVEY §7.2).

Scale: one shuffle on the key columns. At 100 TB with a skewed key, AQE's
skew-join/aggregation splitting handles stragglers; the window variant
map-side-combines nothing, so for heavily-duplicated keys prefer
``find_duplicate_groups`` (partial aggregation) to *measure* first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_keep_first(
    df: DataFrame, keys: list[str], order_by: list[str] | None = None
) -> DataFrame:
    """Keep exactly one row per key: the first by ``order_by`` (A3/W1).

    Faithful form of the reference's ``ids[1:]`` delete
    (transform_raw_weather.py:92-97): survivor = lowest ``_id``.
    """
    order = order_by or ["_id"]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def find_duplicate_groups(
    df: DataFrame, keys: list[str], id_col: str = "_id"
) -> DataFrame:
    """A1+A2: groups with count>1 and their member ids (sorted for
    determinism). Mirrors the Mongo pipeline at transform_raw_weather.py:78-87.
    """
    return (
        df.groupBy(*keys)
        .agg(
            F.sort_array(F.collect_list(id_col)).alias("ids"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .where(F.col("cnt") > 1)
    )
