"""Window-function operators (SURVEY §2.5 W1-W2).

The reference has no window engine; these are its two windowed-in-disguise
computations, generalized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_first_rank(
    df: DataFrame, keys: list[str], order_by: list[str], rank_col: str = "rn"
) -> DataFrame:
    """W1: row_number over (partition by keys order by order_by)
    (transform_raw_weather.py:92-97's ids[1:] delete, as a rank)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
    return df.withColumn(rank_col, F.row_number().over(w))


def stamp_group_flag(
    df: DataFrame, keys: list[str], flag: Column, flag_col: str
) -> DataFrame:
    """W2: a group-level boolean stamped on every member row — the reference's
    ``full_recap`` = "hour 23 present in this (date, location)"
    (daily_compile_weather.py:114-115,70)."""
    w = Window.partitionBy(*keys)
    return df.withColumn(flag_col, F.max(flag).over(w))
