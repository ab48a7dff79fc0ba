"""Filter / predicate operators (SURVEY §2.2 P2-P8, ST2, ST7).

All are thin, declarative ``where`` builders so Catalyst pushes them into the
Parquet scan (check ``PushedFilters`` in ``df.explain("formatted")``).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def eq_filter(df: DataFrame, **kv) -> DataFrame:
    """P3 equality predicates, e.g. ``eq_filter(df, date=d, location_id=i)``.
    Partition-pruning when the column is a partition key."""
    pred: Column = F.lit(True)
    for k, v in kv.items():
        pred = pred & (F.col(k) == F.lit(v))
    return df.where(pred)


def in_filter(df: DataFrame, col: str, values: Iterable) -> DataFrame:
    """P4 IN-list (fetch_weather.py:97). Fine for small literal lists (27
    locations); for large/unbounded sets use a left_semi join instead — the
    reference's unbounded ``$nin`` is the anti-pattern (SURVEY §4.2)."""
    return df.where(F.col(col).isin(list(values)))


def prefix_filter(df: DataFrame, col: str, prefix: str) -> DataFrame:
    """P5 string-prefix time predicate (``$regex ^day``, fetch_weather.py:93-96).
    startswith compiles to StartsWith → pushed to Parquet."""
    return df.where(F.col(col).startswith(prefix))


def null_reject(df: DataFrame, col: str) -> DataFrame:
    """P7 (transform_raw_weather.py:33-35)."""
    return df.where(F.col(col).isNotNull())


def no_future_rows(df: DataFrame, ts_col: str, now=None) -> DataFrame:
    """P8/ST7 no-future-data guard (fetch_weather.py:73-75). String compare in
    the reference; works identically on timestamps or canonical strings."""
    cutoff = F.lit(now) if now is not None else F.current_timestamp()
    return df.where(F.col(ts_col) <= cutoff)


def batch_key_filter(df: DataFrame, batch_end: str) -> DataFrame:
    """ST2 incremental predicate: process only this interval's rows
    (transform_raw_weather.py:112-117, ``dag_times.end == interval_end``)."""
    return df.where(F.col("dag_times.end") == batch_end)
