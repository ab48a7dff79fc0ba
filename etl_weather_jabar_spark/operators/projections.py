"""Projection operators.

P1 (the Silver flatten, dags/transform_raw_weather.py:36-58) plus the
event-time CASE (F8, transform_raw_weather.py:29-32): nested Bronze doc →
17-column flat row. Pure ``select`` — Catalyst prunes the unread nested
fields down to the Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def event_time(df: DataFrame) -> Column:
    """F8: history rows are timestamped by their logical date, live rows by
    the interval end (transform_raw_weather.py:29-32)."""
    return F.when(
        F.col("fetch_method") == "history", F.col("dag_times.logical_date")
    ).otherwise(F.col("dag_times.end"))


def flatten_raw(df: DataFrame) -> DataFrame:
    """Bronze → Silver projection (P1 + P7 null-rejection + F2 derivations).

    The reference drops rows with missing ``location.id``
    (transform_raw_weather.py:33-35) and derives string
    timestamp/date/hour/minute via strftime (:38-41). We standardize on the
    DAG formats ("HH", "mm") — the run-once/ debug variants drifted
    (SURVEY §7.2).
    """
    ts = F.to_timestamp(event_time(df), TS_FMT)
    return (
        df.where(F.col("location.id").isNotNull())  # P7
        .select(
            F.col("_id"),
            F.date_format(ts, TS_FMT).alias("timestamp"),
            F.date_format(ts, "yyyy-MM-dd").alias("date"),
            F.date_format(ts, "HH").alias("hour"),
            F.date_format(ts, "mm").alias("minute"),
            F.col("location.id").alias("location_id"),
            F.col("location.name").alias("location_name"),
            F.col("location.lat").alias("lat"),
            F.col("location.lon").alias("lon"),
            F.col("current.temp_c").alias("temp_c"),
            F.col("current.feelslike_c").alias("feelslike_c"),
            F.col("current.humidity").alias("humidity"),
            F.col("current.wind_kph").alias("wind_kph"),
            F.col("current.wind_dir").alias("wind_dir"),
            F.col("current.wind_degree").alias("wind_degree"),
            F.col("current.precip_mm").alias("precip_mm"),
            F.col("current.is_day").alias("is_day"),
            F.col("current.uv").alias("uv"),
            F.col("current.cloud").alias("cloud"),
            F.col("current.condition.text").alias("condition"),
        )
    )
