"""Batch Parquet sources.

Replaces the reference's Mongo ``find(filter, projection)`` scans (SURVEY §2.1
S4): Parquet + Catalyst gives predicate pushdown and column pruning for free —
callers just write ``load_table(...).where(...).select(...)`` and the filter /
projection reach the scan (verify with ``df.explain`` → ``PushedFilters`` /
``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_US_PER_DAY = 86_400 * 1_000_000


def ntz_from_ns_long(ns: Column) -> Column:
    """Nanoseconds-since-epoch (naive) → TIMESTAMP_NTZ, timezone-free.

    Spark 4 cannot read Parquet TIMESTAMP(NANOS) natively; with
    ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as a raw
    bigint. Every tz-dependent route (timestamp_micros + date_format,
    from_unixtime, …) would shift wall-clock by the session offset, so this
    reconstruction uses only tz-free primitives: date_from_unix_date for the
    calendar part + a day-time interval for the time-of-day part.
    """
    us = F.floor(ns / F.lit(1000)).cast("long")
    days = F.floor(us / F.lit(_US_PER_DAY)).cast("int")
    tod_us = us - days.cast("long") * F.lit(_US_PER_DAY)
    date = F.date_from_unix_date(days)
    secs = (tod_us / F.lit(1_000_000.0)).cast("decimal(18,6)")
    return date.cast("timestamp_ntz") + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), secs
    )


# Resolved-schema memo per (sf_dir, table): Spark runs one footer-reading
# job per schemaless spark.read.parquet CALL (even for the same path), so
# a 16-query bench pays dozens of metadata jobs and plan-only explain
# callers pay one per table touched. The testdata is immutable for a
# session, so the first load's resolved schema is reused via
# reader.schema(...) — later loads are job-free at construction time.
_SCHEMA_MEMO: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # must be set before schema resolution of the read below
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (os.path.abspath(sf_dir), name)
    cached = _SCHEMA_MEMO.get(key)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", ntz_from_ns_long(F.col("ts")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
