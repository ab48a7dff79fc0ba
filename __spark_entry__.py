"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``etl_weather_jabar_spark`` package; this module
is the thin contract surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_weather_jabar_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the Gold recap aggregate
    spine (A4/A5/A8 — grouped avg/min/max + null-to-zero sum; SURVEY §7.1
    slice 0)."""
    return _q.recap_daily_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator class from SURVEY.md §2 + the
    north-star extensions. Each callable takes (spark, sf_dir)."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (same column aliases).
    Keys absent here (vs queries()) are the genuinely non-SQL ops —
    sketch-based approximates, the banded MinHash/SimHash pipelines, and
    iterative float algorithms (PageRank) — which get the driver's
    rows-only check and golden pytest coverage."""
    return dict(_q.ORACLE_SQL)
