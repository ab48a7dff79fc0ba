"""JSON sources.

S3 in SURVEY §2.1: the reference loads its 27-row dimension with
``json.load`` (run-once/init_master_location.py:23-28). Engine equivalent:
multiline JSON read with an explicit schema (no inference in the engine
proper — inference only at exploratory boundaries).

The HTTP fetchers (S1/S2, dags/fetch_weather.py:30-54) stay OUTSIDE the
engine: whatever process talks to the weather API drops its JSON payloads
into a landing directory, and the engine reads that directory — batch here,
streaming in ``streaming/micro_batch.py`` (same layout, ``readStream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import MASTER_LOCATION, RAW_WEATHER


def read_master_location(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.option("multiLine", "true").schema(MASTER_LOCATION).json(path)
    )


def read_json_dir(
    spark: SparkSession, path: str, schema: StructType = RAW_WEATHER
) -> DataFrame:
    """Batch read of a landing directory of (possibly multiline) JSON docs."""
    return spark.read.option("multiLine", "true").schema(schema).json(path)
