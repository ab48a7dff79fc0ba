"""Explicit StructType schemas for the four reference entities.

The reference is schemaless (MongoDB; SURVEY §1.3) — its "schema" is whatever
``dags/transform_raw_weather.py:27-57`` happens to access. We fail fast with
explicit schemas instead. Timestamps are kept BOTH as the reference's
canonical ``"%Y-%m-%d %H:%M:%S"`` strings (lexicographic == chronological;
``dags/transform_raw_weather.py:38-41``) and as proper TimestampType columns
where derived.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# master_location — 27-row dimension (master_data/master_location.json:2-18,
# loaded by run-once/init_master_location.py:20-32)
# ---------------------------------------------------------------------------
MASTER_LOCATION = StructType(
    [
        StructField("id", LongType(), False),
        StructField("central_city", StringType(), False),
        StructField("city", StringType(), True),
        StructField("region", StringType(), True),
        StructField("country", StringType(), True),
        StructField("lat", DoubleType(), True),
        StructField("lon", DoubleType(), True),
        StructField("url", StringType(), True),
        StructField(
            "source",
            StructType(
                [
                    StructField("general_info", StringType(), True),
                    StructField("location", StringType(), True),
                    StructField("central_city", StringType(), True),
                    StructField("lat", DoubleType(), True),
                    StructField("lon", DoubleType(), True),
                ]
            ),
            True,
        ),
    ]
)

# ---------------------------------------------------------------------------
# raw_weather — Bronze nested observation doc
# (dags/fetch_weather.py:78-85 history path, :121-129 current path)
# ---------------------------------------------------------------------------
_CONDITION = StructType([StructField("text", StringType(), True)])

_CURRENT = StructType(
    [
        # `time` only meaningful on the history path (fetch_weather.py:67,96)
        StructField("time", StringType(), True),
        StructField("temp_c", DoubleType(), True),
        StructField("feelslike_c", DoubleType(), True),
        StructField("humidity", LongType(), True),
        StructField("wind_kph", DoubleType(), True),
        StructField("wind_dir", StringType(), True),
        StructField("wind_degree", LongType(), True),
        StructField("precip_mm", DoubleType(), True),
        StructField("is_day", LongType(), True),
        StructField("uv", DoubleType(), True),
        StructField("cloud", LongType(), True),
        StructField("condition", _CONDITION, True),
    ]
)

RAW_WEATHER = StructType(
    [
        # ObjectId stand-in: opaque string whose sort order encodes insertion
        # time (SURVEY §1.4); used by keep-first dedup (A3).
        StructField("_id", StringType(), False),
        StructField("created_at", StringType(), True),
        StructField(
            "dag_times",
            StructType(
                [
                    StructField("start", StringType(), True),
                    StructField("end", StringType(), True),  # the batch key (ST2)
                    StructField("logical_date", StringType(), True),
                ]
            ),
            True,
        ),
        StructField("fetch_method", StringType(), True),  # "current" | "history"
        StructField(
            "location",
            StructType(
                [
                    StructField("id", LongType(), True),  # nullable → P7 filter
                    StructField("name", StringType(), True),
                    StructField("lat", DoubleType(), True),
                    StructField("lon", DoubleType(), True),
                ]
            ),
            True,
        ),
        StructField("current", _CURRENT, True),
    ]
)

# ---------------------------------------------------------------------------
# weather_data — Silver 17-field flat row (dags/transform_raw_weather.py:36-58)
# PK: unique (location_id, timestamp) (transform_raw_weather.py:107-111)
# ---------------------------------------------------------------------------
WEATHER_DATA = StructType(
    [
        StructField("_id", StringType(), False),
        StructField("timestamp", StringType(), False),  # "%Y-%m-%d %H:%M:%S"
        StructField("date", StringType(), False),  # "%Y-%m-%d"
        StructField("hour", StringType(), False),  # "%H" (DAG format, SURVEY §7.2)
        StructField("minute", StringType(), False),  # "%M"
        StructField("location_id", LongType(), False),
        StructField("location_name", StringType(), True),
        StructField("lat", DoubleType(), True),
        StructField("lon", DoubleType(), True),
        StructField("temp_c", DoubleType(), True),
        StructField("feelslike_c", DoubleType(), True),
        StructField("humidity", LongType(), True),
        StructField("wind_kph", DoubleType(), True),
        StructField("wind_dir", StringType(), True),
        StructField("wind_degree", LongType(), True),
        StructField("precip_mm", DoubleType(), True),
        StructField("is_day", LongType(), True),
        StructField("uv", DoubleType(), True),
        StructField("cloud", LongType(), True),
        StructField("condition", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# daily_recap — Gold nested doc per (date, location)
# (dags/daily_compile_weather.py:129-134; hour docs :68-80; minute docs :40-56)
# ---------------------------------------------------------------------------
MINUTE_DOC = StructType(
    [
        StructField("minute", StringType(), False),
        StructField("temp", DoubleType(), True),
        StructField("humidity", LongType(), True),
        StructField("wind_kph", DoubleType(), True),
        StructField("wind_dir", StringType(), True),
        StructField("precip_mm", DoubleType(), True),
    ]
)

HOUR_DOC = StructType(
    [
        StructField("hour", StringType(), False),
        StructField("full_recap", BooleanType(), True),
        StructField("temp_avg", DoubleType(), True),
        StructField("temp_min", DoubleType(), True),
        StructField("temp_max", DoubleType(), True),
        StructField("humidity_avg", DoubleType(), True),
        StructField("wind_avg_kph", DoubleType(), True),
        StructField("dominant_wind_dir", StringType(), True),
        StructField("precip_mm", DoubleType(), True),  # empty → 0.0 (A8!)
        StructField("data_points", ArrayType(MINUTE_DOC), True),
    ]
)

DAILY_RECAP = StructType(
    [
        StructField("date", StringType(), False),
        StructField("location_id", LongType(), False),
        StructField("location_name", StringType(), True),
        StructField("hourly", ArrayType(HOUR_DOC), True),
    ]
)
