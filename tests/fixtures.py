"""Deterministic weather-shaped fixtures (FIXTURES.md schemas).

Hand-built rows pinning the reference's subtle semantics (SURVEY §7.2):
duplicate (location, batch) pairs for keep-first dedup, a null location.id
row, an hour whose measures are all null (sum→0 vs avg→null), a missing
minute slot, a day without hour 23 (full_recap false).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_weather_jabar_spark.schemas import RAW_WEATHER, WEATHER_DATA


def _raw_row(
    _id: str,
    end: str,
    loc_id: int | None,
    temp: float | None = 30.0,
    method: str = "current",
    logical: str | None = None,
):
    return {
        "_id": _id,
        "created_at": end,
        "dag_times": {"start": end, "end": end, "logical_date": logical or end},
        "fetch_method": method,
        "location": {
            "id": loc_id,
            "name": f"LOC_{loc_id}",
            "lat": -6.9,
            "lon": 107.6,
        },
        "current": {
            "time": end if method == "history" else None,
            "temp_c": temp,
            "feelslike_c": (temp + 1.5) if temp is not None else None,
            "humidity": 80,
            "wind_kph": 10.0,
            "wind_dir": "NE",
            "wind_degree": 45,
            "precip_mm": 0.0,
            "is_day": 1,
            "uv": 5.0,
            "cloud": 40,
            "condition": {"text": "Partly cloudy"},
        },
    }


def bronze_fixture(spark: SparkSession) -> DataFrame:
    rows = [
        # two exact-batch duplicates for (loc 1, 10:00) — keep-first = b001
        _raw_row("b001", "2024-02-01 10:00:00", 1, temp=30.0),
        _raw_row("b002", "2024-02-01 10:00:00", 1, temp=31.0),
        # a second location, same batch
        _raw_row("b003", "2024-02-01 10:00:00", 2, temp=25.0),
        # null location.id → rejected by P7
        _raw_row("b004", "2024-02-01 10:00:00", None),
        # history row: event time = logical_date, not end (F8)
        _raw_row(
            "b005",
            "2024-02-01 10:10:00",
            1,
            temp=28.0,
            method="history",
            logical="2024-02-01 09:00:00",
        ),
        # next batch
        _raw_row("b006", "2024-02-01 10:10:00", 2, temp=26.0),
    ]
    return spark.createDataFrame(rows, RAW_WEATHER)


def silver_fixture(spark: SparkSession) -> DataFrame:
    """Silver rows for one location, one day, crafted per FIXTURES.md §3."""

    def row(hour, minute, temp, wind_dir, precip, humidity=80, wind=10.0):
        ts = f"2024-02-01 {hour}:{minute}:00"
        return {
            "_id": f"s{hour}{minute}",
            "timestamp": ts,
            "date": "2024-02-01",
            "hour": hour,
            "minute": minute,
            "location_id": 1,
            "location_name": "LOC_1",
            "lat": -6.9,
            "lon": 107.6,
            "temp_c": temp,
            "feelslike_c": temp + 1.0 if temp is not None else None,
            "humidity": humidity,
            "wind_kph": wind,
            "wind_dir": wind_dir,
            "wind_degree": 45,
            "precip_mm": precip,
            "is_day": 1,
            "uv": 5.0,
            "cloud": 40,
            "condition": "Sunny",
        }

    rows = [
        # hour 08: full 6-slot grid except minute 30 missing; wind mode tie
        # between NE (first at :00) and SW (2 each) → NE wins (first-seen)
        row("08", "00", 30.0, "NE", 0.0),
        row("08", "10", 31.0, "SW", 1.2),
        row("08", "20", 32.0, "NE", 0.0),
        # :30 missing → null grid slot
        row("08", "40", 33.0, "SW", 2.3),
        row("08", "50", 34.0, "N", 0.0),
        # hour 09: all measures null → avg/min/max null but precip sum = 0.0
        {
            **row("09", "00", None, None, None),
            "humidity": None,
            "wind_kph": None,
        },
        # hour 23 absent → full_recap False for the day
    ]
    return spark.createDataFrame(rows, WEATHER_DATA)
