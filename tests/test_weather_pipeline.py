"""Golden tests pinning the reference's pipeline semantics (SURVEY §7.2).

Each test cites the reference behavior it pins (file:line into
/root/reference)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_jabar_spark.operators.aggregates import daily_recap
from etl_weather_jabar_spark.plans.pipelines import recap_stage, transform_stage

from .fixtures import bronze_fixture, silver_fixture


def test_transform_dedups_keep_first(spark):
    """A3: survivor of duplicate (location.id, dag_times.end) is the lowest
    _id (transform_raw_weather.py:92-97 deletes ids[1:])."""
    silver = transform_stage(bronze_fixture(spark))
    rows = {r["_id"]: r for r in silver.collect()}
    assert "b001" in rows and "b002" not in rows
    assert rows["b001"]["temp_c"] == 30.0


def test_transform_rejects_null_location(spark):
    """P7: rows with missing location.id dropped
    (transform_raw_weather.py:33-35)."""
    ids = {r["_id"] for r in transform_stage(bronze_fixture(spark)).collect()}
    assert "b004" not in ids


def test_transform_history_uses_logical_date(spark):
    """F8: history rows take dag_times.logical_date as event time
    (transform_raw_weather.py:29-32)."""
    rows = {r["_id"]: r for r in transform_stage(bronze_fixture(spark)).collect()}
    assert rows["b005"]["timestamp"] == "2024-02-01 09:00:00"
    assert rows["b005"]["hour"] == "09"
    assert rows["b006"]["timestamp"] == "2024-02-01 10:10:00"


def test_transform_batch_key_filter(spark):
    """ST2: only the requested interval's rows processed
    (transform_raw_weather.py:112-117)."""
    silver = transform_stage(bronze_fixture(spark), batch_end="2024-02-01 10:00:00")
    ids = {r["_id"] for r in silver.collect()}
    assert ids == {"b001", "b003"}


def test_transform_17_column_shape(spark):
    """P1: the Silver projection is the 17-field flat row
    (transform_raw_weather.py:36-58) + lineage _id."""
    cols = transform_stage(bronze_fixture(spark)).columns
    assert cols == [
        "_id", "timestamp", "date", "hour", "minute", "location_id",
        "location_name", "lat", "lon", "temp_c", "feelslike_c", "humidity",
        "wind_kph", "wind_dir", "wind_degree", "precip_mm", "is_day", "uv",
        "cloud", "condition",
    ]


def _recap_hours(spark):
    out = recap_stage(silver_fixture(spark)).collect()
    assert len(out) == 1
    doc = out[0]
    return doc, {h["hour"]: h for h in doc["hourly"]}


def test_recap_hour_aggregates(spark):
    """A4/A5: avg rounded 2dp, min/max (daily_compile_weather.py:71-75)."""
    _, hours = _recap_hours(spark)
    h8 = hours["08"]
    assert h8["temp_avg"] == 32.0
    assert h8["temp_min"] == 30.0 and h8["temp_max"] == 34.0
    assert h8["precip_mm"] == 3.5


def test_recap_empty_measures_sum_zero_avg_null(spark):
    """A8: sum of an all-null hour is 0.0 while avg/min/max stay null
    (daily_compile_weather.py:71-78)."""
    _, hours = _recap_hours(spark)
    h9 = hours["09"]
    assert h9["precip_mm"] == 0.0
    assert h9["temp_avg"] is None
    assert h9["temp_min"] is None
    assert h9["dominant_wind_dir"] is None


def test_recap_mode_first_seen_tiebreak(spark):
    """A6: wind mode ties broken by first occurrence in minute order
    (statistics.mode semantics, daily_compile_weather.py:76)."""
    _, hours = _recap_hours(spark)
    assert hours["08"]["dominant_wind_dir"] == "NE"  # NE@:00 beats SW@:10, 2-2


def test_recap_minute_grid_null_fill(spark):
    """J4: missing 10-min slots appear as all-null minute docs
    (daily_compile_weather.py:34-58)."""
    _, hours = _recap_hours(spark)
    points = {p["minute"]: p for p in hours["08"]["data_points"]}
    assert sorted(points) == ["00", "10", "20", "30", "40", "50"]
    assert points["30"]["temp"] is None and points["30"]["wind_dir"] is None
    assert points["40"]["temp"] == 33.0


def test_recap_skips_empty_hours_and_flags_incomplete_day(spark):
    """Hours with no rows are skipped (daily_compile_weather.py:123-124);
    full_recap False when hour 23 absent (:114-115), stamped on every hour
    row (W2)."""
    doc, hours = _recap_hours(spark)
    assert sorted(hours) == ["08", "09"]  # only observed hours present
    assert all(h["full_recap"] is False for h in doc["hourly"])


def test_recap_full_day_flag_true(spark):
    """full_recap True when hour 23 present, for every hour row."""
    silver = silver_fixture(spark)
    extra = silver.limit(1).withColumn("hour", F.lit("23")).withColumn(
        "timestamp", F.lit("2024-02-01 23:00:00")
    ).withColumn("_id", F.lit("s2300"))
    doc = daily_recap(silver.unionByName(extra)).collect()[0]
    assert {h["hour"] for h in doc["hourly"]} == {"08", "09", "23"}
    assert all(h["full_recap"] is True for h in doc["hourly"])


def test_recap_hourly_sorted(spark):
    """A9/§2.6: hourly array ordered by hour, data_points by minute."""
    doc, _ = _recap_hours(spark)
    hrs = [h["hour"] for h in doc["hourly"]]
    assert hrs == sorted(hrs)


def test_json_size_observability(spark):
    """F12: raw + gzipped JSON size of recap documents (the reference's
    debug_measure_size_json.py numbers, computed distributed)."""
    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.functions.observability import (
        gzipped_size_bytes,
        json_size_bytes,
    )

    df = spark.createDataFrame(
        [(1, "a" * 1000), (2, "xyz")], ["id", "payload"]
    )
    out = {
        r["id"]: (r["raw"], r["gz"])
        for r in df.select(
            "id",
            json_size_bytes("id", "payload").alias("raw"),
            gzipped_size_bytes("id", "payload").alias("gz"),
        ).collect()
    }
    raw1, gz1 = out[1]
    raw2, gz2 = out[2]
    assert raw1 > 1000 and raw2 < 50          # raw tracks content size
    assert gz1 < raw1                          # repetitive text compresses
    assert gz2 > 0
    # deterministic across runs
    again = df.select(gzipped_size_bytes("id", "payload").alias("gz")).collect()
    assert sorted(r["gz"] for r in again) == sorted((gz1, gz2))


def test_incremental_recap_rewrites_only_affected_dates(spark, tmp_path):
    """ST5 data-driven: new Silver rows for day 2 must rebuild ONLY day 2's
    Gold partition; day 1's files stay byte-identical, and the result
    equals a full recompute."""
    import os

    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.plans.pipelines import incremental_recap
    from tests.fixtures import silver_fixture

    gold = str(tmp_path / "gold")
    day1 = silver_fixture(spark)
    day2_v1 = (
        day1.withColumn("date", F.lit("2024-02-02"))
        .withColumn("timestamp", F.regexp_replace("timestamp", "2024-02-01", "2024-02-02"))
        .where(F.col("hour") == "08")
    )
    silver_v1 = day1.unionByName(day2_v1)
    incremental_recap(silver_v1, silver_v1, gold)

    def snap(date):
        d = f"{gold}/date={date}"
        return {f: os.path.getmtime(f"{d}/{f}") for f in os.listdir(d)}

    day1_before = snap("2024-02-01")

    # new batch: extra hour-09 rows for day 2 only
    day2_new = (
        day1.withColumn("date", F.lit("2024-02-02"))
        .withColumn("timestamp", F.regexp_replace("timestamp", "2024-02-01", "2024-02-02"))
        .where(F.col("hour") == "09")
    )
    silver_v2 = silver_v1.unionByName(day2_new)
    incremental_recap(silver_v2, day2_new, gold)

    assert snap("2024-02-01") == day1_before  # untouched partition intact
    got = spark.read.parquet(gold)
    assert got.where(F.col("date") == "2024-02-02").select(
        F.explode("hourly").alias("h")
    ).select("h.hour").distinct().count() == 2  # hours 08 + 09 now present
    # equals a from-scratch full recompute
    full = str(tmp_path / "gold_full")
    incremental_recap(silver_v2, silver_v2, full)
    a = {tuple(r) for r in spark.read.parquet(gold).select("date", "location_id", F.size("hourly")).collect()}
    b = {tuple(r) for r in spark.read.parquet(full).select("date", "location_id", F.size("hourly")).collect()}
    assert a == b


def test_haversine_and_nearest_station(spark):
    """haversine_km against a pure-Python replay (same formula, same
    radius) and nearest_station against brute-force argmin; the plan must
    broadcast the station dim and contain exactly one aggregation."""
    import math

    from etl_weather_jabar_spark.functions.weather import haversine_km
    from etl_weather_jabar_spark.operators.joins import nearest_station

    # Jabar-like coordinates: Bandung, Bogor, Bekasi, Cirebon
    stations = [
        (1, -6.9175, 107.6191),
        (2, -6.5971, 106.8060),
        (3, -6.2383, 106.9756),
        (4, -6.7320, 108.5523),
    ]
    points = [
        (10, -6.90, 107.60),   # ~Bandung
        (11, -6.60, 106.80),   # ~Bogor
        (12, -6.45, 107.90),   # between, nearer Bandung
        (13, -6.73, 108.55),   # ~Cirebon (near-exact)
    ]

    def py_hav(a, b, c, d):
        R = 6371.0088
        p1, p2 = math.radians(a), math.radians(c)
        dphi = math.radians(c - a) / 2
        dl = math.radians(d - b) / 2
        h = math.sin(dphi) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
        return 2 * R * math.asin(math.sqrt(h))

    sdf = spark.createDataFrame(stations, ["station_id", "lat", "lon"])
    pdf = spark.createDataFrame(points, ["point_id", "lat", "lon"])

    # column function matches the python replay to float precision
    got_d = {
        r["point_id"]: r["d"]
        for r in pdf.crossJoin(
            sdf.selectExpr(
                "station_id AS s", "lat AS slat", "lon AS slon"
            ).where(F.col("s") == 1)
        )
        .select(
            "point_id",
            haversine_km(
                F.col("lat"), F.col("lon"), F.col("slat"), F.col("slon")
            ).alias("d"),
        )
        .collect()
    }
    for pid, plat, plon in points:
        want = py_hav(plat, plon, stations[0][1], stations[0][2])
        assert abs(got_d[pid] - want) < 1e-9

    out = nearest_station(pdf, sdf)
    got = {r["point_id"]: r["nearest_station_id"] for r in out.collect()}
    want = {
        pid: min(
            stations, key=lambda s: (py_hav(plat, plon, s[1], s[2]), s[0])
        )[0]
        for pid, plat, plon in points
    }
    assert got == want == {10: 1, 11: 2, 12: 1, 13: 4}
    dists = {r["point_id"]: r["distance_km"] for r in out.collect()}
    assert dists[13] < 1.0  # near-exact station hit

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_recap_to_snapshot_idempotent_merge(spark, tmp_path):
    """Gold recap merged into the transactional snapshot table: one
    atomic version per run, keyed (date, location_id) upsert semantics,
    and a replay of the same batch converges to the same table state."""
    from etl_weather_jabar_spark.plans.pipelines import recap_to_snapshot
    from etl_weather_jabar_spark.snapshots import (
        snapshot_history,
        snapshot_read,
    )
    from tests.fixtures import silver_fixture

    silver = silver_fixture(spark)
    gold = str(tmp_path / "gold")

    v1 = recap_to_snapshot(silver, silver, gold)
    assert v1 == 1
    t1 = snapshot_read(spark, gold)
    keys1 = {
        (r["date"], r["location_id"]) for r in t1.select(
            "date", "location_id"
        ).collect()
    }
    rows1 = sorted(map(tuple, t1.drop("hourly").collect()))

    # replay: same input -> same state, one more version
    v2 = recap_to_snapshot(silver, silver, gold)
    assert v2 == 2
    t2 = snapshot_read(spark, gold)
    assert sorted(map(tuple, t2.drop("hourly").collect())) == rows1
    assert {
        (r["date"], r["location_id"]) for r in t2.select(
            "date", "location_id"
        ).collect()
    } == keys1
    assert [h["version"] for h in snapshot_history(gold)] == [1, 2]
