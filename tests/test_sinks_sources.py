"""Tests for sinks (S5-S9 semantics), JSON source (S3), quarantine (P10),
and the ST3 backfill union."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from etl_weather_jabar_spark.plans.pipelines import backfill_union
from etl_weather_jabar_spark.sinks import (
    append,
    append_dedup_keyed,
    overwrite,
    quarantine_split,
    upsert_by_partition,
)
from etl_weather_jabar_spark.sources.jsonsrc import read_master_location

from .fixtures import _raw_row, bronze_fixture


def test_append_and_overwrite(spark):
    df = spark.range(5).select(F.col("id"))
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/t"
        append(df, p)
        append(df, p)
        assert spark.read.parquet(p).count() == 10
        overwrite(df, p)  # S8 truncate-and-reload
        assert spark.read.parquet(p).count() == 5


def test_append_dedup_keyed_unique_index_semantics(spark):
    """ST4/S9: the unique-(location_id,timestamp) index becomes dedup-on-
    write — replays and overlapping batches insert nothing twice."""
    rows = [("a", 1, "t1", 1.0), ("b", 1, "t1", 2.0), ("c", 2, "t1", 3.0)]
    df = spark.createDataFrame(rows, ["_id", "location_id", "timestamp", "v"])
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/silver"
        append_dedup_keyed(df, p, keys=["location_id", "timestamp"])
        got = spark.read.parquet(p)
        assert got.count() == 2  # in-batch dup collapsed, survivor lowest _id
        assert {r["_id"] for r in got.collect()} == {"a", "c"}
        # replay the same batch → idempotent
        append_dedup_keyed(df, p, keys=["location_id", "timestamp"])
        assert spark.read.parquet(p).count() == 2
        # new key appends
        extra = spark.createDataFrame(
            [("d", 3, "t1", 4.0)], ["_id", "location_id", "timestamp", "v"]
        )
        append_dedup_keyed(extra, p, keys=["location_id", "timestamp"])
        assert spark.read.parquet(p).count() == 3


def test_upsert_by_partition_idempotent(spark):
    """S6: keyed upsert as dynamic partition overwrite — rewriting a date
    replaces that date only."""
    v1 = spark.createDataFrame(
        [("2024-02-01", 1, 10.0), ("2024-02-02", 1, 20.0)],
        ["date", "location_id", "v"],
    )
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/gold"
        upsert_by_partition(v1, p, ["date"], dedup_keys=["date", "location_id"])
        v2 = spark.createDataFrame(
            [("2024-02-02", 1, 99.0)], ["date", "location_id", "v"]
        )
        upsert_by_partition(v2, p, ["date"], dedup_keys=["date", "location_id"])
        # partition values come back type-inferred (DateType) — normalize
        got = {str(r["date"]): r["v"] for r in spark.read.parquet(p).collect()}
        assert got == {"2024-02-01": 10.0, "2024-02-02": 99.0}


def test_quarantine_split(spark):
    """P10: error rows split off to a quarantine sink
    (fetch_weather.py:60-62,131-133)."""
    df = spark.createDataFrame(
        [(1, None), (2, "boom"), (3, None)], ["id", "error"]
    )
    with tempfile.TemporaryDirectory() as d:
        q = f"{d}/quarantine"
        clean = quarantine_split(df, F.col("error").isNull(), q)
        assert {r["id"] for r in clean.collect()} == {1, 3}
        assert {r["id"] for r in spark.read.parquet(q).collect()} == {2}


def test_read_master_location(spark):
    """S3: multiline JSON dimension load with explicit schema
    (init_master_location.py:23-28)."""
    doc = [
        {
            "id": 3088089,
            "central_city": "Bandung",
            "city": "Kota Bandung",
            "region": "West Java",
            "country": "Indonesia",
            "lat": -6.92,
            "lon": 107.61,
            "url": "bandung",
            "source": {
                "general_info": "g", "location": "l", "central_city": "c",
                "lat": -6.9, "lon": 107.6,
            },
        }
    ]
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/master.json"
        with open(path, "w") as f:
            json.dump(doc, f)
        got = read_master_location(spark, path)
        rows = got.collect()
        assert len(rows) == 1
        assert rows[0]["id"] == 3088089
        assert rows[0]["source"]["lat"] == -6.9


def test_backfill_union_hourly_coarsening(spark):
    """ST3: history path keeps only :00 rows, drops future rows, anti-joins
    already-stored (loc, time) pairs, then unions with live."""
    live = bronze_fixture(spark).where("fetch_method = 'current'")
    hist_rows = [
        _raw_row("h1", "2024-02-01 08:00:00", 1, method="history"),
        _raw_row("h2", "2024-02-01 08:10:00", 1, method="history"),  # not :00
        _raw_row("h3", "2024-02-01 09:00:00", 1, method="history"),
        _raw_row("h4", "2024-02-01 23:00:00", 1, method="history"),  # future
    ]
    from etl_weather_jabar_spark.schemas import RAW_WEATHER

    history = spark.createDataFrame(hist_rows, RAW_WEATHER)
    existing = spark.createDataFrame(
        [_raw_row("e1", "2024-02-01 09:00:00", 1, method="history")], RAW_WEATHER
    )
    out = backfill_union(
        live, history, existing=existing, now="2024-02-01 12:00:00"
    )
    ids = {r["_id"] for r in out.collect()}
    assert "h1" in ids          # :00, past, not stored yet
    assert "h2" not in ids      # minute != 00 → coarsened away
    assert "h3" not in ids      # already stored (anti-join)
    assert "h4" not in ids      # future
    assert all(i in ids for i in ["b001", "b002", "b003", "b004", "b006"])


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key: the join plan must contain no
    Exchange (shuffle) — the on-disk hash layout is the partitioning."""
    from etl_weather_jabar_spark.sinks import write_bucketed
    from etl_weather_jabar_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
            joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # same answer as the shuffle join over the raw files
            assert joined.count() == li.join(
                orders, li.l_orderkey == orders.o_orderkey
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_csv_source_quarantines_corrupt_rows(spark, tmp_path):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from etl_weather_jabar_spark.sources.csvsrc import read_csv, split_quarantine

    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,3.5\n"
        "2,bob,not_a_number\n"   # type error -> corrupt
        "3,carol,9.25\n"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    df = read_csv(spark, str(p), schema)
    clean, bad = split_quarantine(df)
    got = sorted((r["id"], r["name"], r["score"]) for r in clean.collect())
    assert got == [(1, "alice", 3.5), (3, "carol", 9.25)]
    assert "_corrupt_record" not in clean.columns
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not_a_number" in bad_rows[0]["_corrupt_record"]


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Date-partitioned layout (the engine's stand-in for the reference's
    (date, location) index): a date-filtered read must show PartitionFilters
    in the scan and touch only matching partition directories."""
    import os

    from pyspark.sql import functions as F

    from etl_weather_jabar_spark.sinks import upsert_by_partition
    from etl_weather_jabar_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    ev = (
        load_table(spark, sf, "events")
        .withColumn("date", F.date_format("ts", "yyyy-MM-dd"))
        .limit(2000)
    )
    out = str(tmp_path / "by_date")
    upsert_by_partition(ev, out, ["date"])
    dates = sorted(d for d in os.listdir(out) if d.startswith("date="))
    assert len(dates) > 1
    pick = dates[0].split("=", 1)[1]
    df = spark.read.parquet(out).where(F.col("date") == pick)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "date" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]
    got = df.select(F.countDistinct("date")).collect()[0][0]
    assert got == 1


def test_compact_small_files(spark, tmp_path):
    from etl_weather_jabar_spark.sinks import compact
    from etl_weather_jabar_spark.sources.parquet import load_table

    path = str(tmp_path / "accreted")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(600)
    # simulate micro-batch accretion: 30 tiny appends
    for i in range(30):
        ev.where(F.col("event_id") % 30 == i).write.mode("append").parquet(path)
    import glob

    before = len(glob.glob(path + "/*.parquet"))
    rows_before = spark.read.parquet(path).count()
    n = compact(spark, path, target_file_mb=128)
    after = len(glob.glob(path + "/*.parquet"))
    assert before >= 30 and after == n == 1
    assert spark.read.parquet(path).count() == rows_before


def test_optimize_zorder_clusters_both_dimensions(spark, tmp_path):
    """After OPTIMIZE-ZORDER, each output file's min/max range is a small
    slice of the domain in BOTH clustered columns — the file-stats
    pruning property — while a plain single-column sort only achieves it
    for the leading column."""
    import random

    from etl_weather_jabar_spark.sinks import optimize_zorder

    rng = random.Random(7)
    rows = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(20000)]
    path = str(tmp_path / "t")
    spark.createDataFrame(rows, ["x", "y"]).repartition(8).write.parquet(path)

    def avg_span(col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.col("_metadata.file_name").alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
            .collect()
        )
        return sum(r["span"] for r in per_file) / len(per_file)

    # random layout: every file spans ~the whole domain in both dims
    assert avg_span("x") > 900 and avg_span("y") > 900
    # ADVICE r3: the loosened 12..16/520 gate also widened the window a
    # real clustering regression could slip through. The one observed
    # fold came from AQE's input split feeding the range sampler — pin
    # AQE off for the rewrite so the boundary sample is deterministic,
    # and restore the tight ==16 / 450 asserts.
    saved = spark.conf.get("spark.sql.adaptive.enabled", None)
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        n = optimize_zorder(spark, path, ["x", "y"], n_files=16, bits=8)
    finally:
        if saved is not None:
            spark.conf.set("spark.sql.adaptive.enabled", saved)
    assert n == 16
    got = spark.read.parquet(path)
    assert got.count() == 20000
    per_file = (
        got.select(F.col("_metadata.file_name").alias("f")).distinct().count()
    )
    assert per_file == 16
    # z-ordered layout: files cover a fraction of the domain in BOTH
    # dims — ideal is ~256/file at 16 files; 450 allows boundary overlap
    # while still far below the ~1000 random span
    assert avg_span("x") < 450 and avg_span("y") < 450


def test_append_zordered_with_frozen_bounds(spark, tmp_path):
    """The incremental side of OPTIMIZE-ZORDER: the first optimize freezes
    per-column bounds; append_zordered clusters later batches by those
    SAME bounds, so appended files keep narrow per-file min/max spans that
    line up with the existing layout — no full-table rewrite per batch."""
    import random

    from etl_weather_jabar_spark.sinks import append_zordered, optimize_zorder

    rng = random.Random(11)
    path = str(tmp_path / "t")
    bpath = str(tmp_path / "t_bounds")
    base = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(8000)]
    spark.createDataFrame(base, ["x", "y"]).repartition(4).write.parquet(path)
    optimize_zorder(spark, path, ["x", "y"], n_files=8, bits=8, bounds_path=bpath)
    files_before = {
        r["f"]
        for r in spark.read.parquet(path)
        .select(F.col("_metadata.file_name").alias("f"))
        .distinct()
        .collect()
    }

    batch = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(4000)]
    append_zordered(
        spark.createDataFrame(batch, ["x", "y"]), path, ["x", "y"], bpath,
        n_files=4,
    )
    got = spark.read.parquet(path)
    assert got.count() == 12000
    # appended files (not present before) are themselves narrow in both dims
    per_file = (
        got.groupBy(F.col("_metadata.file_name").alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    new = [r for r in per_file if r["f"] not in files_before]
    assert new, "append produced no new files"
    # a file whose zkey range straddles a Morton quadrant boundary can span
    # a full dimension, so the pruning-relevant metric is the AVERAGE span:
    # an unclustered 4000-row batch puts ~1020 in both dims in every file;
    # 4 z-ordered ranges (random split points → ~2 straddlers) land ~500-750
    avg_sx = sum(r["sx"] for r in new) / len(new)
    avg_sy = sum(r["sy"] for r in new) / len(new)
    assert avg_sx < 880 and avg_sy < 880, (avg_sx, avg_sy)
    # a second optimize with the same bounds_path reuses the frozen stats
    optimize_zorder(spark, path, ["x", "y"], n_files=12, bits=8, bounds_path=bpath)
    assert spark.read.parquet(path).count() == 12000


def test_orc_roundtrip_partition_pruning(spark, tmp_path):
    """The ORC read-back in orc_roundtrip_agg must partition-prune: with
    a priority predicate on a priority-partitioned ORC table, the scan
    lists only the selected directories (PartitionFilters in the plan,
    partition count matches), and values survive the hop exactly."""
    import re

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, i * 100, pr) for i in range(20)
         for pr in ("1-URGENT", "2-HIGH", "5-LOW")],
        ["k", "units", "pr"],
    )
    out = str(tmp_path / "orc")
    df.write.mode("overwrite").partitionBy("pr").orc(out)
    back = spark.read.orc(out).where(F.col("pr").isin("1-URGENT", "2-HIGH"))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*pr#\d+ IN", plan), plan
    got = {
        (r["pr"], r["n"], r["su"])
        for r in back.groupBy("pr")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("units").alias("su"))
        .collect()
    }
    assert got == {("1-URGENT", 20, 19000), ("2-HIGH", 20, 19000)}


def test_weather_landing_datasource_batch_and_stream(spark, tmp_path):
    """The custom Python DataSource (Spark 4 pyspark.sql.datasource)
    over the landing dir: batch read is row-identical to the built-in
    JSONL reader under the same explicit schema (one InputPartition per
    landed file), the stream reader's name-anchored offsets (last
    consumed filename) give exactly-once pickup across two availableNow
    runs sharing a checkpoint (a re-run with no new files appends
    nothing; a new file appends only its rows), and a missing path
    option raises."""
    import json
    import os

    import pytest

    from etl_weather_jabar_spark.schemas import RAW_WEATHER
    from etl_weather_jabar_spark.sources.weather_api_source import (
        WeatherLandingDataSource,
        WeatherLandingReader,
    )

    from .fixtures import bronze_fixture

    rows = [json.loads(r) for r in bronze_fixture(spark).toJSON().collect()]
    landing = str(tmp_path / "in")
    os.makedirs(landing)
    half = len(rows) // 2
    with open(f"{landing}/batch1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows[:half]))
    with open(f"{landing}/batch2.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows[half:]))

    spark.dataSource.register(WeatherLandingDataSource)
    df = spark.read.format("weatherlanding").option("path", landing).load()
    ref = spark.read.schema(RAW_WEATHER).json(landing)
    assert sorted(df.toJSON().collect()) == sorted(ref.toJSON().collect())

    with pytest.raises(ValueError):
        WeatherLandingReader({}, RAW_WEATHER)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("weatherlanding")
            .option("path", landing)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).count()

    assert run_once() == len(rows)
    assert run_once() == len(rows)  # no new files → nothing re-ingested
    with open(f"{landing}/batch3.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows[:3]))
    assert run_once() == len(rows) + 3


def test_weather_landing_stream_offset_guards(tmp_path):
    """Name-anchored stream offsets (round-7 advisor, medium): a late
    upload sorting below the served horizon (the unpadded batch10 <
    batch2 case) and a vanished committed file both fail LOUDLY instead
    of silently shifting the committed range; legacy {"pos": N} count
    offsets from pre-change checkpoints are still understood. Driver-side
    unit test of the reader protocol — no Spark session needed."""
    import os

    import pytest

    from etl_weather_jabar_spark.schemas import RAW_WEATHER
    from etl_weather_jabar_spark.sources.weather_api_source import (
        WeatherLandingStreamReader,
    )

    landing = str(tmp_path)
    b2 = os.path.join(landing, "batch2.json")
    b3 = os.path.join(landing, "batch3.json")
    for p in (b2, b3):
        with open(p, "w") as f:
            f.write("")

    r = WeatherLandingStreamReader({"path": landing}, RAW_WEATHER)
    assert r.initialOffset() == {"last": ""}
    off = r.latestOffset()
    assert off == {"last": b3}
    assert [p.path for p in r.partitions({"last": ""}, off)] == [b2, b3]
    # a later batch advances the horizon; the range below it is unmoved
    b4 = os.path.join(landing, "batch4.json")
    with open(b4, "w") as f:
        f.write("")
    assert r.latestOffset() == {"last": b4}
    assert [p.path for p in r.partitions(off, {"last": b4})] == [b4]

    # the advisor's exact scenario: unpadded batch10.json sorts BELOW the
    # already-served batch2.json → the landing convention is broken and
    # the reader says so instead of skipping/re-ingesting
    b10 = os.path.join(landing, "batch10.json")
    with open(b10, "w") as f:
        f.write("")
    with pytest.raises(ValueError, match="late-arriving"):
        r.latestOffset()
    os.remove(b10)

    # a committed file vanishing mid-range or at the endpoint → loud
    os.remove(b3)
    with pytest.raises(ValueError, match="disappeared"):
        r.partitions({"last": b2}, {"last": b4})  # b3 gone mid-range
    fresh = WeatherLandingStreamReader({"path": landing}, RAW_WEATHER)
    with pytest.raises(ValueError, match="disappeared"):
        fresh.partitions({"last": b2}, {"last": b3})  # endpoint, post-restart

    # legacy count offsets: interpreted against the current listing
    assert [p.path for p in fresh.partitions({"pos": 0}, {"pos": 1})] == [b2]
    assert [p.path for p in fresh.partitions({"pos": 1}, {"pos": 2})] == [b4]
