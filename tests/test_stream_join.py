"""Stream joins (streaming/joins.py) through real streaming queries:
stream-static dimension enrichment, and stream-stream interval join
(impressions joined to clicks within a 10-minute bound)."""

from __future__ import annotations

import os

from etl_weather_jabar_spark.streaming.joins import (
    enrich_stream_static,
    interval_join_streams,
)


def test_enrich_stream_static_broadcast_lookup(spark, tmp_path):
    """Streaming facts enriched against a static broadcast dim: matched
    keys carry the dim columns, unmatched pass through null-extended
    (left join), and the query needs no watermark (stateless)."""
    d = str(tmp_path)
    fact_dir, ckpt = f"{d}/facts", f"{d}/ckpt"
    os.makedirs(fact_dir)
    with open(f"{fact_dir}/f1.csv", "w") as f:
        f.write("1,10\n2,20\n9,90\n")  # location 9 not in the dim
    facts = spark.readStream.schema("loc_id LONG, v LONG").csv(fact_dir)
    dim = spark.createDataFrame(
        [(1, "Bandung"), (2, "Bogor"), (3, "Depok")], ["loc_id", "city"]
    )
    q = (
        enrich_stream_static(facts, dim, "loc_id")
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300), "stream did not finish in time"
    finally:
        q.stop()
    got = {
        r["loc_id"]: (r["v"], r["city"])
        for r in spark.sql("select * from enrich_test").collect()
    }
    assert got == {1: (10, "Bandung"), 2: (20, "Bogor"), 9: (90, None)}


def test_interval_join_streams(spark, tmp_path):
    d = str(tmp_path)
    imp_dir, clk_dir, ckpt = f"{d}/imp", f"{d}/clk", f"{d}/ckpt"
    os.makedirs(imp_dir)
    os.makedirs(clk_dir)
    with open(f"{imp_dir}/imps.csv", "w") as f:
        f.write(
            "1,2024-03-01 08:00:00\n"  # clicked 5 min later -> match
            "2,2024-03-01 08:00:00\n"  # clicked 20 min later -> no match
            "3,2024-03-01 09:00:00\n"  # never clicked -> no match
        )
    with open(f"{clk_dir}/clicks.csv", "w") as f:
        f.write(
            "1,2024-03-01 08:05:00\n"
            "2,2024-03-01 08:20:00\n"
            "9,2024-03-01 08:01:00\n"  # click with no impression
        )
    imps = spark.readStream.schema("imp_user LONG, imp_ts TIMESTAMP").csv(
        imp_dir
    )
    clicks = spark.readStream.schema("clk_user LONG, clk_ts TIMESTAMP").csv(
        clk_dir
    )
    joined = interval_join_streams(
        imps, clicks, "imp_user", "clk_user", "imp_ts", "clk_ts",
        within_seconds=600,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300), "stream did not finish in time"
    finally:
        q.stop()
    got = spark.sql("select * from attrib_test").collect()
    # tz-agnostic: only impression 1 is attributed, to the click 5 min
    # after it (session TZ shifts the rendered wall-clock)
    assert [(r["imp_user"], (r["clk_ts"] - r["imp_ts"]).total_seconds()) for r in got] == [
        (1, 300.0)
    ]


def test_interval_join_streams_left_outer_emits_after_watermark(spark, tmp_path):
    """LEFT outer stream-stream join: unmatched impressions emit (with null
    click columns) only once the watermark passes their join horizon.

    The global watermark is the MIN across both inputs, so BOTH sides carry
    a far-future event; the null-extended row then surfaces in the no-data
    micro-batch that evicts batch-1 state (default processing-time trigger —
    availableNow can terminate before that eviction batch runs).
    """
    import time

    d = str(tmp_path)
    imp_dir, clk_dir, ckpt = f"{d}/imp", f"{d}/clk", f"{d}/ckpt"
    os.makedirs(imp_dir)
    os.makedirs(clk_dir)
    with open(f"{imp_dir}/b1.csv", "w") as f:
        f.write(
            "1,2024-03-01 08:00:00\n"  # clicked -> matched row
            "2,2024-03-01 08:00:00\n"  # never clicked -> null-extended row
            "9,2024-03-01 12:00:00\n"  # far-future: advances imp watermark
        )
    with open(f"{clk_dir}/c1.csv", "w") as f:
        f.write(
            "1,2024-03-01 08:05:00\n"
            "8,2024-03-01 12:00:00\n"  # far-future: advances click watermark
        )
    imps = spark.readStream.schema("imp_user LONG, imp_ts TIMESTAMP").csv(
        imp_dir
    )
    clicks = spark.readStream.schema("clk_user LONG, clk_ts TIMESTAMP").csv(
        clk_dir
    )
    joined = interval_join_streams(
        imps, clicks, "imp_user", "clk_user", "imp_ts", "clk_ts",
        within_seconds=600, watermark="0 seconds", how="leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_outer_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            rows = spark.sql("select * from attrib_outer_test").collect()
            if sum(1 for r in rows if r["imp_user"] in (1, 2)) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = {
        r["imp_user"]: r["clk_user"]
        for r in spark.sql("select * from attrib_outer_test").collect()
    }
    assert got.get(1) == 1          # matched
    assert 2 in got and got[2] is None  # unmatched, null-extended
