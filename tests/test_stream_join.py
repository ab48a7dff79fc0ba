"""Stream-stream interval join (streaming/joins.py) through a real
streaming query: impressions joined to clicks within a 10-minute bound."""

from __future__ import annotations

import os

from etl_weather_jabar_spark.streaming.joins import interval_join_streams


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
