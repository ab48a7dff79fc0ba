"""Structured Streaming micro-batch variant (streaming/micro_batch.py):
landing-dir → watermarked dedup silver → tumbling windowed agg (ST1-ST7)."""

from __future__ import annotations

import json
import tempfile

from etl_weather_jabar_spark.streaming.micro_batch import (
    stream_silver,
    stream_windowed_agg,
)

from .fixtures import bronze_fixture


def _land_jsonl(spark, path: str) -> None:
    rows = [json.loads(r) for r in bronze_fixture(spark).toJSON().collect()]
    # one duplicate landing twice (same location_id + timestamp) on top of
    # the batch-level duplicates already in the fixture
    rows.append(rows[0])
    with open(f"{path}/batch1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))


def test_stream_silver_dedups_within_watermark(spark):
    with tempfile.TemporaryDirectory() as d:
        landing, out, ckpt = f"{d}/in", f"{d}/out", f"{d}/ckpt"
        import os

        os.makedirs(landing)
        _land_jsonl(spark, landing)
        silver = stream_silver(spark, landing)
        q = (
            silver.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        rows = got.collect()
        keys = [(r["location_id"], r["timestamp"]) for r in rows]
        assert len(keys) == len(set(keys)), "dedup within watermark failed"
        # null-location row rejected, duplicates collapsed
        assert got.where("location_id IS NULL").count() == 0


def test_stream_windowed_agg_shape(spark):
    with tempfile.TemporaryDirectory() as d:
        landing, ckpt = f"{d}/in", f"{d}/ckpt"
        import os

        os.makedirs(landing)
        _land_jsonl(spark, landing)
        agg = stream_windowed_agg(stream_silver(spark, landing))
        q = (
            agg.writeStream.format("memory")
            .queryName("agg_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("select * from agg_test").collect()
        assert len(out) > 0
        cols = set(out[0].asDict())
        assert {"window", "location_id", "temp_avg", "n_obs"} <= cols
