"""Tests for multimodal binary-column plumbing (ext/multimodal.py).

The decode kernel is a stub (no codec libs in this container); what these
tests pin is the REAL part: schema, Arrow mapInPandas round-trip, batch
shape, determinism, and payload-column pruning for metadata-only queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_weather_jabar_spark.ext.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    synthetic_media,
)
from etl_weather_jabar_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _media(spark):
    return synthetic_media(spark, load_table(spark, SF, "documents"))


def test_media_schema(spark):
    media = _media(spark)
    assert [f.name for f in media.schema.fields] == [
        f.name for f in MEDIA_SCHEMA.fields
    ]
    assert dict(media.dtypes)["payload"] == "binary"


def test_extract_features_roundtrip_deterministic(spark):
    media = _media(spark)
    a = {r["media_id"]: r["feat_norm"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feat_norm"] for r in extract_features(media).collect()}
    assert a == b
    assert len(a) == media.count()
    dims = {r["feat_dim"] for r in extract_features(media).collect()}
    assert dims == {8}


def test_real_decode_is_explicit_stub(spark):
    media = _media(spark).limit(1)
    with pytest.raises(Exception) as exc_info:
        extract_features(media, fake_decode=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_metadata_query_prunes_payload(spark):
    """Metadata-only aggregation must not read the blob column — check the
    Parquet ReadSchema in the physical plan (ext/multimodal.py scale note).

    Write → read a real parquet so the scan is a FileSourceScan with
    pushdown, the shape production would have."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        _media(spark).write.mode("overwrite").parquet(f"{d}/media")
        df = spark.read.parquet(f"{d}/media")
        q = df.groupBy("kind").agg(F.avg("width").alias("w"))
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "payload" not in plan


def test_resize_images_replaces_payload_and_box(spark):
    from etl_weather_jabar_spark.ext.multimodal import resize_images

    media = _media(spark).limit(20)
    out = resize_images(media, 64, 48).collect()
    assert len(out) == 20
    assert all(r["width"] == 64 and r["height"] == 48 for r in out)
    assert all(len(r["payload"]) == 64 * 48 // 64 for r in out)
    # deterministic: same input -> same thumbnail bytes
    again = resize_images(media, 64, 48).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == {
        r["media_id"]: bytes(r["payload"]) for r in again
    }
    with pytest.raises(Exception, match="NotImplementedError|resize"):
        resize_images(media, 64, 48, fake_decode=False).collect()


def test_sample_frames_fanout(spark):
    from etl_weather_jabar_spark.ext.multimodal import sample_frames, synthetic_media

    videos = synthetic_media(
        spark, load_table(spark, SF, "documents"), kind="video"
    ).limit(10)
    src = {r["media_id"]: r["duration_ms"] for r in videos.collect()}
    frames = sample_frames(videos, every_ms=500).collect()
    # one row per ceil(duration/500) per video, indices 0..n-1, ts stride 500
    by_id: dict = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == set(src)
    for mid, rows in by_id.items():
        n = max((src[mid] + 499) // 500, 1)
        rows.sort(key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == list(range(n))
        assert all(r["ts_ms"] == r["frame_idx"] * 500 for r in rows)
        assert all(len(r["payload"]) == 16 for r in rows)
