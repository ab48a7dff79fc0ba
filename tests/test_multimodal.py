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
