"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The container has no codec libraries, so the decode kernels are STUBS —
`_decode_image_stub` raises unless `fake=True`, in which case a
deterministic fake (seeded from the content hash) stands in. What IS real
and tested: the schema, the Arrow-batched ``mapInPandas`` plumbing, the
batch shapes, and the partitioning strategy — which is the part that has to
be right at 100 TB (binary payloads never shuffle unless the operator needs
them; metadata-only stages prune the blob column).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata travels beside the opaque payload; metadata-only queries
# never deserialize (or even read) the blob column thanks to Parquet column
# pruning.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("feat_dim", IntegerType(), False),
        StructField("feat_norm", StringType(), False),  # hex digest of features
    ]
)


def _decode_image_stub(payload: bytes, fake: bool) -> list[float]:
    """Decode stub. Real impl would use PIL/libvips (not in this container).

    With ``fake=True``: deterministic 8-dim pseudo-feature derived from the
    content digest, so tests exercise the full Arrow round-trip with stable
    outputs.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips — not available in this container"
        )
    digest = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(
    media: DataFrame, fake_decode: bool = True, batch_hint: int = 256
) -> DataFrame:
    """Decode + featurize via ``mapInPandas`` (Arrow-batched, executor-side).

    Scale notes: input should be partitioned so each task holds ~128 MB of
    payloads (``spark.sql.files.maxPartitionBytes``); the UDF streams batches
    (never materializes a partition); output drops the payload column so
    downstream stages shuffle only features.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p, fake_decode) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_dim": [len(f) for f in feats],
                    "feat_norm": [
                        hashlib.md5(str([round(x, 6) for x in f]).encode()).hexdigest()
                        for f in feats
                    ],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def _resize_stub(payload: bytes, w: int, h: int, fake: bool) -> bytes:
    """Resize stub. Real impl: PIL/libvips thumbnail (not in container).
    Fake: deterministic bytes derived from (content digest, target box) —
    size-bounded, so the fake behaves like a real thumbnail for IO purposes.
    """
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/libvips — not available in this container"
        )
    seed = hashlib.md5((payload or b"") + f":{w}x{h}".encode()).digest()
    out = (seed * ((w * h) // len(seed) + 1))[: max(w * h // 64, 16)]
    return out


def resize_images(
    media: DataFrame, width: int, height: int, fake_decode: bool = True
) -> DataFrame:
    """Thumbnail pass: 1→1 ``mapInPandas`` that REPLACES the payload.

    Scale notes: this is the one multimodal stage whose output is also
    blob-heavy — write it straight to a sink partitioned like the input
    rather than feeding a shuffle; only width/height/mime change in the
    metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                _resize_stub(p, width, height, fake_decode) for p in pdf["payload"]
            ]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(run, schema=media.schema)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, fake_decode: bool = True
) -> DataFrame:
    """Video frame sampling: 1→N ``mapInPandas`` — each video row fans out
    to one row per sampled timestamp (0, every_ms, 2·every_ms, … <
    duration_ms).

    Real impl would seek with ffmpeg/pyav; the fake derives each frame's
    bytes from (video digest, frame index), so the fan-out shape, schema,
    and determinism are all real. Scale notes: fan-out multiplies rows
    ~duration/every_ms — size input partitions DOWN (maxPartitionBytes) so
    the expanded batch still fits executor memory; the frame payload column
    goes straight to a sink, never into a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, pays = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if not fake_decode:
                    raise NotImplementedError(
                        "frame extraction requires ffmpeg/pyav — not in container"
                    )
                n = max(int((dur or 0) + every_ms - 1) // every_ms, 1)
                digest = hashlib.md5(payload or b"").digest()
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    pays.append(hashlib.md5(digest + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "payload": pays}
            )

    return media.where(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(run, schema=FRAME_SCHEMA)


def synthetic_media(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a deterministic media table from the documents table: payload =
    utf-8 text bytes (an opaque stand-in blob), metadata derived from length.
    Lets every multimodal test run on driver-provided data only."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("bigint").alias("duration_ms"),
    )
