"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Two decode tiers:

* REAL, codec-free (bottom of file): binary PPM images and 16-bit PCM WAV
  parse with stdlib + numpy alone — `decode_ppm`/`decode_wav_pcm16`,
  `extract_features_real` (true dimensions, channel means, RMS energy,
  duration), `resize_ppm_images` (nearest-neighbour, re-encoded). Tested
  against numpy ground truth computed outside Spark.
* REAL PNG as well (bottom of file): PNG is zlib-deflate + per-scanline
  filters, both implementable with the stdlib — `encode_png`/`decode_png`
  cover 8-bit gray/RGB/RGBA (+alpha variants), filters 0-4, bit-exact
  against numpy ground truth. REAL 24-bit BMP too (`encode_bmp`/
  `decode_bmp` — bottom-up AND top-down rows, stride padding; lossless,
  so roundtrips are bit-exact).
* REAL JPEG too (ext/jpeg.py), baseline SOF0 AND progressive SOF2
  (spectral selection + successive approximation): Huffman entropy
  decode + dequant + IDCT with numpy alone — lossy, so tolerance-pinned
  rather than bit-exact; grayscale and 4:4:4/4:2:0/4:2:2/4:4:0 YCbCr
  with restart markers (the honest scope note lives in that module).
* STUBS for formats that genuinely need codec libraries (MP3/H.264):
  `_decode_image_stub` raises unless
  `fake=True`, in which case a deterministic fake (seeded from the
  content hash) stands in.

In both tiers what the 100 TB story depends on is identical and fully
tested: the schema, the Arrow-batched ``mapInPandas`` plumbing, the batch
shapes, and the partitioning strategy (binary payloads never shuffle unless
the operator needs them; metadata-only stages prune the blob column).
"""

from __future__ import annotations

import hashlib
import struct as _struct
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

#: What a malformed media payload is ALLOWED to raise from the codec layer.
#: The codecs' contract is ValueError (each now length-checks before any
#: struct.unpack / index), but the mapInPandas consumers quarantine on this
#: wider tuple as defense-in-depth: one hostile blob escaping as
#: struct.error / IndexError would otherwise kill the whole Spark stage
#: instead of yielding the documented NULL quarantine row (ADVICE r4).
DECODE_ERRORS = (ValueError, EOFError, IndexError, KeyError, _struct.error)


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


# ---------------------------------------------------------------------------
# REAL codec-free decoders: PPM (P6) images and PCM WAV audio parse with
# stdlib + numpy alone. PNG (below), GIF, BMP, FLAC (ext/flac.py), JPEG
# (ext/jpeg.py — baseline SOF0 AND progressive SOF2, routed at the mime
# dispatch sites in this module), G.711 µ-law/A-law and IMA ADPCM are all
# likewise real in-repo decoders; the NotImplementedError stubs above
# remain only for MP3/H.264 (and PIL-dependent generic image decode),
# whose normative tables need codec libraries absent in this container.
# ---------------------------------------------------------------------------


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6) bytes."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3, "PPM is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes):
    """Binary PPM (P6) bytes → (h, w, 3) uint8 numpy array. Raises
    ValueError on anything that is not a P6 with maxval 255."""
    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    parts: list[bytes] = []
    i = 2
    while len(parts) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        parts.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(parts[0]), int(parts[1]), int(parts[2])
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3)


def encode_bmp(arr) -> bytes:
    """(h, w, 3) RGB uint8 → 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up, BGR byte order, rows padded to 4 bytes — the classic
    Windows layout every viewer reads)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = a[:, :, ::-1]
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + pad
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(hdr + info + body)


def decode_bmp(payload: bytes):
    """24-bit uncompressed BMP bytes → (h, w, 3) RGB uint8. Supports
    bottom-up (positive height) and top-down (negative height) rows;
    raises ValueError on compressed / paletted / other bit depths —
    never a silently wrong image."""
    import struct

    import numpy as np

    d = bytes(payload)
    if len(d) < 54 or d[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", d, 10)[0]
    hsize = struct.unpack_from("<I", d, 14)[0]
    if hsize < 40:
        raise ValueError("BITMAPCOREHEADER unsupported")
    w, h_signed = struct.unpack_from("<ii", d, 18)
    planes, bpp = struct.unpack_from("<HH", d, 26)
    compression = struct.unpack_from("<I", d, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError("invalid BMP dimensions")
    stride = (w * 3 + 3) & ~3
    if off + stride * h > len(d):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        d, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_wav_pcm16(samples, rate: int = 16000) -> bytes:
    """int16 mono samples → WAV (PCM) bytes via the stdlib wave module."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def decode_wav_pcm16(payload: bytes):
    """WAV (16-bit PCM) bytes → (rate, int16 numpy array)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        rate = wf.getframerate()
        data = np.frombuffer(
            wf.readframes(wf.getnframes()), dtype=np.int16
        )
    return rate, data


def _ulaw_encode(samples) -> "np.ndarray":
    """int16 → G.711 µ-law bytes (CCITT segment encoding, bias 0x84,
    clip 32635), vectorized numpy — the telephony codec 8 kHz voice
    corpora ship in."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int32)
    sign = np.where(s < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(s), 32635) + 0x84
    # exponent = position of the highest set bit above bit 7 (0..7)
    exponent = np.clip(
        np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 7, 0, 7
    )
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(np.uint8)


def _ulaw_decode(data) -> "np.ndarray":
    """G.711 µ-law bytes → int16, vectorized numpy (exact inverse of
    the segment table)."""
    import numpy as np

    u = (~np.frombuffer(bytes(data), dtype=np.uint8).astype(np.int32)) & 0xFF
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def encode_au_ulaw(samples, rate: int = 8000) -> bytes:
    """int16 mono samples → Sun .au (audio/basic) bytes, G.711 µ-law
    encoding (the canonical container for 8 kHz telephony audio)."""
    import struct

    body = _ulaw_encode(samples).tobytes()
    # .snd magic, data offset 24, data size, encoding 1 (µ-law 8-bit),
    # sample rate, channels — all big-endian
    return struct.pack(">4sIIIII", b".snd", 24, len(body), 1, rate, 1) + body


def _alaw_encode(samples) -> "np.ndarray":
    """int16 → G.711 A-law bytes (ITU-T G.711 segment encoding with the
    0x55 even-bit inversion), vectorized numpy — the telephony codec of
    the E1/European sphere, the sibling of :func:`_ulaw_encode`.

    Follows the canonical public linear2alaw (Sun g711.c): input is
    reduced to 13 bits (>>3), negatives map to ``-x-1`` (one's
    complement) so the segment search runs on magnitudes, segments are
    the 8 doubling ranges ending at 0xFFF, and the 4-bit mantissa takes
    bits ``seg..seg+3`` (``>>1`` in the two linear segments)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int32) >> 3
    mask = np.where(s >= 0, 0xD5, 0x55).astype(np.int32)
    mag = np.where(s >= 0, s, -s - 1)
    mag = np.minimum(mag, 0xFFF)
    # segment = index of first end >= mag over ends 0x1F,0x3F,...,0xFFF
    seg = np.clip(
        np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 4, 0, 7
    )
    man = np.where(seg < 2, (mag >> 1) & 0x0F, (mag >> seg) & 0x0F)
    aval = (seg << 4) | man
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def _alaw_decode(data) -> "np.ndarray":
    """G.711 A-law bytes → int16, vectorized numpy (exact inverse of
    the segment table; every one of the 256 codes is a fixed point of
    encode∘decode — pinned in tests)."""
    import numpy as np

    a = np.frombuffer(bytes(data), dtype=np.uint8).astype(np.int32) ^ 0x55
    man = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(
        seg == 0,
        man + 8,
        (man + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


def encode_au_alaw(samples, rate: int = 8000) -> bytes:
    """int16 mono samples → Sun .au bytes, G.711 A-law (encoding 27)."""
    import struct

    body = _alaw_encode(samples).tobytes()
    return struct.pack(">4sIIIII", b".snd", 24, len(body), 27, rate, 1) + body


def decode_au_alaw(payload: bytes):
    """Sun .au (G.711 A-law, mono) bytes → (rate, int16 numpy array).
    ValueError on any other encoding — never a silently wrong
    waveform."""
    import struct

    d = bytes(payload)
    if len(d) < 24 or d[:4] != b".snd":
        raise ValueError("not a Sun .au payload")
    off, size, enc, rate, ch = struct.unpack(">IIIII", d[4:24])
    if enc != 27:
        raise ValueError("only G.711 A-law .au supported here")
    if ch != 1:
        raise ValueError("only mono .au supported")
    if off < 24 or off > len(d):
        raise ValueError("truncated .au header")
    n = min(size, len(d) - off) if size != 0xFFFFFFFF else len(d) - off
    return rate, _alaw_decode(d[off : off + n])


# --- IMA ADPCM (WAV format tag 0x11, "DVI/IMA") -------------------------
# The 4:1 block-predictive codec game audio and telephony WAVs ship in.
# Public spec: IMA Digital Audio Focus Group "Recommended Practices for
# Enhancing Digital Audio Compatibility" (1992); tables as in every
# public implementation (e.g. the Stichting Mathematisch Centrum ADPCM
# reference code). Each block restarts the predictor — the seek/appand
# unit, and the reason a corrupted block never poisons its neighbors.

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_encode_block(samples, predictor: int, index: int):
    """Encode one block's samples (after the header sample) to nibbles;
    returns (nibbles list, final predictor, final index)."""
    out = []
    for s in samples:
        step = _IMA_STEPS[index]
        diff = int(s) - predictor
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        vpdiff = step >> 3
        if diff >= step:
            nib |= 4
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            nib |= 2
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            nib |= 1
            vpdiff += step
        predictor = predictor - vpdiff if nib & 8 else predictor + vpdiff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + _IMA_INDEX[nib & 7]))
        out.append(nib)
    return out, predictor, index


def _ima_decode_block(nibbles, predictor: int, index: int):
    """Decode nibbles given the block header state; returns (samples
    list, final predictor, final index) — the exact mirror of
    :func:`_ima_encode_block`'s in-loop reconstruction."""
    out = []
    for nib in nibbles:
        step = _IMA_STEPS[index]
        vpdiff = step >> 3
        if nib & 4:
            vpdiff += step
        if nib & 2:
            vpdiff += step >> 1
        if nib & 1:
            vpdiff += step >> 2
        predictor = predictor - vpdiff if nib & 8 else predictor + vpdiff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + _IMA_INDEX[nib & 7]))
        out.append(predictor)
    return out, predictor, index


def encode_wav_ima(samples, rate: int = 8000, block_align: int = 256) -> bytes:
    """int16 mono samples → WAV bytes, IMA ADPCM (format tag 0x11).

    Block layout (mono): 4-byte header (int16 first sample verbatim,
    uint8 step index, uint8 reserved 0) + ``block_align - 4`` nibble
    bytes (low nibble first) ⇒ ``(block_align-4)·2 + 1`` samples per
    full block. The step index carries ACROSS blocks (adaptation state
    survives; only the predictor is re-seeded from the verbatim header
    sample). The final block is zero-padded; the true sample count goes
    in the mandatory ``fact`` chunk."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    spb = (block_align - 4) * 2 + 1
    index = 0
    blocks = []
    for off in range(0, max(len(s), 1), spb):
        chunk = s[off : off + spb]
        if len(chunk) == 0:
            break
        head = int(chunk[0])
        body = [int(x) for x in chunk[1:]]
        body += [head] * (spb - 1 - len(body))  # pad holds the level
        nibs, _, index_out = _ima_encode_block(body, head, index)
        packed = bytearray()
        for i in range(0, len(nibs), 2):
            packed.append((nibs[i] & 0x0F) | ((nibs[i + 1] & 0x0F) << 4))
        blocks.append(
            struct.pack("<hBB", head, index, 0) + bytes(packed)
        )
        index = index_out
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, rate * block_align // spb,
        block_align, 4, 2, spb,
    )
    fact = struct.pack("<I", len(s))
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_wav_ima(payload: bytes):
    """WAV (IMA ADPCM, mono) bytes → (rate, int16 numpy array), exact
    mirror of :func:`encode_wav_ima`. ValueError on non-IMA format
    tags, non-mono streams, or truncated chunks — quarantine, never a
    silently wrong waveform."""
    import struct

    import numpy as np

    d = bytes(payload)
    if len(d) < 12 or d[:4] != b"RIFF" or d[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, n_samples = 12, None, None, None
    while pos + 8 <= len(d):
        tag = d[pos : pos + 4]
        (size,) = struct.unpack("<I", d[pos + 4 : pos + 8])
        body = d[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"fact":
            (n_samples,) = struct.unpack("<I", body[:4])
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag16, ch, rate, _, block_align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag16 != 0x11:
        raise ValueError("only IMA ADPCM (0x11) supported here")
    if ch != 1 or bits != 4:
        raise ValueError("only mono 4-bit IMA supported")
    spb = (block_align - 4) * 2 + 1
    out = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            raise ValueError("truncated IMA block header")
        head, index, _ = struct.unpack("<hBB", block[:4])
        if index > 88:
            raise ValueError("IMA step index out of range")
        nibs = []
        for byte in block[4:]:
            nibs.append(byte & 0x0F)
            nibs.append(byte >> 4)
        samples, _, _ = _ima_decode_block(nibs, head, index)
        out.append(head)
        out.extend(samples)
    if n_samples is not None:
        out = out[:n_samples]
    return rate, np.asarray(out, dtype=np.int16)


def decode_au_ulaw(payload: bytes):
    """Sun .au (G.711 µ-law, mono) bytes → (rate, int16 numpy array).
    Raises ValueError on other encodings/channel counts — never a
    silently wrong waveform."""
    import struct

    d = bytes(payload)
    if len(d) < 24 or d[:4] != b".snd":
        raise ValueError("not a Sun .au payload")
    off, size, enc, rate, ch = struct.unpack(">IIIII", d[4:24])
    if enc != 1:
        raise ValueError("only G.711 mu-law .au supported")
    if ch != 1:
        raise ValueError("only mono .au supported")
    if off < 24 or off > len(d):
        raise ValueError("truncated .au header")
    n = min(size, len(d) - off) if size != 0xFFFFFFFF else len(d) - off
    return rate, _ulaw_decode(d[off : off + n])


REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("mean_r", StringType(), True),   # fixed 4-dp strings:
        StructField("mean_g", StringType(), True),   # deterministic across
        StructField("mean_b", StringType(), True),   # numpy versions
        StructField("rms", StringType(), True),
    ]
)


def extract_features_real(media: DataFrame) -> DataFrame:
    """REAL decode + featurize for codec-free formats ('image/x-ppm' →
    per-channel means + true dimensions; 'audio/wav' → RMS energy + true
    duration). Same Arrow/mapInPandas shape as the stub path; unsupported
    mimes yield nulls rather than poisoning the batch (quarantine-style).
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, mime, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["mime"], pdf["payload"]
            ):
                w = h = dur = mr = mg = mb = rms = None
                try:
                    if mime == "image/x-ppm":
                        a = decode_ppm(payload)
                        h, w = int(a.shape[0]), int(a.shape[1])
                        m = a.reshape(-1, 3).mean(axis=0)
                        mr, mg, mb = (f"{x:.4f}" for x in m)
                    elif mime == "image/png":
                        a = decode_png(payload)  # real stdlib-zlib decode
                        h, w = int(a.shape[0]), int(a.shape[1])
                        c = a.shape[2]
                        if c >= 3:  # RGB / RGBA: alpha never enters means
                            m = a[:, :, :3].reshape(-1, 3).mean(axis=0)
                        else:  # gray / gray+alpha: replicate the luma mean
                            m = [float(a[:, :, 0].mean())] * 3
                        mr, mg, mb = (f"{float(x):.4f}" for x in m)
                    elif mime == "image/gif":
                        a = decode_gif(payload)  # real stdlib LZW decode
                        h, w = int(a.shape[0]), int(a.shape[1])
                        m = a.reshape(-1, 3).mean(axis=0)
                        mr, mg, mb = (f"{float(x):.4f}" for x in m)
                    elif mime == "image/jpeg":
                        from .jpeg import decode_jpeg

                        a = decode_jpeg(bytes(payload))  # real baseline DCT
                        h, w = int(a.shape[0]), int(a.shape[1])
                        if a.ndim == 3:
                            m = a.reshape(-1, 3).mean(axis=0)
                        else:
                            m = [float(a.mean())] * 3
                        mr, mg, mb = (f"{float(x):.4f}" for x in m)
                    elif mime == "image/bmp":
                        a = decode_bmp(payload)  # real 24-bit decode
                        h, w = int(a.shape[0]), int(a.shape[1])
                        m = a.reshape(-1, 3).mean(axis=0)
                        mr, mg, mb = (f"{float(x):.4f}" for x in m)
                    elif mime in (
                        "audio/wav",
                        "audio/flac",
                        "audio/basic",
                        "audio/x-alaw-basic",
                        "audio/x-wav-ima-adpcm",
                    ):
                        if mime == "audio/flac":
                            from .flac import decode_flac

                            rate, data = decode_flac(bytes(payload))
                        elif mime == "audio/basic":
                            rate, data = decode_au_ulaw(payload)
                        elif mime == "audio/x-alaw-basic":
                            rate, data = decode_au_alaw(payload)
                        elif mime == "audio/x-wav-ima-adpcm":
                            rate, data = decode_wav_ima(payload)
                        else:
                            rate, data = decode_wav_pcm16(payload)
                        dur = int(len(data) * 1000 // max(rate, 1))
                        if len(data):
                            rms = f"{float(np.sqrt(np.mean(data.astype(np.float64) ** 2))):.4f}"
                except DECODE_ERRORS:
                    pass  # unsupported/corrupt → null feature row
                rows.append((mid, kind, w, h, dur, mr, mg, mb, rms))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height", "duration_ms",
                    "mean_r", "mean_g", "mean_b", "rms",
                ],
            )

    return media.select("media_id", "kind", "mime", "payload").mapInPandas(
        run, schema=REAL_FEATURE_SCHEMA
    )


def resize_ppm_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbour resize for PPM payloads (numpy index
    striding — no codec libs), re-encoded as PPM. Non-PPM mimes pass
    through untouched. Same 1→1 payload-replacing shape as resize_images.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            new_pay, new_w, new_h = [], [], []
            for mime, payload, w0, h0 in zip(
                pdf["mime"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                if mime == "image/x-ppm":
                    a = decode_ppm(payload)
                    ys = (np.arange(height) * a.shape[0] // height).astype(int)
                    xs = (np.arange(width) * a.shape[1] // width).astype(int)
                    new_pay.append(encode_ppm(a[ys][:, xs]))
                    new_w.append(width)
                    new_h.append(height)
                else:
                    new_pay.append(payload)
                    new_w.append(w0)
                    new_h.append(h0)
            out["payload"] = new_pay
            out["width"] = new_w
            out["height"] = new_h
            yield out

    return media.mapInPandas(run, schema=media.schema)


# ---------------------------------------------------------------------------
# REAL PNG codec with stdlib zlib alone (round-3 verdict item 4): PNG's
# pixel stream is zlib-deflate over per-scanline-filtered bytes — no codec
# library needed. 8-bit depth, color types 0 (gray), 2 (RGB), 4
# (gray+alpha), 6 (RGBA), non-interlaced; filters 0-4 all supported.
# JPEG is ALSO a real in-repo decoder (ext/jpeg.py, baseline + progressive,
# routed by the image/jpeg mime dispatch below); only MP3/H.264 stay honest
# NotImplementedError stubs (they need real codec libs).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(arr, filter_type: int = 0) -> bytes:
    """(h, w) or (h, w, c) uint8 array → PNG bytes, every scanline
    filtered with ``filter_type`` (0..4) — the encoder exists so the
    decoder can be pinned bit-exact against numpy ground truth for each
    filter branch."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    raw = bytearray()
    prior = bytes(w * c)
    for y in range(h):
        line = a[y].tobytes()
        raw.append(filter_type)
        if filter_type == 0:
            raw += line
        else:
            for x in range(len(line)):
                left = line[x - bpp] if x >= bpp else 0
                up = prior[x]
                ul = prior[x - bpp] if x >= bpp else 0
                if filter_type == 1:
                    pred = left
                elif filter_type == 2:
                    pred = up
                elif filter_type == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                raw.append((line[x] - pred) & 0xFF)
        prior = line

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """PNG bytes → (h, w, channels) uint8 numpy array, stdlib zlib only.

    Supports the common still-image profile: 8-bit depth, color types
    0/2/4/6, non-interlaced, filters 0-4 (Sub/Up/Average/Paeth undone
    per scanline exactly per the spec). Raises ValueError on anything
    outside that profile (16-bit, palette, interlaced) or on malformed
    chunks. De-filtering is inherently sequential in x for filters
    1/3/4 (each byte depends on the reconstructed left neighbour);
    filter 2 (Up) vectorizes. Per-image cost is linear in pixels and
    runs executor-side inside the Arrow batch, like every decoder here.
    """
    import struct
    import zlib

    import numpy as np

    if not payload or not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        crc_bytes = payload[pos + 8 + length : pos + 12 + length]
        if len(crc_bytes) != 4:
            # must be ValueError, not struct.error: the mapInPandas
            # consumers quarantine on the codec layer's documented
            # exception types, and a truncated blob crashing the whole
            # stage instead was ADVICE r4's top finding
            raise ValueError("truncated PNG chunk CRC")
        (crc,) = struct.unpack(">I", crc_bytes)
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError("only 8-bit PNG supported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG compression/filter/interlace")
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel stream length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = c
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            pass
        elif ft == 2:  # Up — vectorizable
            line = bytearray(
                (
                    np.frombuffer(bytes(line), dtype=np.uint8).astype(np.int32)
                    + prior.astype(np.int32)
                )
                .astype(np.uint8)
                .tobytes()
            )
        elif ft in (1, 3, 4):
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                up = int(prior[x])
                ul = int(prior[x - bpp]) if x >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return out.reshape(h, w, c)


def ahash64(arr) -> int:
    """Exact-integer 64-bit average hash (aHash) of an image array — the
    classic perceptual fingerprint for image near-dup detection: 8×8
    grid of luminance cells, bit set iff the cell's mean exceeds the
    global mean. Everything stays in integer arithmetic — luminance is
    the raw channel sum (no /3), and the mean comparison is the exact
    cross-multiplication ``cell_sum · n_pixels > total_sum · cell_n`` —
    so the hash is bit-reproducible on any platform. Cells are the
    integer partition [⌊k·h/8⌋, ⌊(k+1)·h/8⌋); images smaller than 8px on
    a side leave their empty cells at bit 0. Bit (y·8+x) is taken MSB
    first; the result is returned as a SIGNED two's-complement int64 so
    it stores in a Spark long and feeds ext/dedup_text.py::
    hamming_candidates directly."""
    import numpy as np

    a = np.asarray(arr)
    gray = (
        a.astype(np.int64).sum(axis=2) if a.ndim == 3 else a.astype(np.int64)
    )
    h, w = gray.shape
    total = int(gray.sum())
    npix = h * w
    bits = 0
    for y in range(8):
        y0, y1 = y * h // 8, (y + 1) * h // 8
        for x in range(8):
            x0, x1 = x * w // 8, (x + 1) * w // 8
            cell = gray[y0:y1, x0:x1]
            cn = cell.size
            bit = 1 if cn and int(cell.sum()) * npix > total * cn else 0
            bits = (bits << 1) | bit
    return bits - (1 << 64) if bits >= (1 << 63) else bits


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sig", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def ahash_media(media: DataFrame) -> DataFrame:
    """Decode each image payload with the REAL codec-free parsers (PPM
    via decode_ppm, PNG via the stdlib-zlib decode_png) and fingerprint
    it with ``ahash64``. Arrow-batched mapInPandas — blobs are decoded
    where they already sit, and only the 8-byte fingerprint (plus true
    dimensions) leaves the stage, so any downstream near-dup banding
    join shuffles longs, never pixels. Undecodable payloads yield a
    NULL sig (quarantine row), mirroring the quarantine contract of the
    batch sinks."""
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                try:
                    raw = bytes(payload)
                    if mime == "image/png":
                        arr = decode_png(raw)
                    elif mime == "image/gif":
                        arr = decode_gif(raw)
                    elif mime == "image/jpeg":
                        from .jpeg import decode_jpeg

                        arr = decode_jpeg(raw)
                    elif mime == "image/bmp":
                        arr = decode_bmp(raw)
                    else:
                        arr = decode_ppm(raw)
                    if arr.ndim == 3 and arr.shape[2] == 4:
                        arr = arr[:, :, :3]  # alpha is not luminance
                    sig, (ih, iw) = ahash64(arr), arr.shape[:2]
                    out.append((int(mid), sig, int(iw), int(ih)))
                except DECODE_ERRORS:  # malformed payload → quarantine row
                    out.append((int(mid), None, None, None))
            yield pd.DataFrame(
                out, columns=["media_id", "sig", "width", "height"]
            )

    return media.where(F.col("kind") == "image").select(
        "media_id", "payload", "mime"
    ).mapInPandas(run, schema=AHASH_SCHEMA)


def _gif_lzw(raw: bytes, min_code: int) -> bytes:
    """GIF-variant LZW: raw index bytes → packed code stream (LSB-first
    bit packing, clear/EOI framing, variable code width, dictionary
    reset at 4096) — the shared encoder core of ``encode_gif`` and
    ``encode_gif_animated``."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes: list[tuple[int, int]] = []  # (code, width)
    width = min_code + 1
    table_d: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    next_code = eoi + 1
    codes.append((clear, width))
    cur = b""
    for px in raw:
        nxt = cur + bytes([px])
        if nxt in table_d:
            cur = nxt
            continue
        codes.append((table_d[cur], width))
        table_d[nxt] = next_code
        next_code += 1
        if next_code - 1 == 1 << width and width < 12:
            width += 1
        if next_code > 4095:
            codes.append((clear, width))
            table_d = {bytes([i]): i for i in range(1 << min_code)}
            next_code = eoi + 1
            width = min_code + 1
        cur = bytes([px])
    if cur:
        codes.append((table_d[cur], width))
        # the decoder appends a dictionary entry after EVERY data code,
        # including this final one (it cannot know the stream is over) —
        # if that phantom append lands exactly on a power-of-two
        # boundary the decoder widens before reading EOI, so the
        # encoder must widen too (caught by an all-constant 8×8 2-color
        # frame: 64 zeros put the boundary precisely on the last code)
        next_code += 1
        if next_code - 1 == 1 << width and width < 12:
            width += 1
    codes.append((eoi, width))

    bits = bitpos = 0
    data = bytearray()
    for code, cw in codes:
        bits |= code << bitpos
        bitpos += cw
        while bitpos >= 8:
            data.append(bits & 0xFF)
            bits >>= 8
            bitpos -= 8
    if bitpos:
        data.append(bits & 0xFF)
    return bytes(data)


def _gif_sub_blocks(data: bytes) -> bytes:
    """255-byte sub-block framing + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        blk = data[i : i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00"
    return bytes(out)


def _gif_header(w: int, h: int, palette) -> tuple[bytearray, int]:
    """GIF89a header + logical screen + global color table; returns the
    buffer and the LZW minimum code size implied by the palette."""
    import numpy as np

    pal = np.asarray(palette, dtype=np.uint8)
    k = len(pal)
    assert 2 <= k <= 256
    ct_bits = max(1, (k - 1).bit_length())
    ct_size = 1 << ct_bits
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (ct_bits - 1), 0, 0])  # GCT flag + size
    table = np.zeros((ct_size, 3), dtype=np.uint8)
    table[:k] = pal
    out += table.tobytes()
    return out, max(2, ct_bits)


def _gif_image_block(idx, min_code: int) -> bytes:
    """Image descriptor at (0,0) + LZW-coded index data."""
    h, w = idx.shape
    out = bytearray(b"\x2c" + b"\x00" * 4)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += b"\x00"  # no local color table, not interlaced
    out += bytes([min_code])
    out += _gif_sub_blocks(_gif_lzw(idx.tobytes(), min_code))
    return bytes(out)


def encode_gif(indices, palette) -> bytes:
    """(h, w) uint8 palette-index array + (k ≤ 256, 3) palette → GIF89a
    bytes (non-interlaced, single frame). Pure stdlib — the GIF LZW
    variant with variable code width, clear/EOI codes and 255-byte
    sub-blocks, implemented from the GIF89a specification."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    assert int(idx.max(initial=0)) < len(pal)
    out, min_code = _gif_header(w, h, pal)
    out += _gif_image_block(idx, min_code)
    out += b"\x3b"  # trailer
    return bytes(out)


def encode_gif_animated(frames, palette, delays_cs) -> bytes:
    """Animated GIF89a: a list of same-shape (h, w) uint8 index frames
    sharing one global palette, each preceded by a Graphic Control
    Extension carrying its display delay in centiseconds, plus the
    NETSCAPE2.0 infinite-loop application extension — the minimal
    multi-frame "video" container this engine can both write and read
    codec-free. Frames are full replacements (disposal 0, no
    transparency), so decode needs no compositing state."""
    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    assert frames and len(frames) == len(delays_cs)
    h, w = frames[0].shape
    pal = np.asarray(palette, dtype=np.uint8)
    assert all(f.shape == (h, w) for f in frames)
    assert all(int(f.max(initial=0)) < len(pal) for f in frames)
    out, min_code = _gif_header(w, h, pal)
    # NETSCAPE2.0 loop-forever application extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx, delay in zip(frames, delays_cs):
        assert 0 <= int(delay) < 65536
        out += b"\x21\xf9\x04\x00"  # GCE: disposal 0, no transparency
        out += int(delay).to_bytes(2, "little") + b"\x00\x00"
        out += _gif_image_block(idx, min_code)
    out += b"\x3b"
    return bytes(out)


def _iter_gif_frames(payload: bytes):
    """GIF87a/89a block walk: yields ``(delay_cs, rgb)`` per image frame
    — delay from the preceding Graphic Control Extension (0 when
    absent), rgb an (h, w, 3) uint8 array. Lazy, so taking only the
    first frame (``decode_gif``) never touches bytes past it. Raises
    ValueError on malformed input, interlaced frames, or a GIF with no
    image frame at all."""
    import numpy as np

    if len(payload) < 13 or payload[:3] != b"GIF":
        raise ValueError("not a GIF payload")
    if payload[3:6] not in (b"87a", b"89a"):
        raise ValueError("unknown GIF version")
    pos = 6
    pos += 4  # logical screen w/h
    packed = payload[pos]
    pos += 3
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload, dtype=np.uint8, count=n * 3, offset=pos
        ).reshape(n, 3)
        pos += n * 3
    yielded = False
    delay_cs = 0
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            if not yielded:
                raise ValueError("GIF contains no image frame")
            return
        if b0 == 0x21:  # extension: label + sub-blocks
            label = payload[pos] if pos < len(payload) else 0
            pos += 1
            if (
                label == 0xF9
                and pos + 4 <= len(payload)
                and payload[pos] >= 4
            ):  # Graphic Control Extension: delay at offset 2-3
                delay_cs = int.from_bytes(
                    payload[pos + 2 : pos + 4], "little"
                )
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated image descriptor")
        w = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        h = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        ipacked = payload[pos + 8]
        pos += 9
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(
                payload, dtype=np.uint8, count=n * 3, offset=pos
            ).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("no color table")
        if pos >= len(payload):
            raise ValueError("truncated before LZW data")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError("bad LZW minimum code size")
        data = bytearray()
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        if pos >= len(payload):
            raise ValueError("truncated sub-blocks")
        pos += 1  # consume the 0x00 sub-block terminator

        clear, eoi = 1 << min_code, (1 << min_code) + 1
        width = min_code + 1
        dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [
            b"", b""
        ]
        bits = bitpos = bytepos = 0
        out = bytearray()
        prev: bytes | None = None
        while True:
            while bitpos < width:
                if bytepos >= len(data):
                    raise ValueError("LZW stream ended without EOI")
                bits |= data[bytepos] << bitpos
                bytepos += 1
                bitpos += 8
            code = bits & ((1 << width) - 1)
            bits >>= width
            bitpos -= width
            if code == clear:
                dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                break
            if code < len(dictionary):
                entry = dictionary[code]
            elif code == len(dictionary) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt LZW code")
            out += entry
            if prev is not None:
                dictionary.append(prev + entry[:1])
            prev = entry
            if len(dictionary) == (1 << width) and width < 12:
                width += 1
        if len(out) < w * h:
            raise ValueError("LZW output shorter than frame")
        idx = np.frombuffer(bytes(out[: w * h]), dtype=np.uint8)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("palette index out of range")
        yield delay_cs, ct[idx].reshape(h, w, 3)
        yielded = True
        delay_cs = 0
    if not yielded:
        raise ValueError("GIF contains no image frame")
    # payload ended without the 0x3B trailer: a truncated animation
    # must not silently decode as a shorter clip (decode_gif's lazy
    # first-frame path never reaches this — unchanged behavior there)
    raise ValueError("truncated GIF: missing trailer")


def decode_gif(payload: bytes):
    """GIF87a/89a bytes → (h, w, 3) uint8 RGB numpy array (first frame,
    non-interlaced, global or local color table). Pure stdlib LZW with
    variable code width, clear/EOI handling and deferred-clear
    tolerance; raises ValueError on malformed input or interlaced
    frames (out of scope)."""
    for _, rgb in _iter_gif_frames(payload):
        return rgb


def decode_gif_frames(payload: bytes):
    """All frames of a (possibly animated) GIF: list of
    ``(delay_cs, rgb)`` — full decode of every image descriptor, each
    frame an independent full-frame replacement (the only disposal mode
    ``encode_gif_animated`` writes; compositing disposal modes are out
    of codec-free scope)."""
    return list(_iter_gif_frames(payload))


def energy_hash64(samples) -> int:
    """Exact-integer 64-bit energy-contour fingerprint of a PCM sample
    array — the audio sibling of ``ahash64``: 64 integer-partition
    windows [⌊k·n/64⌋, ⌊(k+1)·n/64⌋), bit k set iff the window's energy
    (Σ s², exact int64 sums in python arbitrary precision) exceeds the
    global mean energy, compared by cross-multiplication
    ``E_k · n > E_total · n_k``. Clips shorter than 64 samples leave
    their empty windows at bit 0. Returns a SIGNED two's-complement
    int64 for Spark storage and ``hamming_candidates`` pairing."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    n = len(s)
    e = s * s
    total = int(e.sum())
    bits = 0
    for k in range(64):
        a, b = k * n // 64, (k + 1) * n // 64
        nk = b - a
        bit = 1 if nk and int(e[a:b].sum()) * n > total * nk else 0
        bits = (bits << 1) | bit
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def audio_fingerprint_media(media: DataFrame) -> DataFrame:
    """Decode WAV payloads (real 16-bit PCM parse) and fingerprint with
    ``energy_hash64`` — same Arrow contract as ``ahash_media``: blobs
    decoded in place, only (media_id, sig, n_samples, rate) leave the
    stage. Undecodable payloads yield a NULL sig (quarantine row)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        IntegerType as _I,
        LongType as _L,
        StructField as _SF,
        StructType as _ST,
    )

    schema = _ST(
        [
            _SF("media_id", _L(), False),
            _SF("sig", _L(), True),
            _SF("n_samples", _L(), True),
            _SF("rate", _I(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                try:
                    if mime == "audio/flac":
                        from .flac import decode_flac

                        rate, data = decode_flac(bytes(payload))
                    else:
                        rate, data = decode_wav_pcm16(bytes(payload))
                    out.append(
                        (int(mid), energy_hash64(data), len(data), rate)
                    )
                except DECODE_ERRORS:
                    out.append((int(mid), None, None, None))
            yield pd.DataFrame(
                out, columns=["media_id", "sig", "n_samples", "rate"]
            )

    return media.where(F.col("kind") == "audio").select(
        "media_id", "mime", "payload"
    ).mapInPandas(run, schema=schema)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), True),
        StructField("ts_ms", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sig", LongType(), True),
    ]
)


def sample_frames_real(media: DataFrame, every_ms: int = 100) -> DataFrame:
    """REAL video frame sampling — the functional counterpart of the
    ``sample_frames`` stub, over the one multi-frame container this
    engine decodes codec-free: animated GIF (``decode_gif_frames``).

    Per video row: decode every frame with its Graphic Control
    Extension delay, lay the frames on a timeline (delay in
    centiseconds → ms, frame *i* visible on [start_i, start_i+1)), and
    emit one row per sampling instant ``t = 0, every_ms, 2·every_ms, …
    < total_duration`` — each row carries the index of the frame
    visible at *t*, true dimensions, and the frame's exact-integer
    ``ahash64`` fingerprint (so near-dup banding over sampled frames
    shuffles longs, never pixels). An all-zero-delay animation yields a
    single t=0 sample of the last instant frame; undecodable payloads
    yield one NULL quarantine row, mirroring ``ahash_media``.

    Scale: fan-out multiplies rows by ~duration/every_ms — the same
    sizing note as the stub applies (shrink maxPartitionBytes so the
    expanded Arrow batch fits); only 40-byte rows leave the stage."""
    from bisect import bisect_right
    from collections.abc import Iterator

    import pandas as pd

    if every_ms <= 0:
        raise ValueError("sample_frames_real: every_ms must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = decode_gif_frames(bytes(payload))
                except DECODE_ERRORS:
                    rows.append((int(mid), None, None, None, None, None))
                    continue
                starts, t = [], 0
                for d, _ in frames:
                    starts.append(t)
                    t += d * 10
                total = t
                ts = 0
                while True:
                    i = bisect_right(starts, ts) - 1
                    arr = frames[i][1]
                    rows.append(
                        (
                            int(mid),
                            i,
                            ts,
                            int(arr.shape[1]),
                            int(arr.shape[0]),
                            ahash64(arr),
                        )
                    )
                    ts += every_ms
                    if ts >= total:
                        break
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "frame_idx",
                    "ts_ms",
                    "width",
                    "height",
                    "sig",
                ],
            )

    return media.where(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


def resize_media_real(media: DataFrame, width: int, height: int) -> DataFrame:
    """Format-general REAL thumbnail pass: decodes every codec-free
    format this engine reads (PPM, PNG, GIF — first frame), resizes
    nearest-neighbour, and re-encodes in the SAME container — PNG with
    filter 0, GIF by rebuilding the palette from the surviving colors
    (nearest-neighbour only samples existing pixels, so a decoded GIF
    resize always fits back into ≤ 256 palette entries). Unsupported
    or malformed payloads pass through untouched (the quarantine
    contract of the stub `resize_images` preserved). 1→1 payload
    replacement; the blob goes straight to a sink, never a shuffle."""
    import numpy as np

    def nn(a, w, h):
        ys = (np.arange(h) * a.shape[0] // h).astype(int)
        xs = (np.arange(w) * a.shape[1] // w).astype(int)
        return a[ys][:, xs]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            new_pay, new_w, new_h = [], [], []
            for mime, payload, w0, h0 in zip(
                pdf["mime"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                raw = bytes(payload) if payload is not None else b""
                try:
                    if mime == "image/x-ppm":
                        enc = encode_ppm(nn(decode_ppm(raw), width, height))
                    elif mime == "image/png":
                        a = decode_png(raw)
                        enc = encode_png(nn(a, width, height), filter_type=0)
                    elif mime == "image/gif":
                        small = nn(decode_gif(raw), width, height)
                        flat = small.reshape(-1, 3)
                        pal, inv = np.unique(
                            flat, axis=0, return_inverse=True
                        )
                        enc = encode_gif(
                            inv.reshape(height, width).astype(np.uint8),
                            pal if len(pal) >= 2
                            else np.vstack([pal, pal]),
                        )
                    elif mime == "image/jpeg":
                        from .jpeg import decode_jpeg, encode_jpeg

                        enc = encode_jpeg(
                            nn(decode_jpeg(raw), width, height)
                        )
                    elif mime == "image/bmp":
                        enc = encode_bmp(nn(decode_bmp(raw), width, height))
                    else:
                        raise ValueError("unsupported mime")
                    new_pay.append(enc)
                    new_w.append(width)
                    new_h.append(height)
                except DECODE_ERRORS:
                    new_pay.append(payload)
                    new_w.append(w0)
                    new_h.append(h0)
            out["payload"] = new_pay
            out["width"] = new_w
            out["height"] = new_h
            yield out

    return media.mapInPandas(run, schema=media.schema)
