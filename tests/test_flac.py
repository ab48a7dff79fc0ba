"""FLAC fixed-subset codec (ext/flac.py): lossless, so roundtrips are
BIT-EXACT (unlike JPEG's tolerance contract); CRCs catch tampering,
out-of-scope streams raise."""

from __future__ import annotations

import numpy as np
import pytest

from etl_weather_jabar_spark.ext.flac import decode_flac, encode_flac


def test_roundtrip_bit_exact_all_signal_shapes():
    rng = np.random.default_rng(5)
    t = np.arange(9000)
    cases = {
        "sine": (np.sin(2 * np.pi * 440 * t / 16000) * 12000).astype(
            np.int16
        ),
        "noise": rng.integers(-32768, 32768, size=5000).astype(np.int16),
        "ramp": (np.arange(7000) % 20000 - 10000).astype(np.int16),
        "const": np.full(4196, -123, dtype=np.int16),
        "tiny": np.array([5, -3, 7], dtype=np.int16),
        "extremes": np.array([-32768, 32767, 0, -1, 1], dtype=np.int16),
    }
    for name, s in cases.items():
        rate, dec = decode_flac(encode_flac(s, 16000))
        assert rate == 16000, name
        assert len(dec) == len(s), name
        assert (dec == s).all(), name


def test_fixed_predictors_actually_compress():
    t = np.arange(16000)
    sine = (np.sin(2 * np.pi * 220 * t / 16000) * 15000).astype(np.int16)
    payload = encode_flac(sine, 16000)
    assert len(payload) < 0.5 * 2 * len(sine)  # < half of raw PCM
    const = np.zeros(16000, dtype=np.int16)
    assert len(encode_flac(const, 16000)) < 200  # constant subframes


def test_crc_tamper_detection_and_scope_rejections():
    s = (np.arange(3000) % 1000 - 500).astype(np.int16)
    payload = bytearray(encode_flac(s, 16000))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"WAVEnope")
    # flip one bit in the entropy body → a CRC must catch it
    payload[-40] ^= 0x10
    with pytest.raises(ValueError, match="CRC|truncated|unary|range"):
        decode_flac(bytes(payload))
    good = encode_flac(s, 16000)
    with pytest.raises(ValueError):
        decode_flac(good[: len(good) - 7])  # truncated final frame


def test_flac_flows_through_spark_audio_pipeline(spark):
    """audio/flac payloads decode inside audio_fingerprint_media and
    extract_features_real with fingerprints IDENTICAL to the same
    samples shipped as WAV (lossless = same PCM in, same sig out)."""
    from etl_weather_jabar_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint_media,
        encode_wav_pcm16,
        extract_features_real,
    )

    t = np.arange(8000)
    s = (
        np.sin(2 * np.pi * 330 * t / 16000)
        * (5000 + 8000 * np.exp(-t / 3000))
    ).astype(np.int16)
    rows = [
        (1, "audio", bytearray(encode_flac(s, 16000)), "audio/flac", None, None, None),
        (2, "audio", bytearray(encode_wav_pcm16(s, 16000)), "audio/wav", None, None, None),
        (3, "audio", bytearray(b"fLaCjunk"), "audio/flac", None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    sigs = {
        r["media_id"]: (r["sig"], r["n_samples"], r["rate"])
        for r in audio_fingerprint_media(media).collect()
    }
    assert sigs[1] == sigs[2]  # lossless: identical fingerprints
    assert sigs[1][1] == 8000 and sigs[1][2] == 16000
    assert sigs[3] == (None, None, None)  # quarantine

    feats = {
        r["media_id"]: (r["duration_ms"], r["rms"])
        for r in extract_features_real(media).collect()
    }
    assert feats[1] == feats[2]
    assert feats[1][0] == 500


def test_truncation_at_frame_boundary_raises():
    """A stream cut exactly between frames (valid CRCs up to the cut)
    must raise, not silently return half the samples; STREAMINFO
    total=0 means UNKNOWN per RFC 9639, not an empty stream."""
    s = (np.arange(32) % 100 - 50).astype(np.int16)
    payload = bytearray(encode_flac(s, 16000, block=16))  # 2 frames
    # find the second frame's sync (0xFF 0xF8) after the first frame
    first_sync = payload.index(b"\xff\xf8", 42)
    second_sync = payload.index(b"\xff\xf8", first_sync + 2)
    with pytest.raises(ValueError, match="truncated"):
        decode_flac(bytes(payload[:second_sync]))
    # total=0 → unknown: frames still decode (patch the 36-bit count,
    # which ends the STREAMINFO body at byte 4+4+21 = bits 144..179)
    unk = bytearray(payload)
    # zero the last 4.5 bytes of the 18-byte prefix carrying the count
    unk[21] &= 0xF0
    unk[22:26] = b"\x00\x00\x00\x00"
    rate, dec = decode_flac(bytes(unk))
    assert (dec == s).all()  # all frames decoded despite unknown total
