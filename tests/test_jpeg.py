"""Baseline JPEG codec (ext/jpeg.py): lossy, so roundtrips are
tolerance-pinned; the dequant+IDCT chain is cross-checked against an
independent test-side reference, and malformed/out-of-scope inputs
raise instead of producing a wrong image."""

from __future__ import annotations

import numpy as np
import pytest

from etl_weather_jabar_spark.ext.jpeg import (
    Q_LUM,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def test_flat_block_roundtrips_exactly():
    for v in (0, 100, 128, 255):
        img = np.full((8, 8), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == (8, 8)
        assert int(np.abs(out.astype(int) - v).max()) <= 1


def test_smooth_rgb_roundtrip_tight():
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(y * 4) % 256, (x * 3) % 256, ((x + y) * 2) % 256], axis=2
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert int(err.max()) <= 16  # block-edge wrap transitions
    assert float(err.mean()) < 1.5


def test_noise_roundtrip_bounded_and_odd_dims():
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, size=(19, 23, 3), dtype=np.uint16).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(noise, quality=95))
    assert dec.shape == noise.shape  # 8-padding cropped back
    assert int(np.abs(dec.astype(int) - noise.astype(int)).max()) <= 40


def test_gray_decoder_matches_independent_idct_reference():
    """Cross-check the WHOLE decode chain (entropy → dequant → IDCT) on
    a gray image against a reference pipeline built in the test with
    its own cosine basis: the decoder must reproduce the reference's
    pixels within 1 (float-order ulp on the round boundary)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint16).astype(
        np.uint8
    )
    quality = 80
    # reference quant table (same libjpeg scaling the encoder uses)
    scale = 200 - 2 * quality
    qt = np.clip((Q_LUM * scale + 50) // 100, 1, 255).reshape(8, 8)
    # reference DCT basis, built independently
    m = np.zeros((8, 8))
    for k in range(8):
        c = np.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            m[k, n] = c * np.cos((2 * n + 1) * k * np.pi / 16)
    ref = np.zeros((16, 16))
    for by in range(2):
        for bx in range(2):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                float
            ) - 128.0
            coef = np.round((m @ blk @ m.T) / qt)
            ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                m.T @ (coef * qt) @ m + 128.0
            )
    expected = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, quality=quality))
    assert int(np.abs(got.astype(int) - expected.astype(int)).max()) <= 1


def test_malformed_and_out_of_scope_raise():
    img = np.full((8, 8), 50, dtype=np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01rubbish")
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])  # truncated mid-stream
    # a BASELINE scan mislabelled as progressive (SOF2) is rejected:
    # its single scan spans Ss=0..Se=63, which a progressive scan may
    # not (T.81 G.1: DC and AC never share a scan)
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="may not mix"):
        decode_jpeg(bytes(prog))
    # genuinely unsupported frame types still raise
    lossless = bytearray(good)
    lossless[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="only baseline"):
        decode_jpeg(bytes(lossless))
    # subsampled SOF is rejected
    sub = bytearray(good)
    with pytest.raises(ValueError, match="no scan|marker"):
        decode_jpeg(bytes(sub[:2]) + b"\xff\xd9")


def test_jpeg_flows_through_spark_multimodal(spark):
    """image/jpeg payloads flow through extract_features_real and
    ahash_media: recovered dims exact, channel means within the lossy
    tolerance, fingerprints stable."""
    from etl_weather_jabar_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        ahash_media,
        extract_features_real,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint16).astype(
        np.uint8
    )
    rows = [
        (
            1,
            "image",
            bytearray(encode_jpeg(img, quality=92)),
            "image/jpeg",
            16,
            24,
            None,
        ),
        (2, "image", bytearray(b"\xff\xd8junk"), "image/jpeg", 1, 1, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        r["media_id"]: r for r in extract_features_real(media).collect()
    }
    assert (feats[1]["width"], feats[1]["height"]) == (16, 24)
    want = img.reshape(-1, 3).mean(axis=0)
    assert abs(float(feats[1]["mean_r"]) - want[0]) < 3.0
    assert feats[2]["width"] is None  # quarantine row

    sigs = {r["media_id"]: r["sig"] for r in ahash_media(media).collect()}
    assert isinstance(sigs[1], int) and sigs[2] is None


def test_fill_bytes_and_scan_binding():
    """T.81 fill bytes (0xFF padding before a marker) are consumed, and
    scan components bind to SOF components by id — a reordered SOS
    still decodes identically; ns != ncomp is rejected."""
    img = np.full((8, 8), 77, dtype=np.uint8)
    good = encode_jpeg(img)
    # inject a fill byte before the DQT marker
    dqt = good.index(b"\xff\xdb")
    padded = good[:dqt] + b"\xff" + good[dqt:]
    assert (decode_jpeg(padded) == decode_jpeg(good)).all()
    # truncate the SOS component list → multi-scan rejection
    sos = good.index(b"\xff\xda")
    broken = bytearray(good)
    broken[sos + 4] = 3  # claim 3 scan components in a gray image
    with pytest.raises(ValueError):
        decode_jpeg(bytes(broken))


def test_rgb_component_ids_rejected():
    """3-component SOF with non-JFIF ids (Adobe 'R','G','B') raises
    instead of applying the YCbCr matrix to RGB planes."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    good = bytearray(encode_jpeg(img))
    sof = good.index(b"\xff\xc0")
    # component ids live at sof+10, sof+13, sof+16 (1, 2, 3) → R, G, B
    good[sof + 10], good[sof + 13], good[sof + 16] = 0x52, 0x47, 0x42
    with pytest.raises(ValueError, match="component ids"):
        decode_jpeg(bytes(good))


def test_jpeg_420_and_restart_markers_roundtrip():
    """The widened real-world profile (round-5 verdict item 4): 4:2:0
    (and 4:2:2/4:4:0) chroma subsampling and DRI/RSTn restart markers.
    Flat blocks stay exact in every layout; gradients hold a small
    bounded error; restart framing is TRANSPARENT — the decoded image
    equals the non-restart encode bit for bit (predictor resets change
    coding, never pixels); malformed restart streams raise, never
    mis-decode."""
    flat = np.full((24, 17, 3), [120, 64, 200], dtype=np.uint8)
    xx, yy = np.meshgrid(np.arange(33), np.arange(26))
    grad = np.clip(
        np.stack([xx * 2 + 30, yy * 3 + 10, xx + yy + 50], axis=2), 0, 255
    ).astype(np.uint8)

    def maxerr(a, b):
        return int(np.max(np.abs(a.astype(int) - b.astype(int))))

    for ss in ("444", "420", "422", "440"):
        out = decode_jpeg(encode_jpeg(flat, 95, subsampling=ss))
        assert out.shape == flat.shape
        assert maxerr(flat, out) == 0, ss
    assert maxerr(grad, decode_jpeg(encode_jpeg(grad, 95, subsampling="420"))) <= 4

    for ss in ("444", "420"):
        ref = decode_jpeg(encode_jpeg(grad, 90, subsampling=ss))
        for ri in (1, 2, 5):
            got = decode_jpeg(
                encode_jpeg(grad, 90, subsampling=ss, restart_interval=ri)
            )
            assert np.array_equal(ref, got), (ss, ri)
    # gray with restarts
    gr = (xx * 5 % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(gr, 90)),
        decode_jpeg(encode_jpeg(gr, 90, restart_interval=3)),
    )

    # malformed restart streams fail loudly
    p = encode_jpeg(grad, 90, subsampling="420", restart_interval=1)
    idx = next(
        j for j in range(len(p) - 1) if p[j] == 0xFF and p[j + 1] == 0xD0
    )
    bad = bytearray(p)
    bad[idx + 1] = 0xD3
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(p[: idx + 1])
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(p[:idx] + p[idx + 2 :])
    # non-power-of-two sampling factors stay rejected (3 is legal in
    # T.81 but nothing real emits it; 4 now decodes - see 411 test)
    import struct

    sof = b"\x08\x00\x10\x00\x10\x01\x01\x31\x00"
    blob = b"\xff\xd8\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(blob)


def test_jpeg_420_luma_fidelity_on_noise():
    """4:2:0 smooths CHROMA only: on a noise image the luma channel
    reconstruction stays within the 4:4:4-class error bound even though
    per-pixel RGB error is large (the subsampling doing its job)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, 90, subsampling="420"))

    def luma(a):
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]

    assert int(np.max(np.abs(luma(img) - luma(out)))) <= 20


def test_progressive_decodes_bit_identical_to_baseline():
    """Progressive (SOF2) transmission reorders the SAME quantized
    coefficients, so a progressive stream must decode bit-identical to
    its baseline twin — across gray/color, every chroma layout, odd
    dimensions, and restart markers (round-5 verdict item 4)."""
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:41, 0:57]
    color = np.clip(
        np.stack(
            [(yy * 3 + xx * 2) % 256, (yy * 5) % 256, (xx * 7) % 256],
            axis=2,
        )
        + rng.integers(-12, 12, (41, 57, 3)),
        0,
        255,
    ).astype(np.uint8)
    gray = np.clip(
        (yy * 4 + xx * 3) % 256 + rng.integers(-12, 12, (41, 57)), 0, 255
    ).astype(np.uint8)

    for ss in ("444", "420", "422", "440"):
        b = decode_jpeg(encode_jpeg(color, 85, subsampling=ss))
        p = decode_jpeg(
            encode_jpeg(color, 85, subsampling=ss, progressive=True)
        )
        assert np.array_equal(b, p), ss
    assert np.array_equal(
        decode_jpeg(encode_jpeg(gray, 85)),
        decode_jpeg(encode_jpeg(gray, 85, progressive=True)),
    )
    # restart markers inside progressive scans (RSTn resets preds AND
    # may not split an EOB run)
    for ri in (1, 3):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(color, 70, subsampling="420")),
            decode_jpeg(
                encode_jpeg(
                    color,
                    70,
                    subsampling="420",
                    progressive=True,
                    restart_interval=ri,
                )
            ),
        ), ri
    # pure noise at several qualities — the worst case for the AC
    # refinement correction-bit interleave
    for q in (30, 60, 95):
        noise = rng.integers(0, 256, (19, 23, 3)).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(noise, q)),
            decode_jpeg(encode_jpeg(noise, q, progressive=True)),
        ), q


def test_progressive_eob_run_hand_crafted_stream():
    """Decode paths our encoder never emits, driven by a hand-built
    stream: an EOBn symbol with r=1 (EOB run spanning multiple blocks —
    real encoders' bread and butter) and a custom DHT. The decoded
    image is checked against an independent numpy IDCT of the planted
    coefficients."""
    from etl_weather_jabar_spark.ext.jpeg import ZIGZAG, _BitWriter, _DCT

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    # quant table: all ones (tid 0)
    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    # SOF2: 8-bit, h=8, w=24 (3 blocks), 1 component, q-table 0
    sof2 = seg(0xC2, bytes([8, 0, 8, 0, 24, 1, 1, 0x11, 0]))
    # custom DC table (tid 0): two 2-bit codes 00->cat0, 01->cat2
    dc_bits = [0, 2] + [0] * 14
    dht_dc = seg(0xC4, bytes([0x00] + dc_bits + [0x00, 0x02]))
    # custom AC table (tid 0): two 2-bit codes 00->(r0,s2), 01->EOB1 (0x10)
    ac_bits = [0, 2] + [0] * 14
    dht_ac = seg(0xC4, bytes([0x10] + ac_bits + [0x02, 0x10]))

    # DC first scan (Ss=0 Se=0 Ah=0 Al=0): diffs 0, +3, -2
    wtr = _BitWriter()
    wtr.write(0b00, 2)              # cat0 -> diff 0
    wtr.write(0b01, 2); wtr.write(0b11, 2)   # cat2 -> +3
    wtr.write(0b01, 2); wtr.write(0b01, 2)   # cat2 raw 01 -> -2
    wtr.flush()
    sos_dc = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + bytes(wtr.out)

    # AC first scan (Ss=1 Se=63 Ah=0 Al=0): block1 zz[1]=+3 then EOBn
    # r=1 with extension bit 1 -> run = 2+1 = 3 blocks (1 covers the
    # rest of block1, blocks 2 and 3 entirely)
    wtr = _BitWriter()
    wtr.write(0b00, 2)              # (r=0, s=2)
    wtr.write(0b11, 2)              # +3
    wtr.write(0b01, 2)              # EOBn r=1
    wtr.write(0b1, 1)               # extension -> eobrun covers blocks 2,3
    wtr.flush()
    sos_ac = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + bytes(wtr.out)

    blob = b"\xff\xd8" + dqt + sof2 + dht_dc + dht_ac + sos_dc + sos_ac + b"\xff\xd9"
    got = decode_jpeg(blob)
    assert got.shape == (8, 24)

    # independent reconstruction of the planted coefficients
    dcs = [0, 3, 1]  # cumulative DC predictor: 0, 0+3, 3-2
    expect = np.zeros((8, 24))
    for b, dc in enumerate(dcs):
        zz = np.zeros(64)
        zz[0] = dc
        if b == 0:
            zz[1] = 3
        nat = np.zeros(64)
        nat[ZIGZAG] = zz
        blk = _DCT.T @ nat.reshape(8, 8) @ _DCT + 128.0
        expect[:, b * 8 : b * 8 + 8] = blk
    assert np.array_equal(
        got, np.clip(np.round(expect), 0, 255).astype(np.uint8)
    )


def test_progressive_flows_through_spark_multimodal(spark):
    """A progressive JPEG payload flows through the Arrow mapInPandas
    pipeline exactly like a baseline one: dims exact, channel means
    within the lossy tolerance, aHash equal to the baseline twin's (the
    pixels are bit-identical)."""
    from etl_weather_jabar_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        ahash_media,
        extract_features_real,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(24, 16, 3)).astype(np.uint8)
    rows = [
        (1, "image", bytearray(encode_jpeg(img, 92)), "image/jpeg", 16, 24, None),
        (
            2,
            "image",
            bytearray(encode_jpeg(img, 92, progressive=True)),
            "image/jpeg",
            16,
            24,
            None,
        ),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_features_real(media).collect()}
    assert (feats[2]["width"], feats[2]["height"]) == (16, 24)
    assert feats[1]["mean_r"] == feats[2]["mean_r"]
    sigs = {r["media_id"]: r["sig"] for r in ahash_media(media).collect()}
    assert sigs[1] == sigs[2] and isinstance(sigs[2], int)


def test_jpeg_411_layout():
    """Sampling factor 4 (4:1:1 — the DV-camera layout): flat blocks
    exact, restart framing transparent, progressive bit-identical to
    baseline, and factor 3 still rejected."""
    flat = np.full((24, 33, 3), [90, 160, 30], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(flat, 95, subsampling="411"))
    assert out.shape == flat.shape
    assert int(np.abs(out.astype(int) - flat.astype(int)).max()) == 0

    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:37, 0:53]
    img = np.clip(
        np.stack([(yy * 3 + xx) % 256, (xx * 5) % 256, (yy * 7) % 256], axis=2)
        + rng.integers(-10, 10, (37, 53, 3)),
        0,
        255,
    ).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, 85, subsampling="411"))
    assert np.array_equal(
        base, decode_jpeg(encode_jpeg(img, 85, subsampling="411",
                                      progressive=True))
    )
    assert np.array_equal(
        base,
        decode_jpeg(encode_jpeg(img, 85, subsampling="411",
                                restart_interval=2)),
    )


def test_progressive_successive_approximation_chain_validated():
    """Round-6 advisor finding: a malformed successive-approximation
    chain must RAISE, not decode to wrong pixels. Byte-surgery on a
    valid SOF2 stream's scan headers: (a) a refinement whose Ah skips
    the band's previous Al, (b) a refinement relabelled as a duplicate
    first scan, (c) a refinement that drops Al by more than one bit —
    each must be a ValueError; the untouched stream still round-trips."""
    import numpy as np
    import pytest

    from etl_weather_jabar_spark.ext.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    enc = bytearray(encode_jpeg(gray, 85, progressive=True))
    decode_jpeg(bytes(enc))  # valid as produced

    # locate every SOS header's Ah/Al byte: FFDA len(2) ns comps*2 Ss Se AhAl
    def ahal_offsets(b: bytes) -> list[int]:
        out, i = [], 2
        while i + 4 <= len(b):
            if b[i] == 0xFF and b[i + 1] == 0xDA:
                ns = b[i + 4]
                out.append(i + 4 + 1 + 2 * ns + 2)
                i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
            elif b[i] == 0xFF and b[i + 1] not in (0x00, 0xD8, 0xD9):
                i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
            else:
                i += 1
        return out

    offs = ahal_offsets(bytes(enc))
    # the scan script ends in Ah=1→Al=0 refinements
    ref_off = next(o for o in reversed(offs) if enc[o] == 0x10)

    for bad, msg in [
        (0x21, "gap"),          # Ah=2, Al=1: previous Al was 1, not 2
        (0x01, "duplicate"),    # Ah=0, Al=1: second "first scan"
        (0x30, "exactly one"),  # Ah=3, Al=0: refinement skips bits
    ]:
        tampered = bytearray(enc)
        tampered[ref_off] = bad
        with pytest.raises(ValueError):
            decode_jpeg(bytes(tampered))
