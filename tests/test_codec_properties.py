"""Property-based roundtrip laws for the stdlib codecs (no Spark —
pure codec properties, so hypothesis can run many cases cheaply).

Lossless codecs (PPM, PNG, GIF, FLAC, WAV) must roundtrip BIT-EXACT on
arbitrary inputs; JPEG (lossy) must roundtrip shape-exact with bounded
error on arbitrary inputs and never crash on its own output."""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from etl_weather_jabar_spark.ext.flac import decode_flac, encode_flac
from etl_weather_jabar_spark.ext.jpeg import decode_jpeg, encode_jpeg
from etl_weather_jabar_spark.ext.multimodal import (
    decode_gif,
    decode_png,
    decode_ppm,
    decode_wav_pcm16,
    encode_gif,
    encode_png,
    encode_ppm,
    encode_wav_pcm16,
)


def _img(draw, h, w, channels):
    seed = draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.integers(0, 256, size=shape, dtype=np.uint16).astype(np.uint8)


@st.composite
def rgb_images(draw, max_side=33):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    return _img(draw, h, w, 3)


@st.composite
def any_png_images(draw):
    h = draw(st.integers(1, 20))
    w = draw(st.integers(1, 20))
    c = draw(st.sampled_from([1, 2, 3, 4]))
    return _img(draw, h, w, c), draw(st.integers(0, 4))


@st.composite
def pcm_clips(draw):
    n = draw(st.integers(0, 6000))
    seed = draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["noise", "sine", "steps", "const"]))
    if kind == "noise":
        return rng.integers(-32768, 32768, size=n).astype(np.int16)
    if kind == "sine":
        t = np.arange(n)
        f = draw(st.integers(1, 4000))
        return (np.sin(2 * np.pi * f * t / 16000) * 15000).astype(np.int16)
    if kind == "steps":
        return ((np.arange(n) // 7) % 2000 - 1000).astype(np.int16)
    return np.full(n, draw(st.integers(-32768, 32767)), dtype=np.int16)


@settings(max_examples=30, deadline=None)
@given(rgb_images())
def test_ppm_roundtrip_property(img):
    assert (decode_ppm(encode_ppm(img)) == img).all()


@settings(max_examples=30, deadline=None)
@given(any_png_images())
def test_png_roundtrip_property(case):
    img, ftype = case
    dec = decode_png(encode_png(img, filter_type=ftype))
    want = img if img.ndim == 3 else img[:, :, None]
    assert (dec == want).all()


@settings(max_examples=30, deadline=None)
@given(rgb_images(max_side=20), st.integers(2, 256), st.integers(0, 2**32 - 1))
def test_gif_roundtrip_property(img, k, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(k, 3), dtype=np.uint16).astype(np.uint8)
    idx = (img[:, :, 0].astype(int) % k).astype(np.uint8)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()


@settings(max_examples=40, deadline=None)
@given(pcm_clips(), st.sampled_from([8000, 16000, 44100]))
def test_flac_roundtrip_property(clip, rate):
    if len(clip) == 0:
        return  # empty stream: nothing to assert beyond no-crash
    r, dec = decode_flac(encode_flac(clip, rate))
    assert r == rate and len(dec) == len(clip) and (dec == clip).all()


@settings(max_examples=30, deadline=None)
@given(pcm_clips())
def test_wav_roundtrip_property(clip):
    rate, dec = decode_wav_pcm16(encode_wav_pcm16(clip, 16000))
    assert rate == 16000 and (dec == clip).all()


@settings(max_examples=20, deadline=None)
@given(rgb_images(max_side=24), st.integers(70, 98))
@example(  # the chroma-edge case that falsified the old 128 bound
    img=np.array(
        [[[96, 115, 68], [80, 101, 45]],
         [[6, 235, 252], [75, 121, 14]],
         [[53, 168, 195], [214, 188, 238]]],
        dtype=np.uint8,
    ),
    quality=70,
)
def test_jpeg_lossy_roundtrip_property(img, quality):
    dec = decode_jpeg(encode_jpeg(img, quality=quality))
    assert dec.shape == img.shape
    # Error tripwires. The one-number-per-channel bound this test used
    # to assert (max ≤ 128) was EMPIRICAL and a legitimate encode
    # finally falsified it (3×2 chroma-edge image at q70 → 144): the
    # true per-channel worst case is chroma quant error × the 1.772
    # Cb→B conversion gain summed over coefficients — hundreds, not
    # 128. What separates a working codec from a broken entropy/IDCT
    # path robustly: LUMA max error (gain 1, fine quant table), the
    # MEAN absolute error (broken paths scramble most pixels), and a
    # loose per-channel ceiling.
    err = np.abs(dec.astype(int) - img.astype(int))
    luma_err = np.abs(
        (0.299 * dec[..., 0] + 0.587 * dec[..., 1] + 0.114 * dec[..., 2])
        - (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    )
    assert int(luma_err.max()) <= 128
    assert float(err.mean()) <= 48.0
    assert int(err.max()) <= 192
    # flat regions must stay tight regardless of quality
    flat = np.full((8, 8, 3), int(img[0, 0, 0]), dtype=np.uint8)
    dflat = decode_jpeg(encode_jpeg(flat, quality=quality))
    assert int(np.abs(dflat.astype(int) - flat.astype(int)).max()) <= 2


@settings(max_examples=20, deadline=None)
@given(
    rgb_images(max_side=24),
    st.integers(70, 98),
    st.sampled_from(["420", "422", "440"]),
    st.integers(0, 3),
)
def test_jpeg_subsampled_restart_roundtrip_property(img, quality, ss, ri):
    """Property sweep over the widened profile: any image × quality ×
    chroma layout × restart interval decodes to the right shape with
    bounded LUMA error, and restart framing never changes pixels."""
    enc = encode_jpeg(img, quality=quality, subsampling=ss, restart_interval=ri)
    dec = decode_jpeg(enc)
    assert dec.shape == img.shape

    def luma(a):
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]

    assert int(np.abs(luma(dec) - luma(img)).max()) <= 128
    if ri:
        ref = decode_jpeg(
            encode_jpeg(img, quality=quality, subsampling=ss)
        )
        assert np.array_equal(ref, dec)
