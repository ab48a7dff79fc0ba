"""Baseline JPEG codec, stdlib + numpy only — the third genuinely
compressed image format this engine reads without codec libraries
(after PNG's zlib-deflate and GIF's LZW).

Scope (honest): baseline sequential DCT (SOF0) AND progressive DCT
(SOF2 — round-6: spectral selection + successive approximation, the
layout most web JPEGs ship), 8-bit, grayscale or YCbCr with
power-of-two sampling factors (1/2/4) per axis — 4:4:4, 4:2:0 (the
common camera/web layout), 4:2:2, 4:4:0 and 4:1:1 (the DV-camera
layout) all decode through one generic interleaved-MCU loop
(T.81 A.2.3); restart markers (DRI/RSTn) handled on both encode and
decode in both modes. Progressive decode accumulates quantized
coefficients across scans (DC first/refine per G.1.2.1, AC first with
EOB runs per G.1.2.2, AC refinement with correction bits per G.1.2.3)
and reconstructs once at EOI — progressive transmission reorders the
SAME quantized coefficients, so a progressive stream decodes
BIT-IDENTICAL to its baseline twin (pinned in tests). Huffman tables
are read from the stream's DHT segments (files from other encoders
decode too), JFIF color conversion, box-average chroma downsampling on
encode / sample-replication upsampling on decode (libjpeg's "simple"
mode). NOT supported (ValueError, never a wrong image): arithmetic
coding, hierarchical (SOF3/5/6/7/9+), the non-power-of-two sampling
factor 3 (legal in T.81, emitted by nothing real), 12-bit depth.

JPEG is lossy: the roundtrip contract is tolerance-bounded (quantized
DCT error), unlike the bit-exact PNG/GIF paths — the tests pin a flat
block to ±1 and natural-gradient content to a small max error, plus
the decoder's dequant+IDCT chain against an independent numpy IDCT on
hand-planted coefficients.

Reference: ITU-T T.81 (the JPEG spec); tables below follow its Annex K
layout but their exact values don't matter for correctness — the
encoder WRITES its tables into DQT/DHT and the decoder trusts only the
stream.
"""

from __future__ import annotations

import numpy as np

# zigzag scan order: index i of the scan -> (row, col) flattened position
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex-K-layout Huffman tables: (BITS[1..16], HUFFVAL). Validity is
# self-checked at build time (canonical codes must fit their widths);
# the decoder never assumes them — it reads DHT from the stream.
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8-point DCT-II basis (orthonormal)."""
    m = np.zeros((8, 8))
    for k in range(8):
        c = np.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            m[k, n] = c * np.cos((2 * n + 1) * k * np.pi / 16)
    return m


_DCT = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the base tables (1..100)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (Q_LUM, Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman codes: value -> (code, length). Self-checks the
    table (codes must fit their widths — a corrupt table fails here, not
    with a silently wrong image)."""
    assert len(bits) == 16 and sum(bits) == len(vals)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("invalid Huffman table: code overflow")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit stream with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(
    writer: _BitWriter,
    coefs: np.ndarray,
    pred_dc: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """One quantized 8×8 block (zigzag order) → bit stream; returns DC."""
    zz = coefs.flatten()[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred_dc
    s = _category(diff)
    writer.write(*dc_codes[s])
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            writer.write(*ac_codes[0xF0])  # ZRL
            run -= 16
        s = _category(v)
        writer.write(*ac_codes[(run << 4) | s])
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        writer.write(*ac_codes[0x00])  # EOB
    return dc


def _plane_blocks(
    plane: np.ndarray, qt: np.ndarray, nby: int | None = None,
    nbx: int | None = None
) -> np.ndarray:
    """Pad a (h, w) plane to the block grid (edge replicate; grid
    defaults to the 8-multiple cover, callers pass the MCU-aligned grid
    for interleaved scans), forward DCT every block, quantize. Returns
    (nby, nbx, 8, 8) int32."""
    h, w = plane.shape
    nby = nby if nby is not None else (h + 7) // 8
    nbx = nbx if nbx is not None else (w + 7) // 8
    ph, pw = nby * 8, nbx * 8
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ij,yxjk,lk->yxil", _DCT, blocks, _DCT)
    q = qt.reshape(8, 8).astype(np.float64)
    return np.round(coefs / q).astype(np.int32)


def _box_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """fy×fx box-average downsampling (edge-padded to factor multiples) —
    the encode side of the 4:2:0 chroma path."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ph, pw = (h + fy - 1) // fy * fy, (w + fx - 1) // fx * fx
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


#: sampling-factor layouts: component → (h_i, v_i) per T.81 A.1.1
_SUBSAMPLING = {
    "444": [(1, 1), (1, 1), (1, 1)],
    "420": [(2, 2), (1, 1), (1, 1)],
    "422": [(2, 1), (1, 1), (1, 1)],
    "440": [(1, 2), (1, 1), (1, 1)],
    "411": [(4, 1), (1, 1), (1, 1)],
}


def encode_jpeg(
    arr,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → baseline JFIF bytes.
    ``subsampling``: 444 (default), 420, 422 or 440 chroma layout
    (ignored for gray); ``restart_interval`` > 0 writes a DRI segment
    and emits RSTn markers every that many MCUs (DC predictors reset —
    the error-resilience framing most camera JPEGs carry). Standard-
    layout Huffman tables are written to the stream.

    ``progressive=True`` writes SOF2 with a libjpeg-style scan script
    (interleaved DC first at Al=1 → per-component AC first scans at
    Al=1 with spectral selection on luma → DC refinement → AC
    refinements to Al=0): the SAME quantized coefficients as the
    baseline stream, reordered — so both decode to bit-identical
    pixels. EOB runs are emitted per block (run length 1), which keeps
    the standard Annex-K Huffman tables valid for every scan."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h,w) gray or (h,w,3) RGB")
    h, w = a.shape[:2]
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError("encode_jpeg: dimensions must be in 1..65535")
    if restart_interval < 0 or restart_interval > 65535:
        raise ValueError("encode_jpeg: restart_interval must be 0..65535")
    if not gray and subsampling not in _SUBSAMPLING:
        raise ValueError(f"encode_jpeg: unknown subsampling {subsampling!r}")
    qlum, qchr = _quality_tables(quality)

    samp = [(1, 1)] if gray else _SUBSAMPLING[subsampling]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    if gray:
        planes = [a.astype(np.float64)]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [
            _box_downsample(p, vmax // sv, hmax // sh)
            for p, (sh, sv) in zip([y, cb, cr], samp)
        ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00"
    out += b"\x00\x01\x00\x01\x00\x00"

    def dqt(tid: int, table: np.ndarray) -> bytes:
        zz = table.flatten()[ZIGZAG].astype(np.uint8)
        return b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tid]) + zz.tobytes()

    out += dqt(0, qlum)
    if not gray:
        out += dqt(1, qchr)

    ncomp = 1 if gray else 3
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + (8 + 3 * ncomp).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])

    def dht(tclass: int, tid: int, spec) -> bytes:
        bits, vals = spec
        body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + (2 + len(body)).to_bytes(2, "big") + body

    out += dht(0, 0, DC_LUM) + dht(1, 0, AC_LUM)
    if not gray:
        out += dht(0, 1, DC_CHR) + dht(1, 1, AC_CHR)

    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big")
        out += restart_interval.to_bytes(2, "big")

    dc_lum, ac_lum = _build_codes(*DC_LUM), _build_codes(*AC_LUM)
    dc_chr, ac_chr = _build_codes(*DC_CHR), _build_codes(*AC_CHR)
    qts = [qlum] + ([] if gray else [qchr, qchr])
    dcs = [dc_lum] + ([] if gray else [dc_chr, dc_chr])
    acs = [ac_lum] + ([] if gray else [ac_chr, ac_chr])
    coefs = [
        _plane_blocks(p, qt, nby=mcuy * sv, nbx=mcux * sh)
        for p, qt, (sh, sv) in zip(planes, qts, samp)
    ]

    if progressive:
        out += _encode_progressive_scans(
            coefs, samp, mcux, mcuy, w, h, hmax, vmax,
            dcs, acs, restart_interval,
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    out += b"\xff\xda" + (6 + 2 * ncomp).to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_n, rst = 0, 0
    # generic interleaved MCU: v_i × h_i blocks per component, row-major
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                writer.flush()  # byte-align (1-padded) before the marker
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for vy in range(sv):
                    for vx in range(sh):
                        preds[ci] = _encode_block(
                            writer,
                            coefs[ci][my * sv + vy, mx * sh + vx],
                            preds[ci],
                            dcs[ci],
                            acs[ci],
                        )
            mcu_n += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _comp_block_grid(
    w: int, h: int, sh: int, sv: int, hmax: int, vmax: int
) -> tuple[int, int]:
    """Block grid of ONE component's own samples (T.81 A.1.1): the
    walk order of a non-interleaved scan — NOT the MCU-padded grid."""
    cw = (w * sh + hmax - 1) // hmax
    ch = (h * sv + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _encode_progressive_scans(
    coefs: list[np.ndarray],
    samp: list[tuple[int, int]],
    mcux: int,
    mcuy: int,
    w: int,
    h: int,
    hmax: int,
    vmax: int,
    dcs: list[dict],
    acs: list[dict],
    restart_interval: int,
) -> bytes:
    """The progressive scan script (T.81 Annex G), SOS headers +
    entropy data: interleaved DC first scan at Al=1, per-component AC
    first scans at Al=1 (luma spectrally split 1–5 / 6–63 — the
    "blurry preview first" ordering), DC refinement to Al=0, AC
    refinements to Al=0. EOB runs are length-1 (plain 0x00 symbol), so
    the standard tables cover every emitted symbol."""
    ncomp = len(coefs)
    out = bytearray()

    def zz_of(ci: int, by: int, bx: int) -> np.ndarray:
        return coefs[ci][by, bx].flatten()[ZIGZAG]

    def sos_header(comps_in_scan, ss, se, ah, al) -> bytes:
        ns = len(comps_in_scan)
        hdr = bytearray(
            b"\xff\xda" + (6 + 2 * ns).to_bytes(2, "big") + bytes([ns])
        )
        for ci in comps_in_scan:
            hdr += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        hdr += bytes([ss, se, (ah << 4) | al])
        return bytes(hdr)

    def restart(writer, unit_n, state) -> None:
        """Byte-align + RSTn every restart_interval units (MCUs for the
        interleaved DC scan, blocks for single-component scans)."""
        if (
            restart_interval
            and unit_n
            and unit_n % restart_interval == 0
        ):
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + state["rst"]])
            state["rst"] = (state["rst"] + 1) % 8
            state["preds"] = [0] * ncomp

    # ---- scan 1: DC first, interleaved, Al=1 ------------------------
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
    writer = _BitWriter()
    state = {"rst": 0, "preds": [0] * ncomp}
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            restart(writer, mcu_n, state)
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for vy in range(sv):
                    for vx in range(sh):
                        dc = int(coefs[ci][my * sv + vy, mx * sh + vx][0, 0])
                        v = dc >> 1  # DC point transform: arithmetic shift
                        diff = v - state["preds"][ci]
                        state["preds"][ci] = v
                        s = _category(diff)
                        writer.write(*dcs[ci][s])
                        if s:
                            writer.write(
                                diff if diff > 0 else diff + (1 << s) - 1, s
                            )
            mcu_n += 1
    writer.flush()
    out += writer.out

    # ---- AC first scans, Al=1, luma split 1-5 / 6-63 -----------------
    bands = []
    for ci in range(ncomp):
        if ci == 0 and ncomp > 1:
            bands += [(ci, 1, 5), (ci, 6, 63)]
        else:
            bands += [(ci, 1, 63)]

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> None:
        nonlocal out
        out += sos_header([ci], ss, se, 0, al)
        writer = _BitWriter()
        state = {"rst": 0, "preds": [0] * ncomp}
        sh, sv = samp[ci]
        bh, bw = _comp_block_grid(w, h, sh, sv, hmax, vmax)
        blk_n = 0
        for by in range(bh):
            for bx in range(bw):
                restart(writer, blk_n, state)
                zz = zz_of(ci, by, bx)
                r = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t = -((-v) >> al) if v < 0 else v >> al
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        writer.write(*acs[ci][0xF0])
                        r -= 16
                    s = _category(t)
                    writer.write(*acs[ci][(r << 4) | s])
                    writer.write(t if t > 0 else t + (1 << s) - 1, s)
                    r = 0
                if r:
                    writer.write(*acs[ci][0x00])  # EOB, run length 1
                blk_n += 1
        writer.flush()
        out += writer.out

    for ci, ss, se in bands:
        ac_first_scan(ci, ss, se, 1)

    # ---- DC refinement: Ah=1 → Al=0, interleaved, raw bits -----------
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
    writer = _BitWriter()
    state = {"rst": 0, "preds": [0] * ncomp}
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            restart(writer, mcu_n, state)
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for vy in range(sv):
                    for vx in range(sh):
                        dc = int(coefs[ci][my * sv + vy, mx * sh + vx][0, 0])
                        writer.write(dc & 1, 1)
            mcu_n += 1
    writer.flush()
    out += writer.out

    # ---- AC refinement scans: Ah=1 → Al=0 ----------------------------
    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> None:
        nonlocal out
        ah = al + 1
        out += sos_header([ci], ss, se, ah, al)
        writer = _BitWriter()
        state = {"rst": 0, "preds": [0] * ncomp}
        sh, sv = samp[ci]
        bh, bw = _comp_block_grid(w, h, sh, sv, hmax, vmax)
        blk_n = 0
        for by in range(bh):
            for bx in range(bw):
                restart(writer, blk_n, state)
                zz = zz_of(ci, by, bx)
                # events per position: 'z' still-zero, ('c', bit)
                # previously-significant correction, ('n', sign) newly
                # significant. The emitter mirrors the decoder's walk
                # exactly: a run/size symbol covers its run of 'z'
                # events and every 'c' event passed before placement; a
                # ZRL covers the first SIXTEEN 'z' events and only the
                # 'c' events before the 16th; EOB covers the rest.
                events: list[tuple] = []
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t = abs(v) >> al
                    if t == 0:
                        events.append(("z",))
                    elif t == 1:
                        events.append(("n", 1 if v > 0 else 0))
                    else:
                        events.append(("c", t & 1))
                i, n = 0, len(events)
                while i < n:
                    j = i
                    zeros = 0
                    while j < n and events[j][0] != "n":
                        if events[j][0] == "z":
                            zeros += 1
                        j += 1
                    if j == n:
                        if i < n:
                            writer.write(*acs[ci][0x00])  # EOB, run 1
                            for e in events[i:]:
                                if e[0] == "c":
                                    writer.write(e[1], 1)
                        i = n
                        break
                    while zeros > 15:
                        writer.write(*acs[ci][0xF0])  # ZRL
                        cnt = 0
                        while cnt < 16:
                            e = events[i]
                            i += 1
                            if e[0] == "z":
                                cnt += 1
                            else:
                                writer.write(e[1], 1)
                        zeros -= 16
                    writer.write(*acs[ci][(zeros << 4) | 1])
                    writer.write(events[j][1], 1)
                    for e in events[i:j]:
                        if e[0] == "c":
                            writer.write(e[1], 1)
                    i = j + 1
                if n == 0:
                    writer.write(*acs[ci][0x00])  # empty band: EOB
                blk_n += 1
        writer.flush()
        out += writer.out

    for ci, ss, se in bands:
        ac_refine_scan(ci, ss, se, 0)
    return bytes(out)


class _BitReader:
    """MSB-first reader over the entropy segment with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:  # a real marker inside entropy data — stream is over
                raise ValueError("unexpected marker inside entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> int:
        """Byte-align (discard the 1-padding bits), consume the RSTn
        marker at the head of the stream, return n (0–7). A 0xFF pad
        byte shows up stuffed as FF 00 — skipped before the marker."""
        self.acc = 0
        self.nbits = 0
        p = self.pos
        while (
            p + 1 < len(self.data)
            and self.data[p] == 0xFF
            and self.data[p + 1] == 0x00
        ):
            p += 2  # stuffed all-ones padding byte before the marker
        if (
            p + 1 >= len(self.data)
            or self.data[p] != 0xFF
            or not (0xD0 <= self.data[p + 1] <= 0xD7)
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos = p + 2
        return self.data[p + 1] & 7


def _decode_huffman(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        if (code, length) in table:
            return table[(code, length)]
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _next_marker(d: bytes, p: int) -> int:
    """Position of the next real marker (0xFF followed by neither 0x00
    stuffing, 0xFF fill, nor an RSTn that belongs to entropy data)."""
    while p + 1 < len(d):
        if (
            d[p] == 0xFF
            and d[p + 1] != 0x00
            and d[p + 1] != 0xFF
            and not (0xD0 <= d[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    raise ValueError("JPEG truncated: no marker after scan")


def _progressive_scan(
    d: bytes,
    start: int,
    body: bytes,
    comps: list[tuple[int, int, int, int]],
    pcoefs: list[np.ndarray],
    htables: dict[tuple[int, int], dict[tuple[int, int], int]],
    restart_interval: int,
    w: int,
    h: int,
    hmax: int,
    vmax: int,
    mcux: int,
    mcuy: int,
    sa_state: dict[tuple[int, int], int],
) -> int:
    """Decode ONE progressive scan (T.81 Annex G) into the accumulated
    zigzag coefficient arrays; returns the stream position of the next
    marker. DC scans (Ss=Se=0) may be interleaved and walk the MCU
    grid; AC scans are single-component (spec rule, enforced) and walk
    that component's own block grid. Ah=0 scans establish coefficients
    at precision Al (G.1.2.1/G.1.2.2, with EOB runs); Ah>0 scans refine
    by one bit (G.1.2.3: correction bits for already-nonzero
    coefficients interleave the newly-significant run/size symbols).
    RSTn every restart_interval units resets DC predictors and must not
    split an EOB run.

    ``sa_state`` tracks the successive-approximation chain per
    (component, coefficient) across scans (round-6 advisor finding: a
    malformed chain — a refinement before any first scan, an Ah that
    skips the previous Al, a duplicate first scan — used to decode to
    wrong pixels instead of raising, against the module's 'ValueError,
    never a wrong image' contract): each refinement must have
    Ah == the band's previous Al and Al == Ah − 1 (G.1.1.1.1)."""
    ns = body[0]
    if len(body) < 4 + 2 * ns:
        raise ValueError("truncated SOS segment")
    by_cid = {}
    for si in range(ns):
        cs, tt = body[1 + 2 * si], body[2 + 2 * si]
        by_cid[cs] = (tt >> 4, tt & 0x0F)
    ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if not (0 <= ss <= se <= 63) or al > 13 or ah > 14:
        raise ValueError("invalid progressive scan header")
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError(
            "progressive scan may not mix DC and AC coefficients"
        )
    if not dc_scan and ns != 1:
        raise ValueError("progressive AC scan must be single-component")
    if ah and al != ah - 1:
        raise ValueError(
            "progressive refinement must reduce Al by exactly one bit"
        )
    # scan components, bound to SOF order
    idxs = []
    for ci, (cid, _, _, _) in enumerate(comps):
        if cid in by_cid:
            idxs.append(ci)
    if len(idxs) != ns:
        raise ValueError("scan component not declared in SOF")
    for ci in idxs:
        for k in range(ss, se + 1):
            prev = sa_state.get((ci, k))
            if ah == 0:
                if prev is not None:
                    raise ValueError(
                        "duplicate first scan for a coefficient band in "
                        "the successive-approximation chain"
                    )
            else:
                if prev is None:
                    raise ValueError(
                        "progressive refinement before any first scan "
                        "for its coefficient band"
                    )
                if prev != ah:
                    raise ValueError(
                        "successive-approximation gap: refinement Ah "
                        "must equal the band's previous Al"
                    )
            sa_state[(ci, k)] = al
    tabs = {}
    for ci in idxs:
        cid = comps[ci][0]
        dct, act = by_cid[cid]
        if dc_scan and ah == 0:
            if (0, dct) not in htables:
                raise ValueError("missing Huffman table")
            tabs[ci] = htables[(0, dct)]
        elif not dc_scan:
            if (1, act) not in htables:
                raise ValueError("missing Huffman table")
            tabs[ci] = htables[(1, act)]
        else:
            tabs[ci] = None  # DC refinement: raw bits, no table
    reader = _BitReader(d, start)
    p1, m1 = 1 << al, -1 << al

    state = {"eobrun": 0, "preds": [0] * len(comps), "expect_rst": 0}

    def maybe_restart(unit_n: int) -> None:
        if restart_interval and unit_n and unit_n % restart_interval == 0:
            if state["eobrun"]:
                raise ValueError("EOB run crosses a restart interval")
            got = reader.sync_restart()
            if got != state["expect_rst"]:
                raise ValueError("restart marker out of sequence")
            state["expect_rst"] = (state["expect_rst"] + 1) % 8
            state["preds"] = [0] * len(comps)

    def dc_first(ci: int, by: int, bx: int) -> None:
        s = _decode_huffman(reader, tabs[ci])
        diff = _extend(reader.read_bits(s), s) if s else 0
        state["preds"][ci] += diff
        pcoefs[ci][by, bx, 0] = state["preds"][ci] << al

    def dc_refine(ci: int, by: int, bx: int) -> None:
        if reader.read_bit():
            # two's-complement OR appends the next lower magnitude bit
            # correctly for negative DC values too (see module tests)
            pcoefs[ci][by, bx, 0] |= p1

    def ac_first(ci: int, by: int, bx: int) -> None:
        zz = pcoefs[ci][by, bx]
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _decode_huffman(reader, tabs[ci])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    if k > se + 1:
                        raise ValueError("corrupt ZRL run in AC scan")
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("corrupt AC run/size in scan band")
            zz[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    def ac_refine(ci: int, by: int, bx: int) -> None:
        zz = pcoefs[ci][by, bx]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _decode_huffman(reader, tabs[ci])
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:
                        state["eobrun"] = (1 << r)
                        if r:
                            state["eobrun"] += reader.read_bits(r)
                        break  # rest of band is correction-bits only
                    val = 0  # ZRL: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "AC refinement symbol must have size 1"
                        )
                    val = p1 if reader.read_bit() else m1
                # advance r zero-history positions, reading correction
                # bits for the nonzero-history positions passed over
                while k <= se:
                    if zz[k] != 0:
                        if reader.read_bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if state["eobrun"] > 0:
            # EOB-run phase: correction bits for every remaining
            # nonzero coefficient in the band
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            state["eobrun"] -= 1

    if dc_scan and ns > 1:
        block = dc_first if ah == 0 else dc_refine
        mcu_n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(mcu_n)
                for ci in idxs:
                    _, _, sh, sv = comps[ci]
                    for vy in range(sv):
                        for vx in range(sh):
                            block(ci, my * sv + vy, mx * sh + vx)
                mcu_n += 1
    elif dc_scan:
        # single-component DC scan: non-interleaved, the MCU is one
        # block and the walk is the component's OWN grid (T.81 A.2.2)
        ci = idxs[0]
        _, _, sh, sv = comps[ci]
        bh, bw = _comp_block_grid(w, h, sh, sv, hmax, vmax)
        block = dc_first if ah == 0 else dc_refine
        blk_n = 0
        for by in range(bh):
            for bx in range(bw):
                maybe_restart(blk_n)
                block(ci, by, bx)
                blk_n += 1
    else:
        ci = idxs[0]
        _, _, sh, sv = comps[ci]
        bh, bw = _comp_block_grid(w, h, sh, sv, hmax, vmax)
        block = ac_first if ah == 0 else ac_refine
        blk_n = 0
        for by in range(bh):
            for bx in range(bw):
                maybe_restart(blk_n)
                block(ci, by, bx)
                blk_n += 1
        if state["eobrun"]:
            raise ValueError("EOB run extends past the last block")
    return _next_marker(d, reader.pos)


def _reconstruct_progressive(
    comps: list[tuple[int, int, int, int]],
    pcoefs: list[np.ndarray],
    qtables: dict[int, np.ndarray],
    w: int,
    h: int,
):
    """Dequantize + IDCT the accumulated coefficient planes (vectorized
    einsum over all blocks at once), upsample subsampled components by
    sample replication, crop, JFIF color-convert — the same tail as the
    baseline path."""
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    full = []
    for (cid, qid, sh, sv), cz in zip(comps, pcoefs):
        if qid not in qtables:
            raise ValueError("missing quant table")
        q = qtables[qid].astype(np.float64)
        nby, nbx, _ = cz.shape
        nat = np.zeros((nby, nbx, 64), dtype=np.float64)
        nat[:, :, ZIGZAG] = cz.astype(np.float64)
        blocks = nat.reshape(nby, nbx, 8, 8) * q.reshape(8, 8)
        pix = np.einsum("ji,yxjk,kl->yxil", _DCT, blocks, _DCT) + 128.0
        p = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        if sh < hmax:
            p = np.repeat(p, hmax // sh, axis=1)
        if sv < vmax:
            p = np.repeat(p, vmax // sv, axis=0)
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def decode_jpeg(payload: bytes):
    """Baseline JFIF bytes → (h, w) gray or (h, w, 3) RGB uint8.
    Tables are read from the stream; see module docstring for scope."""
    d = payload
    if len(d) < 4 or d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps = None
    restart_interval = 0
    h = w = 0
    progressive = False
    pcoefs: list[np.ndarray] | None = None  # per-component zigzag coefs
    sa_state: dict[tuple[int, int], int] = {}  # (comp, coef) -> last Al
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(d) and d[pos + 1] == 0xFF:
            pos += 1
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if pcoefs is not None:
                # progressive: all scans accumulated — reconstruct once
                return _reconstruct_progressive(
                    comps, pcoefs, qtables, w, h
                )
            raise ValueError("JPEG contains no scan")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers carry no length segment; they are not
            # legal between header segments
            raise ValueError("unexpected standalone marker in header")
        seglen = int.from_bytes(d[pos : pos + 2], "big")
        if pos + seglen > len(d):
            raise ValueError("truncated JPEG segment")
        body = d[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq, tid = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=bpos + 1
                ).astype(np.int64)
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = zz
                qtables[tid] = t.reshape(8, 8)
                bpos += 65
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                if bpos + 17 > len(body):
                    # ValueError (not IndexError) keeps the quarantine
                    # contract of the mapInPandas consumers intact
                    raise ValueError("truncated DHT segment")
                tclass, tid = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                if bpos + 17 + n > len(body):
                    raise ValueError("DHT declares more codes than present")
                vals = list(body[bpos + 17 : bpos + 17 + n])
                inv: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        inv[(code, length)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                htables[(tclass, tid)] = inv
                bpos += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("truncated SOF0 segment")
            if body[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF0 component list")
            comps = []
            for ci in range(nc):
                cid, samp, qid = body[6 + 3 * ci : 9 + 3 * ci]
                sh, sv = samp >> 4, samp & 0x0F
                if sh not in (1, 2, 4) or sv not in (1, 2, 4):
                    raise ValueError(
                        "sampling factors must be 1, 2 or 4"
                    )
                comps.append((cid, qid, sh, sv))
            if nc == 3 and [c[0] for c in comps] != [1, 2, 3]:
                # Adobe-style RGB component ids ('R','G','B') would get
                # the YCbCr matrix applied — reject rather than emit
                # silently wrong colors
                raise ValueError(
                    "non-JFIF component ids unsupported (expect 1,2,3)"
                )
            if nc not in (1, 3):
                raise ValueError("1- or 3-component JPEG only")
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) JPEG "
                "supported"
            )
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if comps is None:
                raise ValueError("SOS before SOF")
            if progressive:
                hmax = max(c[2] for c in comps)
                vmax = max(c[3] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                if pcoefs is None:
                    pcoefs = [
                        np.zeros(
                            (mcuy * c[3], mcux * c[2], 64), dtype=np.int32
                        )
                        for c in comps
                    ]
                pos = _progressive_scan(
                    d, pos + seglen, body, comps, pcoefs, htables,
                    restart_interval, w, h, hmax, vmax, mcux, mcuy,
                    sa_state,
                )
                continue
            ns = body[0]
            if ns != len(comps):
                raise ValueError(
                    "multi-scan baseline unsupported (one interleaved "
                    "scan expected)"
                )
            by_cid = {}
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                by_cid[cs] = (cs, tt >> 4, tt & 0x0F)
            try:  # bind scan tables by component id, not position
                scan = [by_cid[c[0]] for c in comps]
            except KeyError:
                raise ValueError("scan component not declared in SOF")
            reader = _BitReader(d, pos + seglen)
            ncomp = len(comps)
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            planes = [
                np.zeros((mcuy * c[3] * 8, mcux * c[2] * 8), dtype=np.float64)
                for c in comps
            ]
            preds = [0] * ncomp
            qs = []
            for cid, qid, _, _ in comps:
                if qid not in qtables:
                    raise ValueError("missing quant table")
                qs.append(qtables[qid].astype(np.float64))
            tabs = []
            for ci in range(ncomp):
                _, dct, act = scan[ci]
                if (0, dct) not in htables or (1, act) not in htables:
                    raise ValueError("missing Huffman table")
                tabs.append((htables[(0, dct)], htables[(1, act)]))

            def read_block(ci: int) -> np.ndarray:
                dc_t, ac_t = tabs[ci]
                s = _decode_huffman(reader, dc_t)
                diff = _extend(reader.read_bits(s), s) if s else 0
                preds[ci] += diff
                zz = np.zeros(64, dtype=np.int64)
                zz[0] = preds[ci]
                i = 1
                while i < 64:
                    rs = _decode_huffman(reader, ac_t)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        i += 16
                        if i > 63:  # ZRL may not run off the block
                            raise ValueError("corrupt ZRL run")
                        continue
                    run, size = rs >> 4, rs & 0x0F
                    i += run
                    if i > 63 or size == 0:
                        raise ValueError("corrupt AC run/size")
                    zz[i] = _extend(reader.read_bits(size), size)
                    i += 1
                coefs = np.zeros(64, dtype=np.float64)
                coefs[ZIGZAG] = zz
                block = coefs.reshape(8, 8) * qs[ci]
                return _DCT.T @ block @ _DCT + 128.0

            # generic interleaved MCU walk (T.81 A.2.3): v_i × h_i
            # blocks per component per MCU; RSTn every restart_interval
            # MCUs resets the DC predictors and byte-aligns
            mcu_n, expect_rst = 0, 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if (
                        restart_interval
                        and mcu_n
                        and mcu_n % restart_interval == 0
                    ):
                        got = reader.sync_restart()
                        if got != expect_rst:
                            raise ValueError(
                                "restart marker out of sequence"
                            )
                        expect_rst = (expect_rst + 1) % 8
                        preds = [0] * ncomp
                    for ci in range(ncomp):
                        _, _, sh, sv = comps[ci]
                        for vy in range(sv):
                            for vx in range(sh):
                                pix = read_block(ci)
                                y0 = (my * sv + vy) * 8
                                x0 = (mx * sh + vx) * 8
                                planes[ci][
                                    y0 : y0 + 8, x0 : x0 + 8
                                ] = pix
                    mcu_n += 1
            # upsample subsampled components by sample replication
            # (libjpeg "simple" mode), then crop to the frame
            full = []
            for p, (_, _, sh, sv) in zip(planes, comps):
                if sh < hmax:
                    p = np.repeat(p, hmax // sh, axis=1)
                if sv < vmax:
                    p = np.repeat(p, vmax // sv, axis=0)
                full.append(p[:h, :w])
            if ncomp == 1:
                return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
            y, cb, cr = full
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            return np.clip(
                np.round(np.stack([r, g, b], axis=2)), 0, 255
            ).astype(np.uint8)
        pos += seglen
    if (
        pcoefs is not None
        and pos + 2 <= len(d)
        and d[pos : pos + 2] == b"\xff\xd9"
    ):
        # EOI in the final two bytes (the loop guard needs 4 bytes for
        # segment headers): all progressive scans accumulated
        return _reconstruct_progressive(comps, pcoefs, qtables, w, h)
    raise ValueError("JPEG contains no scan")
