"""FLAC codec (fixed-prediction subset), stdlib only — the compressed
AUDIO format this engine reads codec-free, beside PCM WAV. Unlike JPEG
the format is lossless, so roundtrips are bit-exact and testable
without any reference library.

Scope (honest): 16-bit mono, one frame per stream chunk, subframe types
CONSTANT / VERBATIM / FIXED order 0-4 (the spec's polynomial
predictors), rice-coded residuals (partition order 0), CRC-8 header and
CRC-16 frame checksums verified on decode. The encoder picks the fixed
order with the smallest absolute-residual sum — the same heuristic
flake/libFLAC use for its subset mode. NOT supported (ValueError,
never wrong samples): LPC subframes, stereo decorrelation, wasted
bits, variable block strategy beyond the last-frame short block.

Reference: the FLAC format spec (RFC 9639); structure only — every
line below is written from the published bit layout.
"""

from __future__ import annotations


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BW:
    """MSB-first bit writer."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.w(0, 32)
            q -= 32
        self.w(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.w(0, 8 - self.n)


class _BR:
    """MSB-first bit reader."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def r(self, bits: int) -> int:
        while self.n < bits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def unary(self) -> int:
        q = 0
        while self.r(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0


_FIXED = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _residual(samples: list[int], order: int) -> list[int]:
    co = _FIXED[order]
    return [
        samples[i] - sum(c * samples[i - j - 1] for j, c in enumerate(co))
        for i in range(order, len(samples))
    ]


def _rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res) + 1
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _zz(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _unzz(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def encode_flac(samples, rate: int = 16000, block: int = 4096) -> bytes:
    """int16 mono sample sequence → FLAC bytes (fixed-subset encoder)."""
    s = [int(x) for x in samples]
    if any(not -32768 <= x <= 32767 for x in s):
        raise ValueError("encode_flac expects int16-range samples")
    n = len(s)
    out = bytearray(b"fLaC")
    # STREAMINFO (34 bytes), last-metadata flag set
    si = _BW()
    si.w(block, 16)  # min block
    si.w(block, 16)  # max block
    si.w(0, 24)  # min frame size unknown
    si.w(0, 24)
    si.w(rate, 20)
    si.w(0, 3)  # channels - 1
    si.w(15, 5)  # bits per sample - 1
    si.w(n, 36)
    si.w(0, 128)  # md5 unset
    out += b"\x80\x00\x00\x22" + si.buf

    for f_idx, start in enumerate(range(0, max(n, 1), block)):
        blk = s[start : start + block]
        if not blk:
            break
        bs = len(blk)
        hdr = _BW()
        hdr.w(0b11111111111110, 14)  # sync
        hdr.w(0, 1)  # reserved
        hdr.w(0, 1)  # fixed block strategy
        # block size code: 7 = get 16 bit from end of header
        hdr.w(0b0111, 4)
        hdr.w(0, 4)  # sample rate: from STREAMINFO
        hdr.w(0, 4)  # mono
        hdr.w(4, 3)  # 16 bits per sample
        hdr.w(0, 1)  # reserved
        # frame number, UTF-8 style
        fn = f_idx
        if fn < 0x80:
            hdr.w(fn, 8)
        elif fn < 0x800:
            hdr.w(0xC0 | (fn >> 6), 8)
            hdr.w(0x80 | (fn & 0x3F), 8)
        elif fn < 0x10000:
            hdr.w(0xE0 | (fn >> 12), 8)
            hdr.w(0x80 | ((fn >> 6) & 0x3F), 8)
            hdr.w(0x80 | (fn & 0x3F), 8)
        else:  # 4-byte UTF-8 branch not implemented — fail loudly
            raise ValueError(
                "encode_flac: stream exceeds 65536 frames; shard the "
                "input (the 4-byte frame-number branch is out of scope)"
            )
        hdr.w(bs - 1, 16)
        hdr.align()
        head = bytes(hdr.buf)
        head += bytes([_crc8(head)])

        body = _BW()
        if all(x == blk[0] for x in blk):
            body.w(0, 1)  # subframe header: zero pad
            body.w(0b000000, 6)  # CONSTANT
            body.w(0, 1)  # no wasted bits
            body.w(blk[0] & 0xFFFF, 16)
        else:
            best_o, best_res, best_cost = 0, blk[:], None
            for o in range(0, min(5, bs)):
                res = _residual(blk, o)
                cost = sum(abs(r) for r in res)
                if best_cost is None or cost < best_cost:
                    best_o, best_res, best_cost = o, res, cost
            body.w(0, 1)
            body.w(0b001000 | best_o, 6)  # FIXED, order o
            body.w(0, 1)
            for w in blk[: best_o]:  # warm-up samples, plain 16 bit
                body.w(w & 0xFFFF, 16)
            # residual: rice method 0, partition order 0
            body.w(0b00, 2)
            body.w(0, 4)  # partition order 0
            k = _rice_param(best_res)
            body.w(k, 4)
            for r in best_res:
                u = _zz(r)
                body.unary(u >> k)
                if k:
                    body.w(u & ((1 << k) - 1), k)
        body.align()
        frame = head + bytes(body.buf)
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)


def decode_flac(payload: bytes):
    """FLAC bytes → (rate, numpy int16 array). Fixed-subset scope (see
    module docstring); CRC-8/CRC-16 verified, LPC/stereo rejected."""
    import numpy as np

    d = payload
    if len(d) < 8 or d[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    rate = None
    total = None
    # metadata blocks
    while pos + 4 <= len(d):
        hdr = d[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        length = int.from_bytes(d[pos + 1 : pos + 4], "big")
        body = d[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("truncated FLAC metadata")
        if btype == 0:  # STREAMINFO
            br = _BR(body)
            br.r(16)
            br.r(16)
            br.r(24)
            br.r(24)
            rate = br.r(20)
            if br.r(3) != 0:
                raise ValueError("only mono FLAC supported")
            if br.r(5) != 15:
                raise ValueError("only 16-bit FLAC supported")
            total = br.r(36)
            if total == 0:  # spec: 0 = unknown, NOT an empty stream
                total = None
        pos += 4 + length
        if last:
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")

    samples: list[int] = []
    while pos < len(d) and (total is None or len(samples) < total):
        frame_start = pos
        br = _BR(d, pos)
        if br.r(14) != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        br.r(1)
        br.r(1)  # block strategy
        bs_code = br.r(4)
        sr_code = br.r(4)
        if br.r(4) != 0:
            raise ValueError("only mono FLAC supported")
        if br.r(3) != 4:
            raise ValueError("only 16-bit FLAC supported")
        br.r(1)
        b0 = br.r(8)  # frame number, UTF-8 coded
        if b0 >= 0xC0:
            extra = 1 if b0 < 0xE0 else (2 if b0 < 0xF0 else 3)
            for _ in range(extra):
                br.r(8)
        if bs_code == 0b0001:
            bs = 192
        elif bs_code == 0b0110:
            bs = br.r(8) + 1
        elif bs_code == 0b0111:
            bs = br.r(16) + 1
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        else:
            raise ValueError("bad block size code")
        if sr_code in (0b1100,):
            br.r(8)
        elif sr_code in (0b1101, 0b1110):
            br.r(16)
        br.align()  # header fields are whole bytes by construction
        crc8 = br.r(8)
        if _crc8(d[frame_start : br.pos - 1]) != crc8:
            raise ValueError("FLAC frame header CRC mismatch")

        # one mono subframe
        if br.r(1) != 0:
            raise ValueError("bad subframe padding bit")
        st = br.r(6)
        if br.r(1) != 0:
            raise ValueError("wasted bits unsupported")
        if st == 0:  # CONSTANT
            v = br.r(16)
            v = v - 65536 if v >= 32768 else v
            blk = [v] * bs
        elif st == 1:  # VERBATIM
            blk = []
            for _ in range(bs):
                v = br.r(16)
                blk.append(v - 65536 if v >= 32768 else v)
        elif 8 <= st <= 12:  # FIXED order 0-4
            order = st - 8
            blk = []
            for _ in range(order):
                v = br.r(16)
                blk.append(v - 65536 if v >= 32768 else v)
            if br.r(2) != 0:
                raise ValueError("rice2/ unsupported residual method")
            if br.r(4) != 0:
                raise ValueError("partitioned rice unsupported")
            k = br.r(4)
            if k == 0b1111:
                raise ValueError(
                    "rice escape code (verbatim residuals) unsupported"
                )
            co = _FIXED[order]
            for _ in range(bs - order):
                q = br.unary()
                u = (q << k) | (br.r(k) if k else 0)
                r = _unzz(u)
                pred = sum(c * blk[-j - 1] for j, c in enumerate(co))
                blk.append(pred + r)
        elif 32 <= st <= 63:
            raise ValueError("LPC subframes unsupported (fixed subset)")
        else:
            raise ValueError("reserved subframe type")
        br.align()
        if br.pos + 2 > len(d):
            raise ValueError("truncated FLAC frame CRC")
        if _crc16(d[frame_start : br.pos]) != int.from_bytes(
            d[br.pos : br.pos + 2], "big"
        ):
            raise ValueError("FLAC frame CRC mismatch")
        pos = br.pos + 2
        samples.extend(blk)
    if total is not None:
        if len(samples) < total:
            raise ValueError(
                "FLAC stream truncated: fewer samples than STREAMINFO "
                "declares"
            )
        samples = samples[:total]
    out = np.asarray(samples, dtype=np.int64)
    if len(out) and (out.max() > 32767 or out.min() < -32768):
        raise ValueError("decoded sample out of int16 range")
    return rate, out.astype(np.int16)
