"""Pure-Python/numpy FLAC codec (the lossless audio format of real web
crawls alongside WAV/MP3).

Everything here derives from the public format specification (RFC 9639 /
the xiph.org FLAC format document) — FLAC needs NO external probability
or Huffman tables (unlike MP3/AAC), so a complete decoder is buildable
offline:

* :func:`decode_flac` — full frame decode: CONSTANT / VERBATIM / FIXED
  (orders 0–4) / LPC (any order) subframes, Rice + Rice2 residual coding
  with partition orders and escape codes, wasted-bits shift, all four
  channel assignments (independent, left/side, right/side, mid/side),
  UTF-8-coded frame numbers, CRC-8 header and CRC-16 frame checks.
* :func:`encode_flac` — spec-valid encoder used for fixtures and the
  media corpus: 16-bit mono or stereo (independent or mid/side), block
  coding with per-subframe best-of fixed predictors 0–4 vs constant vs
  verbatim, Rice parameter search, single-partition residuals.
* :func:`probe_flac` — header-only STREAMINFO metadata.

Round-trip is bit-exact (lossless) and pinned by tests over tonal,
noisy, constant and ramp signals at several block sizes, plus CRC and
structure checks on the emitted stream.
"""

from __future__ import annotations

import struct

import numpy as np

# frame-header code tables (RFC 9639 §9.1)
_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _crc_table(poly: int, width: int) -> np.ndarray:
    tbl = np.zeros(256, dtype=np.uint32)
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if (c & top) else (c << 1)
        tbl[i] = c & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TBL[(c ^ b) & 0xFF])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TBL[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        n = 0
        while True:
            if self.read(1):
                return n
            n += 1

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)        # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(r: _BitReader) -> int:
    """FLAC's UTF-8-style coded number (extended to 36 bits)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = r.read(8)
        if b >> 6 != 0b10:
            raise ValueError("bad FLAC UTF-8 number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shifts = 6 * (nbytes - 1)
    out.append(lead | (v >> shifts))
    for i in range(nbytes - 1):
        shifts -= 6
        out.append(0x80 | ((v >> shifts) & 0x3F))
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def is_flac(b: bytes) -> bool:
    return len(b) > 8 and b[:4] == b"fLaC"


def _parse_streaminfo(b: bytes):
    """→ (info dict, offset of first frame)."""
    if not is_flac(b):
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        hdr = b[pos]
        btype = hdr & 0x7F
        size = int.from_bytes(b[pos + 1: pos + 4], "big")
        body = b[pos + 4: pos + 4 + size]
        if btype == 0:
            if size < 34:
                raise ValueError("short STREAMINFO")
            r = _BitReader(body)
            info = {
                "min_block": r.read(16), "max_block": r.read(16),
                "min_frame": r.read(24), "max_frame": r.read(24),
                "rate": r.read(20), "channels": r.read(3) + 1,
                "bits": r.read(5) + 1, "total_samples": r.read(36),
            }
        pos += 4 + size
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC stream without STREAMINFO")
    return info, pos


def probe_flac(b: bytes) -> dict | None:
    """Header-only FLAC metadata: {codec, rate, channels, bits,
    duration_ms} from STREAMINFO."""
    try:
        info, _ = _parse_streaminfo(b)
    except ValueError:
        return None
    rate = max(info["rate"], 1)
    return {"codec": "flac", "rate": info["rate"],
            "channels": info["channels"], "bits": info["bits"],
            "duration_ms": int(info["total_samples"] * 1000 / rate)}


def _decode_residual(r: _BitReader, block_size: int, order: int):
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = r.read(4)
    nparts = 1 << part_order
    if block_size % nparts:
        raise ValueError("partition order does not divide block size")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = block_size // nparts - (order if p == 0 else 0)
        param = r.read(plen)
        if param == escape:
            bits = r.read(5)
            for i in range(n):
                out[idx + i] = r.read_signed(bits) if bits else 0
        else:
            for i in range(n):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                out[idx + i] = (u >> 1) ^ -(u & 1)     # un-zigzag
        idx += n
    return out


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("bad subframe padding bit")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if stype == 0:                              # CONSTANT
        v = r.read_signed(bps)
        out = np.full(block_size, v, dtype=np.int64)
    elif stype == 1:                            # VERBATIM
        out = np.array([r.read_signed(bps) for _ in range(block_size)],
                       dtype=np.int64)
    elif 8 <= stype <= 12:                      # FIXED order 0-4
        order = stype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _decode_residual(r, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        if order == 0:
            out = res.copy()
        else:
            for i in range(order, block_size):
                pred = 0
                for j, c in enumerate(coefs):
                    pred += c * out[i - 1 - j]
                out[i] = res[i - order] + pred
    elif stype >= 32:                           # LPC order 1-32
        order = stype - 31
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = r.read_signed(5)
        coefs = np.array([r.read_signed(prec) for _ in range(order)],
                         dtype=np.int64)
        res = _decode_residual(r, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            pred = int(np.dot(coefs, out[i - order: i][::-1])) >> shift
            out[i] = res[i - order] + pred
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


def decode_flac(b: bytes):
    """FLAC bytes → (float32 mono samples in [-1, 1] — channel 0 after
    stereo decorrelation — sample rate). Lossless: int samples are
    reconstructed exactly, then scaled by 2^(bits-1)."""
    info, pos = _parse_streaminfo(b)
    chans_all = []
    total = info["total_samples"] or None
    got = 0
    while pos < len(b) - 2 and (total is None or got < total):
        hdr_start = pos
        r = _BitReader(b, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        r.read(1)                               # reserved
        r.read(1)                               # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)                               # reserved
        _utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved block size code 0")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        rate = info["rate"] if sr_code in (0, 12, 13, 14, 15) \
            else _SAMPLE_RATES.get(sr_code, info["rate"])
        bps = info["bits"] if ss_code in (0, 3) else _SAMPLE_SIZES[ss_code]
        r.align()
        header_bytes = b[hdr_start: r.byte]
        if crc8(header_bytes) != r.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            chans = [_decode_subframe(r, block_size, bps)
                     for _ in range(nch)]
        elif ch_code == 8:                      # left/side
            left = _decode_subframe(r, block_size, bps)
            side = _decode_subframe(r, block_size, bps + 1)
            chans = [left, left - side]
        elif ch_code == 9:                      # right/side
            side = _decode_subframe(r, block_size, bps + 1)
            right = _decode_subframe(r, block_size, bps)
            chans = [right + side, right]
        elif ch_code == 10:                     # mid/side
            mid = _decode_subframe(r, block_size, bps)
            side = _decode_subframe(r, block_size, bps + 1)
            m2 = (mid << 1) | (side & 1)
            chans = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        r.align()
        frame_crc = struct.unpack_from(">H", b, r.byte)[0]
        if crc16(b[hdr_start: r.byte]) != frame_crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.byte + 2
        chans_all.append(np.stack(chans))
        got += block_size
    if not chans_all:
        return np.zeros(0, dtype=np.float32), info["rate"]
    full = np.concatenate(chans_all, axis=1)
    if total is not None:
        full = full[:, :total]
    scale = float(1 << (info["bits"] - 1))
    return (full[0].astype(np.float32) / scale), info["rate"]


# ---------------------------------------------------------------------------
# encode (fixture-grade, spec-valid, lossless)
# ---------------------------------------------------------------------------

def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res << 1, (-res << 1) - 1).astype(np.int64)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """→ (param, total bits) minimizing the single-partition Rice cost."""
    best = (0, 1 << 62)
    for k in range(15):
        cost = int((u >> k).sum()) + len(u) * (k + 1)
        if cost < best[1]:
            best = (k, cost)
    return best


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int):
    x = x.astype(np.int64)
    n = len(x)
    if n and (x == x[0]).all():                 # CONSTANT
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    best_order, best_cost, best_res = 0, 1 << 62, None
    for order in range(min(4, n - 1) + 1):
        res = _fixed_residual(x, order)
        u = _zigzag(res)
        _, cost = _best_rice_param(u) if len(u) else (0, 0)
        cost += order * bps
        if cost < best_cost:
            best_order, best_cost, best_res = order, cost, res
    if best_cost >= n * bps:                    # VERBATIM wins
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in x:
            w.write(int(v), bps)
        return
    w.write(0, 1)
    w.write(8 + best_order, 6)                  # FIXED
    w.write(0, 1)                               # no wasted bits
    for v in x[:best_order]:
        w.write(int(v), bps)
    u = _zigzag(best_res)
    k, _ = _best_rice_param(u) if len(u) else (0, 0)
    w.write(0, 2)                               # Rice 4-bit params
    w.write(0, 4)                               # partition order 0
    w.write(k, 4)
    for v in u:
        v = int(v)
        w.write_unary(v >> k)
        if k:
            w.write(v, k)


def encode_flac(x: np.ndarray, rate: int = 8000, block_size: int = 1024,
                stereo_mode: str = "independent") -> bytes:
    """float array in [-1, 1] — shape (n,) mono or (2, n) stereo — →
    FLAC bytes (16-bit). Lossless w.r.t. the quantized int16 samples.
    ``stereo_mode``: 'independent' or 'mid_side'."""
    x = np.asarray(x)
    if x.ndim == 1:
        pcm = np.round(np.clip(x, -1, 1) * 32767).astype(np.int64)[None, :]
    else:
        pcm = np.round(np.clip(x, -1, 1) * 32767).astype(np.int64)
    nch, total = pcm.shape
    assert nch in (1, 2)
    bps = 16

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.bytes() + b"\x00" * 16            # MD5 unset (all zero)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, total, block_size):
        blk = pcm[:, start: start + block_size]
        n = blk.shape[1]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)                           # fixed block size strategy
        if n == block_size and block_size in _BLOCK_SIZES.values():
            bs_code = next(c for c, v in _BLOCK_SIZES.items()
                           if v == block_size)
            bs_extra = None
        else:
            bs_code, bs_extra = 7, n - 1
        w.write(bs_code, 4)
        w.write(0, 4)                           # rate: from STREAMINFO
        if nch == 1:
            ch_code = 0
        elif stereo_mode == "mid_side":
            ch_code = 10
        else:
            ch_code = 1
        w.write(ch_code, 4)
        w.write(4, 3)                           # 16-bit
        w.write(0, 1)
        for byte in _utf8_encode(frame_no):
            w.write(byte, 8)
        if bs_extra is not None:
            w.write(bs_extra, 16)
        w.align()
        hdr = w.bytes()
        hdr += bytes([crc8(hdr)])
        w = _BitWriter()
        if nch == 1 or ch_code == 1:
            for c in range(nch):
                _encode_subframe(w, blk[c], bps)
        else:                                   # mid/side
            left, right = blk[0], blk[1]
            mid = (left + right) >> 1
            side = left - right
            _encode_subframe(w, mid, bps)
            _encode_subframe(w, side, bps + 1)
        w.align()
        frame = hdr + w.bytes()
        frame += struct.pack(">H", crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
