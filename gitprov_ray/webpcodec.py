"""Pure-python/numpy WebP lossless (VP8L) codec.

Implements the public "WebP Lossless Bitstream Specification" (RFC 9649
§3, also shipped as libwebp's lossless_bitstream_specification) with no
external decoder:

  * container: RIFF/WEBP walk — plain `VP8L` files and `VP8X` extended
    files (the VP8L chunk is located inside); lossy `VP8 ` payloads are
    declared NotImplementedError (a full VP8 inter/intra predictor +
    bool-coder is out of scope — same policy as H.264 in mp4codec).
  * decoder: canonical prefix codes (simple 1/2-symbol AND full
    code-length-coded forms incl. the max_symbol shortcut), LZ77
    backward references with the 120-entry 2-D distance mapping, color
    cache, meta-prefix entropy images, and all four transforms —
    predictor (14 modes), color (signed 3.5 fixed-point multipliers),
    subtract-green, color-indexing (palette incl. sub-byte pixel
    bundling for palettes ≤16) — applied in reverse read order.
  * encoder (fixture writer): literal pixels + optional left-run LZ77 +
    optional color cache, under any combination of subtract-green /
    uniform predictor / color-transform / palette, with real canonical
    prefix codes built by boundary package-merge (length-limited) and
    the code-length-code encoding of the spec. Every encoder option
    exists to exercise a decoder path; outputs are valid WebP files
    (verified against `dwebp` conventions by construction).

Reference parity note: the reference serves stored media blobs
untouched (git-prov has no transcode stage); this codec exists for the
engine's OWN multimodal curation stages (multimodal.py ImageDecode /
ImageResize / FeatureExtract / MediaProbe), turning the WebP stub into
a real path alongside jpegcodec/pngcodec/gifcodec/mp4codec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def is_webp(b: bytes) -> bool:
    return (len(b) >= 16 and b[:4] == b"RIFF" and b[8:12] == b"WEBP")


def _riff_chunks(b: bytes):
    """Yield (fourcc, payload) for each chunk inside the WEBP RIFF."""
    pos = 12
    while pos + 8 <= len(b):
        tag = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        payload = b[pos + 8: pos + 8 + size]
        yield tag, payload
        pos += 8 + size + (size & 1)          # chunks are 2-byte aligned


def _find_vp8l(b: bytes) -> bytes | None:
    for tag, payload in _riff_chunks(b):
        if tag == b"VP8L":
            return payload
    return None


def probe_webp(b: bytes) -> dict:
    """Header-only metadata: {codec, width, height, has_alpha, animated,
    frames, duration_ms}. codec is 'lossless' (VP8L), 'lossy' (VP8),
    'animated' or 'extended' dims from VP8X."""
    out = {"codec": "", "width": -1, "height": -1, "has_alpha": False,
           "animated": False, "frames": 0, "duration_ms": 0}
    for tag, p in _riff_chunks(b):
        if tag == b"VP8X" and len(p) >= 10:
            out["codec"] = out["codec"] or "extended"
            out["has_alpha"] = bool(p[0] & 0x10)
            out["animated"] = bool(p[0] & 0x02)
            out["width"] = 1 + (p[4] | p[5] << 8 | p[6] << 16)
            out["height"] = 1 + (p[7] | p[8] << 8 | p[9] << 16)
        elif tag == b"ANMF" and len(p) >= 16:
            out["codec"] = "animated"
            out["frames"] += 1
            out["duration_ms"] += p[12] | p[13] << 8 | p[14] << 16
        elif tag == b"VP8L" and len(p) >= 5 and p[0] == 0x2F:
            bits = struct.unpack_from("<I", p, 1)[0]
            out["codec"] = "lossless"
            out["width"] = (bits & 0x3FFF) + 1
            out["height"] = ((bits >> 14) & 0x3FFF) + 1
            out["has_alpha"] = out["has_alpha"] or bool((bits >> 28) & 1)
        elif tag == b"VP8 " and len(p) >= 10:
            out["codec"] = out["codec"] or "lossy"
            # keyframe: 3-byte frame tag, start code 9d 01 2a, 14-bit dims
            if p[3:6] == b"\x9d\x01\x2a":
                w, h = struct.unpack_from("<HH", p, 6)
                out["width"], out["height"] = w & 0x3FFF, h & 0x3FFF
    return out


# ---------------------------------------------------------------------------
# bit I/O (VP8L is LSB-first for values; prefix codes descend MSB-first)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0                          # absolute bit position

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.d
        for i in range(n):
            byte_i = p >> 3
            if byte_i >= len(d):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((d[byte_i] >> (p & 7)) & 1) << i
            p += 1
        self.pos = p
        return v


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int):
        self.acc |= (val & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int):
        """Prefix-code bits go most-significant (tree-top) first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _PrefixCode:
    """Decode table: walk bits MSB-first through a {(len, code): sym} map.
    A single-symbol code (simple form num_symbols=1, or a degenerate
    full form) costs 0 bits per symbol."""

    __slots__ = ("table", "single", "max_len")

    def __init__(self, lengths):
        used = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("VP8L: empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.table, self.max_len = {}, 0
            return
        self.single = None
        max_len = max(ln for ln, _ in used)
        bl_count = [0] * (max_len + 1)
        for ln, _ in used:
            bl_count[ln] += 1
        next_code = [0] * (max_len + 1)
        code = 0
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        table = {}
        for ln, sym in sorted(used):
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
        self.table = table
        self.max_len = max_len

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):                            # simple code (≤2 symbols)
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        code = _PrefixCode.__new__(_PrefixCode)
        if num_symbols == 1:                  # 0 bits per symbol
            code.single, code.table, code.max_len = sym0, {}, 0
            return code
        sym1 = br.read(8)
        if sym1 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        # simple codes assign bit 0/1 in READ order, not canonically
        code.single = None
        code.table = {(1, 0): sym0, (1, 1): sym1}
        code.max_len = 1
        return code
    # full form: code lengths are themselves prefix-coded
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):                            # max_symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.decode(br)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len:
                prev_len = code_len
        elif code_len == 16:
            rep = 3 + br.read(2)
            if sym + rep > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflow")
            lengths[sym: sym + rep] = [prev_len] * rep
            sym += rep
        elif code_len == 17:
            sym += 3 + br.read(3)
        else:                                 # 18
            sym += 11 + br.read(7)
    return _PrefixCode(lengths)


def _limited_lengths(freqs, limit: int) -> list[int]:
    """Boundary package-merge: optimal length-limited prefix-code
    lengths. freqs is a full-alphabet frequency list; zeros get 0."""
    syms = [s for s, f in enumerate(freqs) if f > 0]
    lengths = [0] * len(freqs)
    if not syms:
        return lengths
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    leaves = sorted((freqs[s], (s,)) for s in syms)
    pkgs = list(leaves)
    for _ in range(limit - 1):
        paired = [(pkgs[i][0] + pkgs[i + 1][0], pkgs[i][1] + pkgs[i + 1][1])
                  for i in range(0, len(pkgs) - 1, 2)]
        pkgs = sorted(paired + leaves)
    for _, group in pkgs[: 2 * len(leaves) - 2]:
        for s in group:
            lengths[s] += 1
    return lengths


def _canonical_codes(lengths) -> dict[int, tuple[int, int]]:
    """lengths → {symbol: (code, length)} canonical assignment."""
    used = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    codes = {}
    code, prev_len = 0, 0
    for ln, s in used:
        code <<= (ln - prev_len)
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return codes


def _write_prefix_code(bw: _BitWriter, freqs) -> dict[int, tuple[int, int]]:
    """Emit one prefix code (simple or full form); return the write map."""
    syms = [s for s, f in enumerate(freqs) if f > 0]
    if not syms:
        syms = [0]                            # unused code: 0-bit symbol 0
    if len(syms) <= 2 and max(syms) <= 255:
        bw.write(1, 1)                        # simple
        bw.write(len(syms) - 1, 1)
        if len(syms) == 1:
            first_8bit = 0 if syms[0] <= 1 else 1
            bw.write(first_8bit, 1)
            bw.write(syms[0], 8 if first_8bit else 1)
            return {syms[0]: (0, 0)}
        bw.write(1, 1)                        # first symbol in 8 bits
        bw.write(syms[0], 8)
        bw.write(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.write(0, 1)                            # full form
    lengths = _limited_lengths(freqs, 15)
    # RLE the length array: literals + 17/18 zero-runs
    tokens: list[tuple[int, int, int]] = []   # (cl_symbol, extra, extra_bits)
    i = 0
    while i < len(lengths):
        if lengths[i] == 0:
            j = i
            while j < len(lengths) and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                chunk = min(run, 138)
                tokens.append((18, chunk - 11, 7))
                run -= chunk
            while run >= 3:
                chunk = min(run, 10)
                tokens.append((17, chunk - 3, 3))
                run -= chunk
            for _ in range(run):
                tokens.append((0, 0, 0))
            i = j
        else:
            tokens.append((lengths[i], 0, 0))
            i += 1
    cl_freqs = [0] * 19
    for t, _, _ in tokens:
        cl_freqs[t] += 1
    cl_lengths = _limited_lengths(cl_freqs, 7)
    cl_codes = _canonical_codes(cl_lengths)
    bw.write(15, 4)                           # num_code_lengths = 19
    for s in _CL_ORDER:
        bw.write(cl_lengths[s], 3)
    bw.write(0, 1)                            # no max_symbol shortcut
    if len(cl_codes) == 1:
        # degenerate single-symbol CL code: tokens cost 0 bits each
        for _, extra, ebits in tokens:
            if ebits:
                bw.write(extra, ebits)
    else:
        for t, extra, ebits in tokens:
            c, ln = cl_codes[t]
            bw.write_code(c, ln)
            if ebits:
                bw.write(extra, ebits)
    return _canonical_codes(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------

# 2-D offset map for distance codes 1..120 (spec "distance mapping"):
# dist = dy * xsize + dx, clamped to ≥ 1; codes > 120 are literal
# distances minus 120.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (-8, 3), (7, 6), (-7, 6), (6, 7), (-6, 7), (8, 4), (3, 8), (-3, 8),
    (8, 5), (4, 8), (-4, 8), (8, 6), (7, 7), (-7, 7), (8, 7), (8, 8),
)


def _prefix_decode_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix symbol → value (spec §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode_value(value: int) -> tuple[int, int, int]:
    """value → (prefix_code, extra_val, extra_bits), inverse of above."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    code = 2 * extra + ((v >> extra) & 1)
    offset = (2 + ((v >> extra) & 1)) << extra
    return code + 2, v - offset, extra


def _plane_code_to_dist(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(dy * xsize + dx, 1)


def _cache_hash(pix: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * pix) & 0xFFFFFFFF) >> (32 - cache_bits)


# ---------------------------------------------------------------------------
# spatially-coded image decode (main image AND entropy-coded subimages)
# ---------------------------------------------------------------------------


def _decode_pixels(br: _BitReader, w: int, h: int,
                   allow_meta: bool) -> np.ndarray:
    """Decode one spatially-coded ARGB image → uint32 array (h*w flat,
    pixel = a<<24 | r<<16 | g<<8 | b). Entropy-coded subimages pass
    allow_meta=False (no meta-prefix image, per spec §5)."""
    cache_bits = br.read(4) if br.read(1) else 0
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta_codes = None
    meta_bits = 0
    meta_xsize = 0
    num_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        meta_xsize = (w + (1 << meta_bits) - 1) >> meta_bits
        meta_ysize = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_pixels(br, meta_xsize, meta_ysize,
                                  allow_meta=False)
        # meta index lives in (red << 8) | green
        meta_codes = (((meta_img >> 16) & 0xFF) << 8) | ((meta_img >> 8)
                                                         & 0xFF)
        num_groups = int(meta_codes.max()) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, 256),       # red
            _read_prefix_code(br, 256),       # blue
            _read_prefix_code(br, 256),       # alpha
            _read_prefix_code(br, 40),        # distance
        ))

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        if meta_codes is not None:
            x, y = pos % w, pos // w
            gidx = int(meta_codes[(y >> meta_bits) * meta_xsize
                                  + (x >> meta_bits)])
            g_code, r_code, b_code, a_code, d_code = groups[gidx]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        g = g_code.decode(br)
        if g < 256:                           # literal ARGB
            r = r_code.decode(br)
            b = b_code.decode(br)
            a = a_code.decode(br)
            pix = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = pix
            pos += 1
            if cache is not None:
                cache[_cache_hash(pix, cache_bits)] = pix
        elif g < 280:                         # LZ77 backward reference
            length = _prefix_decode_value(g - 256, br)
            dist_code = _prefix_decode_value(d_code.decode(br), br)
            dist = _plane_code_to_dist(w, dist_code)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                pix = int(out[pos - dist])
                out[pos] = pix
                pos += 1
                if cache is not None:
                    cache[_cache_hash(pix, cache_bits)] = pix
        else:                                 # color-cache hit
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            out[pos] = cache[g - 280]
            pos += 1
    return out


# ---------------------------------------------------------------------------
# transforms (inverse, decode side)
# ---------------------------------------------------------------------------


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.uint16) + b.astype(np.uint16)) // 2


_BLACK = None                                 # lazy np.array singleton


def _predict_px(px: np.ndarray, y: int, x: int, w: int,
                mode: int) -> np.ndarray:
    """The 14-mode spatial prediction for one pixel, reading neighbors
    from ``px`` (which holds FINAL values up to scan position (y, x)).
    Shared by the decoder's inverse pass and the encoder's forward pass
    — the two stay mirror-exact by construction."""
    global _BLACK
    if _BLACK is None:
        _BLACK = np.array([0xFF, 0, 0, 0], dtype=np.uint8)
    if x == 0 and y == 0:
        return _BLACK
    if y == 0:
        return px[0, x - 1]
    if x == 0:
        return px[y - 1, 0]
    left = px[y, x - 1]
    top = px[y - 1, x]
    tl = px[y - 1, x - 1]
    # top-right wraps to the first pixel of the current row
    tr = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
    if mode == 0:
        return _BLACK
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top).astype(np.uint8)
    if mode == 6:
        return _avg2(left, tl).astype(np.uint8)
    if mode == 7:
        return _avg2(left, top).astype(np.uint8)
    if mode == 8:
        return _avg2(tl, top).astype(np.uint8)
    if mode == 9:
        return _avg2(top, tr).astype(np.uint8)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr)).astype(np.uint8)
    if mode == 11:
        est = (left.astype(np.int16) + top.astype(np.int16)
               - tl.astype(np.int16))
        p_l = int(np.abs(est - left).sum())
        p_t = int(np.abs(est - top).sum())
        return left if p_l < p_t else top
    if mode == 12:
        v = (left.astype(np.int16) + top.astype(np.int16)
             - tl.astype(np.int16))
        return np.clip(v, 0, 255).astype(np.uint8)
    if mode == 13:
        ave = _avg2(left, top).astype(np.int16)
        d = ave - tl.astype(np.int16)
        # C-style truncation toward zero for the /2
        v = ave + np.trunc(d / 2).astype(np.int16)
        return np.clip(v, 0, 255).astype(np.uint8)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _apply_inverse_predictor(argb: np.ndarray, w: int, h: int,
                             pred_img: np.ndarray, bits: int) -> None:
    """In-place inverse predictor transform over channel-split uint8
    view (h, w, 4 = A,R,G,B)."""
    px = argb                                  # (h, w, 4) uint8
    tiles_x = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            mode = int((pred_img[(y >> bits) * tiles_x + (x >> bits)]
                        >> 8) & 0xFF)
            pred = _predict_px(px, y, x, w, mode)
            px[y, x] = px[y, x] + pred        # uint8 wraps mod 256


def _ct_delta(t: int, c: int) -> int:
    """Signed 3.5 fixed-point color-transform delta (spec §4.2.1.2):
    (int8(t) * int8(c)) >> 5 with arithmetic shift."""
    t8 = t - 256 if t > 127 else t
    c8 = c - 256 if c > 127 else c
    return (t8 * c8) >> 5


def _apply_inverse_color_transform(px: np.ndarray, w: int, h: int,
                                   ct_img: np.ndarray, bits: int) -> None:
    tiles_x = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            cte = int(ct_img[(y >> bits) * tiles_x + (x >> bits)])
            g2r = (cte >> 0) & 0xFF           # blue channel
            g2b = (cte >> 8) & 0xFF           # green channel
            r2b = (cte >> 16) & 0xFF          # red channel
            a, r, g, b = (int(px[y, x, 0]), int(px[y, x, 1]),
                          int(px[y, x, 2]), int(px[y, x, 3]))
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g)) & 0xFF
            b = (b + _ct_delta(r2b, r)) & 0xFF
            px[y, x, 1] = r
            px[y, x, 3] = b


def _palette_xbits(palette_size: int) -> int:
    if palette_size <= 2:
        return 3
    if palette_size <= 4:
        return 2
    if palette_size <= 16:
        return 1
    return 0


# ---------------------------------------------------------------------------
# decoder entry
# ---------------------------------------------------------------------------


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload → HxWx3 (opaque) or HxWx4 (alpha used) uint8."""
    if len(payload) < 5 or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature")
    br = _BitReader(payload)
    br.pos = 8
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                                # alpha hint (informational)
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")
    px = _decode_argb_stream(br, w, h)
    a, r, g, b = px[..., 0], px[..., 1], px[..., 2], px[..., 3]
    rgb = np.stack([r, g, b], axis=-1)
    if (a != 255).any():
        return np.concatenate([rgb, a[..., None]], axis=-1)
    return rgb


def _decode_argb_stream(br: _BitReader, w: int, h: int) -> np.ndarray:
    """Headerless VP8L image stream (transform chain + spatially-coded
    image) → (h, w, 4) uint8 in A,R,G,B order. Shared by the VP8L chunk
    body and the ALPH alpha-plane stream (container spec §Alpha, which
    stores the same stream without the signature/dimension header)."""
    # transforms: read order captured with the width active at read time
    transforms: list[tuple] = []
    xsize = w
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 0:                        # predictor
            bits = br.read(3) + 2
            tx = (xsize + (1 << bits) - 1) >> bits
            ty = (h + (1 << bits) - 1) >> bits
            img = _decode_pixels(br, tx, ty, allow_meta=False)
            transforms.append(("predictor", xsize, bits, img))
        elif ttype == 1:                      # color transform
            bits = br.read(3) + 2
            tx = (xsize + (1 << bits) - 1) >> bits
            ty = (h + (1 << bits) - 1) >> bits
            img = _decode_pixels(br, tx, ty, allow_meta=False)
            transforms.append(("color", xsize, bits, img))
        elif ttype == 2:                      # subtract green
            transforms.append(("subtract_green", xsize, 0, None))
        else:                                 # color indexing
            pal_size = br.read(8) + 1
            pal = _decode_pixels(br, pal_size, 1, allow_meta=False)
            # palette entries are stored as component-wise deltas
            pal = np.cumsum(pal.view(np.uint8).reshape(-1, 4)
                            .astype(np.uint16), axis=0).astype(np.uint8)
            xbits = _palette_xbits(pal_size)
            transforms.append(("palette", xsize, xbits, (pal_size, pal)))
            xsize = (xsize + (1 << xbits) - 1) >> xbits

    flat = _decode_pixels(br, xsize, h, allow_meta=True)

    # channel-split little-endian uint32 → (b, g, r, a); reorder to ARGB
    def split(u32: np.ndarray, hh: int, ww: int) -> np.ndarray:
        v = u32.astype("<u4").view(np.uint8).reshape(hh, ww, 4)
        return v[..., [3, 2, 1, 0]].copy()    # → (a, r, g, b)

    px = split(flat, h, xsize)

    for kind, tw, bits, data in reversed(transforms):
        if kind == "palette":
            pal_size, pal = data
            xbits = bits
            idx = px[..., 2].astype(np.int32)  # green channel holds index
            if xbits:
                per = 1 << xbits
                ibits = 8 >> xbits
                cols = np.arange(tw)
                sub = (cols % per) * ibits
                wide = (idx[:, cols >> xbits] >> sub[None, :]) \
                    & ((1 << ibits) - 1)
                idx = wide
            if int(idx.max(initial=0)) >= pal_size:
                raise ValueError("VP8L: palette index out of range")
            argb = pal[idx.reshape(-1)]       # rows are (b?, ...) —
            # palette pixels came through split already? No: pal is raw
            # little-endian u32 bytes (b, g, r, a); reorder to (a,r,g,b)
            px = argb[:, [3, 2, 1, 0]].reshape(idx.shape[0], idx.shape[1],
                                               4)[:, :tw]
        elif kind == "subtract_green":
            g = px[..., 2]
            px[..., 1] = px[..., 1] + g       # uint8 wrap
            px[..., 3] = px[..., 3] + g
        elif kind == "color":
            _apply_inverse_color_transform(px, tw, h, data, bits)
        elif kind == "predictor":
            _apply_inverse_predictor(px, tw, h, data, bits)

    return px


def decode_alpha(alph_payload: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk payload → (h, w) uint8 alpha plane (container spec:
    1 header byte — 2 bits each reserved/preprocessing/filter/compression
    — then either raw bytes or a headerless VP8L stream with alpha in
    the green channel, plus an optional prediction filter)."""
    if not alph_payload:
        raise ValueError("ALPH: empty chunk")
    head = alph_payload[0]
    compression = head & 0x3
    filter_ = (head >> 2) & 0x3
    if compression == 0:
        plane = np.frombuffer(alph_payload, np.uint8, count=w * h,
                              offset=1).reshape(h, w).copy()
    elif compression == 1:
        br = _BitReader(alph_payload)
        br.pos = 8
        plane = _decode_argb_stream(br, w, h)[..., 2].copy()  # green
    else:
        raise ValueError(f"ALPH: unknown compression {compression}")
    if filter_:
        # inverse prediction filters (A=left, B=above, C=above-left);
        # first pixel predicts from 0, top row from A, left column from B
        p = plane.astype(np.int16)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = p[0, x - 1]
                elif x == 0:
                    pred = p[y - 1, 0]
                elif filter_ == 1:            # horizontal
                    pred = p[y, x - 1]
                elif filter_ == 2:            # vertical
                    pred = p[y - 1, x]
                else:                         # gradient
                    pred = int(np.clip(p[y, x - 1] + p[y - 1, x]
                                       - p[y - 1, x - 1], 0, 255))
                p[y, x] = (p[y, x] + pred) & 0xFF
        plane = p.astype(np.uint8)
    return plane


def decode_webp_alpha(b: bytes) -> np.ndarray | None:
    """Decode the ALPH chunk of an extended WebP file → (h, w) uint8, or
    None when the file has no separate alpha plane. Works even when the
    color payload is the lossy-VP8 stub — the alpha plane is VP8L-coded
    and fully decodable."""
    alph = None
    for tag, p in _riff_chunks(b):
        if tag == b"ALPH":
            alph = p
            break
    if alph is None:
        return None
    meta = probe_webp(b)
    if meta["width"] < 0 or meta["height"] < 0:
        raise ValueError("ALPH without canvas dimensions")
    return decode_alpha(alph, meta["width"], meta["height"])


def decode_webp(b: bytes) -> np.ndarray:
    """WebP container → HxWxC uint8 (lossless/VP8L only; animated files
    return their first composed frame; lossy VP8 raises
    NotImplementedError naming the codec)."""
    if not is_webp(b):
        raise ValueError("not a WebP payload")
    vp8l = _find_vp8l(b)
    if vp8l is None:
        if any(tag == b"ANMF" for tag, _ in _riff_chunks(b)):
            return decode_webp_frames(b)[0]
        tags = [t.decode("ascii", "replace") for t, _ in _riff_chunks(b)]
        raise NotImplementedError(
            f"WebP payload has no VP8L chunk (found {tags}); lossy VP8 "
            "decode requires libwebp (not installed). Deliberate stub: "
            "the RFC 6386 decode LOGIC (bool decoder, trees, IDCT, intra "
            "predictors) is implementable offline, but a faithful decoder "
            "also needs the default token/mode probability tables "
            "(~2100 published constants) which are DATA, not derivable — "
            "a from-memory transcription would silently mis-decode, so "
            "the honest boundary stays here")
    return decode_vp8l(vp8l)


# ---------------------------------------------------------------------------
# animated WebP (VP8X + ANIM/ANMF, container spec §Animation)
# ---------------------------------------------------------------------------


def _parse_anmf(p: bytes) -> tuple[dict, bytes]:
    """ANMF payload → (frame header, frame-data bytes)."""
    if len(p) < 16:
        raise ValueError("ANMF: truncated header")
    hdr = {
        "x": 2 * (p[0] | p[1] << 8 | p[2] << 16),
        "y": 2 * (p[3] | p[4] << 8 | p[5] << 16),
        "w": 1 + (p[6] | p[7] << 8 | p[8] << 16),
        "h": 1 + (p[9] | p[10] << 8 | p[11] << 16),
        "duration_ms": p[12] | p[13] << 8 | p[14] << 16,
        "no_blend": bool(p[15] & 0x02),
        "dispose_background": bool(p[15] & 0x01),
    }
    return hdr, p[16:]


def decode_webp_frames(b: bytes) -> list[np.ndarray]:
    """Animated WebP → list of fully-composed HxWx4 RGBA canvas frames
    (same contract as gifcodec.decode_gif: composition — subrect
    placement, alpha-blend vs overwrite, dispose-to-background — is done
    here so callers see complete frames). Lossy-coded frames raise
    NotImplementedError naming VP8."""
    meta = probe_webp(b)
    if not meta["animated"] and meta["frames"] == 0:
        arr = decode_webp(b)                  # static: one-frame list
        if arr.shape[-1] == 3:
            arr = np.concatenate(
                [arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)], -1)
        return [arr]
    cw, ch = meta["width"], meta["height"]
    if cw < 0 or ch < 0:
        raise ValueError("animated WebP without VP8X canvas size")
    canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
    frames: list[np.ndarray] = []
    for tag, p in _riff_chunks(b):
        if tag != b"ANMF":
            continue
        hdr, data = _parse_anmf(p)
        sub = None
        for ftag, fp in _riff_chunks(b"\x00" * 12 + data):
            if ftag == b"VP8L":
                sub = decode_vp8l(fp)
            elif ftag == b"VP8 ":
                raise NotImplementedError(
                    "animated WebP frame is lossy VP8; decode requires "
                    "libwebp (not installed)")
        if sub is None:
            raise ValueError("ANMF frame without image data")
        if sub.shape[-1] == 3:
            sub = np.concatenate(
                [sub, np.full(sub.shape[:2] + (1,), 255, np.uint8)], -1)
        x, y, fw, fh = hdr["x"], hdr["y"], hdr["w"], hdr["h"]
        if sub.shape[0] != fh or sub.shape[1] != fw:
            raise ValueError("ANMF dims disagree with frame bitstream")
        region = canvas[y: y + fh, x: x + fw]
        if hdr["no_blend"]:
            region[:] = sub
        else:                                 # source-over alpha blend
            # uint32 intermediates: rgb*da*(255-sa) peaks at ~16.5M,
            # far past uint16
            sa = sub[..., 3:4].astype(np.uint32)
            da = region[..., 3:4].astype(np.uint32)
            out_a = sa + da * (255 - sa) // 255
            safe = np.maximum(out_a, 1)
            rgb = (sub[..., :3].astype(np.uint32) * sa
                   + region[..., :3].astype(np.uint32) * da
                   * (255 - sa) // 255) // safe
            region[..., :3] = rgb.astype(np.uint8)
            region[..., 3:4] = out_a.astype(np.uint8)
        frames.append(canvas.copy())
        if hdr["dispose_background"]:         # clear frame rect to
            canvas[y: y + fh, x: x + fw] = 0  # transparent black
    if not frames:
        raise ValueError("animated WebP with no ANMF frames")
    return frames


def encode_webp_anim(frames: list[np.ndarray], duration_ms: int = 100,
                     offsets: list[tuple[int, int]] | None = None,
                     dispose_background: bool = False) -> bytes:
    """Animated-WebP fixture writer: VP8X + ANIM + one lossless ANMF per
    frame. Frames may be smaller than the canvas (canvas = frame 0 size)
    when offsets are given; frames are written no-blend."""
    if not frames:
        raise ValueError("need at least one frame")
    ch, cw = frames[0].shape[:2]
    offsets = offsets or [(0, 0)] * len(frames)
    chunks = bytearray()
    flags = 0x02 | (0x10 if any(f.ndim == 3 and f.shape[-1] == 4
                                for f in frames) else 0)
    vp8x = bytes([flags, 0, 0, 0]) \
        + struct.pack("<I", cw - 1)[:3] + struct.pack("<I", ch - 1)[:3]
    chunks += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    anim = struct.pack("<IH", 0x00000000, 0)  # bg color, loop forever
    chunks += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for frame, (x, y) in zip(frames, offsets):
        fh, fw = frame.shape[:2]
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even")
        if y + fh > ch or x + fw > cw:
            raise ValueError("frame exceeds canvas")
        sub = encode_webp_lossless(frame)
        vp8l_chunk = sub[12:]                 # strip RIFF....WEBP header
        flags_byte = 0x02 | (0x01 if dispose_background else 0)
        hdr = (struct.pack("<I", x // 2)[:3] + struct.pack("<I", y // 2)[:3]
               + struct.pack("<I", fw - 1)[:3]
               + struct.pack("<I", fh - 1)[:3]
               + struct.pack("<I", duration_ms)[:3] + bytes([flags_byte]))
        payload = hdr + vp8l_chunk
        chunks += b"ANMF" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunks += b"\x00"
    riff = b"WEBP" + bytes(chunks)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# encoder (fixture writer: literal/LZ77/cache under optional transforms)
# ---------------------------------------------------------------------------


def _forward_color_transform(px: np.ndarray, g2r: int, g2b: int,
                             r2b: int, x0: int = 0,
                             x1: int | None = None) -> None:
    h, w, _ = px.shape
    x1 = w if x1 is None else x1
    for y in range(h):
        for x in range(x0, x1):
            r, g, b = int(px[y, x, 1]), int(px[y, x, 2]), int(px[y, x, 3])
            new_r = (r - _ct_delta(g2r, g)) & 0xFF
            new_b = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            px[y, x, 1] = new_r
            px[y, x, 3] = new_b


def _forward_predictor(px: np.ndarray, mode: int,
                       bits: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Forward (residual) pass → (residuals, per-tile mode image).
    ``mode`` is any of the 14 spec modes, or "auto" for per-tile
    selection (argmin of centered-residual magnitude — all 14 candidate
    predictions read ORIGINAL pixels, which are exactly the decoder's
    already-reconstructed values, so the choice is free)."""
    h, w, _ = px.shape
    tiles_x = (w + (1 << bits) - 1) >> bits
    tiles_y = (h + (1 << bits) - 1) >> bits
    modes = np.zeros(tiles_x * tiles_y, dtype=np.uint8)
    if mode != "auto":
        modes[:] = mode
    else:
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                y0, x0 = ty << bits, tx << bits
                y1, x1 = min(y0 + (1 << bits), h), min(x0 + (1 << bits), w)
                best, best_cost = 0, None
                for m in range(14):
                    cost = 0
                    for y in range(y0, y1):
                        for x in range(x0, x1):
                            p = _predict_px(px, y, x, w, m)
                            r = (px[y, x].astype(np.int16)
                                 - p.astype(np.int16)) % 256
                            # centered magnitude: residual near 0 OR 255
                            cost += int(np.minimum(r, 256 - r).sum())
                    if best_cost is None or cost < best_cost:
                        best, best_cost = m, cost
                modes[ty * tiles_x + tx] = best
    out = px.copy()
    for y in range(h):
        for x in range(w):
            m = int(modes[(y >> bits) * tiles_x + (x >> bits)])
            pred = _predict_px(px, y, x, w, m)
            out[y, x] = px[y, x] - pred       # uint8 wrap
    mode_img = (0xFF000000 | (modes.astype(np.uint32) << 8))
    return out, mode_img


def _pack_pixels(px: np.ndarray) -> np.ndarray:
    """(h, w, 4) A,R,G,B uint8 → flat uint32 a<<24|r<<16|g<<8|b."""
    h, w, _ = px.shape
    le = px[..., [3, 2, 1, 0]].reshape(h * w, 4).copy()
    return le.view("<u4").reshape(-1).astype(np.uint32)


def _encode_pixels(bw: _BitWriter, flat: np.ndarray, w: int,
                   cache_bits: int = 0, use_lz77: bool = False,
                   is_main: bool = False) -> None:
    """Emit one spatially-coded image: tokenize (literals + optional
    left-run LZ77 + optional cache hits), build real canonical prefix
    codes from the token histogram, write codes then tokens."""
    total = len(flat)
    cache = [None] * (1 << cache_bits) if cache_bits else None
    tokens: list[tuple] = []                  # ('lit',a,r,g,b)|('cache',i)
    #                                         | ('copy', length, dist_val)
    pos = 0
    while pos < total:
        pix = int(flat[pos])
        if use_lz77 and pos > 0 and pix == int(flat[pos - 1]):
            run = 1
            while (pos + run < total and run < 4096
                   and int(flat[pos + run]) == pix):
                run += 1
            # dist 1 as a literal distance → prefix value 121
            tokens.append(("copy", run, 121))
            if cache is not None:
                cache[_cache_hash(pix, cache_bits)] = pix
            pos += run
            continue
        if (use_lz77 and pos >= w
                and pix == int(flat[pos - w])
                and pos + 3 < total
                and all(int(flat[pos + k]) == int(flat[pos + k - w])
                        for k in range(1, 4))):
            # vertical copy-from-above: 2-D plane code 1 = (dx 0, dy 1)
            run = 4
            while (pos + run < total and run < 4096
                   and int(flat[pos + run]) == int(flat[pos + run - w])):
                run += 1
            tokens.append(("copy", run, 1))
            if cache is not None:
                for k in range(run):
                    v = int(flat[pos + k])
                    cache[_cache_hash(v, cache_bits)] = v
            pos += run
            continue
        if cache is not None:
            idx = _cache_hash(pix, cache_bits)
            if cache[idx] == pix:
                tokens.append(("cache", idx))
                pos += 1
                continue
            cache[idx] = pix
        tokens.append(("lit", (pix >> 24) & 0xFF, (pix >> 16) & 0xFF,
                       (pix >> 8) & 0xFF, pix & 0xFF))
        pos += 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    g_freq = [0] * green_size
    r_freq = [0] * 256
    b_freq = [0] * 256
    a_freq = [0] * 256
    d_freq = [0] * 40
    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            g_freq[g] += 1
            r_freq[r] += 1
            b_freq[b] += 1
            a_freq[a] += 1
        elif t[0] == "copy":
            code, _, _ = _prefix_encode_value(t[1])
            g_freq[256 + code] += 1
            dcode, _, _ = _prefix_encode_value(t[2])
            d_freq[dcode] += 1
        else:
            g_freq[280 + t[1]] += 1

    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if is_main:
        bw.write(0, 1)                        # no meta-prefix image
    # (entropy-coded subimages have no meta-prefix bit, spec §5)
    g_codes = _write_prefix_code(bw, g_freq)
    r_codes = _write_prefix_code(bw, r_freq)
    b_codes = _write_prefix_code(bw, b_freq)
    a_codes = _write_prefix_code(bw, a_freq)
    d_codes = _write_prefix_code(bw, d_freq)

    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            bw.write_code(*g_codes[g])
            bw.write_code(*r_codes[r])
            bw.write_code(*b_codes[b])
            bw.write_code(*a_codes[a])
        elif t[0] == "copy":
            code, extra, ebits = _prefix_encode_value(t[1])
            bw.write_code(*g_codes[256 + code])
            if ebits:
                bw.write(extra, ebits)
            dcode, dextra, debits = _prefix_encode_value(t[2])
            bw.write_code(*d_codes[dcode])
            if debits:
                bw.write(dextra, debits)
        else:
            bw.write_code(*g_codes[280 + t[1]])


def _encode_pixels_meta(bw: _BitWriter, flat: np.ndarray, w: int, h: int,
                        meta_bits: int = 2) -> None:
    """Main-image encoder with a META-PREFIX image: tiles in the left
    half of the picture use code group 0, the right half group 1 —
    exercising the decoder's per-tile group dispatch with genuinely
    different histograms per group. Literals only (the group split is
    the point here)."""
    tile = 1 << meta_bits
    mx = (w + tile - 1) >> meta_bits
    my = (h + tile - 1) >> meta_bits
    tiles = np.zeros((my, mx), dtype=np.uint32)
    tiles[:, mx // 2:] = 1                    # right half → group 1
    bw.write(0, 1)                            # no color cache
    bw.write(1, 1)                            # meta-prefix present
    bw.write(meta_bits - 2, 3)
    # meta index lives in (red<<8)|green; indexes 0/1 fit in green
    _encode_pixels(bw, (0xFF000000 | (tiles << 8)).reshape(-1), mx)

    cols = np.arange(w) >> meta_bits
    rows = np.arange(h) >> meta_bits
    gidx = tiles[rows][:, cols].reshape(-1)   # per-pixel group

    chans = [((flat >> 24) & 0xFF), ((flat >> 16) & 0xFF),
             ((flat >> 8) & 0xFF), (flat & 0xFF)]   # a, r, g, b
    group_codes = []
    for grp in (0, 1):
        mask = gidx == grp
        g_freq = [0] * (256 + 24)
        r_freq = [0] * 256
        b_freq = [0] * 256
        a_freq = [0] * 256
        for v in chans[2][mask]:
            g_freq[int(v)] += 1
        for v in chans[1][mask]:
            r_freq[int(v)] += 1
        for v in chans[3][mask]:
            b_freq[int(v)] += 1
        for v in chans[0][mask]:
            a_freq[int(v)] += 1
        if not mask.any():
            g_freq[0] = 1                     # degenerate single-symbol
        group_codes.append((
            _write_prefix_code(bw, g_freq),
            _write_prefix_code(bw, r_freq),
            _write_prefix_code(bw, b_freq),
            _write_prefix_code(bw, a_freq),
            _write_prefix_code(bw, [1] + [0] * 39),   # distance unused
        ))
    for i in range(len(flat)):
        g_codes, r_codes, b_codes, a_codes, _ = group_codes[int(gidx[i])]
        bw.write_code(*g_codes[int(chans[2][i])])
        bw.write_code(*r_codes[int(chans[1][i])])
        bw.write_code(*b_codes[int(chans[3][i])])
        bw.write_code(*a_codes[int(chans[0][i])])


def encode_webp_lossless(arr: np.ndarray, *, use_subtract_green=False,
                         predictor_mode: int | None = None,
                         color_transform: tuple[int, int, int] | None = None,
                         use_palette=False, cache_bits: int = 0,
                         use_lz77: bool = False,
                         meta_split: bool = False) -> bytes:
    """HxWx{1,3,4} uint8 → lossless WebP bytes. Options choose which
    decoder paths the stream exercises; all outputs are spec-valid.
    ``meta_split`` writes a meta-prefix image with two code groups
    (left/right halves) — exclusive with palette/cache/lz77."""
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    if c == 1:
        arr = np.repeat(arr, 3, axis=-1)
        c = 3
    alpha = arr[..., 3] if c == 4 else np.full((h, w), 255, np.uint8)
    px = np.stack([alpha, arr[..., 0], arr[..., 1], arr[..., 2]],
                  axis=-1).astype(np.uint8)   # (h, w, 4) A,R,G,B

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if c == 4 else 0, 1)
    bw.write(0, 3)                            # version

    if use_palette:
        colors = px.reshape(-1, 4)
        uniq, inv = np.unique(colors, axis=0, return_inverse=True)
        if len(uniq) > 256:
            raise ValueError("palette encoding needs ≤256 distinct colors")
        pal_size = len(uniq)
        xbits = _palette_xbits(pal_size)
        bw.write(1, 1)                        # transform present
        bw.write(3, 2)                        # color indexing
        bw.write(pal_size - 1, 8)
        # palette as entropy-coded image of component deltas
        deltas = np.diff(np.vstack([[[0, 0, 0, 0]], uniq.astype(np.int16)]),
                         axis=0).astype(np.uint8)
        pal_px = deltas.reshape(1, pal_size, 4)     # (a, r, g, b) rows?
        # uniq rows are (a, r, g, b) — matches px layout
        _encode_pixels(bw, _pack_pixels(pal_px), pal_size)
        idx = inv.reshape(h, w).astype(np.uint32)
        if xbits:
            per = 1 << xbits
            ibits = 8 >> xbits
            packed_w = (w + per - 1) >> xbits
            packed = np.zeros((h, packed_w), dtype=np.uint32)
            for i in range(per):
                cols = np.arange(i, w, per)
                packed[:, : len(cols)] |= idx[:, cols] << (i * ibits)
            green = packed
            w_coded = packed_w
        else:
            green = idx
            w_coded = w
        flat = (0xFF000000 | (green << 8)).reshape(-1).astype(np.uint32)
        bw.write(0, 1)                        # end of transforms
        _encode_pixels(bw, flat, w_coded, cache_bits=cache_bits,
                       use_lz77=use_lz77, is_main=True)
    else:
        # The decoder inverts transforms in reverse READ order, so the
        # write order must equal the forward application order: apply
        # subtract-green, then color, then predictor — and write the
        # transform chunks in that same order.
        if use_subtract_green:
            g = px[..., 2].copy()
            px[..., 1] = px[..., 1] - g
            px[..., 3] = px[..., 3] - g
            bw.write(1, 1)
            bw.write(2, 2)                    # subtract green
        if color_transform is not None:
            bits = 4
            tx = (w + (1 << bits) - 1) >> bits
            ty = (h + (1 << bits) - 1) >> bits

            def _cte(t):
                g2r, g2b, r2b = t
                return (0xFF000000 | ((r2b & 0xFF) << 16)
                        | ((g2b & 0xFF) << 8) | (g2r & 0xFF))

            if isinstance(color_transform[0], tuple):
                # spatially-split: left tiles use element 0, right
                # tiles element 1 — exercises per-tile decode lookup
                left_t, right_t = color_transform
                split_px = (tx // 2) << bits
                _forward_color_transform(px, *left_t, 0, min(split_px, w))
                if split_px < w:
                    _forward_color_transform(px, *right_t, split_px, w)
                ct_img = np.full((ty, tx), _cte(left_t), dtype=np.uint32)
                ct_img[:, tx // 2:] = _cte(right_t)
                ct_img = ct_img.reshape(-1)
            else:
                _forward_color_transform(px, *color_transform)
                ct_img = np.full(tx * ty, _cte(color_transform),
                                 dtype=np.uint32)
            bw.write(1, 1)
            bw.write(1, 2)                    # color transform
            bw.write(bits - 2, 3)
            _encode_pixels(bw, ct_img, tx)
        if predictor_mode is not None:
            bits = 4
            px, mode_img = _forward_predictor(px, predictor_mode, bits)
            tx = (w + (1 << bits) - 1) >> bits
            bw.write(1, 1)
            bw.write(0, 2)                    # predictor transform
            bw.write(bits - 2, 3)
            _encode_pixels(bw, mode_img, tx)
        bw.write(0, 1)                        # end of transforms
        if meta_split:
            if use_palette or cache_bits or use_lz77:
                raise ValueError("meta_split is exclusive with "
                                 "palette/cache/lz77")
            _encode_pixels_meta(bw, _pack_pixels(px), w, h)
        else:
            _encode_pixels(bw, _pack_pixels(px), w, cache_bits=cache_bits,
                           use_lz77=use_lz77, is_main=True)

    payload = bytes([0x2F]) + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
