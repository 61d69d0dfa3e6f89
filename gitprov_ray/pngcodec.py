"""Pure-stdlib/numpy PNG codec (no external codec dependency).

Implements the static-image subset of the public PNG spec (RFC 2083 /
ISO 15948): every legal bit depth (1/2/4/8/16), color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha) and 6 (RGBA), all five scanline
filters (None/Sub/Up/Average/Paeth), Adam7 interlace, zlib-compressed
IDAT via the stdlib. Output is always 8-bit (16-bit samples take their
high byte, sub-8-bit gray rescales to full range) — like ``jpegcodec``,
this is the decode path that feeds the multimodal stages, not a general
imaging library. APNG animation is out of scope (the first frame — the
static IDAT image — decodes normally).

The encoder writes 8-bit gray/RGB/RGBA with filter 0 rows (zlib does the
compression) so tests can round-trip real PNG bitstreams losslessly
without any vendored binary asset.

Performance note: unfiltering is sequential across a row's pixels for
Sub/Average/Paeth (each byte depends on the reconstructed left
neighbour), so those rows run a per-pixel loop over numpy vectors of
channels; filter-None/Up rows (the common output of most encoders for
photographic data is a mix) vectorize whole-row. Decoding runs inside
the multimodal actor-pool stages, so throughput scales with the pool.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel, per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(b: bytes) -> bool:
    return b[: len(_SIG)] == _SIG


def probe_png(b: bytes) -> dict:
    """Header-only probe (IHDR): width / height / bit depth / color type /
    interlaced."""
    if not is_png(b):
        raise ValueError("not a PNG")
    for ctype, data in _chunks(b):
        if ctype == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            return {"width": w, "height": h, "bit_depth": data[8],
                    "color_type": data[9], "interlaced": data[12] == 1}
        break                       # IHDR must be the first chunk
    raise ValueError("PNG missing IHDR")


def _chunks(b: bytes):
    pos = len(_SIG)
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos:pos + 4])
        ctype = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length          # length + type + data + crc
        if ctype == b"IEND":
            return


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (spec §6.6), vectorized over a pixel's channels."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering → (h, stride) reconstructed bytes.
    ``raw`` is (h, 1+stride): filter byte + filtered row."""
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        row = raw[y, 1:].copy()
        prior = out[y - 1] if y else zero_row
        if ftype == 0:                      # None
            out[y] = row
        elif ftype == 2:                    # Up — whole-row vector add
            out[y] = row + prior
        elif ftype == 1:                    # Sub
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(row[x]) + int(left)) & 0xFF
        elif ftype == 3:                    # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(row[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif ftype == 4:                    # Paeth
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else np.uint8(0)
                ul = prior[x - bpp] if x >= bpp else np.uint8(0)
                pred = _paeth(np.array(left), prior[x], np.array(ul))
                out[y, x] = (int(row[x]) + int(pred)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


# Adam7 pass grid (spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _decode_pass(raw: bytes, pos: int, w: int, h: int, depth: int,
                 ch: int):
    """Unfilter and unpack one (sub)image of w×h pixels starting at byte
    ``pos`` of the decompressed IDAT stream → ((h, w, ch) uint8 samples,
    next position). 16-bit samples keep their high byte; sub-8-bit
    samples come out as raw index/gray values (caller rescales)."""
    bits_pp = depth * ch
    stride = (w * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)             # filter offset unit (spec §9.2)
    need = h * (stride + 1)
    chunk = raw[pos:pos + need]
    if len(chunk) != need:
        raise ValueError("PNG IDAT size mismatch")
    rows = np.frombuffer(chunk, np.uint8).reshape(h, stride + 1)
    flat = _unfilter(rows, h, stride, bpp)
    if depth == 8:
        img = flat.reshape(h, w, ch)
    elif depth == 16:
        img = flat.reshape(h, w, ch, 2)[..., 0]   # big-endian high byte
    else:                                   # 1/2/4-bit gray or palette
        per_byte = 8 // depth
        shifts = np.arange(per_byte - 1, -1, -1, np.uint8) * depth
        mask = (1 << depth) - 1
        vals = (flat[:, :, None] >> shifts[None, None, :]) & mask
        img = vals.reshape(h, stride * per_byte)[:, :w].reshape(h, w, 1)
    return img, pos + need


def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes → HxWxC uint8 (C = 1 gray, 2 gray+alpha, 3 RGB, 4 RGBA;
    palette images expand to RGB/RGBA). Handles every legal depth
    (1/2/4/8/16) and Adam7 interlace."""
    if not is_png(b):
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    trns = None
    idat = []
    for ctype, data in _chunks(b):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if ctype_ not in _CHANNELS:
        raise ValueError(f"bad PNG color type {ctype_}")
    if depth not in (1, 2, 4, 8, 16) or \
            (depth < 8 and ctype_ not in (0, 3)) or \
            (depth == 16 and ctype_ == 3):
        raise ValueError(f"bad PNG depth {depth} for color type {ctype_}")
    ch = _CHANNELS[ctype_]
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        img, _ = _decode_pass(raw, 0, w, h, depth, ch)
    else:                                   # Adam7: 7 sequential passes
        img = np.zeros((h, w, ch), np.uint8)
        pos = 0
        for xs, ys, xstep, ystep in _ADAM7:
            pw = (w - xs + xstep - 1) // xstep
            ph = (h - ys + ystep - 1) // ystep
            if pw <= 0 or ph <= 0:
                continue
            sub, pos = _decode_pass(raw, pos, pw, ph, depth, ch)
            img[ys::ystep, xs::xstep] = sub
    if ctype_ == 3:                         # palette → RGB(A)
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[..., 0]
        rgb = plte[idx]                     # HxWx3
        if trns is not None:
            alpha = np.full(256, 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if depth < 8:                           # gray: rescale to full range
        img = (img.astype(np.uint16) * 255 // ((1 << depth) - 1)) \
            .astype(np.uint8)
    return img


def encode_png(arr: np.ndarray) -> bytes:
    """HxWxC uint8 (C ∈ {1,2,3,4}) → PNG bytes (filter-0 rows, stdlib
    zlib). Lossless: decode_png(encode_png(a)) == a."""
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (struct.pack(">I", len(data)) + body +
                struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    filtered = np.hstack([np.zeros((h, 1), np.uint8),
                          np.ascontiguousarray(arr).reshape(h, w * c)])
    return (_SIG + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(filtered.tobytes(), 6)) +
            chunk(b"IEND", b""))
