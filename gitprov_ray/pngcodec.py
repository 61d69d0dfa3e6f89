"""Pure-stdlib/numpy PNG codec (no external codec dependency).

Implements the non-interlaced subset of the public PNG spec (RFC 2083 /
ISO 15948): 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha) and 6 (RGBA), all five scanline filters (None/Sub/Up/
Average/Paeth), zlib-compressed IDAT via the stdlib. Adam7 interlace and
16-bit depth raise ``NotImplementedError`` — like ``jpegcodec``, this is
the baseline path that turns the multimodal compressed-image stub into a
real decode, not a general imaging library.

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


def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes → HxWxC uint8 (C = 1 gray, 2 gray+alpha, 3 RGB, 4 RGBA;
    palette images expand to RGB/RGBA)."""
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
    if interlace != 0:
        raise NotImplementedError("Adam7 interlaced PNG not supported")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} not supported")
    if ctype_ not in _CHANNELS:
        raise ValueError(f"bad PNG color type {ctype_}")
    ch = _CHANNELS[ctype_]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    img = _unfilter(rows, h, stride, ch).reshape(h, w, ch)
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
