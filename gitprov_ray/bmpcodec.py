"""Windows BMP codec (BITMAPINFOHEADER family, public Windows GDI spec):
real decode of 24/32-bpp uncompressed, 8-bpp palette (uncompressed and
RLE8), 4-bpp palette (uncompressed), bottom-up and top-down row order;
encoder emits 24-bpp uncompressed or 8-bpp palette/RLE8.

Out of scope (declared): 1/16-bpp, RLE4, BITFIELDS compression, embedded
PNG/JPEG (BI_PNG/BI_JPEG) — NotImplementedError naming the feature.

Reference parity note: the reference delegates media handling to external
libraries; this module serves the multimodal curation stages only.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(b: bytes) -> bool:
    return b[:2] == b"BM" and len(b) >= 26


def probe_bmp(b: bytes) -> dict:
    if not is_bmp(b):
        raise ValueError("not a BMP")
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size >= 40:
        w, h = struct.unpack_from("<ii", b, 18)
        planes, bpp = struct.unpack_from("<HH", b, 26)
        comp = struct.unpack_from("<I", b, 30)[0]
    else:                                  # BITMAPCOREHEADER
        w, h = struct.unpack_from("<HH", b, 18)
        bpp = struct.unpack_from("<H", b, 24)[0]
        comp = 0
    comp_name = {0: "rgb", 1: "rle8", 2: "rle4", 3: "bitfields",
                 4: "jpeg", 5: "png"}.get(comp, f"comp{comp}")
    return {"width": int(w), "height": abs(int(h)), "bpp": int(bpp),
            "compression": comp_name,
            "top_down": int(h) < 0}


def _rle8_decode(src: bytes, w: int, h: int) -> np.ndarray:
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = 0
    while i + 1 < len(src):
        n, v = src[i], src[i + 1]
        i += 2
        if n > 0:                          # encoded run
            out[y, x:x + n] = v
            x += n
        elif v == 0:                       # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif v == 1:                       # end of bitmap
            break
        elif v == 2:                       # delta
            dx, dy = src[i], src[i + 1]
            i += 2
            x += dx
            y += dy
        else:                              # absolute run of v pixels
            out[y, x:x + v] = np.frombuffer(src[i:i + v], dtype=np.uint8)
            i += v + (v % 2)               # word-aligned
            x += v
    return out


def _rle8_encode(row: np.ndarray) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i
        while j + 1 < n and row[j + 1] == row[j] and j - i < 254:
            j += 1
        run = j - i + 1
        out += bytes([run, int(row[i])])
        i = j + 1
    out += b"\x00\x00"                     # end of line
    return bytes(out)


def decode_bmp(b: bytes) -> np.ndarray:
    """payload -> HxW (gray palette) or HxWx3 / HxWx4 uint8 (RGB order)."""
    if not is_bmp(b):
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP")
    w, h_raw = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    n_colors = struct.unpack_from("<I", b, 46)[0]
    top_down = h_raw < 0
    h = abs(h_raw)
    pal_off = 14 + hdr_size
    if comp not in (0, 1):
        raise NotImplementedError(
            f"BMP compression {probe_bmp(b)['compression']}")
    if bpp in (4, 8):
        nc = n_colors or (1 << bpp)
        pal = np.frombuffer(b[pal_off:pal_off + 4 * nc],
                            dtype=np.uint8).reshape(nc, 4)[:, [2, 1, 0]]
        if comp == 1:
            if bpp != 8:
                raise NotImplementedError("RLE4 BMP")
            idx = _rle8_decode(b[data_off:], w, h)
            if not top_down:
                idx = idx[::-1]
        else:
            stride = (w * bpp // 8 + 3) & ~3 if bpp == 8 else \
                ((w + 1) // 2 + 3) & ~3
            rows = np.frombuffer(b[data_off:data_off + stride * h],
                                 dtype=np.uint8).reshape(h, stride)
            if bpp == 8:
                idx = rows[:, :w]
            else:                          # 4bpp: unpack nibbles
                hi = rows[:, :(w + 1) // 2] >> 4
                lo = rows[:, :(w + 1) // 2] & 0xF
                idx = np.empty((h, ((w + 1) // 2) * 2), dtype=np.uint8)
                idx[:, 0::2] = hi
                idx[:, 1::2] = lo
                idx = idx[:, :w]
            if not top_down:
                idx = idx[::-1]
        rgb = pal[idx]
        # grayscale palette -> 2-D array (matches the other codecs' gray)
        if (rgb[..., 0] == rgb[..., 1]).all() and \
                (rgb[..., 1] == rgb[..., 2]).all():
            return np.ascontiguousarray(rgb[..., 0])
        return np.ascontiguousarray(rgb)
    if bpp in (24, 32):
        nch = bpp // 8
        stride = (w * nch + 3) & ~3
        rows = np.frombuffer(b[data_off:data_off + stride * h],
                             dtype=np.uint8).reshape(h, stride)
        px = rows[:, :w * nch].reshape(h, w, nch)
        if not top_down:
            px = px[::-1]
        if nch == 3:
            return np.ascontiguousarray(px[..., [2, 1, 0]])     # BGR->RGB
        return np.ascontiguousarray(px[..., [2, 1, 0, 3]])      # BGRA->RGBA
    raise NotImplementedError(f"BMP {bpp}-bpp")


def encode_bmp(arr: np.ndarray, rle: bool = False,
               top_down: bool = False) -> bytes:
    """HxW gray (8-bpp palette, optionally RLE8) or HxWx3 RGB (24-bpp)
    uint8 -> spec-valid BMP."""
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    h, w = arr.shape[:2]
    gray = arr.ndim == 2
    if rle and not gray:
        raise ValueError("RLE8 requires a grayscale (palette) image")
    if gray:
        pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
        rows = arr if top_down else arr[::-1]
        if rle:
            body = b"".join(_rle8_encode(r) for r in rows) + b"\x00\x01"
            comp = 1
        else:
            stride = (w + 3) & ~3
            padded = np.zeros((h, stride), dtype=np.uint8)
            padded[:, :w] = rows
            body = padded.tobytes()
            comp = 0
        data_off = 14 + 40 + len(pal)
        info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                           1, 8, comp, len(body), 2835, 2835, 256, 0)
        hdr = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0,
                          data_off)
        return hdr + info + pal + body
    bgr = arr[..., [2, 1, 0]]
    rows = bgr if top_down else bgr[::-1]
    stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, :w * 3] = rows.reshape(h, w * 3)
    body = padded.tobytes()
    data_off = 14 + 40
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                       1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    return hdr + info + body
