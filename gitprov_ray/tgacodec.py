"""Truevision TGA codec (public TGA 1.0/2.0 spec): real decode of
image types 2/10 (truecolor 24/32-bpp, raw and RLE), 3/11 (8-bpp
grayscale, raw and RLE) and 1/9 (8-bpp colormapped with 24/32-bit
palette entries); both bottom-up (default) and top-down row order via
descriptor bit 5; pixel order is BGR(A) on disk.  Encoder emits
truecolor 24-bpp, raw (type 2) or RLE (type 10), top-down.

Out of scope (declared): 15/16-bpp pixels, right-to-left scan order
(descriptor bit 4), TGA 2.0 footer extension areas —
NotImplementedError naming the feature.

Reference parity note: the reference delegates media handling to
external libraries; this module serves the multimodal curation stages
only.
"""

from __future__ import annotations

import struct

import numpy as np


def is_tga(b: bytes) -> bool:
    """TGA has no magic; validate the header fields instead (the same
    heuristic file(1) uses)."""
    if len(b) < 18:
        return False
    cmap_type, img_type = b[1], b[2]
    if cmap_type not in (0, 1):
        return False
    if img_type not in (1, 2, 3, 9, 10, 11):
        return False
    depth = b[16]
    if depth not in (8, 15, 16, 24, 32):
        return False
    w, h = struct.unpack_from("<HH", b, 12)
    return w > 0 and h > 0


def probe_tga(b: bytes) -> dict:
    if not is_tga(b):
        raise ValueError("not a TGA")
    img_type = b[2]
    w, h = struct.unpack_from("<HH", b, 12)
    depth, desc = b[16], b[17]
    kind = {1: "colormap", 2: "truecolor", 3: "gray"}[img_type & 0x7]
    return {"width": int(w), "height": int(h), "bpp": int(depth),
            "kind": kind, "rle": bool(img_type & 0x8),
            "top_down": bool(desc & 0x20)}


def _rle_unpack(src: bytes, n_px: int, bpp_bytes: int) -> bytes:
    out = bytearray()
    i = 0
    need = n_px * bpp_bytes
    while len(out) < need:
        hdr = src[i]
        i += 1
        count = (hdr & 0x7F) + 1
        if hdr & 0x80:                       # run packet: one pixel repeats
            out += src[i:i + bpp_bytes] * count
            i += bpp_bytes
        else:                                # raw packet: count pixels
            out += src[i:i + count * bpp_bytes]
            i += count * bpp_bytes
    return bytes(out[:need])


def decode_tga(b: bytes) -> np.ndarray:
    """-> (h, w, 3) or (h, w, 4) uint8 RGB(A)."""
    p = probe_tga(b)
    img_type = b[2]
    if b[17] & 0x10:
        raise NotImplementedError("TGA right-to-left scan order")
    if p["bpp"] in (15, 16):
        raise NotImplementedError("TGA 15/16-bpp pixels")
    id_len = b[0]
    cm_first, cm_len = struct.unpack_from("<HH", b, 3)
    cm_size = b[7]
    w, h = p["width"], p["height"]
    off = 18 + id_len
    palette = None
    if b[1] == 1:
        if cm_size not in (24, 32):
            raise NotImplementedError(f"TGA {cm_size}-bit palette entries")
        nbytes = cm_size // 8
        palette = np.frombuffer(
            b, np.uint8, cm_len * nbytes, off).reshape(cm_len, nbytes)
        off += cm_len * nbytes
    bpp_bytes = p["bpp"] // 8
    raw = b[off:]
    if img_type & 0x8:
        raw = _rle_unpack(raw, w * h, bpp_bytes)
    else:
        raw = raw[:w * h * bpp_bytes]
    px = np.frombuffer(raw, np.uint8).reshape(h, w, bpp_bytes)
    kind = img_type & 0x7
    if kind == 2:                            # truecolor, BGR(A) -> RGB(A)
        if bpp_bytes == 3:
            arr = px[:, :, ::-1]
        else:
            arr = np.concatenate([px[:, :, [2, 1, 0]], px[:, :, 3:4]],
                                 axis=2)
    elif kind == 3:                          # grayscale
        arr = np.repeat(px, 3, axis=2)
    else:                                    # colormapped
        idx = px[:, :, 0].astype(np.int64) - cm_first
        ent = palette[idx]                   # BGR(A) entries
        if ent.shape[-1] == 3:
            arr = ent[:, :, [2, 1, 0]]
        else:
            arr = np.concatenate([ent[:, :, [2, 1, 0]], ent[:, :, 3:4]],
                                 axis=2)
    if not p["top_down"]:
        arr = arr[::-1]
    return np.ascontiguousarray(arr)


def _rle_pack(rows: np.ndarray) -> bytes:
    """RLE per scanline (packets must not cross lines per spec)."""
    out = bytearray()
    h, w, c = rows.shape
    for y in range(h):
        line = rows[y]
        x = 0
        while x < w:
            # find run length of identical pixels
            run = 1
            while (x + run < w and run < 128
                   and (line[x + run] == line[x]).all()):
                run += 1
            if run >= 2:
                out.append(0x80 | (run - 1))
                out += line[x].tobytes()
                x += run
            else:
                # literal stretch: until next run of >=2 or 128 px
                start = x
                x += 1
                while x < w and (x - start) < 128:
                    if (x + 1 < w and (line[x + 1] == line[x]).all()):
                        break
                    x += 1
                out.append((x - start) - 1)
                out += line[start:x].tobytes()
    return bytes(out)


def encode_tga(arr: np.ndarray, rle: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bpp top-down TGA (type 2 or RLE 10)."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w, _ = arr.shape
    bgr = np.ascontiguousarray(arr[:, :, ::-1]).astype(np.uint8)
    img_type = 10 if rle else 2
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, img_type, 0, 0, 0,
                      0, 0, w, h, 24, 0x20)
    body = _rle_pack(bgr) if rle else bgr.tobytes()
    return hdr + body
