"""QOI codec ("Quite OK Image", qoiformat.org public 1-page spec):
full decode and encode of both 3- and 4-channel images — all six chunk
ops (RGB, RGBA, INDEX, DIFF, LUMA, RUN), the 64-entry running index
with the (3r+5g+7b+11a) mod 64 hash, wrap-around byte diffs, and the
7x00+01 end marker.  QOI is byte-exact lossless, so encode->decode
round-trips are pinned to array equality in tests.

Reference parity note: the reference delegates media handling to
external libraries; this module serves the multimodal curation stages
only.
"""

from __future__ import annotations

import struct

import numpy as np

_OP_RGB = 0xFE
_OP_RGBA = 0xFF
_END = b"\x00" * 7 + b"\x01"


def is_qoi(b: bytes) -> bool:
    return b[:4] == b"qoif" and len(b) >= 14


def probe_qoi(b: bytes) -> dict:
    if not is_qoi(b):
        raise ValueError("not a QOI stream")
    w, h = struct.unpack_from(">II", b, 4)
    channels, colorspace = b[12], b[13]
    return {"width": int(w), "height": int(h), "channels": int(channels),
            "colorspace": int(colorspace)}


def _hash(r: int, g: int, bl: int, a: int) -> int:
    return (r * 3 + g * 5 + bl * 7 + a * 11) % 64


def decode_qoi(b: bytes) -> np.ndarray:
    """-> (h, w, 3) or (h, w, 4) uint8, per the header channel count."""
    p = probe_qoi(b)
    w, h, channels = p["width"], p["height"], p["channels"]
    if channels not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {channels}")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = np.zeros((64, 4), dtype=np.uint8)
    r, g, bl, a = 0, 0, 0, 255
    i, px = 14, 0
    data = b
    while px < n:
        byte = data[i]
        i += 1
        if byte == _OP_RGB:
            r, g, bl = data[i], data[i + 1], data[i + 2]
            i += 3
        elif byte == _OP_RGBA:
            r, g, bl, a = data[i], data[i + 1], data[i + 2], data[i + 3]
            i += 4
        else:
            tag = byte >> 6
            if tag == 0:                       # INDEX
                r, g, bl, a = index[byte & 0x3F]
                r, g, bl, a = int(r), int(g), int(bl), int(a)
            elif tag == 1:                     # DIFF (bias 2, wraps)
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                bl = (bl + (byte & 3) - 2) & 0xFF
            elif tag == 2:                     # LUMA (bias 32 / 8)
                dg = (byte & 0x3F) - 32
                b2 = data[i]
                i += 1
                r = (r + dg + ((b2 >> 4) & 0xF) - 8) & 0xFF
                g = (g + dg) & 0xFF
                bl = (bl + dg + (b2 & 0xF) - 8) & 0xFF
            else:                              # RUN (bias -1)
                run = (byte & 0x3F) + 1
                out[px:px + run] = (r, g, bl, a)
                px += run
                index[_hash(r, g, bl, a)] = (r, g, bl, a)
                continue
        out[px] = (r, g, bl, a)
        px += 1
        index[_hash(r, g, bl, a)] = (r, g, bl, a)
    arr = out.reshape(h, w, 4)
    return arr[:, :, :3].copy() if channels == 3 else arr


def encode_qoi(arr: np.ndarray, colorspace: int = 0) -> bytes:
    """(h, w, 3|4) uint8 -> QOI bytes (reference chunk-selection order:
    RUN, INDEX, DIFF, LUMA, RGB/RGBA)."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w, channels = arr.shape
    if channels not in (3, 4):
        raise ValueError("encode_qoi wants (h,w,3|4)")
    px = arr.reshape(-1, channels).astype(np.uint8)
    if channels == 3:
        px = np.concatenate(
            [px, np.full((len(px), 1), 255, np.uint8)], axis=1)
    out = bytearray()
    out += b"qoif" + struct.pack(">II", w, h) + bytes([channels, colorspace])
    index = np.zeros((64, 4), dtype=np.uint8)
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for r, g, bl, a in px.tolist():
        if (r, g, bl, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hx = _hash(r, g, bl, a)
        if tuple(index[hx]) == (r, g, bl, a):
            out.append(hx)
        elif a == pa:
            dr = (r - pr) & 0xFF
            dg = (g - pg) & 0xFF
            db = (bl - pb) & 0xFF
            # map wrapped deltas to signed [-128,127]
            sr = dr - 256 if dr > 127 else dr
            sg = dg - 256 if dg > 127 else dg
            sb = db - 256 if db > 127 else db
            if -2 <= sr <= 1 and -2 <= sg <= 1 and -2 <= sb <= 1:
                out.append(0x40 | ((sr + 2) << 4) | ((sg + 2) << 2)
                           | (sb + 2))
            elif (-32 <= sg <= 31 and -8 <= sr - sg <= 7
                  and -8 <= sb - sg <= 7):
                out.append(0x80 | (sg + 32))
                out.append(((sr - sg + 8) << 4) | (sb - sg + 8))
            else:
                out += bytes([_OP_RGB, r, g, bl])
        else:
            out += bytes([_OP_RGBA, r, g, bl, a])
        index[hx] = (r, g, bl, a)
        pr, pg, pb, pa = r, g, bl, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)
