"""PCX (ZSoft Paintbrush) codec — the classic RLE-compressed DOS-era
raster format still found in legacy crawls. Public spec: the ZSoft PCX
File Format Technical Reference Manual (rev 5).

Profile: 8-bit pixels, 1 plane (VGA palette at EOF marker 0x0C, or
grayscale when absent) and 3 planes (24-bit RGB, row-planar); RLE
encoding 1. 1/2/4-bpp EGA modes are declared stubs. Encoder writes
version-5 files with even bytes-per-line and per-row RLE (runs never
cross row/plane boundaries — the spec's recommendation), so every
decode path is roundtrip-pinned against the engine's own encoder."""

from __future__ import annotations

import struct

import numpy as np


def is_pcx(b: bytes) -> bool:
    """Manufacturer 0x0A + a sane version/encoding/bpp combination.
    PCX's magic is weak (one byte), so this probe goes LATE in the
    image dispatch — after every strong-magic format."""
    return (len(b) >= 128 and b[0] == 0x0A
            and b[1] in (0, 2, 3, 4, 5) and b[2] in (0, 1)
            and b[3] in (1, 2, 4, 8))


def _header(b: bytes):
    (xmin, ymin, xmax, ymax) = struct.unpack_from("<4H", b, 4)
    bpp = b[3]
    nplanes = b[65]
    bpl = struct.unpack_from("<H", b, 66)[0]
    return (xmax - xmin + 1, ymax - ymin + 1, bpp, nplanes, bpl,
            b[1], b[2])


def probe_pcx(b: bytes) -> dict:
    if not is_pcx(b):
        raise ValueError("not a PCX")
    w, h, bpp, nplanes, bpl, version, encoding = _header(b)
    return {"width": w, "height": h, "bits": bpp, "planes": nplanes,
            "version": version, "rle": encoding == 1,
            "bytes_per_line": bpl,
            "vga_palette": len(b) > 769 and b[-769] == 0x0C}


def _rle_decode(src: bytes, expected: int) -> np.ndarray:
    out = np.empty(expected, dtype=np.uint8)
    i = pos = 0
    n = len(src)
    while pos < expected and i < n:
        v = src[i]
        i += 1
        if v >= 0xC0:
            run = v & 0x3F
            if i >= n:
                break
            val = src[i]
            i += 1
            end = min(pos + run, expected)
            out[pos:end] = val
            pos = end
        else:
            out[pos] = v
            pos += 1
    if pos < expected:
        raise ValueError("truncated PCX RLE stream")
    return out


def decode_pcx(b: bytes) -> np.ndarray:
    """payload → HxW (gray) or HxWx3 (RGB) uint8."""
    if not is_pcx(b):
        raise ValueError("not a PCX")
    w, h, bpp, nplanes, bpl, _version, encoding = _header(b)
    if bpp != 8 or nplanes not in (1, 3):
        raise NotImplementedError(
            f"PCX {bpp}-bpp {nplanes}-plane (EGA modes) unsupported")
    total = bpl * nplanes * h
    body = b[128:]
    has_pal = len(b) > 769 and b[-769] == 0x0C
    if has_pal:
        body = b[128:-769]
    raw = _rle_decode(body, total) if encoding == 1 else \
        np.frombuffer(body[:total], dtype=np.uint8).copy()
    rows = raw.reshape(h, nplanes, bpl)[:, :, :w]
    if nplanes == 3:
        return np.moveaxis(rows, 1, 2).copy()      # (h, w, 3) RGB
    idx = rows[:, 0, :]
    if has_pal:
        pal = np.frombuffer(b[-768:], dtype=np.uint8).reshape(256, 3)
        return pal[idx]
    return idx.copy()


def _rle_encode_row(row: np.ndarray) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        v = int(row[i])
        run = 1
        while i + run < n and row[i + run] == v and run < 63:
            run += 1
        if run > 1 or v >= 0xC0:
            out.append(0xC0 | run)
            out.append(v)
        else:
            out.append(v)
        i += run
    return bytes(out)


def encode_pcx(arr: np.ndarray) -> bytes:
    """HxW / HxWx1 (gray, written with an identity VGA palette) or
    HxWx3 (RGB, 3 planes) uint8 → version-5 PCX."""
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    nplanes = 1 if gray else 3
    bpl = w + (w & 1)
    hdr = bytearray(128)
    hdr[0], hdr[1], hdr[2], hdr[3] = 0x0A, 5, 1, 8
    struct.pack_into("<4H", hdr, 4, 0, 0, w - 1, h - 1)
    struct.pack_into("<2H", hdr, 12, 72, 72)
    hdr[65] = nplanes
    struct.pack_into("<H", hdr, 66, bpl)
    struct.pack_into("<H", hdr, 68, 1)
    out = bytearray(hdr)
    data = arr.astype(np.uint8)
    pad = bpl - w
    for y in range(h):
        for p in range(nplanes):
            row = data[y] if gray else data[y, :, p]
            if pad:
                row = np.concatenate([row, row[-1:]])
            out += _rle_encode_row(row)
    if gray:
        pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
        out += b"\x0c" + pal.tobytes()
    return bytes(out)
