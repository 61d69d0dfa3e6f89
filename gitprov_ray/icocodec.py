"""Windows ICO/CUR codec (favicon format — ubiquitous crawl content).

Public ICONDIR layout: 6-byte header (reserved=0, type 1=icon 2=cursor,
count), then 16-byte ICONDIRENTRY records (w, h, palette count, planes,
bpp, payload size, payload offset; w/h byte 0 means 256). Each entry's
payload is either a complete PNG stream (Vista+ icons) or a headerless
BMP DIB: BITMAPINFOHEADER with DOUBLED height covering the XOR
(color) image followed by a 1-bpp AND (transparency) mask, both
bottom-up with 4-byte-aligned rows.

Decode reuses the real codecs in this package: PNG entries go through
``pngcodec.decode_png``; DIB entries get a synthesized 14-byte
BITMAPFILEHEADER (height halved back) and go through
``bmpcodec.decode_bmp``, then the AND mask applies as alpha for
sub-32-bpp images. The encoder writes PNG entries (spec-valid, the
modern favicon form) or 32-bpp DIB entries with an all-opaque mask.

Reference parity note: the reference delegates media handling to
external libraries; this module serves the multimodal curation stages.
"""

from __future__ import annotations

import struct

import numpy as np


def is_ico(b: bytes) -> bool:
    return len(b) >= 6 and b[:4] in (b"\x00\x00\x01\x00",
                                     b"\x00\x00\x02\x00") \
        and struct.unpack_from("<H", b, 4)[0] > 0


def probe_ico(b: bytes) -> dict:
    """Header-only probe: kind (icon/cursor), entry list with per-entry
    width/height/bpp/format, and the largest entry's dimensions."""
    if not is_ico(b):
        raise ValueError("not an ICO")
    from . import pngcodec

    kind = "icon" if b[2] == 1 else "cursor"
    count = struct.unpack_from("<H", b, 4)[0]
    entries = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(b):
            raise ValueError("truncated ICO directory")
        w, h, _ncol, _res, planes, bpp, size, doff = struct.unpack_from(
            "<BBBBHHII", b, off)
        w = w or 256
        h = h or 256
        payload = b[doff:doff + size]
        fmt = "png" if pngcodec.is_png(payload) else "bmp"
        if fmt == "bmp" and len(payload) >= 16:
            bpp = struct.unpack_from("<H", payload, 14)[0] or bpp
        entries.append({"width": w, "height": h, "bpp": bpp,
                        "format": fmt, "size": size})
    big = max(entries, key=lambda e: e["width"] * e["height"])
    return {"kind": kind, "count": count, "entries": entries,
            "width": big["width"], "height": big["height"]}


def _decode_dib(payload: bytes) -> np.ndarray:
    """Headerless ICO DIB → RGBA uint8 (XOR image + AND mask)."""
    from . import bmpcodec

    if len(payload) < 40:
        raise ValueError("truncated ICO DIB")
    hdr_size = struct.unpack_from("<I", payload, 0)[0]
    w, h2 = struct.unpack_from("<ii", payload, 4)
    bpp = struct.unpack_from("<H", payload, 14)[0]
    n_colors = struct.unpack_from("<I", payload, 32)[0]
    h = h2 // 2                        # doubled height: XOR + AND mask
    pal_bytes = 4 * (n_colors or (1 << bpp)) if bpp <= 8 else 0
    data_off = hdr_size + pal_bytes
    # synthesize a BMP file header and halve the height so bmpcodec
    # decodes the XOR image
    info = bytearray(payload[:hdr_size])
    struct.pack_into("<i", info, 8, h)
    file_hdr = b"BM" + struct.pack("<IHHI", 14 + len(payload), 0, 0,
                                   14 + data_off)
    xor = bmpcodec.decode_bmp(bytes(file_hdr) + bytes(info)
                              + payload[hdr_size:])
    if xor.ndim == 2:
        xor = np.dstack([xor] * 3)
    if xor.shape[2] == 3:
        xor = np.dstack([xor, np.full((h, w), 255, np.uint8)])
    if bpp < 32:                       # apply the 1-bpp AND mask as alpha
        xor_stride = ((w * bpp + 31) // 32) * 4
        and_off = data_off + xor_stride * h
        and_stride = ((w + 31) // 32) * 4
        need = and_off + and_stride * h
        if len(payload) >= need:
            rows = np.frombuffer(payload[and_off:need],
                                 np.uint8).reshape(h, and_stride)
            bits = np.unpackbits(rows, axis=1)[:, :w][::-1]  # bottom-up
            xor = xor.copy()
            xor[..., 3] = np.where(bits == 1, 0, xor[..., 3])
    return xor


def decode_ico(b: bytes, index: int | None = None) -> np.ndarray:
    """ICO bytes → (H, W, 4) uint8 RGBA of the largest entry (or the
    ``index``-th entry)."""
    from . import pngcodec

    p = probe_ico(b)
    if index is None:
        index = max(range(p["count"]),
                    key=lambda i: (p["entries"][i]["width"]
                                   * p["entries"][i]["height"]))
    if not 0 <= index < p["count"]:
        raise ValueError("ICO entry index out of range")
    _w, _h, _nc, _r, _pl, _bpp, size, doff = struct.unpack_from(
        "<BBBBHHII", b, 6 + 16 * index)
    payload = b[doff:doff + size]
    if pngcodec.is_png(payload):
        img = pngcodec.decode_png(payload)
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[2] == 1:
            img = np.dstack([img[..., 0]] * 3)
        if img.shape[2] == 2:
            g = img[..., 0]
            img = np.dstack([g, g, g, img[..., 1]])
        if img.shape[2] == 3:
            img = np.dstack([img,
                             np.full(img.shape[:2], 255, np.uint8)])
        return img
    return _decode_dib(payload)


def encode_ico(images, fmt: str = "png") -> bytes:
    """List of HxWx{3,4} uint8 images → spec-valid multi-entry ICO.
    ``fmt="png"`` writes PNG entries (modern favicons); ``fmt="bmp"``
    writes 32-bpp DIB entries with doubled-height headers and an
    all-opaque AND mask."""
    from . import pngcodec

    if not images:
        raise ValueError("no images")
    payloads = []
    metas = []
    for img in images:
        if img.ndim == 2:
            img = np.dstack([img] * 3)
        h, w = img.shape[:2]
        if w > 256 or h > 256:
            raise ValueError("ICO entries are at most 256x256")
        if fmt == "png":
            payloads.append(pngcodec.encode_png(img))
        elif fmt == "bmp":
            if img.shape[2] == 3:
                img = np.dstack([img, np.full((h, w), 255, np.uint8)])
            bgra = np.ascontiguousarray(img[::-1][..., [2, 1, 0, 3]])
            and_stride = ((w + 31) // 32) * 4
            info = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0,
                               w * h * 4 + and_stride * h, 0, 0, 0, 0)
            payloads.append(info + bgra.tobytes()
                            + b"\x00" * (and_stride * h))
        else:
            raise ValueError(f"unknown ICO entry format {fmt!r}")
        metas.append((w, h, img.shape[2] * 8 if fmt == "bmp" else 32))
    parts = [struct.pack("<HHH", 0, 1, len(images))]
    doff = 6 + 16 * len(images)
    for (w, h, bpp), payload in zip(metas, payloads):
        parts.append(struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0,
                                 1, bpp, len(payload), doff))
        doff += len(payload)
    parts.extend(payloads)
    return b"".join(parts)
