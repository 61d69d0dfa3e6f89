"""Pure-Python/numpy GIF codec (no external codec dependency).

Implements the GIF87a/89a subset that matters for frame extraction from
real files: global + local color tables, variable-width LZW decode,
interlaced images, graphic-control transparency, and frame composition
with all four disposal methods — 0/1 (leave), 2 (restore to
background) and 3 (restore previous). Like ``jpegcodec``/``pngcodec``
this is the path that turns the multimodal video stub into a real
compressed-format decode, not a general imaging library.

The encoder writes GIF89a with one global color table (≤256 unique
colors across frames required) so tests can round-trip real multi-frame
bitstreams losslessly without vendored binary assets.

Performance note: LZW entropy decode is bit-serial by nature (the code
width changes as the dictionary grows); everything after it (palette
lookup, deinterlace, composition) is vectorized numpy. Decoding runs
inside the multimodal actor-pool stages, so throughput scales with the
pool, not single-image speed.
"""

from __future__ import annotations

import struct

import numpy as np


def is_gif(b: bytes) -> bool:
    return b[:6] in (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF variable-width LZW → list of palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return list(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:                       # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return list(out)


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for idx in indices:
        wk = w + bytes([idx])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code <= 0xFFF:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:                           # table full → clear and restart
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([idx])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _DEINTERLACE_PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def probe_gif(b: bytes) -> dict:
    """Header-only probe (block walk, no LZW decode): logical-screen
    width / height, frame count, summed GCE delay (ms) and animated."""
    if not is_gif(b):
        raise ValueError("not a GIF payload")
    w, h, flags, _, _ = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 7))
    frames = 0
    delay_ms = 0

    def skip_subblocks(p: int) -> int:
        while True:
            size = b[p]
            p += 1
            if size == 0:
                return p
            p += size

    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:               # extension
            label = b[pos]
            pos += 1
            if label == 0xF9:
                (_delay,) = struct.unpack("<H", b[pos + 2:pos + 4])
                delay_ms += _delay * 10
            pos = skip_subblocks(pos)
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        _, _, _, _, iflags = struct.unpack("<HHHHB", b[pos:pos + 9])
        pos += 9
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 7))
        pos += 1                        # LZW min code size
        pos = skip_subblocks(pos)
        frames += 1
    return {"width": w, "height": h, "frames": frames,
            "duration_ms": delay_ms, "animated": frames > 1}


def decode_gif(b: bytes) -> list[np.ndarray]:
    """GIF bytes → list of composited HxWx3 uint8 frames (full logical
    screen per frame)."""
    if not is_gif(b):
        raise ValueError("not a GIF payload")
    w, h, flags, bg_idx, _ = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(b[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    # A graphic-control extension applies to the SINGLE following image
    # block (spec §23): `pending_*` hold that one-shot state, while
    # `prev_disposal`/`prev_rect` remember how the frame ALREADY drawn
    # asked to be disposed before the next one renders.
    pending_transparent = None
    pending_disposal = 0
    prev_disposal = 0
    prev_rect = None
    prev_saved = None                   # canvas snapshot for disposal 3
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:               # trailer
            break
        if block == 0x21:               # extension
            label = b[pos]
            pos += 1
            if label == 0xF9:           # graphic control
                size = b[pos]
                gflags, _delay, tidx = struct.unpack(
                    "<BHB", b[pos + 1:pos + 5])
                pos += size + 1
                pending_transparent = tidx if (gflags & 1) else None
                pending_disposal = (gflags >> 2) & 7
            while True:                 # skip (remaining) sub-blocks
                size = b[pos]
                pos += 1
                if size == 0:
                    break
                pos += size
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB", b[pos:pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:               # local color table
            n = 2 << (iflags & 7)
            table = np.frombuffer(b[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image with no color table")
        min_code = b[pos]
        pos += 1
        data = bytearray()
        while True:
            size = b[pos]
            pos += 1
            if size == 0:
                break
            data += b[pos:pos + size]
            pos += size
        idx = np.array(_lzw_decode(bytes(data), min_code),
                       np.uint8)[: fw * fh].reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        # dispose of the PREVIOUS frame per ITS OWN disposal method
        if prev_rect is not None and prev_disposal == 2:
            (pl, pt, pw, ph) = prev_rect
            canvas[pt:pt + ph, pl:pl + pw] = (
                gct[bg_idx] if gct is not None and bg_idx < len(gct) else 0)
        elif prev_disposal == 3 and prev_saved is not None:
            canvas = prev_saved         # restore-previous (spec §23)
        # disposal 3 restores to the canvas as it was BEFORE this frame
        prev_saved = canvas.copy() if pending_disposal == 3 else None
        rgb = table[np.minimum(idx, len(table) - 1)]
        region = canvas[top:top + fh, left:left + fw]
        if pending_transparent is not None:
            mask = (idx != pending_transparent)[..., None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        prev_rect = (left, top, fw, fh)
        prev_disposal = pending_disposal
        pending_transparent = None      # a GCE governs only one image
        pending_disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


# ---------------------------------------------------------------------------
# encode (tests only: one global palette, full frames, no transparency)
# ---------------------------------------------------------------------------

def encode_gif(frames: list[np.ndarray]) -> bytes:
    """HxWx3 uint8 frames (≤256 unique colors total) → animated GIF89a.
    Lossless: decode_gif(encode_gif(f)) == f."""
    h, w, _ = frames[0].shape
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <=256 unique colors")
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n = 1 << bits
    pal = np.zeros((n, 3), np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    min_code = max(2, bits)
    per_frame = w * h
    for fi in range(len(frames)):
        idx = inverse[fi * per_frame:(fi + 1) * per_frame]
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        payload = _lzw_encode([int(i) for i in idx], min_code)
        for i in range(0, len(payload), 255):
            chunk = payload[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
