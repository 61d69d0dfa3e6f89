"""Pure-stdlib/numpy PNG codec (no external codec dependency).

Implements the static-image subset of the public PNG spec (RFC 2083 /
ISO 15948): every legal bit depth (1/2/4/8/16), color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha) and 6 (RGBA), all five scanline
filters (None/Sub/Up/Average/Paeth), Adam7 interlace, zlib-compressed
IDAT via the stdlib. Output is always 8-bit (16-bit samples take their
high byte, sub-8-bit gray rescales to full range) — like ``jpegcodec``,
this is the decode path that feeds the multimodal stages, not a general
imaging library. APNG animation (the public acTL/fcTL/fdAT extension)
decodes fully: per-frame regions with dispose none/background/previous
and blend source/over compose onto an RGBA canvas
(``decode_apng_frames``), and ``encode_apng`` writes spec-valid
animations for fixtures.

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
    """Header-only probe (IHDR + APNG acTL/fcTL walk): width / height /
    bit depth / color type / interlaced / animated / frames /
    duration_ms (fcTL delay_den==0 means 1/100 s per the APNG spec)."""
    if not is_png(b):
        raise ValueError("not a PNG")
    out = None
    animated = False
    frames = 1
    duration = 0.0
    for ctype, data in _chunks(b):
        if ctype == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            out = {"width": w, "height": h, "bit_depth": data[8],
                   "color_type": data[9], "interlaced": data[12] == 1}
        elif ctype == b"acTL":
            animated = True
            frames = struct.unpack(">I", data[:4])[0]
        elif ctype == b"fcTL":
            num, den = struct.unpack(">HH", data[20:24])
            duration += num * 1000.0 / (den or 100)
    if out is None:
        raise ValueError("PNG missing IHDR")
    out.update(animated=animated, frames=frames if animated else 1,
               duration_ms=int(duration) if animated else -1)
    return out


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
    raw = zlib.decompress(b"".join(idat))
    img = _decode_image(raw, w, h, depth, ctype_, interlace)
    return _finish_image(img, ctype_, depth, plte, trns)


def _decode_image(raw: bytes, w: int, h: int, depth: int, ctype_: int,
                  interlace: int) -> np.ndarray:
    """Decompressed filter stream → (h, w, ch) raw samples (palette
    indices / unscaled gray left as-is). Shared by the static IDAT image
    and each APNG frame region (frames inherit IHDR depth/color/
    interlace per the APNG spec)."""
    ch = _CHANNELS[ctype_]
    if interlace == 0:
        img, _ = _decode_pass(raw, 0, w, h, depth, ch)
        return img
    img = np.zeros((h, w, ch), np.uint8)    # Adam7: 7 sequential passes
    pos = 0
    for xs, ys, xstep, ystep in _ADAM7:
        pw = (w - xs + xstep - 1) // xstep
        ph = (h - ys + ystep - 1) // ystep
        if pw <= 0 or ph <= 0:
            continue
        sub, pos = _decode_pass(raw, pos, pw, ph, depth, ch)
        img[ys::ystep, xs::xstep] = sub
    return img


def _finish_image(img: np.ndarray, ctype_: int, depth: int, plte, trns):
    """Palette expansion + sub-8-bit gray rescale (the tail of
    decode_png, shared with APNG frame decode)."""
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

# ---------------------------------------------------------------------------
# APNG (animated PNG) — public spec: the PNG third-edition acTL/fcTL/fdAT
# extension. Frames inherit IHDR depth/color-type/interlace; each frame's
# fdAT payloads concatenate into an independent zlib stream over the
# frame's (width x height) region with its own per-scanline filtering.
# ---------------------------------------------------------------------------

_DISPOSE_NONE, _DISPOSE_BACKGROUND, _DISPOSE_PREVIOUS = 0, 1, 2
_BLEND_SOURCE, _BLEND_OVER = 0, 1


def _to_rgba(img: np.ndarray) -> np.ndarray:
    """(h, w, {1,2,3,4}) uint8 → (h, w, 4) RGBA."""
    c = img.shape[2]
    if c == 4:
        return img
    if c == 3:
        return np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    if c == 2:                              # gray + alpha
        g = img[..., 0]
        return np.dstack([g, g, g, img[..., 1]])
    g = img[..., 0]
    return np.dstack([g, g, g, np.full(img.shape[:2], 255, np.uint8)])


def _blend_over(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """APNG_BLEND_OP_OVER: standard alpha compositing, exact integer
    arithmetic in uint32 (num <= 255*255*255 — no overflow)."""
    fa = src[..., 3].astype(np.uint32)
    ca = dst[..., 3].astype(np.uint32)
    ca_part = ca * (255 - fa)               # canvas contribution x255
    den = fa * 255 + ca_part
    out = np.empty_like(dst)
    for i in range(3):
        num = (src[..., i].astype(np.uint32) * fa * 255
               + dst[..., i].astype(np.uint32) * ca_part)
        out[..., i] = ((num + den // 2) // np.maximum(den, 1)).astype(np.uint8)
    out[..., 3] = (fa + (ca_part + 127) // 255).astype(np.uint8)
    return out


def decode_apng_frames(b: bytes) -> list:
    """APNG bytes → list of (H, W, 4) uint8 RGBA canvases, one per
    animation frame, fully composed (dispose none/background/previous,
    blend source/over). A static PNG decodes as a single frame. A
    default image (IDAT with no preceding fcTL) is excluded from the
    animation per the spec."""
    if not is_png(b):
        raise ValueError("not a PNG payload")
    ihdr = plte = trns = None
    actl = False
    frames = []                             # [{meta, data: [bytes]}]
    cur = None
    idat_static = []
    for ctype, data in _chunks(b):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif ctype == b"acTL":
            actl = True
        elif ctype == b"fcTL":
            (seq, fw, fh, fx, fy, dnum, dden, dop, bop) = struct.unpack(
                ">IIIIIHHBB", data[:26])
            cur = {"w": fw, "h": fh, "x": fx, "y": fy,
                   "dispose": dop, "blend": bop, "data": []}
            frames.append(cur)
        elif ctype == b"IDAT":
            idat_static.append(data)
            if cur is not None and cur is frames[0] \
                    and not cur.get("fdat"):
                cur["data"].append(data)    # fcTL before IDAT: frame 0
        elif ctype == b"fdAT":
            if cur is None:
                raise ValueError("APNG fdAT without fcTL")
            cur["fdat"] = True
            cur["data"].append(data[4:])    # strip sequence_number
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if not actl or not frames:
        return [_to_rgba(np.atleast_3d(decode_png(b)))]
    w, h, depth, ctype_, _comp, _filt, interlace = ihdr
    canvas = np.zeros((h, w, 4), np.uint8)
    out = []
    for i, fr in enumerate(frames):
        if not fr["data"]:
            raise ValueError("APNG frame missing data")
        fw, fh, fx, fy = fr["w"], fr["h"], fr["x"], fr["y"]
        if fx + fw > w or fy + fh > h:
            raise ValueError("APNG frame region outside canvas")
        raw = zlib.decompress(b"".join(fr["data"]))
        img = _finish_image(_decode_image(raw, fw, fh, depth, ctype_,
                                          interlace),
                            ctype_, depth, plte, trns)
        src = _to_rgba(np.atleast_3d(img))
        region = (slice(fy, fy + fh), slice(fx, fx + fw))
        dispose = fr["dispose"]
        if i == 0 and dispose == _DISPOSE_PREVIOUS:
            dispose = _DISPOSE_BACKGROUND   # spec: first-frame quirk
        saved = canvas[region].copy() if dispose == _DISPOSE_PREVIOUS \
            else None
        if fr["blend"] == _BLEND_OVER:
            canvas[region] = _blend_over(canvas[region], src)
        else:
            canvas[region] = src
        out.append(canvas.copy())
        if dispose == _DISPOSE_BACKGROUND:
            canvas[region] = 0
        elif dispose == _DISPOSE_PREVIOUS:
            canvas[region] = saved
    return out


def encode_apng(frames, delays_ms=None, num_plays: int = 0,
                dispose: int = 0, blend: int = 0, offsets=None) -> bytes:
    """List of (H, W, C) uint8 frames (C ∈ {1,2,3,4}; frame 0 must be
    full-canvas, later frames may be sub-regions placed at ``offsets``)
    → spec-valid APNG (8-bit, filter-0 rows, stdlib zlib). Frame 0 is
    the IDAT image with a preceding fcTL, so it participates in the
    animation; later frames ride fdAT chunks."""
    if not frames:
        raise ValueError("no frames")
    frames = [f[..., None] if f.ndim == 2 else f for f in frames]
    c = frames[0].shape[2]
    if any(f.shape[2] != c for f in frames):
        raise ValueError("mixed channel counts")
    h, w = frames[0].shape[:2]
    delays_ms = delays_ms or [100] * len(frames)
    offsets = offsets or [(0, 0)] * len(frames)
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (struct.pack(">I", len(data)) + body +
                struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    def filt0(arr: np.ndarray) -> bytes:
        fh, fw = arr.shape[:2]
        rows = np.hstack([np.zeros((fh, 1), np.uint8),
                          np.ascontiguousarray(arr).reshape(fh, fw * c)])
        return zlib.compress(rows.tobytes(), 6)

    seq = 0

    def fctl(fr: np.ndarray, delay: int, off) -> bytes:
        nonlocal seq
        data = struct.pack(">IIIIIHHBB", seq, fr.shape[1], fr.shape[0],
                           off[0], off[1], delay, 1000, dispose, blend)
        seq += 1
        return chunk(b"fcTL", data)

    parts = [_SIG,
             chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)),
             chunk(b"acTL", struct.pack(">II", len(frames), num_plays))]
    if frames[0].shape[:2] != (h, w) or offsets[0] != (0, 0):
        raise ValueError("frame 0 must cover the full canvas")
    parts.append(fctl(frames[0], delays_ms[0], (0, 0)))
    parts.append(chunk(b"IDAT", filt0(frames[0])))
    for fr, d, off in zip(frames[1:], delays_ms[1:], offsets[1:]):
        if off[0] + fr.shape[1] > w or off[1] + fr.shape[0] > h:
            raise ValueError("frame region outside canvas")
        parts.append(fctl(fr, d, off))
        parts.append(chunk(b"fdAT", struct.pack(">I", seq) + filt0(fr)))
        seq += 1
    parts.append(chunk(b"IEND", b""))
    return b"".join(parts)
