"""Baseline TIFF codec (TIFF 6.0, Adobe 1992 public spec): real decode of
the dominant crawl-TIFF profile — 8-bit grayscale / RGB / palette, strip
layout, Compression 1 (none) / 5 (LZW, incl. the early-change convention
and Predictor 2 horizontal differencing) / 32773 (PackBits), MinIsWhite
inversion, both byte orders — plus a spec-valid fixture encoder for the
same profile.

Round-4 extensions: §15 tile layout, 16-bit samples (decode downscales
>>8), PlanarConfiguration 2, and Compression 7 (new-style JPEG — full or
TIFF-EP-abbreviated streams with the JPEGTables tag, decoded through the
engine's own JPEG codec). Out of scope (declared, not silently wrong):
CCITT G3/G4 fax and old-style JPEG (6) — these raise
NotImplementedError naming the feature.

Reference parity note: the reference engine (git-prov) delegates all
media handling to external libraries; this module exists for the
multimodal curation stages (SURVEY.md §2 extension surface), not for
reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

# IFD tag ids (TIFF 6.0 §8)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_COLORMAP = 320
_T_PREDICTOR = 317

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}


def is_tiff(b: bytes) -> bool:
    return b[:4] in (b"II*\x00", b"MM\x00*")


def _read_ifd(b: bytes, endian: str) -> dict[int, list[int]]:
    (off,) = struct.unpack_from(endian + "I", b, 4)
    (n,) = struct.unpack_from(endian + "H", b, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        pos = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(endian + "HHI", b, pos)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            data_off = pos + 8
        else:
            (data_off,) = struct.unpack_from(endian + "I", b, pos + 8)
        if typ == 3:
            vals = list(struct.unpack_from(endian + f"{cnt}H", b, data_off))
        elif typ == 4:
            vals = list(struct.unpack_from(endian + f"{cnt}I", b, data_off))
        elif typ in (1, 7):                  # BYTE / UNDEFINED
            vals = list(b[data_off:data_off + cnt])
        else:  # rationals etc. — unused by this profile
            vals = []
        tags[tag] = vals
    return tags


def probe_tiff(b: bytes) -> dict:
    """Header-only metadata: dims, compression, photometric, samples."""
    if not is_tiff(b):
        raise ValueError("not a TIFF")
    endian = "<" if b[:2] == b"II" else ">"
    t = _read_ifd(b, endian)
    comp = t.get(_T_COMPRESSION, [1])[0]
    comp_name = {1: "none", 5: "lzw", 32773: "packbits", 2: "ccitt-rle",
                 3: "ccitt-g3", 4: "ccitt-g4", 6: "jpeg-old",
                 7: "jpeg"}.get(comp, f"comp{comp}")
    return {"width": t.get(_T_WIDTH, [-1])[0],
            "height": t.get(_T_HEIGHT, [-1])[0],
            "bits": t.get(_T_BITS, [8])[0],
            "samples": t.get(_T_SAMPLES, [1])[0],
            "compression": comp_name,
            "photometric": t.get(_T_PHOTOMETRIC, [1])[0],
            "byte_order": "little" if endian == "<" else "big",
            "tiled": _T_TILE_OFFSETS in t,
            "planar": t.get(_T_PLANAR, [1])[0]}


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)
# ---------------------------------------------------------------------------

def packbits_decode(src: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expected:
        n = src[i]
        i += 1
        if n < 128:                       # literal run of n+1
            out += src[i:i + n + 1]
            i += n + 1
        elif n > 128:                     # repeat next byte 257-n times
            out += src[i:i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def packbits_encode(src: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        # find a repeat run of >= 3
        j = i
        while j + 1 < n and src[j] == src[j + 1] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(src[i])
            i = j + 1
            continue
        # literal run until next >=3 repeat (max 128)
        j = i
        while j < n and j - i < 128:
            if (j + 2 < n and src[j] == src[j + 1] == src[j + 2]):
                break
            j += 1
        out.append(j - i - 1)
        out += src[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF LZW (TIFF 6.0 §13): 9->12-bit variable codes, MSB-first packing,
# Clear=256, EOI=257, EARLY-CHANGE width bump (one code before the table
# actually fills — the TIFF quirk vs. GIF LZW).
# ---------------------------------------------------------------------------

_CLEAR = 256
_EOI = 257


def lzw_decode(src: bytes, expected: int) -> bytes:
    out = bytearray()
    data = int.from_bytes(src, "big")
    total_bits = 8 * len(src)
    pos = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal pos
        if pos + width > total_bits:
            return _EOI
        shift = total_bits - pos - width
        code = (data >> shift) & ((1 << width) - 1)
        pos += width
        return code

    while True:
        code = read_code()
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):          # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        # early change: bump width when the NEXT add would hit the limit
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            break
    return bytes(out[:expected])


def lzw_encode(src: bytes) -> bytes:
    out_bits: list[tuple[int, int]] = []   # (code, width)
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    out_bits.append((_CLEAR, width))
    w = b""
    for byte in src:
        c = bytes([byte])
        if w + c in table:
            w = w + c
            continue
        out_bits.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        # early change: the ENCODER bumps when next_code+1 would overflow
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:              # reset before the table is full
            out_bits.append((_CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        out_bits.append((table[w], width))
    out_bits.append((_EOI, width))
    acc = 0
    nbits = 0
    out = bytearray()
    for code, wd in out_bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode / encode
# ---------------------------------------------------------------------------

_T_TILE_W, _T_TILE_H = 322, 323
_T_TILE_OFFSETS, _T_TILE_COUNTS = 324, 325
_T_JPEG_TABLES = 347


def _jpeg_chunk_decode(chunk: bytes, tables: bytes | None) -> np.ndarray:
    """One new-style-JPEG (compression 7) strip/tile → pixels via the
    engine's own JPEG codec. An abbreviated stream (TIFF-EP JPEGTables
    tag) merges as SOI + tables-body + chunk-body — DQT/DHT before the
    frame header is legal table-misc placement (ITU T.81 §B.2.4)."""
    from . import jpegcodec

    if tables is not None and len(tables) >= 4:
        chunk = b"\xff\xd8" + tables[2:-2] + chunk[2:]
    arr = jpegcodec.decode_jpeg(chunk)
    return arr[:, :, None] if arr.ndim == 2 else arr


def decode_tiff(b: bytes) -> np.ndarray:
    """payload -> HxW (gray) or HxWx3 (RGB) uint8 array.

    Profile: 8- and 16-bit samples (16-bit downscales to 8 via >>8 —
    the engine's image lane is uint8), strip AND tile layouts (TIFF 6.0
    §15), chunky and planar (PlanarConfiguration 2, plane-major chunk
    order) storage, Compression none/LZW(+Predictor 2)/PackBits, both
    byte orders, palette/MinIsWhite. CCITT/JPEG-in-TIFF stay declared
    stubs (external codec data)."""
    if not is_tiff(b):
        raise ValueError("not a TIFF")
    endian = "<" if b[:2] == b"II" else ">"
    t = _read_ifd(b, endian)
    w = t[_T_WIDTH][0]
    h = t[_T_HEIGHT][0]
    samples = t.get(_T_SAMPLES, [1])[0]
    bits = t.get(_T_BITS, [8])
    comp = t.get(_T_COMPRESSION, [1])[0]
    photo = t.get(_T_PHOTOMETRIC, [1])[0]
    planar = t.get(_T_PLANAR, [1])[0]
    pred = t.get(_T_PREDICTOR, [1])[0]
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} "
                                  "(8- and 16-bit supported)")
    bps = bits[0]
    itemsize = bps // 8
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF planar configuration {planar}")
    if comp not in (1, 5, 7, 32773):
        raise NotImplementedError(
            f"TIFF compression {probe_tiff(b)['compression']}")
    jpeg_tables = None
    if comp == 7:
        jt = t.get(_T_JPEG_TABLES)
        if jt:
            jpeg_tables = bytes(jt)

    def decompress(chunk: bytes, expected: int) -> bytes:
        if comp == 1:
            return chunk[:expected]
        if comp == 5:
            return lzw_decode(chunk, expected)
        return packbits_decode(chunk, expected)

    def as_pixels(raw: bytes, rows: int, cols: int, spp: int):
        if bps == 8:
            a = np.frombuffer(raw, dtype=np.uint8)
        else:
            a = np.frombuffer(raw, dtype=endian + "u2").astype(np.uint16)
        a = a[:rows * cols * spp].reshape(rows, cols, spp)
        if pred == 2:   # horizontal differencing restarts per chunk row
            acc = np.cumsum(a.astype(np.uint32), axis=1)
            a = acc.astype(np.uint8 if bps == 8 else np.uint16)
        return a

    spp_chunk = 1 if planar == 2 else samples
    dtype = np.uint8 if bps == 8 else np.uint16
    full = np.zeros((h, w, samples), dtype=dtype)
    if _T_TILE_OFFSETS in t:               # tile layout (§15)
        tw = t[_T_TILE_W][0]
        th = t[_T_TILE_H][0]
        offsets = t[_T_TILE_OFFSETS]
        counts = t.get(_T_TILE_COUNTS,
                       [len(b) - offsets[0]] if len(offsets) == 1 else None)
        if counts is None:
            raise ValueError("multi-tile TIFF without TileByteCounts")
        across = -(-w // tw)
        down = -(-h // th)
        per_plane = across * down
        for idx, (off, cnt) in enumerate(zip(offsets, counts)):
            plane, ti = divmod(idx, per_plane) if planar == 2 else (0, idx)
            ty, tx = divmod(ti, across)
            if comp == 7:
                tile = _jpeg_chunk_decode(b[off:off + cnt], jpeg_tables)
            else:
                raw = decompress(b[off:off + cnt], th * tw * spp_chunk
                                 * itemsize)
                tile = as_pixels(raw, th, tw, spp_chunk)
            y0, x0 = ty * th, tx * tw
            ys, xs = min(th, h - y0), min(tw, w - x0)
            if planar == 2:
                full[y0:y0 + ys, x0:x0 + xs, plane] = tile[:ys, :xs, 0]
            else:
                full[y0:y0 + ys, x0:x0 + xs, :] = tile[:ys, :xs, :]
    else:                                  # strip layout
        offsets = t.get(_T_STRIP_OFFSETS)
        if not offsets:
            raise ValueError("TIFF without strip offsets")
        counts = t.get(_T_STRIP_COUNTS)
        if not counts:
            if len(offsets) != 1:
                raise ValueError("multi-strip TIFF without StripByteCounts")
            counts = [len(b) - offsets[0]]
        rows_per = t.get(_T_ROWS_PER_STRIP, [h])[0]
        per_plane = -(-h // rows_per)
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            plane, pi = divmod(si, per_plane) if planar == 2 else (0, si)
            row0 = pi * rows_per
            nrows = min(rows_per, h - row0)
            if comp == 7:
                strip = _jpeg_chunk_decode(b[off:off + cnt],
                                           jpeg_tables)[:nrows]
            else:
                raw = decompress(b[off:off + cnt],
                                 nrows * w * spp_chunk * itemsize)
                strip = as_pixels(raw, nrows, w, spp_chunk)
            if planar == 2:
                full[row0:row0 + nrows, :, plane] = strip[:, :, 0]
            else:
                full[row0:row0 + nrows, :, :] = strip
    if photo == 0:                         # MinIsWhite (at native depth)
        full = ((1 << bps) - 1) - full
    if bps == 16:                          # engine image lane is uint8
        full = (full >> 8).astype(np.uint8)
    arr = full if samples > 1 else full[:, :, 0]
    if photo == 3:                         # palette -> RGB
        cmap = t.get(_T_COLORMAP)
        if not cmap:
            raise ValueError("palette TIFF without ColorMap")
        n = len(cmap) // 3
        lut = (np.array(cmap, dtype=np.uint32).reshape(3, n).T >> 8) \
            .astype(np.uint8)
        arr = lut[arr.reshape(h, w)]
    return arr


def encode_tiff(arr: np.ndarray, compression: str = "lzw",
                rows_per_strip: int = 32, byte_order: str = "little",
                predictor: bool = False,
                min_is_white: bool = False,
                tile: tuple[int, int] | None = None,
                planar: int = 1) -> bytes:
    """HxW / HxWx1 (gray) or HxWx3 (RGB) -> spec-valid TIFF.

    uint8 input writes 8-bit samples; uint16 input writes 16-bit
    samples in ``byte_order``. ``tile=(tw, th)`` switches to the §15
    tile layout (tile dims must be multiples of 16 per spec);
    ``planar=2`` stores separate planes (plane-major chunk order)."""
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    samples = 1 if gray else 3
    bps = 16 if arr.dtype == np.uint16 else 8
    endian = "<" if byte_order == "little" else ">"
    item_dt = np.uint8 if bps == 8 else np.dtype(endian + "u2")
    data = arr.astype(np.uint16 if bps == 16 else np.uint8)
    photo = 1 if gray else 2
    if min_is_white and gray:
        data = ((1 << bps) - 1) - data
        photo = 0
    if gray:
        data = data[:, :, None]
    if planar == 2:
        chunks_src = [data[:, :, p:p + 1] for p in range(samples)]
    else:
        chunks_src = [data]

    def chunk_bytes(block) -> bytes:
        if predictor:
            d = block.astype(np.int32)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            block = (d % (1 << bps)).astype(data.dtype)
        return np.ascontiguousarray(block).astype(item_dt).tobytes()

    comp_id = {"none": 1, "lzw": 5, "packbits": 32773}[compression]

    def compress(raw: bytes) -> bytes:
        if compression == "lzw":
            return lzw_encode(raw)
        if compression == "packbits":
            return packbits_encode(raw)
        return raw

    strips = []
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16:
            raise ValueError("TIFF tile dims must be multiples of 16")
        across, down = -(-w // tw), -(-h // th)
        for src_plane in chunks_src:
            padded = np.zeros((down * th, across * tw,
                               src_plane.shape[2]), dtype=data.dtype)
            padded[:h, :w, :] = src_plane
            for ty in range(down):
                for tx in range(across):
                    blk = padded[ty * th:(ty + 1) * th,
                                 tx * tw:(tx + 1) * tw, :]
                    strips.append(compress(chunk_bytes(blk)))
    else:
        for src_plane in chunks_src:
            for r0 in range(0, h, rows_per_strip):
                blk = src_plane[r0:r0 + min(rows_per_strip, h - r0), :, :]
                strips.append(compress(chunk_bytes(blk)))

    off_tag = _T_TILE_OFFSETS if tile is not None else _T_STRIP_OFFSETS
    cnt_tag = _T_TILE_COUNTS if tile is not None else _T_STRIP_COUNTS
    tags: list[tuple[int, int, int, list[int]]] = [
        (_T_WIDTH, 3, 1, [w]), (_T_HEIGHT, 3, 1, [h]),
        (_T_BITS, 3, samples, [bps] * samples),
        (_T_COMPRESSION, 3, 1, [comp_id]),
        (_T_PHOTOMETRIC, 3, 1, [photo]),
        (off_tag, 4, len(strips), [0] * len(strips)),  # patched below
        (_T_SAMPLES, 3, 1, [samples]),
        (cnt_tag, 4, len(strips), [len(s) for s in strips]),
    ]
    if tile is not None:
        tags.append((_T_TILE_W, 3, 1, [tile[0]]))
        tags.append((_T_TILE_H, 3, 1, [tile[1]]))
    else:
        tags.append((_T_ROWS_PER_STRIP, 3, 1, [rows_per_strip]))
    if planar == 2:
        tags.append((_T_PLANAR, 3, 1, [2]))
    if predictor:
        tags.append((_T_PREDICTOR, 3, 1, [2]))
    tags.sort()


    # layout: header(8) | IFD | overflow values | strip data
    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def value_bytes(typ: int, vals: list[int]) -> bytes:
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack(endian + fmt * len(vals), *vals)

    # first pass: compute overflow sizes to find strip data start
    entries = []
    for tag, typ, cnt, vals in tags:
        vb = value_bytes(typ, vals)
        entries.append((tag, typ, cnt, vals, len(vb) > 4))
        if len(vb) > 4:
            overflow += vb if len(vb) % 2 == 0 else vb + b"\x00"
    data_off = overflow_off + len(overflow)
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s) + (len(s) % 2)

    # second pass: emit with patched strip offsets
    out = bytearray()
    out += (b"II*\x00" if endian == "<" else b"MM\x00*")
    out += struct.pack(endian + "I", ifd_off)
    out += struct.pack(endian + "H", len(tags))
    overflow = bytearray()
    ov_pos = overflow_off
    for tag, typ, cnt, vals, big in entries:
        if tag in (_T_STRIP_OFFSETS, _T_TILE_OFFSETS):
            vals = strip_offsets
        vb = value_bytes(typ, vals)
        out += struct.pack(endian + "HHI", tag, typ, cnt)
        if len(vb) <= 4:
            out += vb + b"\x00" * (4 - len(vb))
        else:
            out += struct.pack(endian + "I", ov_pos)
            pad = vb if len(vb) % 2 == 0 else vb + b"\x00"
            overflow += pad
            ov_pos += len(pad)
    out += struct.pack(endian + "I", 0)    # next IFD = none
    out += overflow
    for s in strips:
        out += s + (b"\x00" * (len(s) % 2))
    return bytes(out)


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Full interchange JPEG → (JPEGTables blob, abbreviated stream):
    DQT/DHT segments move into a SOI+tables+EOI blob (the TIFF-EP
    JPEGTables payload); everything else stays, giving an abbreviated
    per-strip stream (ITU T.81 §B.2.4 table-misc segments are position-
    independent before first use)."""
    assert stream[:2] == b"\xff\xd8"
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    i = 2
    while i < len(stream):
        if stream[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = stream[i + 1]
        if marker == 0xD9:                      # EOI
            rest += stream[i:i + 2]
            break
        if marker == 0xDA:                      # SOS: rest is entropy
            rest += stream[i:]
            break
        seglen = int.from_bytes(stream[i + 2:i + 4], "big")
        seg = stream[i:i + 2 + seglen]
        if marker in (0xDB, 0xC4):              # DQT / DHT
            tables += seg
        else:
            rest += seg
        i += 2 + seglen
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def encode_tiff_jpeg(arr: np.ndarray, rows_per_strip: int = 32,
                     quality: int = 90,
                     shared_tables: bool = False) -> bytes:
    """HxWx3 uint8 → Compression-7 (new-style JPEG) TIFF: one baseline
    JPEG per strip through the engine's own encoder; with
    ``shared_tables`` the DQT/DHT segments factor into ONE JPEGTables
    tag and the strips become abbreviated streams (TIFF-EP)."""
    from . import jpegcodec

    h, w = arr.shape[:2]
    rows_per_strip = min(rows_per_strip, h)
    strips, tables_blob = [], None
    for r0 in range(0, h, rows_per_strip):
        stream = jpegcodec.encode_jpeg_baseline(
            arr[r0:r0 + rows_per_strip], quality=quality)
        if shared_tables:
            tb, stream = _split_jpeg_tables(stream)
            if tables_blob is None:
                tables_blob = tb       # same quality → same tables
        strips.append(stream)

    endian = "<"
    tags: list[tuple[int, int, int, list[int]]] = [
        (_T_WIDTH, 3, 1, [w]), (_T_HEIGHT, 3, 1, [h]),
        (_T_BITS, 3, 3, [8, 8, 8]),
        (_T_COMPRESSION, 3, 1, [7]),
        (_T_PHOTOMETRIC, 3, 1, [6]),           # YCbCr (JPEG-coded)
        (_T_STRIP_OFFSETS, 4, len(strips), [0] * len(strips)),
        (_T_SAMPLES, 3, 1, [3]),
        (_T_ROWS_PER_STRIP, 3, 1, [rows_per_strip]),
        (_T_STRIP_COUNTS, 4, len(strips), [len(s) for s in strips]),
    ]
    if tables_blob is not None:
        tags.append((_T_JPEG_TABLES, 7, len(tables_blob),
                     list(tables_blob)))
    tags.sort()

    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    overflow_off = ifd_off + ifd_size

    def value_bytes(typ: int, vals: list[int]) -> bytes:
        if typ in (1, 7):
            return bytes(vals)
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack(endian + fmt * len(vals), *vals)

    overflow = bytearray()
    entries = []
    for tag, typ, cnt, vals in tags:
        vb = value_bytes(typ, vals)
        entries.append((tag, typ, cnt, vals, len(vb) > 4))
        if len(vb) > 4:
            overflow += vb if len(vb) % 2 == 0 else vb + b"\x00"
    data_off = overflow_off + len(overflow)
    strip_offsets = []
    pos = data_off
    for st in strips:
        strip_offsets.append(pos)
        pos += len(st) + (len(st) % 2)

    out = bytearray(b"II*\x00")
    out += struct.pack(endian + "I", ifd_off)
    out += struct.pack(endian + "H", len(tags))
    overflow = bytearray()
    ov_pos = overflow_off
    for tag, typ, cnt, vals, big in entries:
        if tag == _T_STRIP_OFFSETS:
            vals = strip_offsets
        vb = value_bytes(typ, vals)
        out += struct.pack(endian + "HHI", tag, typ, cnt)
        if len(vb) <= 4:
            out += vb + b"\x00" * (4 - len(vb))
        else:
            out += struct.pack(endian + "I", ov_pos)
            pad = vb if len(vb) % 2 == 0 else vb + b"\x00"
            overflow += pad
            ov_pos += len(pad)
    out += struct.pack(endian + "I", 0)
    out += overflow
    for st in strips:
        out += st + (b"\x00" * (len(st) % 2))
    return bytes(out)
