"""Font file probe: TTF / OTF (sfnt) and WOFF / WOFF2 wrappers.

Header-only metadata from the PUBLIC formats (OpenType spec /
RFC 8081 media types, W3C WOFF 1.0/2.0): the sfnt table directory,
``head`` (unitsPerEm), ``maxp`` (numGlyphs), ``name`` (family /
subfamily from the naming table, platform 3/1 UTF-16-BE preferred,
platform 1/0 Latin-1 fallback), and the WOFF wrapper headers (the
wrapped sfnt flavor + reported table count; WOFF2 table data is
Brotli-compressed, so name extraction stops at the wrapper — the
DECLARED boundary, the probe still types the payload).

Fonts are a real crawl payload class (css url() targets); probe_media
types them like every other opaque binary column. A fixture writer
emits minimal valid sfnt/WOFF bytes so tests carry no vendored fonts.
"""

from __future__ import annotations

import struct

_SFNT_TAGS = (b"\x00\x01\x00\x00", b"OTTO", b"true", b"typ1")


def is_font(b: bytes) -> bool:
    return len(b) >= 12 and (b[:4] in _SFNT_TAGS
                             or b[:4] in (b"wOFF", b"wOF2"))


def _parse_name_table(data: bytes) -> dict:
    """naming table → {name_id: value} for ids 1 (family), 2
    (subfamily), 4 (full name)."""
    if len(data) < 6:
        return {}
    _fmt, count, str_off = struct.unpack(">HHH", data[:6])
    out: dict = {}
    best_score: dict = {}
    for i in range(count):
        rec = data[6 + 12 * i: 6 + 12 * (i + 1)]
        if len(rec) < 12:
            break
        plat, enc, _lang, nid, length, off = struct.unpack(">HHHHHH",
                                                           rec)
        if nid not in (1, 2, 4):
            continue
        raw = data[str_off + off: str_off + off + length]
        if plat == 3 and enc in (1, 10):      # Windows, UTF-16BE
            val, score = raw.decode("utf-16-be", "replace"), 2
        elif plat == 0:                       # Unicode
            val, score = raw.decode("utf-16-be", "replace"), 1
        elif plat == 1 and enc == 0:          # Mac Roman
            val, score = raw.decode("latin-1", "replace"), 0
        else:
            continue
        if score >= best_score.get(nid, -1):
            best_score[nid] = score
            out[nid] = val
    return out


def _probe_sfnt(b: bytes) -> dict:
    num_tables = struct.unpack(">H", b[4:6])[0]
    tables = {}
    for i in range(num_tables):
        rec = b[12 + 16 * i: 12 + 16 * (i + 1)]
        if len(rec) < 16:
            break
        tag, _chk, off, length = struct.unpack(">4sIII", rec)
        tables[tag] = (off, length)
    out = {"flavor": "otf" if b[:4] == b"OTTO" else "ttf",
           "num_tables": num_tables, "units_per_em": -1,
           "num_glyphs": -1, "family": "", "subfamily": ""}
    if b"head" in tables:
        off, _ = tables[b"head"]
        if off + 20 <= len(b):
            out["units_per_em"] = struct.unpack(">H", b[off + 18:
                                                       off + 20])[0]
    if b"maxp" in tables:
        off, _ = tables[b"maxp"]
        if off + 6 <= len(b):
            out["num_glyphs"] = struct.unpack(">H", b[off + 4:
                                                     off + 6])[0]
    if b"name" in tables:
        off, length = tables[b"name"]
        names = _parse_name_table(b[off:off + length])
        out["family"] = names.get(1, "")
        out["subfamily"] = names.get(2, "")
    return out


def probe_font(b: bytes) -> dict:
    """→ {container, flavor, num_tables, units_per_em, num_glyphs,
    family, subfamily}; raises ValueError on non-font bytes."""
    if not is_font(b):
        raise ValueError("not an sfnt/WOFF font")
    if b[:4] == b"wOFF":
        # WOFF 1.0: header + zlib-per-table; rebuild enough to reuse
        # the sfnt walk (tables decompressed lazily, name/head/maxp only)
        import zlib

        flavor, _len, num_tables = struct.unpack(">4sIH", b[4:14])
        out = {"container": "woff", "flavor":
               "otf" if flavor == b"OTTO" else "ttf",
               "num_tables": num_tables, "units_per_em": -1,
               "num_glyphs": -1, "family": "", "subfamily": ""}
        for i in range(num_tables):
            rec = b[44 + 20 * i: 44 + 20 * (i + 1)]
            if len(rec) < 20:
                break
            tag, off, comp_len, orig_len, _chk = struct.unpack(
                ">4sIIII", rec)
            if tag not in (b"head", b"maxp", b"name"):
                continue
            raw = b[off:off + comp_len]
            data = raw if comp_len == orig_len else zlib.decompress(raw)
            if tag == b"head" and len(data) >= 20:
                out["units_per_em"] = struct.unpack(">H",
                                                    data[18:20])[0]
            elif tag == b"maxp" and len(data) >= 6:
                out["num_glyphs"] = struct.unpack(">H", data[4:6])[0]
            elif tag == b"name":
                names = _parse_name_table(data)
                out["family"] = names.get(1, "")
                out["subfamily"] = names.get(2, "")
        return out
    if b[:4] == b"wOF2":
        flavor, _len, num_tables = struct.unpack(">4sIH", b[4:14])
        return {"container": "woff2",
                "flavor": "otf" if flavor == b"OTTO" else "ttf",
                "num_tables": num_tables, "units_per_em": -1,
                "num_glyphs": -1, "family": "", "subfamily": ""}
    out = _probe_sfnt(b)
    out["container"] = "sfnt"
    return out


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------

def _name_table(family: str, subfamily: str) -> bytes:
    strings = []
    recs = []
    off = 0
    for nid, val in ((1, family), (2, subfamily)):
        enc = val.encode("utf-16-be")
        recs.append(struct.pack(">HHHHHH", 3, 1, 0x409, nid,
                                len(enc), off))
        strings.append(enc)
        off += len(enc)
    header = struct.pack(">HHH", 0, len(recs), 6 + 12 * len(recs))
    return header + b"".join(recs) + b"".join(strings)


def write_font_fixture(family: str = "Graft Sans",
                       subfamily: str = "Regular",
                       num_glyphs: int = 42,
                       units_per_em: int = 1000,
                       woff: bool = False) -> bytes:
    """Minimal valid sfnt (head/maxp/name tables) or its WOFF 1.0
    wrapping — enough structure for any table-directory walker."""
    head = (b"\x00\x01\x00\x00" + struct.pack(">I", 0x5F0F3CF5 & 0)
            + b"\x00" * 10 + struct.pack(">H", units_per_em)
            + b"\x00" * 34)
    maxp = b"\x00\x01\x00\x00" + struct.pack(">H", num_glyphs) \
        + b"\x00" * 26
    name = _name_table(family, subfamily)
    tables = [(b"head", head), (b"maxp", maxp), (b"name", name)]
    n = len(tables)
    sfnt = bytearray(struct.pack(">4sHHHH", b"\x00\x01\x00\x00", n,
                                 16, 2, n * 16 - 16))
    off = 12 + 16 * n
    body = bytearray()
    for tag, data in tables:
        sfnt += struct.pack(">4sIII", tag, 0, off, len(data))
        body += data + b"\x00" * ((4 - len(data) % 4) % 4)
        off += len(data) + (4 - len(data) % 4) % 4
    sfnt += body
    if not woff:
        return bytes(sfnt)
    import zlib

    woff_tables = []
    data_off = 44 + 20 * n
    dirs = bytearray()
    payload = bytearray()
    off = data_off
    for tag, data in tables:
        comp = zlib.compress(data)
        if len(comp) >= len(data):
            comp = data
        dirs += struct.pack(">4sIIII", tag, off, len(comp), len(data),
                            0)
        payload += comp + b"\x00" * ((4 - len(comp) % 4) % 4)
        off += len(comp) + (4 - len(comp) % 4) % 4
        woff_tables.append(tag)
    total = data_off + len(payload)
    header = struct.pack(">4s4sIHHIHHIIIII", b"wOFF",
                         b"\x00\x01\x00\x00", total, n, 0, len(sfnt),
                         1, 0, 0, 0, 0, 0, 0)
    return bytes(header + dirs + payload)
