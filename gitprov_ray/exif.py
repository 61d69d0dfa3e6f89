"""EXIF metadata for JPEG payloads (Exif 2.3 / TIFF 6.0 IFD structure):
parse, build and strip the APP1 segment — the metadata-extraction and
PII-scrub (GPS removal) stages of an image curation pipeline.

The APP1 payload is ``Exif\\0\\0`` + a self-contained TIFF byte area:
IFD0 carries camera fields and pointers to the Exif sub-IFD (tag 0x8769)
and GPS IFD (tag 0x8825); offsets are relative to the TIFF base. The
reader handles both byte orders and value types BYTE/ASCII/SHORT/LONG/
RATIONAL; the writer emits little-endian with a deterministic layout
(fixtures are byte-stable).

Reference semantics: reference repo exposes no EXIF support — this is
part of the engine's multimodal surface beyond the reference
(SURVEY.md §2.11 extension row).
"""

from __future__ import annotations

import struct

# IFD0 / Exif / GPS tag ids (Exif 2.3 §4.6)
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_EXPOSURE = 0x829A
TAG_FNUMBER = 0x829D
TAG_ISO = 0x8827
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _pack_values(typ: int, vals) -> bytes:
    if typ == 2:                       # ASCII, NUL-terminated
        return vals.encode("ascii") + b"\x00"
    if typ == 1:
        return bytes(vals)
    if typ == 3:
        return struct.pack(f"<{len(vals)}H", *vals)
    if typ == 4:
        return struct.pack(f"<{len(vals)}I", *vals)
    if typ == 5:                       # rationals: (num, den) pairs
        out = b""
        for num, den in vals:
            out += struct.pack("<II", num, den)
        return out
    raise ValueError(f"type {typ}")


def _count_of(typ: int, vals) -> int:
    if typ == 2:
        return len(vals) + 1
    return len(vals)


def _build_ifd(entries, base_off: int):
    """entries = [(tag, type, values)] → (ifd_bytes, data_bytes); the
    IFD sits at base_off, its overflow data area right after it."""
    entries = sorted(entries, key=lambda e: e[0])
    n = len(entries)
    data_off = base_off + 2 + 12 * n + 4
    ifd = struct.pack("<H", n)
    data = b""
    for tag, typ, vals in entries:
        raw = _pack_values(typ, vals)
        cnt = _count_of(typ, vals)
        ifd += struct.pack("<HHI", tag, typ, cnt)
        if len(raw) <= 4:
            ifd += raw.ljust(4, b"\x00")
        else:
            ifd += struct.pack("<I", data_off + len(data))
            data += raw
    ifd += struct.pack("<I", 0)        # next-IFD = none
    return ifd, data


def build_app1(make: str, model: str, orientation: int, iso: int,
               exposure: tuple, fnumber: tuple, pixel_x: int,
               pixel_y: int, lat: tuple | None = None,
               lat_ref: str = "N", lon: tuple | None = None,
               lon_ref: str = "E") -> bytes:
    """→ full APP1 segment bytes (marker + length + Exif TIFF area).
    ``lat``/``lon`` are ((deg,1),(min,1),(sec_centi,100)) rational
    triples or None to omit the GPS IFD."""
    exif_entries = [(TAG_EXPOSURE, 5, [exposure]),
                    (TAG_FNUMBER, 5, [fnumber]),
                    (TAG_ISO, 3, [iso]),
                    (TAG_PIXEL_X, 4, [pixel_x]),
                    (TAG_PIXEL_Y, 4, [pixel_y])]
    gps_entries = None
    if lat is not None:
        gps_entries = [(TAG_GPS_LAT_REF, 2, lat_ref),
                       (TAG_GPS_LAT, 5, list(lat)),
                       (TAG_GPS_LON_REF, 2, lon_ref),
                       (TAG_GPS_LON, 5, list(lon))]

    # two-pass layout: IFD0 at 8; Exif IFD after IFD0(+data); GPS last
    ifd0_entries = [(TAG_MAKE, 2, make), (TAG_MODEL, 2, model),
                    (TAG_ORIENTATION, 3, [orientation]),
                    (TAG_EXIF_IFD, 4, [0])]
    if gps_entries is not None:
        ifd0_entries.append((TAG_GPS_IFD, 4, [0]))

    def layout(exif_off: int, gps_off: int):
        e0 = [(t, ty, v) for t, ty, v in ifd0_entries]
        e0 = [(t, ty, [exif_off] if t == TAG_EXIF_IFD else
               ([gps_off] if t == TAG_GPS_IFD else v))
              for t, ty, v in e0]
        ifd0, d0 = _build_ifd(e0, 8)
        real_exif_off = 8 + len(ifd0) + len(d0)
        ifd1, d1 = _build_ifd(exif_entries, real_exif_off)
        real_gps_off = real_exif_off + len(ifd1) + len(d1)
        parts = [ifd0, d0, ifd1, d1]
        if gps_entries is not None:
            ifd2, d2 = _build_ifd(gps_entries, real_gps_off)
            parts += [ifd2, d2]
        return real_exif_off, real_gps_off, b"".join(parts)

    exif_off, gps_off, _ = layout(0, 0)
    exif_off2, gps_off2, body = layout(exif_off, gps_off)
    assert (exif_off2, gps_off2) == (exif_off, gps_off)
    tiff = b"II*\x00" + struct.pack("<I", 8) + body
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def _walk_app1(jpeg: bytes):
    """Yield (start, end, payload) of every APP1-Exif segment."""
    i = 2
    n = len(jpeg)
    while i + 4 <= n:
        if jpeg[i] != 0xFF:
            break
        marker = jpeg[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:             # SOS: entropy data follows
            break
        (seglen,) = struct.unpack_from(">H", jpeg, i + 2)
        if marker == 0xE1 and jpeg[i + 4:i + 10] == b"Exif\x00\x00":
            yield i, i + 2 + seglen, jpeg[i + 10:i + 2 + seglen]
        i += 2 + seglen


def strip_exif(jpeg: bytes) -> bytes:
    """Remove every APP1-Exif segment (the GPS/PII scrub for images);
    the entropy-coded image bytes are untouched."""
    spans = [(s, e) for s, e, _ in _walk_app1(jpeg)]
    out = jpeg
    for s, e in reversed(spans):
        out = out[:s] + out[e:]
    return out


def _read_ifd_full(t: bytes, endian: str, off: int) -> dict:
    (n,) = struct.unpack_from(endian + "H", t, off)
    tags = {}
    for i in range(n):
        pos = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(endian + "HHI", t, pos)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        data_off = pos + 8 if size <= 4 else \
            struct.unpack_from(endian + "I", t, pos + 8)[0]
        if typ == 2:
            raw = t[data_off:data_off + cnt]
            tags[tag] = raw.split(b"\x00")[0].decode("ascii",
                                                     "replace")
        elif typ == 3:
            tags[tag] = list(struct.unpack_from(
                endian + f"{cnt}H", t, data_off))
        elif typ == 4:
            tags[tag] = list(struct.unpack_from(
                endian + f"{cnt}I", t, data_off))
        elif typ == 1:
            tags[tag] = list(t[data_off:data_off + cnt])
        elif typ == 5:
            vals = struct.unpack_from(endian + f"{2*cnt}I", t, data_off)
            tags[tag] = [(vals[2*j], vals[2*j+1]) for j in range(cnt)]
    return tags


def parse_exif(jpeg: bytes) -> dict | None:
    """First APP1-Exif segment → flat dict (make, model, orientation,
    iso, exposure, fnumber, pixel_x, pixel_y, lat_milli, lon_milli) —
    GPS rational triples collapse to signed milli-degrees (deg*3.6e6 +
    min*6e4 + sec_centi*10, integer-exact for /100 rationals). Returns
    None when no EXIF is present."""
    for _, _, tiff in _walk_app1(jpeg):
        if tiff[:2] not in (b"II", b"MM"):
            continue
        endian = "<" if tiff[:2] == b"II" else ">"
        (ifd0_off,) = struct.unpack_from(endian + "I", tiff, 4)
        ifd0 = _read_ifd_full(tiff, endian, ifd0_off)
        out = {"make": ifd0.get(TAG_MAKE, ""),
               "model": ifd0.get(TAG_MODEL, ""),
               "orientation": ifd0.get(TAG_ORIENTATION, [0])[0],
               "iso": -1, "exposure_den": -1, "fnumber_tenths": -1,
               "pixel_x": -1, "pixel_y": -1,
               "lat_milli": None, "lon_milli": None}
        if TAG_EXIF_IFD in ifd0:
            ex = _read_ifd_full(tiff, endian, ifd0[TAG_EXIF_IFD][0])
            out["iso"] = ex.get(TAG_ISO, [-1])[0]
            if TAG_EXPOSURE in ex:
                out["exposure_den"] = ex[TAG_EXPOSURE][0][1]
            if TAG_FNUMBER in ex:
                num, den = ex[TAG_FNUMBER][0]
                out["fnumber_tenths"] = num * 10 // den
            out["pixel_x"] = ex.get(TAG_PIXEL_X, [-1])[0]
            out["pixel_y"] = ex.get(TAG_PIXEL_Y, [-1])[0]
        if TAG_GPS_IFD in ifd0:
            gp = _read_ifd_full(tiff, endian, ifd0[TAG_GPS_IFD][0])

            def _milli(trip):
                (d, dd), (m, md), (s, sd) = trip
                return (d * 3_600_000 // dd + m * 60_000 // md
                        + s * 1000 // sd)

            if TAG_GPS_LAT in gp:
                sign = -1 if gp.get(TAG_GPS_LAT_REF, "N") == "S" else 1
                out["lat_milli"] = sign * _milli(gp[TAG_GPS_LAT])
            if TAG_GPS_LON in gp:
                sign = -1 if gp.get(TAG_GPS_LON_REF, "E") == "W" else 1
                out["lon_milli"] = sign * _milli(gp[TAG_GPS_LON])
        return out
    return None
