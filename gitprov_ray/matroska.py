"""Matroska / WebM (EBML) container probe + fixture writer, pure Python.

Layout per the published EBML (RFC 8794) and Matroska specs: a stream of
elements, each ``<id vint, length-marker kept><size vint, marker
stripped><data>``. The probe walks EBML→DocType and
Segment→Info/Tracks, reporting codec ids (V_VP8/V_VP9/A_OPUS/…), video
dimensions, and duration (TimecodeScale × Duration). Frame/audio DECODE
is out of scope — WebM payloads are VP8/VP9/Opus/Vorbis, all declared
external-codec stubs elsewhere in the engine — so this is the
header-only metadata stage (probe_media), mirroring the MP3/Ogg probes.
"""

from __future__ import annotations

import struct

__all__ = ["is_matroska", "probe_matroska", "encode_webm_fixture"]

_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_DOCTYPE = 0x4282
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_AUDIO = 0xE1
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_SAMPLING = 0xB5
_CHANNELS = 0x9F

_MASTER = {_EBML, _SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _AUDIO}


def is_matroska(b: bytes) -> bool:
    return b[:4] == b"\x1aE\xdf\xa3"


def _read_vint(b: bytes, pos: int, keep_marker: bool):
    """EBML variable-size integer at pos → (value, next_pos).
    keep_marker=True reads an element ID (marker bit retained)."""
    if pos >= len(b):
        raise ValueError("truncated EBML")
    first = b[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    n = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        n += 1
    if pos + n > len(b):
        raise ValueError("truncated EBML vint")
    v = first if keep_marker else (first & (mask - 1))
    for i in range(1, n):
        v = (v << 8) | b[pos + i]
    return v, pos + n


def _iter_elements(b: bytes, pos: int, end: int):
    """Yield (element_id, data_start, data_end) in [pos, end)."""
    while pos < end:
        eid, pos = _read_vint(b, pos, keep_marker=True)
        size, pos = _read_vint(b, pos, keep_marker=False)
        data_end = min(pos + size, end)
        yield eid, pos, data_end
        pos = pos + size


def _uint(b: bytes) -> int:
    v = 0
    for x in b:
        v = (v << 8) | x
    return v


def _float(b: bytes) -> float:
    if len(b) == 4:
        return struct.unpack(">f", b)[0]
    if len(b) == 8:
        return struct.unpack(">d", b)[0]
    return 0.0


def probe_matroska(b: bytes) -> dict | None:
    """Header metadata: {format, codec, width, height, frames,
    duration_ms} with -1 for not-applicable. format is 'webm' when the
    DocType says so, else 'mkv'."""
    if not is_matroska(b):
        return None
    out = {"format": "mkv", "codec": "", "width": -1, "height": -1,
           "frames": -1, "duration_ms": -1}
    scale_ns = 1_000_000
    duration_ticks = None
    tracks = []
    try:
        for eid, s, e in _iter_elements(b, 0, len(b)):
            if eid == _EBML:
                for e2, s2, e2e in _iter_elements(b, s, e):
                    if e2 == _DOCTYPE:
                        dt = b[s2:e2e].split(b"\0")[0].decode(
                            "latin-1").strip()
                        if dt == "webm":
                            out["format"] = "webm"
            elif eid == _SEGMENT:
                for e2, s2, e2e in _iter_elements(b, s, e):
                    if e2 == _INFO:
                        for e3, s3, e3e in _iter_elements(b, s2, e2e):
                            if e3 == _TIMECODE_SCALE:
                                scale_ns = _uint(b[s3:e3e]) or scale_ns
                            elif e3 == _DURATION:
                                duration_ticks = _float(b[s3:e3e])
                    elif e2 == _TRACKS:
                        for e3, s3, e3e in _iter_elements(b, s2, e2e):
                            if e3 != _TRACK_ENTRY:
                                continue
                            tr = {"type": 0, "codec": "", "w": -1,
                                  "h": -1}
                            for e4, s4, e4e in _iter_elements(b, s3,
                                                              e3e):
                                if e4 == _TRACK_TYPE:
                                    tr["type"] = _uint(b[s4:e4e])
                                elif e4 == _CODEC_ID:
                                    tr["codec"] = b[s4:e4e].split(
                                        b"\0")[0].decode("latin-1")
                                elif e4 == _VIDEO:
                                    for e5, s5, e5e in _iter_elements(
                                            b, s4, e4e):
                                        if e5 == _PIXEL_W:
                                            tr["w"] = _uint(b[s5:e5e])
                                        elif e5 == _PIXEL_H:
                                            tr["h"] = _uint(b[s5:e5e])
                            tracks.append(tr)
    except ValueError:
        if not tracks and duration_ticks is None:
            return None            # not parseable at all
    if duration_ticks is not None:
        out["duration_ms"] = int(duration_ticks * scale_ns / 1e6)
    video = [t for t in tracks if t["type"] == 1]
    pick = video[0] if video else (tracks[0] if tracks else None)
    if pick is not None:
        out["codec"] = pick["codec"].lower()
        out["width"], out["height"] = pick["w"], pick["h"]
    return out


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------

def _vint_size(v: int) -> bytes:
    """Encode a size vint in the fewest bytes (marker in the top bit)."""
    for n in range(1, 9):
        if v < (1 << (7 * n)) - 1:
            out = v | (1 << (7 * n))
            return out.to_bytes(n, "big")
    raise ValueError("size too large")


def _eid(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _el(eid: int, data: bytes) -> bytes:
    return _eid(eid) + _vint_size(len(data)) + data


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def encode_webm_fixture(codec: str = "V_VP9", w: int = 320, h: int = 240,
                        duration_ms: int = 2000,
                        doctype: str = "webm") -> bytes:
    """Minimal conforming Matroska/WebM header (EBML + Segment with
    Info and one video TrackEntry, no clusters) for probe tests."""
    ebml = _el(_EBML,
               _el_uint(0x4286, 1)            # EBMLVersion
               + _el_uint(0x42F7, 1)          # EBMLReadVersion
               + _el_uint(0x42F2, 4)          # EBMLMaxIDLength
               + _el_uint(0x42F3, 8)          # EBMLMaxSizeLength
               + _el(_DOCTYPE, doctype.encode())
               + _el_uint(0x4287, 2)          # DocTypeVersion
               + _el_uint(0x4285, 2))         # DocTypeReadVersion
    info = _el(_INFO,
               _el_uint(_TIMECODE_SCALE, 1_000_000)
               + _el(_DURATION, struct.pack(">d", float(duration_ms))))
    video = _el(_VIDEO, _el_uint(_PIXEL_W, w) + _el_uint(_PIXEL_H, h))
    track = _el(_TRACK_ENTRY,
                _el_uint(0xD7, 1)              # TrackNumber
                + _el_uint(0x73C5, 1)          # TrackUID
                + _el_uint(_TRACK_TYPE, 1)
                + _el(_CODEC_ID, codec.encode())
                + video)
    tracks = _el(_TRACKS, track)
    segment = _el(_SEGMENT, info + tracks)
    return ebml + segment
