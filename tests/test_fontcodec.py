"""Font probe: sfnt table walk, naming-table platform preference, WOFF
wrapper (zlib per table), WOFF2 wrapper boundary, probe_media typing."""

import struct

import pytest

from gitprov_ray import fontcodec as F
from gitprov_ray import multimodal


def test_sfnt_probe_roundtrip():
    b = F.write_font_fixture("Graft Sans", "Bold", num_glyphs=77,
                             units_per_em=2048)
    p = F.probe_font(b)
    assert p["container"] == "sfnt" and p["flavor"] == "ttf"
    assert p["family"] == "Graft Sans" and p["subfamily"] == "Bold"
    assert p["num_glyphs"] == 77 and p["units_per_em"] == 2048
    assert p["num_tables"] == 3


def test_woff_probe_roundtrip():
    b = F.write_font_fixture("Woffy", "Italic", num_glyphs=9, woff=True)
    assert b[:4] == b"wOFF"
    p = F.probe_font(b)
    assert p["container"] == "woff" and p["flavor"] == "ttf"
    assert p["family"] == "Woffy" and p["subfamily"] == "Italic"
    assert p["num_glyphs"] == 9


def test_woff2_wrapper_boundary():
    b = (struct.pack(">4s4sIHH", b"wOF2", b"OTTO", 100, 7, 0)
         + b"\x00" * 40)
    p = F.probe_font(b)
    assert p["container"] == "woff2" and p["flavor"] == "otf"
    assert p["num_tables"] == 7
    assert p["family"] == ""              # declared boundary (Brotli)


def test_mac_roman_fallback_and_windows_preference():
    """Windows 3/1 names win over Mac 1/0 when both exist."""
    mac = struct.pack(">HHHHHH", 1, 0, 0, 1, 3, 0)
    win = struct.pack(">HHHHHH", 3, 1, 0x409, 1, 6, 3)
    strings = b"Mac" + "Win".encode("utf-16-be")
    table = struct.pack(">HHH", 0, 2, 6 + 24) + mac + win + strings
    names = F._parse_name_table(table)
    assert names[1] == "Win"


def test_probe_media_types_fonts():
    b = F.write_font_fixture(num_glyphs=12)
    p = multimodal.probe_media(b)
    assert p["format"] == "font" and p["codec"] == "sfnt-ttf"
    assert p["frames"] == 12
    assert multimodal.probe_media(b"notafont")["format"] == "unknown"


def test_not_a_font_raises():
    with pytest.raises(ValueError, match="not an sfnt"):
        F.probe_font(b"\x00\x00\x00\x00garbage")
