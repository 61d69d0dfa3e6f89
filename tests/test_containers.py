"""Matroska/WebM (EBML) and MPEG-TS container probes + probe_media
dispatch."""

from gitprov_ray import matroska, mpegts, multimodal as M


def test_webm_probe():
    b = matroska.encode_webm_fixture(codec="V_VP9", w=320, h=240,
                                     duration_ms=2000)
    assert matroska.is_matroska(b)
    assert matroska.probe_matroska(b) == {
        "format": "webm", "codec": "v_vp9", "width": 320, "height": 240,
        "frames": -1, "duration_ms": 2000}


def test_mkv_doctype_and_other_codecs():
    b = matroska.encode_webm_fixture(codec="V_VP8", w=64, h=48,
                                     duration_ms=500, doctype="matroska")
    p = matroska.probe_matroska(b)
    assert (p["format"], p["codec"], p["width"]) == ("mkv", "v_vp8", 64)
    assert matroska.probe_matroska(b"notmatroska") is None


def test_ebml_vint_edge():
    # 2-byte vint: 0x4000 | v form
    v, pos = matroska._read_vint(b"\x40\x7f", 0, keep_marker=False)
    assert (v, pos) == (0x7F, 2)
    v, _ = matroska._read_vint(b"\x81", 0, keep_marker=False)
    assert v == 1


def test_mpegts_probe_h264_and_aac():
    b = mpegts.encode_ts_fixture(stream_type=0x1B, duration_ms=2000)
    assert mpegts.is_mpegts(b)
    p = mpegts.probe_mpegts(b)
    assert (p["codec"], p["duration_ms"]) == ("h264", 2000)
    p2 = mpegts.probe_mpegts(
        mpegts.encode_ts_fixture(stream_type=0x0F, duration_ms=700))
    assert (p2["codec"], p2["duration_ms"]) == ("aac", 700)


def test_mpegts_crc_rejects_corrupt_section():
    b = bytearray(mpegts.encode_ts_fixture())
    b[8] ^= 0xFF                      # inside the PAT section body
    p = mpegts.probe_mpegts(bytes(b))
    assert p["codec"] == ""           # PAT dropped → no PMT → no streams
    assert p["duration_ms"] == 2000   # PCR span still reads


def test_mpegts_crc32_known_vector():
    # CRC-32/MPEG-2 of '123456789' is the published check value
    assert mpegts._crc32_mpeg(b"123456789") == 0x0376E6E7


def test_probe_media_dispatch():
    p = M.probe_media(matroska.encode_webm_fixture())
    assert (p["format"], p["codec"]) == ("webm", "v_vp9")
    p = M.probe_media(mpegts.encode_ts_fixture(stream_type=0x24))
    assert (p["format"], p["codec"]) == ("mpegts", "hevc")
