"""EXIF APP1 build/parse/strip (gitprov_ray/exif.py): roundtrip of every
field, GPS sign collapse, strip keeps the entropy-coded image intact."""

import numpy as np

from gitprov_ray import exif, jpegcodec


def _jpeg():
    return jpegcodec.encode_jpeg_baseline(
        (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3), quality=90)


def test_build_parse_roundtrip_full():
    app1 = exif.build_app1(
        make="CamX", model="M9", orientation=6, iso=400,
        exposure=(1, 125), fnumber=(56, 10), pixel_x=8, pixel_y=8,
        lat=((48, 1), (51, 1), (2400, 100)), lat_ref="N",
        lon=((2, 1), (21, 1), (300, 100)), lon_ref="E")
    j = exif.insert_app1(_jpeg(), app1)
    m = exif.parse_exif(j)
    assert m["make"] == "CamX" and m["model"] == "M9"
    assert m["orientation"] == 6 and m["iso"] == 400
    assert m["exposure_den"] == 125 and m["fnumber_tenths"] == 56
    assert m["pixel_x"] == 8 and m["pixel_y"] == 8
    assert m["lat_milli"] == 48 * 3600000 + 51 * 60000 + 2400 * 10
    assert m["lon_milli"] == 2 * 3600000 + 21 * 60000 + 300 * 10


def test_gps_sign_and_omission():
    a = exif.build_app1("c", "m", 1, 100, (1, 50), (28, 10), 8, 8,
                        lat=((10, 1), (0, 1), (0, 100)), lat_ref="S",
                        lon=((20, 1), (0, 1), (0, 100)), lon_ref="W")
    m = exif.parse_exif(exif.insert_app1(_jpeg(), a))
    assert m["lat_milli"] == -36000000 and m["lon_milli"] == -72000000

    b = exif.build_app1("c", "m", 1, 100, (1, 50), (28, 10), 8, 8)
    m2 = exif.parse_exif(exif.insert_app1(_jpeg(), b))
    assert m2["lat_milli"] is None and m2["lon_milli"] is None


def test_strip_exif_keeps_pixels():
    base = _jpeg()
    app1 = exif.build_app1("c", "m", 3, 200, (1, 60), (40, 10), 8, 8,
                           lat=((1, 1), (2, 1), (3, 100)), lat_ref="N",
                           lon=((4, 1), (5, 1), (6, 100)), lon_ref="E")
    tagged = exif.insert_app1(base, app1)
    assert exif.parse_exif(tagged) is not None
    stripped = exif.strip_exif(tagged)
    assert exif.parse_exif(stripped) is None
    a = jpegcodec.decode_jpeg(base)
    b = jpegcodec.decode_jpeg(stripped)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_no_exif_returns_none_and_nonjpeg_raises():
    assert exif.parse_exif(_jpeg()) is None
    try:
        exif.insert_app1(b"not a jpeg", b"")
        assert False
    except ValueError:
        pass
