"""PCX codec: RLE roundtrips against the engine's own encoder, palette
expansion, header probe, stage wiring and corpus rotation."""

import numpy as np
import pytest

from gitprov_ray import multimodal as M
from gitprov_ray import pcxcodec as P


def test_pcx_roundtrips():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 53, 3), dtype=np.uint8)  # odd width
    b = P.encode_pcx(img)
    assert P.is_pcx(b)
    assert np.array_equal(P.decode_pcx(b), img)
    p = P.probe_pcx(b)
    assert (p["width"], p["height"], p["planes"]) == (53, 40, 3)
    assert p["bytes_per_line"] == 54 and p["rle"]

    gray = rng.integers(0, 256, (37, 41), dtype=np.uint8)
    bg = P.encode_pcx(gray)
    got = P.decode_pcx(bg)                  # identity palette → RGB
    assert np.array_equal(got, np.stack([gray] * 3, -1))
    assert P.probe_pcx(bg)["vga_palette"]

    flat = np.full((20, 130), 200, np.uint8)   # runs > 63 split
    assert np.array_equal(P.decode_pcx(P.encode_pcx(flat)),
                          np.stack([flat] * 3, -1))
    # 0xC0-range literals must be escaped as runs of 1
    hot = np.full((4, 4), 0xC5, np.uint8)
    assert np.array_equal(P.decode_pcx(P.encode_pcx(hot)),
                          np.stack([hot] * 3, -1))


def test_pcx_stub_and_errors():
    with pytest.raises(ValueError):
        P.decode_pcx(b"\x00" * 200)
    b = bytearray(P.encode_pcx(np.zeros((4, 4), np.uint8)))
    b[3] = 1                                  # declare 1-bpp EGA
    with pytest.raises(NotImplementedError, match="EGA"):
        P.decode_pcx(bytes(b))
    with pytest.raises(ValueError, match="truncated"):
        P.decode_pcx(P.encode_pcx(np.zeros((8, 8), np.uint8))[:140])


def test_pcx_stage_wiring_and_corpus():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (18, 24, 3), dtype=np.uint8)
    b = P.encode_pcx(img)
    arr = M.decode_image(b)
    assert arr.shape == (18, 24, 3)
    pr = M.probe_media(b)
    assert pr["format"] == "pcx" and pr["codec"] == "p3b8-rle"
    assert (pr["width"], pr["height"]) == (24, 18)

    # corpus carries PCX and every payload still decodes
    tbl = M.synth_media_table(60)
    mimes = set(tbl.column("mime").to_pylist())
    assert "image/x-pcx" in mimes
    for kind, payload in zip(tbl.column("kind").to_pylist(),
                             tbl.column("payload").to_pylist()):
        if kind == "image":
            assert M.decode_image(payload) is not None
