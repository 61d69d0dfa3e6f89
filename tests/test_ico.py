"""ICO/CUR favicon codec: PNG and DIB entries, AND-mask alpha,
largest-entry selection, probe/resize/corpus wiring."""

import struct

import numpy as np

from gitprov_ray import icocodec as I
from gitprov_ray import pngcodec as P


def test_png_entries_roundtrip_and_largest_selection():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16, 4), dtype=np.uint8)
    img[..., 3] = 255
    small = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    b = I.encode_ico([small, img], fmt="png")
    assert I.is_ico(b)
    p = I.probe_ico(b)
    assert p["count"] == 2 and p["width"] == 16 and p["kind"] == "icon"
    assert all(e["format"] == "png" for e in p["entries"])
    d = I.decode_ico(b)                    # largest wins
    assert d.shape == (16, 16, 4) and (d == img).all()
    d0 = I.decode_ico(b, index=0)
    assert (d0[..., :3] == small).all() and (d0[..., 3] == 255).all()


def test_bmp_dib_entries_roundtrip():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (12, 10, 4), dtype=np.uint8)
    img[..., 3] = 255
    b = I.encode_ico([img], fmt="bmp")
    assert I.probe_ico(b)["entries"][0]["format"] == "bmp"
    assert (I.decode_ico(b) == img).all()


def test_and_mask_applies_as_alpha():
    """Hand-built 24-bpp DIB entry: right half transparent via the
    1-bpp AND mask (bottom-up, MSB-first, 4-byte aligned)."""
    rng = np.random.RandomState(7)
    w, h = 4, 2
    rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    bgr = np.ascontiguousarray(rgb[::-1][..., [2, 1, 0]])
    stride = (w * 3 + 3) & ~3
    rows = b"".join(bgr[y].tobytes() + b"\x00" * (stride - w * 3)
                    for y in range(h))
    maskrow = np.zeros(8, np.uint8)
    maskrow[2:4] = 1
    mb = np.packbits(maskrow)[:1].tobytes() + b"\x00" * 3
    info = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 24,
                       0, 0, 0, 0, 0, 0)
    payload = info + rows + mb * h
    ico = (struct.pack("<HHH", 0, 1, 1)
           + struct.pack("<BBBBHHII", w, h, 0, 0, 1, 24,
                         len(payload), 22) + payload)
    d = I.decode_ico(ico)
    assert (d[..., :3] == rgb).all()
    assert (d[:, :2, 3] == 255).all() and (d[:, 2:, 3] == 0).all()


def test_size_256_encodes_as_zero_byte():
    img = np.zeros((256, 256, 3), np.uint8)
    b = I.encode_ico([img])
    p = I.probe_ico(b)
    assert p["width"] == 256 and p["height"] == 256
    assert I.decode_ico(b).shape == (256, 256, 4)


def test_multimodal_wiring():
    from gitprov_ray import multimodal as M

    b = M._synth_ico(4)                   # png-entry variant (even seed)
    pr = M.probe_media(b)
    assert pr["format"] == "ico" and pr["frames"] == 2
    assert pr["width"] == 16 and pr["codec"].startswith("png")
    arr = M.decode_image(b)
    assert arr.shape == (16, 16, 4)
    b2 = M._synth_ico(5)                  # bmp-entry variant
    assert M.probe_media(b2)["codec"].startswith("bmp")
    assert M.decode_image(b2).shape == (16, 16, 4)

    batch = M.synth_media_table(60)
    mimes = set(batch.column("mime").to_pylist())
    assert "image/x-icon" in mimes
    # resize keeps ICO-ness
    import pyarrow as pa
    t = pa.table({"media_id": ["i0"], "payload": [b],
                  "mime": ["image/x-icon"]})
    out = M.ImageResize(target=(8, 8))(t)
    rb = out.column("payload").to_pylist()[0]
    assert I.is_ico(rb) and I.decode_ico(rb).shape == (8, 8, 4)
