"""pngcodec: pure-stdlib PNG decode/encode (the second real compressed
image codec after jpegcodec — converts the PNG branch of the multimodal
stub into a real path)."""

import struct
import zlib

import numpy as np
import pytest

from gitprov_ray import pngcodec as P


def _chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return (struct.pack(">I", len(data)) + body +
            struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))


def _png(w, h, depth, ctype, raw, extra=b"", interlace=0):
    return (P._SIG +
            _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype,
                                        0, 0, interlace)) +
            extra + _chunk(b"IDAT", zlib.compress(raw)) +
            _chunk(b"IEND", b""))


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_lossless(channels):
    rng = np.random.RandomState(channels)
    a = rng.randint(0, 256, size=(13, 17, channels), dtype=np.uint8)
    b = P.encode_png(a)
    assert P.is_png(b)
    d = P.decode_png(b)
    assert d.shape == a.shape
    assert (d == a).all()


def _forward_filter(img: np.ndarray, ftypes) -> bytes:
    """Reference forward filterer (spec §6.2-6.6) for decoder tests."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int16)
    out = bytearray()
    for y, ft in enumerate(ftypes):
        prior = flat[y - 1] if y else np.zeros(stride, np.int16)
        row = flat[y]
        left = np.concatenate([np.zeros(c, np.int16), row[:-c]])
        ul = np.concatenate([np.zeros(c, np.int16), prior[:-c]])
        if ft == 0:
            f = row
        elif ft == 1:
            f = row - left
        elif ft == 2:
            f = row - prior
        elif ft == 3:
            f = row - ((left + prior) // 2)
        else:
            pred = np.empty(stride, np.int16)
            for x in range(stride):
                p = left[x] + prior[x] - ul[x]
                pa_, pb, pc_ = abs(p - left[x]), abs(p - prior[x]), abs(p - ul[x])
                pred[x] = (left[x] if pa_ <= pb and pa_ <= pc_
                           else (prior[x] if pb <= pc_ else ul[x]))
            f = row - pred
        out.append(ft)
        out += (f % 256).astype(np.uint8).tobytes()
    return bytes(out)


def test_all_five_filters_decode():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    raw = _forward_filter(img, [0, 1, 2, 3, 4])
    d = P.decode_png(_png(6, 5, 8, 2, raw))
    assert (d == img).all()


def test_palette_expands_to_rgb_and_rgba():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                    np.uint8)
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    raw = b"".join(b"\x00" + r.tobytes() for r in idx)
    d = P.decode_png(_png(2, 2, 8, 3, raw, extra=_chunk(b"PLTE", plte.tobytes())))
    assert d.shape == (2, 2, 3) and (d == plte[idx]).all()
    d = P.decode_png(_png(2, 2, 8, 3, raw,
                          extra=_chunk(b"PLTE", plte.tobytes()) +
                          _chunk(b"tRNS", bytes([10, 20]))))
    assert d.shape == (2, 2, 4)
    assert list(d[..., 3].ravel()) == [10, 20, 255, 255]


def test_invalid_variants_raise():
    with pytest.raises(ValueError):
        P.decode_png(b"not a png")
    with pytest.raises(ValueError):        # depth 16 palette is illegal
        P.decode_png(_png(2, 2, 16, 3, b"\x00" * 10))
    with pytest.raises(ValueError):        # depth 2 RGB is illegal
        P.decode_png(_png(2, 2, 2, 2, b"\x00" * 6))


def _adam7_raw(img: np.ndarray, depth: int = 8) -> bytes:
    """Serialize an image as the 7 sequential Adam7 pass sub-images,
    every scanline filter 0."""
    out = bytearray()
    for xs, ys, xstep, ystep in P._ADAM7:
        sub = img[ys::ystep, xs::xstep]
        if sub.size == 0:
            continue
        for row in sub:
            out.append(0)
            if depth == 16:
                out += row.astype(">u2").tobytes()
            else:
                out += row.astype(np.uint8).tobytes()
    return bytes(out)


def test_adam7_interlaced_decode():
    rng = np.random.RandomState(11)
    # 13x10 exercises ragged pass dimensions; 3 channels
    img = rng.randint(0, 256, size=(10, 13, 3), dtype=np.uint8)
    d = P.decode_png(_png(13, 10, 8, 2, _adam7_raw(img), interlace=1))
    assert (d == img).all()
    # tiny image where some passes are empty
    img = rng.randint(0, 256, size=(2, 2, 1), dtype=np.uint8)
    d = P.decode_png(_png(2, 2, 8, 0, _adam7_raw(img), interlace=1))
    assert (d == img[..., None].reshape(2, 2, 1)).all()


def test_16bit_decodes_to_high_byte():
    rng = np.random.RandomState(5)
    img16 = rng.randint(0, 65536, size=(4, 5, 3), dtype=np.uint16)
    raw = b"".join(b"\x00" + r.astype(">u2").tobytes() for r in img16)
    d = P.decode_png(_png(5, 4, 16, 2, raw))
    assert d.dtype == np.uint8 and (d == (img16 >> 8).astype(np.uint8)).all()
    # 16-bit gray, Adam7
    g16 = rng.randint(0, 65536, size=(5, 3, 1), dtype=np.uint16)
    d = P.decode_png(_png(3, 5, 16, 0, _adam7_raw(g16, depth=16),
                          interlace=1))
    assert (d == (g16 >> 8).astype(np.uint8)).all()


def test_sub8bit_gray_and_palette():
    # 1-bit gray: a 10-px-wide checker row needs 2 bytes/row (bit packing)
    bits = np.array([[1, 0, 1, 0, 1, 0, 1, 0, 1, 0],
                     [0, 1, 0, 1, 0, 1, 0, 1, 0, 1]], np.uint8)
    packed = np.packbits(bits, axis=1)
    raw = b"".join(b"\x00" + r.tobytes() for r in packed)
    d = P.decode_png(_png(10, 2, 1, 0, raw))
    assert d.shape == (2, 10, 1) and set(d.ravel()) == {0, 255}
    assert (d[..., 0] == bits * 255).all()
    # 4-bit palette: two indexes per byte
    plte = np.arange(16 * 3, dtype=np.uint8).reshape(16, 3)
    idx = np.array([[0, 1, 2], [15, 14, 13]], np.uint8)
    raw = bytes([0, 0x01, 0x20, 0, 0xFE, 0xD0])
    d = P.decode_png(_png(3, 2, 4, 3, raw,
                          extra=_chunk(b"PLTE", plte.tobytes())))
    assert (d == plte[idx]).all()
    # 2-bit gray rescales 0..3 -> 0,85,170,255
    raw = bytes([0, 0b00011011])
    d = P.decode_png(_png(4, 1, 2, 0, raw))
    assert d[..., 0].ravel().tolist() == [0, 85, 170, 255]


def test_multimodal_decode_and_resize_png():
    from gitprov_ray import multimodal as M

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(12, 9, 3), dtype=np.uint8)
    b = P.encode_png(img)
    assert (M.decode_image(b) == img).all()

    batch = M.synth_media_table(32)
    assert "image/png" in set(batch.column("mime").to_pylist())

    import pyarrow.compute as pc
    imgs = batch.filter(pc.equal(batch["kind"], "image"))
    out = M.ImageResize(target=(8, 8))(imgs)
    for payload, mime in zip(out.column("payload").to_pylist(),
                             imgs.column("mime").to_pylist()):
        if mime == "image/png":
            arr = P.decode_png(payload)      # PNG in → PNG out
            assert arr.shape == (8, 8, 3)
    feats = M.FeatureExtract(dim=64)(imgs)
    assert feats.num_rows == imgs.num_rows
    assert all(len(e) == 64 for e in feats.column("embedding").to_pylist())


def test_apng_roundtrip_and_probe():
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, size=(10, 14, 4), dtype=np.uint8)
              for _ in range(5)]
    for f in frames:
        f[..., 3] = 255
    b = P.encode_apng(frames, delays_ms=[30, 40, 50, 60, 70])
    pr = P.probe_png(b)
    assert pr["animated"] and pr["frames"] == 5 and pr["duration_ms"] == 250
    dec = P.decode_apng_frames(b)
    assert len(dec) == 5
    for d, f in zip(dec, frames):
        assert (d == f).all()
    # a static PNG probes as non-animated and decodes as one frame
    sp = P.encode_png(frames[0][..., :3])
    assert not P.probe_png(sp)["animated"]
    one = P.decode_apng_frames(sp)
    assert len(one) == 1 and (one[0][..., :3] == frames[0][..., :3]).all()


def test_apng_dispose_and_blend_composition():
    """Sub-region frames with blend OVER and dispose PREVIOUS compose
    exactly like a hand-rolled canvas replay."""
    rng = np.random.RandomState(5)
    f0 = rng.randint(0, 256, (8, 8, 4), dtype=np.uint8)
    f0[..., 3] = 255
    f1 = rng.randint(0, 256, (3, 4, 4), dtype=np.uint8)   # partial alpha
    b = P.encode_apng([f0, f1], offsets=[(0, 0), (2, 3)],
                      blend=1, dispose=2)
    dec = P.decode_apng_frames(b)
    canvas = P._blend_over(np.zeros((8, 8, 4), np.uint8), f0)
    canvas[:, :] = 0                      # frame-0 dispose PREV -> BACKGROUND
    exp1 = canvas.copy()
    reg = (slice(3, 6), slice(2, 6))
    exp1[reg] = P._blend_over(exp1[reg], f1)
    assert (dec[1] == exp1).all()
    # dispose BACKGROUND clears only the frame region
    b2 = P.encode_apng([f0, f1], offsets=[(0, 0), (2, 3)], dispose=1)
    d2 = P.decode_apng_frames(b2)
    assert (d2[0] == f0).all()
    exp = np.zeros((8, 8, 4), np.uint8)
    exp[reg] = f1
    assert (d2[1] == exp).all()


def test_apng_through_framesample_and_probe_media():
    from gitprov_ray import multimodal as M

    b = M._synth_apng(9, frames=6)
    pr = M.probe_media(b)
    assert pr["format"] == "png" and pr["codec"].endswith("-apng")
    assert pr["frames"] == 6 and pr["duration_ms"] == 240
    batch = M.synth_media_table(36)
    assert "image/apng" in set(batch.column("mime").to_pylist())
    import pyarrow as pa
    t = pa.table({"media_id": ["a"], "payload": [b]})
    out = M.FrameSample(k=3)(t)
    assert out.num_rows == 3
    frames = P and [r for r in out.column("frame").to_pylist()]
    dec = [f[..., :3] for f in P.decode_apng_frames(b)]
    from gitprov_ray.multimodal import iter_ppm_stream
    got = [next(iter_ppm_stream(fr))[0] for fr in frames]
    picks = sorted({(i * 6) // 3 for i in range(3)})
    for g, p_ in zip(got, picks):
        assert (g == dec[p_]).all()
