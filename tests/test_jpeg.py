"""Baseline JPEG codec (jpegcodec.py) + multimodal stage integration.

The decoder is validated three ways: encode→decode round-trip PSNR on
synthetic images (the encoder uses the independent forward path and the
spec's Annex K tables, so zigzag/Huffman/DCT bugs do not cancel), decoding
of real-world JPEG files baked into the container's Python installs (skipped
when absent), and refusal of progressive streams."""

import os

import numpy as np
import pyarrow as pa
import pytest

from gitprov_ray import jpegcodec as J
from gitprov_ray import multimodal as M


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else np.inf


def test_roundtrip_rgb():
    h, w = 41, 53
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([yy * 255 // (h - 1), xx * 255 // (w - 1),
                    (yy + xx) * 127 // (h + w)], axis=-1).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_baseline(img, quality=92))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 40


def test_roundtrip_gray_and_block_multiple():
    yy, xx = np.mgrid[0:64, 0:64]
    img = ((np.sin(yy / 5.0) + np.cos(xx / 7.0)) * 60 + 128).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_baseline(img, quality=85))
    assert dec.shape == img.shape and dec.ndim == 2
    assert _psnr(dec, img) > 40


def test_roundtrip_noise_low_quality():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_baseline(img, quality=30))
    assert dec.shape == img.shape          # lossy, but structurally valid
    assert 0 <= dec.min() and dec.max() <= 255


_REAL_JPEGS = [
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "site-packages/IPython/core/tests/2x2.jpg",
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/"
    "python.jpg",
]


@pytest.mark.parametrize("path", _REAL_JPEGS)
def test_decode_real_world(path):
    if not os.path.exists(path):
        pytest.skip("container fixture JPEG not present")
    arr = J.decode_jpeg(open(path, "rb").read())
    assert arr.dtype == np.uint8
    assert arr.shape[0] > 0 and arr.shape[1] > 0
    # dims must match the SOF header
    import struct
    b = open(path, "rb").read()
    i = b.find(b"\xff\xc0")
    h, w = struct.unpack(">HH", b[i + 5:i + 9])
    assert arr.shape[:2] == (h, w)


def test_progressive_roundtrip_exact():
    """Progressive decode must equal baseline decode bit-for-bit: both
    scan scripts carry the same quantized coefficients to the same IDCT,
    so any divergence is an entropy-coding bug, not quantization loss."""
    rng = np.random.RandomState(11)
    for shape in [(18, 24, 3), (33, 17, 3), (16, 16), (21, 13)]:
        yy, xx = np.mgrid[: shape[0], : shape[1]]
        base = (xx * 7 + yy * 3) % 256
        img = base if len(shape) == 2 else np.stack([base] * 3, -1)
        img = ((img + rng.randint(0, 60, shape)) % 256).astype(np.uint8)
        for q in (90, 55, 25):
            d_base = J.decode_jpeg(J.encode_jpeg_baseline(img, quality=q))
            d_prog = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(d_base, d_prog), (shape, q)


def test_progressive_real_world():
    """A real encoder's SOF2 stream (subsampled, multi-scan successive
    approximation) decodes to SOF dims with image-like local structure."""
    path = ("/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/"
            "share/doc/rust/html/embedded-book/assets/f3.jpg")
    if not os.path.exists(path):
        pytest.skip("progressive fixture not present")
    b = open(path, "rb").read()
    import struct

    i = b.find(b"\xff\xc2")
    h, w = struct.unpack(">HH", b[i + 5:i + 9])
    arr = J.decode_jpeg(b)
    assert arr.shape == (h, w, 3) and arr.dtype == np.uint8
    f = arr.astype(float)                   # photographs are locally smooth;
    assert np.abs(f[1:] - f[:-1]).mean() < 30   # garbage decode would be ~85


def test_not_a_jpeg():
    assert not J.is_jpeg(b"P6 1 1 255 xxx")
    with pytest.raises(ValueError):
        J.decode_jpeg(b"definitely not a jpeg")


def test_image_stages_accept_jpeg():
    """ImageDecode / FeatureExtract / ImageResize handle image/jpeg rows
    without deterministic_fake (the former stub path)."""
    media = M.synth_media_table(n=24, seed=7)
    mimes = set(media.column("mime").to_pylist())
    assert "image/jpeg" in mimes
    import pyarrow.compute as pc
    imgs = media.filter(pc.equal(media.column("kind"), "image"))
    dec = M.ImageDecode()(imgs)
    assert dec.num_rows == imgs.num_rows
    assert all(w > 0 for w in dec.column("width").to_pylist())
    feats = M.FeatureExtract(dim=16)(imgs)
    assert all(len(e) == 16 for e in feats.column("embedding").to_pylist())
    rs = M.ImageResize(target=(32, 32))(imgs)
    for mime, payload in zip(imgs.column("mime").to_pylist(),
                             rs.column("payload").to_pylist()):
        if mime == "image/jpeg":
            arr = J.decode_jpeg(payload)       # resized output is JPEG again
            assert arr.shape[:2] == (32, 32)
        elif mime == "image/png":
            from gitprov_ray import pngcodec

            assert pngcodec.decode_png(payload).shape[:2] == (32, 32)
        elif mime == "image/webp":
            from gitprov_ray import webpcodec

            assert webpcodec.decode_webp(payload).shape[:2] == (32, 32)
        elif mime == "image/tiff":
            from gitprov_ray import tiffcodec

            assert tiffcodec.decode_tiff(payload).shape[:2] == (32, 32)
        elif mime == "image/bmp":
            from gitprov_ray import bmpcodec

            assert bmpcodec.decode_bmp(payload).shape[:2] == (32, 32)
        elif mime == "image/x-icon":
            from gitprov_ray import icocodec

            assert icocodec.decode_ico(payload).shape[:2] == (32, 32)
        elif mime == "image/qoi":
            from gitprov_ray import qoicodec

            assert qoicodec.decode_qoi(payload).shape[:2] == (32, 32)
        elif mime == "image/x-tga":
            from gitprov_ray import tgacodec

            assert tgacodec.decode_tga(payload).shape[:2] == (32, 32)
        else:
            assert M.parse_ppm(payload)[0].shape[:2] == (32, 32)


def test_jpeg_resize_roundtrip_content():
    """Resize of a JPEG gradient keeps the gradient (not noise): corner
    means must be ordered like the source."""
    b = M._synth_jpeg(5, w=48, h=48)
    out = M.ImageResize(target=(16, 16))(pa.table({
        "media_id": pa.array(["x"]), "payload": pa.array([b], pa.binary())}))
    arr = J.decode_jpeg(out.column("payload").to_pylist()[0])
    red = arr[..., 0].astype(float)
    assert red[12:, :].mean() > red[:4, :].mean() + 50   # vertical gradient
