"""QOI / TGA image codecs and AIFF / AU audio containers.

QOI and TGA(raw/RLE) are lossless byte formats — round-trips pin array
equality.  AIFF/AU are 16-bit PCM containers — round-trips pin samples
to 1/32768 tolerance (quantization only); AU μ-law pins companding to
the same nearest-level contract as write_wav_g711.
"""

import numpy as np
import pytest

from gitprov_ray import audiocodec, multimodal, qoicodec, tgacodec


def _img(seed, h=13, w=17, c=3):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    arr[:, 5:9] = arr[0, 0]          # flat region: RUN/INDEX/RLE coverage
    return arr


# ---------------------------------------------------------------- QOI

@pytest.mark.parametrize("channels", [3, 4])
def test_qoi_roundtrip(channels):
    arr = _img(1, c=channels)
    enc = qoicodec.encode_qoi(arr)
    assert qoicodec.is_qoi(enc)
    out = qoicodec.decode_qoi(enc)
    np.testing.assert_array_equal(out, arr)


def test_qoi_all_chunk_ops():
    # craft pixels that force DIFF (small deltas), LUMA (mid deltas),
    # RGB (large deltas), RGBA (alpha change), INDEX (revisit), RUN
    px = [(10, 10, 10, 255)]
    px.append((11, 11, 11, 255))          # DIFF
    px.append((31, 41, 35, 255))          # LUMA range
    px.append((200, 5, 90, 255))          # RGB
    px.append((200, 5, 90, 128))          # RGBA
    px.append((10, 10, 10, 255))          # INDEX (hash hit)
    px += [(10, 10, 10, 255)] * 70        # RUN, crosses the 62 cap
    arr = np.array(px, np.uint8).reshape(1, -1, 4)
    enc = qoicodec.encode_qoi(arr)
    np.testing.assert_array_equal(qoicodec.decode_qoi(enc), arr)


def test_qoi_wraparound_diff():
    arr = np.array([[[254, 254, 254], [0, 0, 0]]], np.uint8)  # +2 wraps
    enc = qoicodec.encode_qoi(arr)
    np.testing.assert_array_equal(qoicodec.decode_qoi(enc), arr)


def test_qoi_probe():
    p = qoicodec.probe_qoi(qoicodec.encode_qoi(_img(2)))
    assert (p["width"], p["height"], p["channels"]) == (17, 13, 3)


# ---------------------------------------------------------------- TGA

@pytest.mark.parametrize("rle", [False, True])
def test_tga_roundtrip(rle):
    arr = _img(3)
    enc = tgacodec.encode_tga(arr, rle=rle)
    assert tgacodec.is_tga(enc)
    p = tgacodec.probe_tga(enc)
    assert p["rle"] == rle and p["kind"] == "truecolor"
    np.testing.assert_array_equal(tgacodec.decode_tga(enc), arr)


def test_tga_bottom_up_and_gray():
    """Hand-built type-3 grayscale, bottom-up (descriptor bit 5 clear)."""
    import struct

    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 3, 0, 0, 0, 0, 0, 4, 3, 8, 0)
    out = tgacodec.decode_tga(hdr + g[::-1].tobytes())
    np.testing.assert_array_equal(out, np.repeat(g[..., None], 3, axis=2))


def test_tga_colormapped():
    import struct

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 3, 24, 0, 0, 2, 2, 8,
                      0x20)
    b = hdr + pal.tobytes() + idx.tobytes()   # palette entries are BGR
    out = tgacodec.decode_tga(b)
    expect = pal[idx][:, :, ::-1]
    np.testing.assert_array_equal(out, expect)


def test_tga_16bpp_raises():
    import struct

    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 2, 2, 16,
                      0x20)
    with pytest.raises(NotImplementedError):
        tgacodec.decode_tga(hdr + b"\x00" * 8)


# ---------------------------------------------------------------- AIFF

def test_aiff_roundtrip():
    rng = np.random.RandomState(7)
    x = np.clip(rng.randn(800) * 0.3, -1, 1).astype(np.float32)
    b = audiocodec.write_aiff(x, rate=8000)
    assert audiocodec.is_aiff(b)
    y, rate, codec = audiocodec.parse_aiff(b)
    assert rate == 8000 and codec == "pcm_be16"
    assert np.max(np.abs(y - x)) <= 2.0 / 32768 + 1e-7


def test_aiff_probe_and_f80():
    for rate in (8000, 11025, 44100, 48000):
        assert audiocodec._f80_decode(audiocodec._f80_encode(rate)) == rate
    p = audiocodec.probe_aiff(audiocodec.write_aiff(np.zeros(400), 44100))
    assert p["sample_rate"] == 44100 and p["n_samples"] == 400
    assert p["duration_ms"] == 400 * 1000 // 44100


def test_aiff_stereo_takes_first_channel():
    x = np.linspace(-0.5, 0.5, 64, dtype=np.float32)
    b = audiocodec.write_aiff(x, rate=8000, channels=2)
    y, rate, _ = audiocodec.parse_aiff(b)
    assert len(y) == 64
    assert np.max(np.abs(y - x)) <= 2.0 / 32768 + 1e-7


# ------------------------------------------------------------------ AU

@pytest.mark.parametrize("encoding", ["mulaw", "pcm_be16"])
def test_au_roundtrip(encoding):
    rng = np.random.RandomState(9)
    x = np.clip(rng.randn(600) * 0.2, -1, 1).astype(np.float32)
    b = audiocodec.write_au(x, rate=8000, encoding=encoding)
    assert audiocodec.is_au(b)
    y, rate, codec = audiocodec.parse_au(b)
    assert rate == 8000 and codec == encoding
    tol = 0.03 if encoding == "mulaw" else 2.0 / 32768 + 1e-7
    assert np.max(np.abs(y - x)) <= tol


def test_au_mulaw_matches_wav_g711_companding():
    """AU μ-law and WAV G.711 μ-law share the nearest-level contract:
    the same PCM input companded by both must produce identical codes."""
    rng = np.random.RandomState(11)
    s16 = (rng.randn(256) * 8000).astype(np.int16)
    au_codes = audiocodec._mulaw_encode(s16)
    dec = audiocodec._mulaw_table()[au_codes]
    # decode error bounded by the μ-law segment step at each magnitude
    assert np.all(np.abs(dec.astype(np.int32) - s16) <= 1000)
    # and re-encoding the decode is a fixed point
    np.testing.assert_array_equal(audiocodec._mulaw_encode(dec), au_codes)


def test_au_probe():
    b = audiocodec.write_au(np.zeros(160), rate=8000, encoding="mulaw")
    p = audiocodec.probe_au(b)
    assert p["codec"] == "mulaw" and p["sample_rate"] == 8000
    assert p["n_samples"] == 160 and p["duration_ms"] == 20


# --------------------------------------------------- stage dispatch

def test_decode_image_dispatch():
    arr = _img(5)
    assert np.array_equal(
        multimodal.decode_image(qoicodec.encode_qoi(arr)), arr)
    assert np.array_equal(
        multimodal.decode_image(tgacodec.encode_tga(arr, rle=True)), arr)
    # 4-channel QOI drops alpha for the stats stages
    a4 = _img(6, c=4)
    assert np.array_equal(
        multimodal.decode_image(qoicodec.encode_qoi(a4)), a4[..., :3])


def test_parse_wav_dispatch():
    x = np.clip(np.sin(np.arange(300) / 7.0) * 0.4, -1, 1)
    y, rate = multimodal.parse_wav(audiocodec.write_aiff(x, 8000))
    assert rate == 8000 and len(y) == 300
    y2, rate2 = multimodal.parse_wav(
        audiocodec.write_au(x, 8000, "pcm_be16"))
    assert rate2 == 8000 and len(y2) == 300


def test_probe_media_new_formats():
    arr = _img(8)
    p = multimodal.probe_media(qoicodec.encode_qoi(arr))
    assert p["format"] == "qoi" and (p["width"], p["height"]) == (17, 13)
    p = multimodal.probe_media(tgacodec.encode_tga(arr, rle=True))
    assert p["format"] == "tga" and p["codec"] == "truecolor-rle"
    p = multimodal.probe_media(audiocodec.write_aiff(np.zeros(800), 8000))
    assert p["format"] == "aiff" and p["duration_ms"] == 100
    p = multimodal.probe_media(
        audiocodec.write_au(np.zeros(800), 8000, "mulaw"))
    assert p["format"] == "au" and p["codec"] == "mulaw"
    assert p["duration_ms"] == 100


def test_image_resize_format_preserving():
    from gitprov_ray.multimodal import ImageResize
    import pyarrow as pa

    arr = _img(10)
    t = pa.table({
        "media_id": ["q", "t"],
        "payload": pa.array([qoicodec.encode_qoi(arr),
                             tgacodec.encode_tga(arr)], pa.binary()),
    })
    out = ImageResize(target=(8, 6))(t)
    pq, pt = out.column("payload").to_pylist()
    assert qoicodec.is_qoi(pq) and qoicodec.probe_qoi(pq)["width"] == 8
    assert tgacodec.is_tga(pt) and tgacodec.probe_tga(pt)["width"] == 8


def test_corpus_carries_new_formats():
    t = multimodal.synth_media_table(n=84)
    mimes = set(t.column("mime").to_pylist())
    assert {"image/qoi", "image/x-tga", "audio/aiff",
            "audio/basic"} <= mimes
    # every corpus image decodes; every corpus audio row parses or is a
    # declared-external container
    import pyarrow.compute as pc

    imgs = t.filter(pc.equal(t["kind"], "image"))
    for p in imgs.column("payload").to_pylist():
        assert multimodal.decode_image(p) is not None
    auds = t.filter(pc.equal(t["kind"], "audio"))
    for p in auds.column("payload").to_pylist():
        parsed = multimodal.parse_wav(p)
        assert parsed is not None and len(parsed[0]) > 0
