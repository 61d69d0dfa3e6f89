"""WebP lossless (VP8L) codec tests — roundtrips through every encoder
option (each exists to exercise a decoder path), real-world lossy-file
probing, and the multimodal stage integration.

Reference parity: the reference stores/serves media blobs untouched;
this codec backs the engine's own multimodal curation stages (SURVEY.md
north-star), completing the compressed-image family next to
jpegcodec/pngcodec/gifcodec."""

import glob

import numpy as np
import pytest

from gitprov_ray import webpcodec as wc
from gitprov_ray.multimodal import decode_image, probe_media


def _roundtrip(arr, **kw):
    b = wc.encode_webp_lossless(arr, **kw)
    out = wc.decode_webp(b)
    exp = arr
    if exp.ndim == 2:
        exp = exp[..., None]
    if exp.shape[-1] == 1:
        exp = np.repeat(exp, 3, -1)
    if exp.shape[-1] == 4 and (exp[..., 3] == 255).all():
        exp = exp[..., :3]
    assert out.shape == exp.shape
    assert (out == exp).all()
    return b


def test_roundtrip_rgb_random():
    rng = np.random.RandomState(7)
    _roundtrip(rng.randint(0, 256, (13, 17, 3), dtype=np.uint8))


def test_roundtrip_edge_sizes():
    rng = np.random.RandomState(8)
    for shape in [(1, 1, 3), (1, 9, 3), (9, 1, 3), (5, 7, 3)]:
        _roundtrip(rng.randint(0, 256, shape, dtype=np.uint8))


def test_roundtrip_gray_replicates():
    rng = np.random.RandomState(9)
    _roundtrip(rng.randint(0, 256, (6, 8), dtype=np.uint8))


def test_roundtrip_rgba_alpha_survives():
    rng = np.random.RandomState(10)
    arr = rng.randint(0, 256, (9, 11, 4), dtype=np.uint8)
    arr[0, 0, 3] = 17                     # force non-opaque
    b = wc.encode_webp_lossless(arr)
    out = wc.decode_webp(b)
    assert out.shape == (9, 11, 4)
    assert (out == arr).all()
    assert wc.probe_webp(b)["has_alpha"]


def test_roundtrip_subtract_green():
    rng = np.random.RandomState(11)
    _roundtrip(rng.randint(0, 256, (12, 14, 3), dtype=np.uint8),
               use_subtract_green=True)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_all_predictor_modes(mode):
    """Every one of the 14 spec predictors: forward and inverse share
    _predict_px, and the roundtrip pins each inverse branch."""
    rng = np.random.RandomState(12 + mode)
    # a gradient makes predictor residuals meaningful, noise keeps it honest
    yy, xx = np.mgrid[0:20, 0:23]
    arr = np.stack([(yy * 11) % 256, (xx * 7) % 256,
                    rng.randint(0, 256, (20, 23))], axis=-1).astype(np.uint8)
    _roundtrip(arr, predictor_mode=mode)


def test_predictor_auto_selection():
    """Per-tile argmin predictor selection: mixed content (flat /
    gradient / noise) roundtrips, picks several distinct modes, and
    beats the no-predictor stream."""
    rng = np.random.RandomState(60)
    yy = np.mgrid[0:32, 0:48][0]
    mix = np.zeros((32, 48, 3), dtype=np.uint8)
    mix[:, :16] = 77
    mix[:, 16:32] = np.stack([(yy[:, :16] * 8 % 256)] * 3,
                             -1).astype(np.uint8)
    mix[:, 32:] = rng.randint(0, 256, (32, 16, 3))
    b = wc.encode_webp_lossless(mix, predictor_mode="auto")
    assert (wc.decode_webp(b) == mix).all()
    assert len(b) < len(wc.encode_webp_lossless(mix))
    argb = np.concatenate([np.full(mix.shape[:2] + (1,), 255, np.uint8),
                           mix], -1)          # (h, w, 4) A,R,G,B
    _, mode_img = wc._forward_predictor(argb, "auto")
    assert len({int((m >> 8) & 0xFF) for m in mode_img}) >= 3


def test_roundtrip_color_transform():
    rng = np.random.RandomState(13)
    _roundtrip(rng.randint(0, 256, (10, 10, 3), dtype=np.uint8),
               color_transform=(10, 253, 100))   # incl. a negative int8


def test_roundtrip_stacked_transforms():
    rng = np.random.RandomState(14)
    _roundtrip(rng.randint(0, 256, (8, 19, 3), dtype=np.uint8),
               use_subtract_green=True, color_transform=(5, 6, 7),
               predictor_mode=1)


def test_roundtrip_color_cache():
    rng = np.random.RandomState(15)
    # few distinct colors → real cache hits
    pal = rng.randint(0, 256, (5, 3), dtype=np.uint8)
    arr = pal[rng.randint(0, 5, (16, 16))]
    small = wc.encode_webp_lossless(arr, cache_bits=6)
    plain = wc.encode_webp_lossless(arr)
    _roundtrip(arr, cache_bits=6)
    assert len(small) < len(plain)        # cache symbols beat literals


def test_roundtrip_lz77_runs():
    rng = np.random.RandomState(16)
    arr = np.tile(rng.randint(0, 256, (1, 1, 3), dtype=np.uint8),
                  (24, 31, 1))
    b = _roundtrip(arr, use_lz77=True)
    assert len(b) < 120                   # backrefs collapse the plane


@pytest.mark.parametrize("ncolors", [2, 3, 12, 200])
def test_roundtrip_palette_incl_pixel_bundling(ncolors):
    rng = np.random.RandomState(17 + ncolors)
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    arr = pal[rng.randint(0, ncolors, (10, 13))]
    _roundtrip(arr, use_palette=True)     # ≤16 colors exercises bundling


def test_palette_rejects_too_many_colors():
    rng = np.random.RandomState(21)
    arr = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="palette"):
        wc.encode_webp_lossless(arr, use_palette=True)


def test_probe_lossless():
    arr = np.zeros((4, 6, 3), dtype=np.uint8)
    p = wc.probe_webp(wc.encode_webp_lossless(arr))
    assert (p["codec"], p["width"], p["height"]) == ("lossless", 6, 4)
    assert not p["has_alpha"] and not p["animated"]


def test_animated_roundtrip_and_probe():
    rng = np.random.RandomState(40)
    frames = [rng.randint(0, 256, (10, 14, 3), dtype=np.uint8)
              for _ in range(5)]
    b = wc.encode_webp_anim(frames, duration_ms=40)
    p = wc.probe_webp(b)
    assert p["animated"] and p["frames"] == 5 and p["duration_ms"] == 200
    assert (p["width"], p["height"]) == (14, 10)
    dec = wc.decode_webp_frames(b)
    assert len(dec) == 5
    for f, d in zip(frames, dec):
        assert (d[..., :3] == f).all() and (d[..., 3] == 255).all()
    # decode_webp on an animated file = first composed frame
    assert (wc.decode_webp(b)[..., :3] == frames[0]).all()


def test_animated_subrect_dispose_composition():
    rng = np.random.RandomState(41)
    base = rng.randint(0, 256, (12, 16, 3), dtype=np.uint8)
    patch = rng.randint(0, 256, (4, 6, 3), dtype=np.uint8)
    b = wc.encode_webp_anim([base, patch], offsets=[(0, 0), (2, 4)],
                            dispose_background=True)
    f0, f1 = wc.decode_webp_frames(b)
    assert (f0[..., :3] == base).all()
    assert (f1[4:8, 2:8, :3] == patch).all()      # patch at (x=2, y=4)
    assert (f1[0, 0] == 0).all()                  # disposed to transparent


def test_animated_alpha_blend_semitransparent():
    """Source-over compositing with a genuinely semi-transparent frame:
    out = (src*sa + dst*da*(1-sa)) / out_a — checked against the float
    formula (the integer path overflowed uint16 before round 3)."""
    base = np.full((4, 4, 4), 200, dtype=np.uint8)
    base[..., 3] = 255                                    # opaque grey
    overlay = np.zeros((4, 4, 4), dtype=np.uint8)
    overlay[..., 0] = 100                                 # dark red
    overlay[..., 3] = 128                                 # half alpha
    b = wc.encode_webp_anim([base, overlay])
    # second ANMF must alpha-blend: rewrite its no-blend flag to 0
    raw = bytearray(b)
    anmf_positions = []
    pos = 12
    while pos + 8 <= len(raw):
        tag = bytes(raw[pos:pos + 4])
        size = int.from_bytes(raw[pos + 4:pos + 8], "little")
        if tag == b"ANMF":
            anmf_positions.append(pos)
        pos += 8 + size + (size & 1)
    flags_off = anmf_positions[1] + 8 + 15
    raw[flags_off] &= ~0x02                               # clear no-blend
    f0, f1 = wc.decode_webp_frames(bytes(raw))
    sa, da = 128, 255
    out_a = sa + da * (255 - sa) // 255
    exp_r = (100 * sa + 200 * da * (255 - sa) // 255) // out_a
    assert abs(int(f1[0, 0, 0]) - exp_r) <= 1
    assert f1[0, 0, 3] == out_a
    assert (f0[..., 0] == 200).all()


def test_framesample_animated_webp(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gitprov_ray.multimodal import (MEDIA_SCHEMA, FrameSample,
                                        parse_ppm)

    rng = np.random.RandomState(42)
    frames = [rng.randint(0, 256, (8, 10, 3), dtype=np.uint8)
              for _ in range(6)]
    rows = [{"media_id": "aw0", "kind": "video",
             "payload": wc.encode_webp_anim(frames), "mime": "image/webp",
             "width": -1, "height": -1, "duration_ms": -1}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    out = ds.map_batches(FrameSample, fn_constructor_kwargs={"k": 3},
                         batch_format="pyarrow", concurrency=1).to_pandas()
    assert len(out) == 3
    picks = sorted({(i * 6) // 3 for i in range(3)})
    for (_, row), pick in zip(out.iterrows(), picks):
        arr, _ = parse_ppm(bytes(row["frame"]))
        assert (arr == frames[pick]).all()


def test_real_world_lossy_file_probe_and_stub():
    """The stdlib test corpus ships a real libwebp-encoded VP8X+VP8 file:
    probe must read the extended-header dims; pixel decode is the
    declared lossy stub."""
    candidates = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/*/python.webp")
    if not candidates:
        pytest.skip("no real-world webp on this host")
    b = open(candidates[0], "rb").read()
    assert wc.is_webp(b)
    p = wc.probe_webp(b)
    assert (p["codec"], p["width"], p["height"]) == ("extended", 16, 16)
    assert p["has_alpha"]
    with pytest.raises(NotImplementedError, match="VP8"):
        wc.decode_webp(b)


def test_real_libwebp_alpha_stream_decodes():
    """The ALPH chunk of the stdlib's python.webp is a headerless VP8L
    stream written by REAL libwebp — decoding it exercises the prefix
    code / LZ77 / cache machinery against a non-self-written bitstream.
    The plane must look like the Python-logo mask, not noise."""
    candidates = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/*/python.webp")
    if not candidates:
        pytest.skip("no real-world webp on this host")
    b = open(candidates[0], "rb").read()
    alpha = wc.decode_webp_alpha(b)
    assert alpha.shape == (16, 16)
    assert alpha.dtype == np.uint8
    # a logo mask is bimodal: mostly fully-opaque or fully-transparent
    frac_extreme = ((alpha == 0) | (alpha == 255)).mean()
    assert frac_extreme > 0.5       # measured 0.594 (16×16 → soft edges)
    assert 0.2 < (alpha == 255).mean() < 0.8


def test_decode_webp_alpha_none_without_alph():
    arr = np.zeros((3, 3, 3), dtype=np.uint8)
    assert wc.decode_webp_alpha(wc.encode_webp_lossless(arr)) is None


def test_alpha_filters_roundtrip():
    """Raw-compression ALPH payloads with each prediction filter."""
    rng = np.random.RandomState(30)
    plane = rng.randint(0, 256, (6, 9), dtype=np.uint8)
    for filt in (0, 1, 2, 3):
        # forward-filter the plane the way an encoder would
        p = plane.astype(np.int16)
        res = np.zeros_like(p)
        for y in range(6):
            for x in range(9):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = p[0, x - 1]
                elif x == 0:
                    pred = p[y - 1, 0]
                elif filt == 0:
                    pred = 0
                elif filt == 1:
                    pred = p[y, x - 1]
                elif filt == 2:
                    pred = p[y - 1, x]
                else:
                    pred = int(np.clip(p[y, x - 1] + p[y - 1, x]
                                       - p[y - 1, x - 1], 0, 255))
                if filt == 0 and not (x == 0 or y == 0):
                    pred = 0
                res[y, x] = (p[y, x] - pred) & 0xFF
        if filt == 0:
            payload = bytes([0]) + plane.tobytes()   # raw, no filter
        else:
            payload = bytes([filt << 2]) + res.astype(np.uint8).tobytes()
        out = wc.decode_alpha(payload, 9, 6)
        assert (out == plane).all(), filt


def test_not_webp_rejected():
    with pytest.raises(ValueError):
        wc.decode_webp(b"GIF89a....")
    assert not wc.is_webp(b"RIFF\x00\x00\x00\x00WAVE....")


def test_decode_image_dispatch_and_probe_media():
    rng = np.random.RandomState(22)
    arr = rng.randint(0, 256, (7, 9, 3), dtype=np.uint8)
    b = wc.encode_webp_lossless(arr, use_subtract_green=True, cache_bits=4)
    out = decode_image(b)
    assert (out == arr).all()
    meta = probe_media(b)
    assert meta["format"] == "webp"
    assert meta["codec"] == "lossless"
    assert (meta["width"], meta["height"]) == (9, 7)


def test_image_stages_accept_webp(ray_session):
    """ImageDecode → real dims; ImageResize keeps webp-in → webp-out."""
    import pyarrow as pa
    import ray.data as rd

    from gitprov_ray.multimodal import MEDIA_SCHEMA, ImageDecode, ImageResize

    rng = np.random.RandomState(23)
    rows = [{"media_id": f"w{i}", "kind": "image",
             "payload": wc.encode_webp_lossless(
                 rng.randint(0, 256, (10 + i, 12, 3), dtype=np.uint8)),
             "mime": "image/webp", "width": -1, "height": -1,
             "duration_ms": -1} for i in range(3)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    dec = ds.map_batches(ImageDecode, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert sorted(dec["height"]) == [10, 11, 12]
    res = ds.map_batches(ImageResize,
                         fn_constructor_kwargs={"target": (6, 5)},
                         batch_format="pyarrow", concurrency=1).to_pandas()
    for payload in res["payload"]:
        out = wc.decode_webp(bytes(payload))
        assert out.shape == (5, 6, 3)


def test_meta_prefix_groups_roundtrip():
    """Meta-prefix image path: two code groups (left constant / right
    noise) — the per-tile group dispatch in the decoder, and the split
    must actually pay (smaller than the single-group stream)."""
    rng = np.random.RandomState(50)
    arr = np.zeros((20, 32, 3), dtype=np.uint8)
    arr[:, :16] = [30, 60, 90]
    arr[:, 16:] = rng.randint(0, 256, (20, 16, 3))
    b_meta = wc.encode_webp_lossless(arr, meta_split=True)
    assert (wc.decode_webp(b_meta) == arr).all()
    assert len(b_meta) < len(wc.encode_webp_lossless(arr))


def test_lz77_2d_distance_codes():
    """Vertical copy-from-above backrefs use 2-D plane code 1 (dx 0,
    dy 1) — the 120-entry distance-map branch of the decoder."""
    rng = np.random.RandomState(51)
    stripes = np.tile(rng.randint(0, 256, (1, 24, 3), dtype=np.uint8),
                      (16, 1, 1))
    b = wc.encode_webp_lossless(stripes, use_lz77=True)
    assert (wc.decode_webp(b) == stripes).all()
    assert len(b) < 400          # 16 rows collapse into above-copies
    # horizontal+vertical runs + cache together
    mix = np.repeat(rng.randint(0, 256, (4, 24, 3), dtype=np.uint8),
                    4, axis=0)
    b2 = wc.encode_webp_lossless(mix, use_lz77=True, cache_bits=4)
    assert (wc.decode_webp(b2) == mix).all()


def test_meta_split_exclusive_options():
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="exclusive"):
        wc.encode_webp_lossless(arr, meta_split=True, use_lz77=True)


def test_color_transform_spatially_split():
    """Per-tile color-transform elements: left tiles use one multiplier
    set, right tiles another — the decoder's tile-indexed element
    lookup with genuinely varying data."""
    rng = np.random.RandomState(61)
    arr = rng.randint(0, 256, (20, 40, 3), dtype=np.uint8)
    b = wc.encode_webp_lossless(
        arr, color_transform=((10, 253, 100), (200, 7, 33)))
    assert (wc.decode_webp(b) == arr).all()
