"""gifcodec: pure-Python GIF decode/encode — the real compressed path
through the video FrameSample stage (animated GIF) plus static-image
decode. Validated by lossless round-trips AND by decoding real-world
GIF files baked into the container's Python installs (skipped when
absent), so encoder/decoder bugs cannot cancel silently."""

import glob
import os

import numpy as np
import pytest

from gitprov_ray import gifcodec as G
from gitprov_ray import multimodal as M


def _frames(seed, n=4, h=13, w=17, colors=7):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(colors, 3), dtype=np.uint8)
    return [pal[rng.randint(0, colors, size=(h, w))] for _ in range(n)]


def test_roundtrip_multiframe_lossless():
    frames = _frames(0)
    b = G.encode_gif(frames)
    assert G.is_gif(b)
    out = G.decode_gif(b)
    assert len(out) == len(frames)
    for a, c in zip(frames, out):
        assert (a == c).all()


def test_roundtrip_256_colors_and_growth():
    rng = np.random.RandomState(3)
    pal = np.unique(rng.randint(0, 256, size=(256, 3), dtype=np.uint8), axis=0)
    img = pal[rng.randint(0, len(pal), size=(64, 64))]
    out = G.decode_gif(G.encode_gif([img]))
    assert (out[0] == img).all()


def test_interlaced_decode():
    """Interlace bit set → rows come back in Adam-style pass order."""
    frames = _frames(5, n=1, h=16, w=8)
    b = bytearray(G.encode_gif(frames))
    # image descriptor starts after header(6)+LSD(7)+GCT; find 0x2C
    gct_n = 2 << (b[10] & 7)
    idesc = 13 + 3 * gct_n
    assert b[idesc] == 0x2C
    # flip the interlace flag and reorder the index stream to match
    h, w = 16, 8
    order = np.concatenate([np.arange(s, h, st)
                            for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))])
    # descriptor = 0x2C + 9 bytes; flags at idesc+9, min code at idesc+10
    flat = G._lzw_decode(
        _collect_subblocks(bytes(b), idesc + 11), b[idesc + 10])
    idx = np.array(flat, np.uint8).reshape(h, w)
    reordered = idx[order]
    payload = G._lzw_encode([int(i) for i in reordered.ravel()],
                            b[idesc + 10])
    # rebuild: descriptor with interlace flag set, then re-chunked payload
    rebuilt = (bytes(b[:idesc + 9]) + bytes([b[idesc + 9] | 0x40]) +
               bytes([b[idesc + 10]]) + _chunk_subblocks(payload) +
               b"\x3b")
    got = G.decode_gif(rebuilt)
    assert (got[0] == frames[0]).all()


def _collect_subblocks(b: bytes, pos: int) -> bytes:
    out = bytearray()
    while True:
        size = b[pos]
        pos += 1
        if size == 0:
            return bytes(out)
        out += b[pos:pos + size]
        pos += size


def _chunk_subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


REAL_GIFS = [p for p in [
    "/root/.pyenv/install_local_python.gif",
    *glob.glob("/root/.pyenv/versions/*/lib/python*/idlelib/Icons/*.gif"),
    *glob.glob("/root/.pyenv/versions/*/lib/python*/test/test_email/data/*.gif"),
] if os.path.exists(p)][:6]


@pytest.mark.skipif(not REAL_GIFS, reason="no real-world GIFs on this host")
def test_decodes_real_world_gifs():
    decoded = 0
    for p in REAL_GIFS:
        with open(p, "rb") as f:
            b = f.read()
        try:
            frames = G.decode_gif(b)
        except NotImplementedError:
            continue                      # e.g. disposal-3 animations
        assert frames and frames[0].ndim == 3 and frames[0].shape[2] == 3
        decoded += 1
    assert decoded > 0


def test_frame_sample_stage_on_gif():
    import pyarrow as pa

    gif = M._synth_gif(9, frames=6)
    batch = pa.Table.from_pylist([{
        "media_id": "v0", "kind": "video", "payload": gif,
        "mime": "image/gif", "width": -1, "height": -1, "duration_ms": -1,
    }], schema=M.MEDIA_SCHEMA)
    out = M.FrameSample(k=3)(batch)
    assert out.num_rows == 3
    for fb in out.column("frame").to_pylist():
        arr, _ = M.parse_ppm(fb)
        assert arr.shape == (12, 16, 3)


def test_decode_image_static_gif_and_resize():
    frames = _frames(11, n=1)
    b = G.encode_gif(frames)
    assert (M.decode_image(b) == frames[0]).all()
    import pyarrow as pa

    out = M.ImageResize(target=(8, 8))(pa.table({
        "media_id": pa.array(["x"]),
        "payload": pa.array([b], pa.binary())}))
    resized = out.column("payload").to_pylist()[0]
    assert G.is_gif(resized)              # GIF in → GIF out
    assert G.decode_gif(resized)[0].shape == (8, 8, 3)


def test_synth_media_has_gif_video():
    t = M.synth_media_table(32)
    mimes = set(t.column("mime").to_pylist())
    assert "image/gif" in mimes and "video/x-ppm-stream" in mimes


def _gce(disposal=0, transparent=None):
    gflags = (disposal << 2) | (1 if transparent is not None else 0)
    return bytes([0x21, 0xF9, 4, gflags, 0, 0,
                  transparent if transparent is not None else 0, 0])


def _img_block(left, top, idx, min_code=2, local_table=None):
    import struct as _st

    h, w = idx.shape
    iflags = 0
    out = bytearray()
    if local_table is not None:
        bits = max(1, int(np.ceil(np.log2(max(len(local_table), 2)))))
        n = 1 << bits
        pad = np.zeros((n, 3), np.uint8)
        pad[: len(local_table)] = local_table
        iflags = 0x80 | (bits - 1)
        out += bytes([0x2C]) + _st.pack("<HHHHB", left, top, w, h, iflags)
        out += pad.tobytes()
    else:
        out += bytes([0x2C]) + _st.pack("<HHHHB", left, top, w, h, iflags)
    out.append(min_code)
    payload = G._lzw_encode([int(i) for i in idx.ravel()], min_code)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _gif_header(w, h, gct):
    import struct as _st

    bits = max(1, int(np.ceil(np.log2(max(len(gct), 2)))))
    n = 1 << bits
    pad = np.zeros((n, 3), np.uint8)
    pad[: len(gct)] = gct
    return (b"GIF89a" + _st.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0) +
            pad.tobytes())


def test_disposal_applies_to_own_frame_not_next():
    """Review fix: each frame is disposed by ITS OWN GCE disposal, not
    the next frame's; a GCE's transparency governs only one image."""
    gct = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]],
                   np.uint8)
    full = np.full((4, 4), 1, np.uint8)          # red everywhere
    patch = np.full((2, 2), 2, np.uint8)         # green 2x2 at (1,1)
    # frame0: GCE disposal=1 (leave). frame1: GCE disposal=2 — must NOT
    # erase frame0 before frame1 draws (old bug used frame1's value).
    gif = (_gif_header(4, 4, gct) +
           _gce(disposal=1) + _img_block(0, 0, full) +
           _gce(disposal=2) + _img_block(1, 1, patch) +
           b"\x3b")
    frames = G.decode_gif(gif)
    assert (frames[0] == gct[1]).all()           # all red
    # frame1 canvas: red with green patch — red ring must SURVIVE
    # (frame0 said leave-in-place)
    assert (frames[1][0, :] == gct[1]).all()
    assert (frames[1][1:3, 1:3] == gct[2]).all()

    # frame0 disposal=2: ITS rect clears to background before frame1
    gif2 = (_gif_header(4, 4, gct) +
            _gce(disposal=2) + _img_block(0, 0, full) +
            _img_block(1, 1, patch) +            # no GCE on frame1
            b"\x3b")
    f2 = G.decode_gif(gif2)
    assert (f2[1][0, :] == gct[0]).all()         # cleared to bg
    assert (f2[1][1:3, 1:3] == gct[2]).all()


def test_disposal_restore_previous():
    """Disposal 3 (restore previous): the canvas under a frame comes
    back before the NEXT frame draws — an overlay that must not stick."""
    gct = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    base = np.full((4, 4), 1, np.uint8)          # red background frame
    overlay = np.full((2, 2), 3, np.uint8)       # blue overlay at (1,1)
    dot = np.full((1, 1), 2, np.uint8)           # green dot at (0,0)
    gif = (_gif_header(4, 4, gct) +
           _gce(disposal=1) + _img_block(0, 0, base) +
           _gce(disposal=3) + _img_block(1, 1, overlay) +
           _img_block(0, 0, dot) +
           b"\x3b")
    frames = G.decode_gif(gif)
    assert (frames[1][1:3, 1:3] == gct[3]).all()  # overlay visible on f1
    # frame2: overlay restored away (red again), only the dot differs
    assert (frames[2][0, 0] == gct[2]).all()
    assert (frames[2][1:3, 1:3] == gct[1]).all()
    assert (frames[2][3, :] == gct[1]).all()


def test_transparency_is_one_shot():
    gct = np.array([[0, 0, 0], [255, 0, 0], [7, 7, 7]], np.uint8)
    full1 = np.full((3, 3), 1, np.uint8)
    full2 = np.full((3, 3), 2, np.uint8)
    # frame0 marks index 2 transparent; frame1 (GCE-less) draws index 2
    # everywhere — it must NOT inherit the stale transparent index
    gif = (_gif_header(3, 3, gct) +
           _gce(transparent=2) + _img_block(0, 0, full1) +
           _img_block(0, 0, full2) +
           b"\x3b")
    frames = G.decode_gif(gif)
    assert (frames[1] == gct[2]).all()


def test_resize_falls_back_to_ppm_when_palette_overflows():
    """Review fix: a composited first frame can exceed 256 colors (bg
    from the GCT + a full 256-color local table); ImageResize must fall
    back to PPM instead of crashing the batch."""
    import pyarrow as pa

    rng = np.random.RandomState(4)
    local = np.unique(rng.randint(1, 255, size=(300, 3), dtype=np.uint8),
                      axis=0)[:256]
    assert len(local) == 256
    gct = np.array([[255, 255, 255]], np.uint8)   # bg not in local table
    idx = np.arange(256, dtype=np.uint8).reshape(16, 16)
    gif = (_gif_header(16, 17, gct) +
           _img_block(0, 0, idx, min_code=8, local_table=local) +
           b"\x3b")
    canvas = G.decode_gif(gif)[0]
    assert len(np.unique(canvas.reshape(-1, 3), axis=0)) == 257
    out = M.ImageResize(target=(16, 17))(pa.table({
        "media_id": pa.array(["x"]),
        "payload": pa.array([gif], pa.binary())}))
    payload = out.column("payload").to_pylist()[0]
    arr, _ = M.parse_ppm(payload)                 # PPM fallback
    assert arr.shape == (17, 16, 3)
