"""H.264 I_PCM subset codec (h264codec.py): conforming-stream
roundtrips through both NAL framings, header parsing, the declared
predicted-macroblock stub, and the avc1-in-MP4 route through
mp4codec + FrameSample."""

import numpy as np
import pytest

from gitprov_ray import h264codec as H
from gitprov_ray import mp4codec as M


def _smooth(w, h, i=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([np.clip(yy * 6 + i * 10, 0, 255),
                     np.clip(xx * 4, 0, 255),
                     np.clip(128 + yy * 2 - xx, 0, 255)],
                    -1).astype(np.uint8)


def test_annexb_roundtrip_smooth():
    frames = [_smooth(48, 32, i) for i in range(3)]
    dec = H.decode_annexb(H.encode_annexb(frames))
    assert len(dec) == 3
    for f, d in zip(frames, dec):
        assert d.shape == f.shape
        # I_PCM is lossless in YUV; RGB error is 4:2:0 chroma + rounding
        assert np.abs(d.astype(int) - f.astype(int)).max() <= 4


def test_gray_roundtrip_exact():
    """Neutral-chroma content survives the color conversion exactly."""
    gray = np.repeat(np.arange(0, 256, 8, dtype=np.uint8).reshape(1, -1),
                     16, 0)
    rgb = np.stack([gray] * 3, -1)
    d = H.decode_annexb(H.encode_annexb([rgb]))[0]
    assert (d == rgb).all()


def test_non_mb_multiple_dims_crop():
    """50×34 needs cropping (SPS frame_cropping): decoded dims match."""
    f = _smooth(50, 34)
    d = H.decode_annexb(H.encode_annexb([f]))[0]
    assert d.shape == (34, 50, 3)
    assert np.abs(d.astype(int) - f.astype(int)).max() <= 4


def test_probe_reads_sps():
    b = H.encode_annexb([_smooth(50, 34)])
    assert H.probe_h264(b) == {"profile": 66, "level": 20,
                               "width": 50, "height": 34}


def test_emulation_prevention_roundtrip():
    """RBSP ↔ NAL payload with 00 00 0x runs."""
    rbsp = b"\x00\x00\x00\x00\x01\x02\x03\x00\x00"
    nal = H._add_emulation(rbsp)
    assert b"\x00\x00\x00" not in nal[:-1] or nal.count(b"\x03")
    assert H._strip_emulation(nal) == rbsp


def test_avcc_route_matches_annexb():
    frames = [_smooth(32, 16, i) for i in range(2)]
    annexb = H.decode_annexb(H.encode_annexb(frames))
    avcc = H.decode_avcc(H.avcc_config(32, 16), H.encode_samples(frames))
    assert all((a == b).all() for a, b in zip(annexb, avcc))


def test_predicted_macroblocks_are_declared_stub():
    """A stream whose first mb_type is not I_PCM raises naming CAVLC —
    the honest boundary of the subset."""
    f = _smooth(16, 16)
    b = bytearray(H.encode_annexb([f]))
    # find the slice NAL (type 5) and corrupt its first mb_type bits
    idx = b.rfind(b"\x00\x00\x00\x01")
    with pytest.raises(NotImplementedError, match="CAVLC|I_PCM"):
        # re-encode with a hand-built non-PCM mb_type: simplest is to
        # decode a truncated/malformed slice body where ue() yields 0
        sps = H._sps_rbsp(16, 16)
        pps = H._pps_rbsp()
        bw = H._BitWriter()
        bw.ue(0)          # first_mb
        bw.ue(7)          # slice_type I
        bw.ue(0)          # pps_id
        bw.u(0, 4)        # frame_num
        bw.ue(0)          # idr_pic_id
        bw.u(0, 2)        # dec_ref_pic_marking
        bw.se(0)          # qp_delta
        bw.ue(1)          # deblocking disabled
        bw.ue(0)          # mb_type 0 = I_4x4 → stub
        stream = (b"\x00\x00\x00\x01" + H._nal(7, sps)
                  + b"\x00\x00\x00\x01" + H._nal(8, pps)
                  + b"\x00\x00\x00\x01" + H._nal(5, bw.trailing()))
        H.decode_annexb(stream)
    assert idx > 0        # the fixture stream itself was well-formed


def test_mp4_avc1_end_to_end():
    frames = [_smooth(32, 16, i) for i in range(4)]
    b = M.encode_mp4_h264_ipcm(frames, fps=5)
    p = M.probe_mp4(b)
    t = p["tracks"][0]
    assert (t["codec"], t["width"], t["height"], t["sample_count"]) == \
        ("avc1", 32, 16, 4)
    dec = M.decode_mp4_frames(b)
    assert len(dec) == 4
    for f, d in zip(frames, dec):
        assert np.abs(d.astype(int) - f.astype(int)).max() <= 4


def test_framesample_accepts_avc1(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gitprov_ray.multimodal import (MEDIA_SCHEMA, FrameSample,
                                        parse_ppm, probe_media)

    frames = [_smooth(32, 16, i) for i in range(6)]
    payload = M.encode_mp4_h264_ipcm(frames, fps=5)
    meta = probe_media(payload)
    assert (meta["format"], meta["codec"]) == ("mp4", "avc1")
    rows = [{"media_id": "h0", "kind": "video", "payload": payload,
             "mime": "video/mp4", "width": -1, "height": -1,
             "duration_ms": -1}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    out = ds.map_batches(FrameSample, fn_constructor_kwargs={"k": 3},
                         batch_format="pyarrow", concurrency=1).to_pandas()
    assert len(out) == 3
    for _, row in out.iterrows():
        arr, _ = parse_ppm(bytes(row["frame"]))
        assert arr.shape == (16, 32, 3)


def test_annexb_probe_media():
    from gitprov_ray.multimodal import probe_media

    b = H.encode_annexb([_smooth(48, 32)])
    meta = probe_media(b)
    assert meta["format"] == "h264"
    assert meta["codec"] == "profile66"
    assert (meta["width"], meta["height"]) == (48, 32)
