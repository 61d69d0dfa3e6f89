"""AVI (RIFF) container: demux + fixture mux (avicodec.py) and its
multimodal stage wiring (FrameSample / AudioFeatures / probe_media /
corpus rotation)."""

import numpy as np
import pyarrow as pa
import pytest

from gitprov_ray import avicodec, multimodal as M


def _frames(seed=3, n=5, h=24, w=32):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)]


def test_dib_roundtrip_lossless():
    frames = _frames()
    b = avicodec.encode_avi_dib(frames, fps=12)
    assert avicodec.is_avi(b) and not avicodec.is_avi(b"RIFFxxxxWAVE")
    dec = avicodec.decode_avi_frames(b)
    assert len(dec) == len(frames)
    for a, d in zip(frames, dec):
        assert np.array_equal(a, d)


def test_dib_odd_width_padding():
    """w=7 → 21-byte rows pad to 24: the 4-byte stride path."""
    frames = _frames(n=2, h=5, w=7)
    dec = avicodec.decode_avi_frames(avicodec.encode_avi_dib(frames))
    for a, d in zip(frames, dec):
        assert np.array_equal(a, d)


def test_mjpeg_decode_and_probe():
    frames = _frames()
    b = avicodec.encode_avi_mjpeg(frames, fps=10, quality=95)
    dec = avicodec.decode_avi_frames(b)
    assert len(dec) == 5 and dec[0].shape == (24, 32, 3)
    # JPEG is lossy but close at q95
    assert np.abs(dec[0].astype(int) - frames[0].astype(int)).mean() < 24
    p = avicodec.probe_avi(b)
    assert p == {"format": "avi", "codec": "mjpg", "width": 32,
                 "height": 24, "frames": 5, "duration_ms": 500}


def test_pcm_audio_roundtrip():
    x = (np.sin(np.arange(4000) * 0.05) * 0.5).astype(np.float32)
    b = avicodec.encode_avi_mjpeg(_frames(n=2), fps=10, audio=(x, 8000))
    y, rate = avicodec.decode_avi_audio(b)
    assert rate == 8000 and len(y) == 4000
    assert np.abs(y - x).max() < 2 / 32768


def test_unknown_video_fourcc_raises_named():
    b = bytearray(avicodec.encode_avi_mjpeg(_frames(n=1)))
    i = bytes(b).find(b"MJPG", 40)          # strf biCompression slot
    while i != -1:
        b[i:i + 4] = b"cvid"
        i = bytes(b).find(b"MJPG", i)
    with pytest.raises(NotImplementedError, match="CVID"):
        avicodec.decode_avi_frames(bytes(b))


def test_compressed_audio_tag_raises_named():
    x = np.zeros(100, np.float32)
    b = avicodec.encode_avi_mjpeg(_frames(n=1), audio=(x, 8000))
    info = avicodec._parse(b)
    # flip the WAVEFORMATEX tag to 85 (MP3) in place
    raw = bytearray(b)
    import struct

    for four, s, e in avicodec._iter_chunks(raw, 12, len(raw)):
        pass
    # locate the auds strf: search for the packed PCM fmt header
    fmt = struct.pack("<HHI", 1, 1, 8000)
    i = bytes(raw).find(fmt)
    assert i != -1
    raw[i:i + 2] = struct.pack("<H", 85)
    with pytest.raises(NotImplementedError, match="85"):
        avicodec.decode_avi_audio(bytes(raw))
    assert info["avih"]["streams"] == 2


def test_frame_sample_stage_on_avi():
    for payload in (avicodec.encode_avi_mjpeg(_frames(n=6), fps=5),
                    avicodec.encode_avi_dib(_frames(n=6), fps=5)):
        batch = pa.table({"media_id": ["v1"], "payload": [payload]})
        out = M.FrameSample(k=3)(batch)
        assert out.num_rows == 3
        assert all(f.startswith(b"P6") for f in
                   out.column("frame").to_pylist())


def test_audio_features_stage_on_avi():
    x = (np.sin(np.arange(2000) * 0.04) * 0.4).astype(np.float32)
    payload = avicodec.encode_avi_mjpeg(_frames(n=2), audio=(x, 8000))
    batch = pa.table({"media_id": ["a1"], "payload": [payload]})
    out = M.AudioFeatures(env_dim=8)(batch)
    assert out.num_rows == 1
    assert out.column("duration_ms").to_pylist() == [250]
    assert out.column("rms").to_pylist()[0] == pytest.approx(
        float(np.sqrt(np.mean(x * x))), rel=1e-3)


def test_probe_media_dispatches_avi():
    p = M.probe_media(avicodec.encode_avi_dib(_frames(n=4), fps=8))
    assert (p["format"], p["codec"], p["frames"]) == ("avi", "dib24", 4)
    # WAV payloads still route to the wav probe (both are RIFF)
    import struct

    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000,
                                   2, 16)
           + b"data" + struct.pack("<I", 0))
    assert M.probe_media(wav)["format"] == "wav"


def test_corpus_rotation_carries_avi():
    t = M.synth_media_table(n=150)
    mimes = t.column("mime").to_pylist()
    kinds = t.column("kind").to_pylist()
    avi_rows = [i for i, m in enumerate(mimes) if m == "video/x-msvideo"]
    assert avi_rows, "corpus must carry AVI payloads"
    payloads = t.column("payload").to_pylist()
    saw = set()
    for i in avi_rows:
        assert kinds[i] == "video"
        p = M.probe_media(payloads[i])
        assert p["format"] == "avi"
        saw.add(p["codec"])
        assert M.FrameSample(k=2)(pa.table(
            {"media_id": ["x"], "payload": [payloads[i]]})).num_rows == 2
    assert saw == {"mjpg", "dib24"}     # both fixture variants rotate
