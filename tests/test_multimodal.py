"""Multimodal stages: real uncompressed codecs (netpbm/WAV/PPM-stream),
actor-pool plumbing, and stub gating for compressed formats."""

import numpy as np
import pyarrow as pa
import pytest

from gitprov_ray import multimodal as M


def _junk_table(n=2):
    rows = [{"media_id": f"j{i}", "kind": "image",
             "payload": b"\x89PNG\r\n\x1a\n" + bytes(range(32)),
             "mime": "image/png", "width": -1, "height": -1,
             "duration_ms": -1} for i in range(n)]
    return pa.Table.from_pylist(rows, schema=M.MEDIA_SCHEMA)


def test_ppm_roundtrip_and_resize():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(18, 24, 3), dtype=np.uint8)
    b = M.render_ppm(arr)
    back, consumed = M.parse_ppm(b)
    assert consumed == len(b)
    assert (back == arr).all()
    small = M.resize_nearest(arr, 8, 6)
    assert small.shape == (6, 8, 3)
    # corner pixels survive nearest-neighbor
    assert (small[0, 0] == arr[0, 0]).all()


def test_image_decode_real_dims():
    t = M.synth_media_table(9)
    img = t.filter(pa.compute.equal(t["kind"], "image"))
    out = M.ImageDecode()(img).to_pylist()
    assert len(out) == 3
    for r in out:
        assert (r["width"], r["height"]) == (24, 18)
        assert 0.0 <= r["channel_mean"] <= 1.0


def test_feature_extract_real_grid():
    t = M.synth_media_table(3)
    img = t.filter(pa.compute.equal(t["kind"], "image"))
    e1 = M.FeatureExtract()(img).to_pylist()[0]["embedding"]
    e2 = M.FeatureExtract()(img).to_pylist()[0]["embedding"]
    assert e1 == e2 and len(e1) == 64
    assert any(v > 0 for v in e1)
    # features reflect content: a black image embeds to zeros
    black = pa.Table.from_pylist([{
        "media_id": "b", "kind": "image",
        "payload": M.render_ppm(np.zeros((10, 10, 3), np.uint8)),
        "mime": "image/x-portable-pixmap", "width": -1, "height": -1,
        "duration_ms": -1}], schema=M.MEDIA_SCHEMA)
    eb = M.FeatureExtract()(black).to_pylist()[0]["embedding"]
    assert all(v == 0.0 for v in eb)


def test_image_resize_real_output_parses():
    t = M.synth_media_table(3)
    img = t.filter(pa.compute.equal(t["kind"], "image"))
    out = M.ImageResize(target=(32, 20))(img).to_pylist()[0]
    arr, _ = M.parse_ppm(out["payload"])
    assert arr.shape == (20, 32, 3)


def test_audio_features_real_wav():
    t = M.synth_media_table(6)
    aud = t.filter(pa.compute.equal(t["kind"], "audio"))
    out = M.AudioFeatures()(aud).to_pylist()
    for r in out:
        assert r["duration_ms"] == 250
        assert 0.1 < r["rms"] < 1.0       # a sine at 0.5 amplitude
        assert 0.0 < r["zcr"] < 1.0
        assert len(r["envelope"]) == 16 and all(v > 0 for v in r["envelope"])


def test_frame_sample_real_stream():
    t = M.synth_media_table(3)
    vid = t.filter(pa.compute.equal(t["kind"], "video"))
    out = M.FrameSample(k=3)(vid)
    assert out.num_rows == 3              # 3 distinct picks from 6 frames
    for fr in out.column("frame").to_pylist():
        arr, _ = M.parse_ppm(fr)
        assert arr.shape == (12, 16, 3)


def test_stub_raises_on_compressed_without_fake():
    junk = _junk_table()
    with pytest.raises(NotImplementedError):
        M.ImageDecode()(junk)
    with pytest.raises(NotImplementedError):
        M.ImageResize()(junk)
    with pytest.raises(NotImplementedError):
        M.FeatureExtract()(junk)
    with pytest.raises(NotImplementedError):
        M.FrameSample()(junk)
    with pytest.raises(NotImplementedError):
        M.AudioFeatures()(junk)
    # fake mode keeps the plumbing alive for unparseable payloads
    assert M.ImageDecode(deterministic_fake=True)(junk).num_rows == 2


def test_probe_media_every_format():
    """Header-only probes return the right metadata for every real
    payload format the corpus produces, without decoding pixels."""
    from gitprov_ray import gifcodec, mp4codec

    p = M.probe_media(M._synth_jpeg(1))
    assert (p["format"], p["codec"]) == ("jpeg", "baseline")
    assert (p["width"], p["height"], p["frames"]) == (24, 18, 1)

    from gitprov_ray import jpegcodec
    import numpy as np
    prog = jpegcodec.encode_jpeg_progressive(
        np.zeros((10, 12, 3), np.uint8))
    p = M.probe_media(prog)
    assert (p["format"], p["codec"]) == ("jpeg", "progressive")
    assert (p["width"], p["height"]) == (12, 10)

    p = M.probe_media(M._synth_png(1))
    assert (p["format"], p["codec"]) == ("png", "depth8")
    assert (p["width"], p["height"]) == (24, 18)

    p = M.probe_media(M._synth_gif(1, frames=6))
    assert (p["format"], p["codec"]) == ("gif", "animated")
    assert (p["width"], p["height"], p["frames"]) == (16, 12, 6)
    assert gifcodec.probe_gif(M._synth_gif(1, frames=6))["frames"] == 6

    p = M.probe_media(M._synth_mp4(1, frames=5))
    assert (p["format"], p["codec"], p["frames"]) == ("mp4", "jpeg", 5)
    assert (p["width"], p["height"]) == (16, 12)
    assert p["duration_ms"] == 1000                   # 5 frames at 5 fps
    assert mp4codec.probe_mp4(M._synth_mp4(1))["brand"] == "isom"

    p = M.probe_media(M._synth_wav(1, ms=250))
    assert (p["format"], p["codec"]) == ("wav", "pcm16")
    assert p["duration_ms"] == 250

    p = M.probe_media(M._synth_ppm(1))
    assert (p["format"], p["codec"], p["frames"]) == ("ppm", "P6", 1)

    p = M.probe_media(M._synth_ppm_stream(1, frames=6))
    assert (p["format"], p["frames"]) == ("ppm-stream", 6)

    # unknown/malformed is a RESULT, not an error
    assert M.probe_media(b"\x00gibberish")["format"] == "unknown"
    assert M.probe_media(b"")["format"] == "unknown"
    assert M.probe_media(b"GIF89a\x01")["format"] == "unknown"  # truncated


def test_media_probe_stage():
    t = M.synth_media_table(12)
    out = M.MediaProbe()(t)
    assert out.num_rows == 12
    fmts = set(out.column("format").to_pylist())
    assert "unknown" not in fmts            # every synth payload probes
    assert out.column("media_id").to_pylist() == \
        t.column("media_id").to_pylist()


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_pipelines():
    import ray.data as rd

    media = rd.from_arrow(M.synth_media_table(30))
    feats = M.image_pipeline(media, concurrency=(1, 2), batch_size=8)
    df = feats.to_pandas()
    assert len(df) == 10                  # every 3rd synth row is an image
    assert all(len(e) == 64 for e in df["embedding"])

    auds = M.audio_pipeline(media, concurrency=(1, 2), batch_size=8).to_pandas()
    assert len(auds) == 10 and (auds["duration_ms"] == 250).all()

    vids = M.video_pipeline(media, k=2, concurrency=(1, 2)).to_pandas()
    assert len(vids) == 20                # 10 videos × 2 frames


def test_shot_boundary_detects_planted_cut(ray_session):
    """Two flat-color scenes in a REAL animated GIF: the only cut is at
    the scene change; within-scene frames (tiny gradient wiggle) stay
    far below threshold. Integer milli-diffs are deterministic."""
    import ray.data as rd

    from gitprov_ray import gifcodec
    from gitprov_ray.multimodal import ShotBoundary, shot_boundary_pipeline

    h = w = 24
    scene_a = np.full((h, w, 3), 40, np.uint8)
    scene_b = np.full((h, w, 3), 200, np.uint8)
    frames = []
    for i in range(3):                       # scene A, mild wiggle
        f = scene_a.copy()
        f[0, :i + 1] = 44
        frames.append(f)
    for i in range(3):                       # scene B
        f = scene_b.copy()
        f[0, :i + 1] = 204
        frames.append(f)
    gif = gifcodec.encode_gif(frames)

    sb = ShotBoundary(threshold_milli=400)
    out = sb(pa.table({"media_id": pa.array(["v0"]),
                       "payload": pa.array([gif], pa.binary())}))
    df = out.to_pandas()
    assert df["frame_idx"].tolist() == [1, 2, 3, 4, 5]
    cuts = df[df["is_cut"]]["frame_idx"].tolist()
    assert cuts == [3]                       # exactly the scene change
    # the cut diff saturates (disjoint histograms -> 1000 milli)
    assert int(df.loc[df["frame_idx"] == 3, "diff_milli"].iloc[0]) == 1000
    assert (df.loc[df["frame_idx"] != 3, "diff_milli"] < 50).all()

    # pipeline wrapper: same rows through the actor-pool stage
    media = rd.from_arrow(pa.table({
        "media_id": pa.array(["v0"]), "kind": pa.array(["video"]),
        "payload": pa.array([gif], pa.binary()),
        "mime": pa.array(["image/gif"]),
        "width": pa.array([w], pa.int32()),
        "height": pa.array([h], pa.int32()),
        "duration_ms": pa.array([600], pa.int32())}))
    got = shot_boundary_pipeline(media, concurrency=(1, 2),
                                 batch_size=4).to_pandas()
    assert got.sort_values("frame_idx")["is_cut"].tolist() == \
        df.sort_values("frame_idx")["is_cut"].tolist()
