"""Multimodal plumbing tests: schemas, actor-pool signatures, stub gating."""

import pytest


def test_stub_raises_without_fake():
    import pyarrow as pa
    from gitprov_ray import multimodal

    t = multimodal.synth_media_table(3)
    with pytest.raises(NotImplementedError):
        multimodal.ImageResize()(t)
    with pytest.raises(NotImplementedError):
        multimodal.FeatureExtract()(t)
    with pytest.raises(NotImplementedError):
        multimodal.FrameSample()(t)


def test_fake_decode_deterministic():
    from gitprov_ray import multimodal

    t = multimodal.synth_media_table(8)
    a = multimodal.ImageDecode(deterministic_fake=True)(t).to_pylist()
    b = multimodal.ImageDecode(deterministic_fake=True)(t).to_pylist()
    assert a == b
    assert all(r["width"] > 0 for r in a)


def test_frame_sample_explodes():
    from gitprov_ray import multimodal

    t = multimodal.synth_media_table(4)
    out = multimodal.FrameSample(k=3, deterministic_fake=True)(t)
    assert out.num_rows == 12
    assert out.schema.names == ["media_id", "frame_idx", "frame"]


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_pipeline():
    import ray.data as rd
    from gitprov_ray import multimodal

    media = rd.from_arrow(multimodal.synth_media_table(30))
    feats = multimodal.image_pipeline(media, concurrency=(1, 2), batch_size=8)
    df = feats.to_pandas()
    assert len(df) == 10  # every 3rd synth row is an image
    assert all(len(e) == 64 for e in df["embedding"])
