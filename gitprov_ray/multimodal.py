"""Multimodal (image/audio/video) column stages.

Binary payloads are opaque ``binary`` columns with typed metadata; every
stage is an actor-pool ``map_batches`` callable class (codec/model loaded
once per actor in ``__init__``). The image/audio codec libraries are NOT in
this container, so the decode kernels are STUBS: by default they raise
``NotImplementedError`` naming the missing dependency; with
``deterministic_fake=True`` they produce seeded deterministic fakes so the
Ray-side plumbing (schemas, batch sizing, actor signatures, output layout)
is real and tested end-to-end.

Batch-size guidance: payload columns dominate memory — size ``batch_size``
so batch_bytes × concurrency fits the worker heap (a 1 MiB-mean image
column wants batch_size ≲ 64 with 8 actors on a 4 GiB heap).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),            # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),            # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_floats(seed_bytes: bytes, n: int) -> np.ndarray:
    h = hashlib.sha256(seed_bytes).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.rand(n).astype(np.float32)


class ImageDecode:
    """payload → decoded dims + channel stats. Real decode needs Pillow —
    stubbed; fake mode derives deterministic dims/stats from payload bytes."""

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake
        if not self.fake:
            try:
                import PIL.Image  # noqa: F401
                self.pil = True
            except ImportError:
                self.pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake and not getattr(self, "pil", False):
            raise NotImplementedError(
                "image decode requires Pillow (not installed); "
                "pass deterministic_fake=True for the plumbing path")
        ids, widths, heights, means = [], [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            b = payload or b""
            f = _fake_floats(b, 3)
            ids.append(mid)
            widths.append(int(16 + (len(b) % 1024)))
            heights.append(int(16 + (len(b) % 768)))
            means.append(float(f.mean()))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "channel_mean": pa.array(means, pa.float32()),
        })


class ImageResize:
    """payload → resized payload (stub: deterministic truncation fake)."""

    def __init__(self, target: tuple[int, int] = (224, 224),
                 deterministic_fake: bool = False):
        self.target = target
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image resize requires Pillow (not installed); "
                "pass deterministic_fake=True for the plumbing path")
        w, h = self.target
        out = []
        for payload in batch.column("payload").to_pylist():
            b = payload or b""
            out.append(hashlib.sha256(b + f"{w}x{h}".encode()).digest())
        return pa.table({
            "media_id": batch.column("media_id"),
            "payload": pa.array(out, pa.binary()),
            "width": pa.array([w] * len(out), pa.int32()),
            "height": pa.array([h] * len(out), pa.int32()),
        })


class FeatureExtract:
    """payload → embedding list<float32> (model stub; fake = seeded)."""

    def __init__(self, dim: int = 64, deterministic_fake: bool = False):
        self.dim = dim
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "feature extraction requires a vision model (none installed); "
                "pass deterministic_fake=True for the plumbing path")
        embs = [_fake_floats(p or b"", self.dim).tolist()
                for p in batch.column("payload").to_pylist()]
        return pa.table({
            "media_id": batch.column("media_id"),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
        })


class FrameSample:
    """video payload → k evenly-spaced frame payloads (stub fake: sliced
    digests). Output is exploded (one row per sampled frame)."""

    def __init__(self, k: int = 4, deterministic_fake: bool = False):
        self.k = k
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video frame sampling requires an av codec (none installed); "
                "pass deterministic_fake=True for the plumbing path")
        ids, idxs, frames = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            b = payload or b""
            for i in range(self.k):
                ids.append(mid)
                idxs.append(i)
                frames.append(hashlib.sha256(b + bytes([i])).digest())
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def synth_media_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 7)
        rows.append({
            "media_id": f"m{i}", "kind": kind, "payload": payload,
            "mime": {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
            "width": -1, "height": -1, "duration_ms": -1,
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def image_pipeline(media_ds, concurrency=(1, 4), batch_size=16,
                   deterministic_fake=True):
    """Actor-pool pipeline: filter images → decode → features. The small
    batch_size is deliberate: binary payload columns dominate memory."""
    import pyarrow.compute as pc

    imgs = media_ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")),
        batch_format="pyarrow")
    feats = imgs.map_batches(
        FeatureExtract, fn_constructor_kwargs={"deterministic_fake": deterministic_fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
    return feats
