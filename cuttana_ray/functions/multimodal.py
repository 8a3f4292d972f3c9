"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED — the image/audio codec libraries
are not in this environment — behind ``DecodeBackend``:

* ``backend="fake"`` (default): a deterministic, dependency-free stand-in
  that derives a fixed-size feature vector from the payload bytes (stable
  hash → seeded projection). It exercises ALL the real Ray-side plumbing:
  binary Arrow columns, small batch sizes for wide rows, actor-pool stages
  with per-actor setup, typed list<float32> outputs.
* ``backend="pillow"`` / ``"librosa"``: raise ``NotImplementedError`` with
  the exact integration point documented, unless the library is importable.

Schema: ``item_id:int64, payload:binary, media_type:string, meta:string``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from cuttana_ray.util import pool_size

MEDIA_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),
    ("meta", pa.string()),
])


def synth_media_table(n_items: int, payload_bytes: int = 4096,
                      seed: int = 42) -> pa.Table:
    """Deterministic fake binary payloads for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n_items)]
    return pa.table({
        "item_id": pa.array(np.arange(n_items, dtype=np.int64)),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(["image/fake"] * n_items),
        "meta": pa.array(['{"w":64,"h":64}'] * n_items),
    })


class DecodeBackend:
    """Per-actor decoder state; constructed once per actor (the expensive
    model/codec load point)."""

    def __init__(self, backend: str, feature_dim: int):
        self.backend = backend
        self.feature_dim = feature_dim
        if backend == "fake":
            rng = np.random.default_rng(42)
            self.proj = rng.standard_normal((256, feature_dim)).astype(np.float32)
        elif backend == "pillow":
            try:
                from PIL import Image  # noqa: F401
                self.Image = Image
            except ImportError as e:  # pragma: no cover - lib not in sandbox
                raise NotImplementedError(
                    "pillow backend: decode via PIL.Image.open(BytesIO(payload))"
                    " → np.asarray → resize → feature extraction. Library not"
                    " available in this environment.") from e
        else:
            raise NotImplementedError(f"backend {backend!r}")

    def features(self, payload: bytes) -> np.ndarray:
        if self.backend == "fake":
            # byte histogram → fixed seeded projection: deterministic,
            # content-sensitive, and shaped like a real embedding
            hist = np.bincount(np.frombuffer(payload, dtype=np.uint8),
                               minlength=256).astype(np.float32)
            hist /= max(1.0, hist.sum())
            return hist @ self.proj
        raise NotImplementedError  # pragma: no cover


class _FeatureExtractor:
    def __init__(self, backend: str, feature_dim: int):
        self.decoder = DecodeBackend(backend, feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decoder.features(p)
                 for p in batch["payload"].to_pylist()]
        return pa.table({
            "item_id": batch["item_id"],
            "media_type": batch["media_type"],
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


def extract_features(ds: "ray.data.Dataset", backend: str = "fake",
                     feature_dim: int = 64, batch_size: int = 64,
                     concurrency: int | None = None) -> "ray.data.Dataset":
    """Binary media rows → feature vectors. Small ``batch_size`` because
    payload rows are wide (batch bytes ≈ batch_size × payload size must fit
    the worker heap); actor pool so decoder setup happens once per actor."""
    return ds.map_batches(_FeatureExtractor, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=concurrency or pool_size(),
                          fn_constructor_args=(backend, feature_dim))


class _FrameSampler:
    """Video-style frame sampling stub: splits the payload into fixed-size
    pseudo-frames and keeps every ``stride``-th — the real backend would
    demux containers; the partitioning/batching shape is identical."""

    def __init__(self, frame_bytes: int, stride: int):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for item_id, payload in zip(batch["item_id"].to_pylist(),
                                    batch["payload"].to_pylist()):
            n = max(1, len(payload) // self.frame_bytes)
            for f in range(0, n, self.stride):
                ids.append(item_id)
                frame_idx.append(f)
                frames.append(payload[f * self.frame_bytes:
                                      (f + 1) * self.frame_bytes])
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int64()),
            "frame": pa.array(frames, pa.binary()),
        })


def sample_frames(ds: "ray.data.Dataset", frame_bytes: int = 1024,
                  stride: int = 2, batch_size: int = 32) -> "ray.data.Dataset":
    return ds.map_batches(_FrameSampler, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=pool_size(cap=2),
                          fn_constructor_args=(frame_bytes, stride))
