"""Multimodal (image/audio/video) column plumbing — decode stubbed.

Binary payloads ride as opaque ``binary`` columns with typed metadata; the
Ray-side plumbing (schema, small batches for large payloads, actor-pool
stage shape, output layout) is real and tested — only the codec call is a
deterministic fake because no image/audio libraries exist in this container
(clearly marked; swap ``_fake_decode`` for PIL/libav in production).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),     # 'image' | 'audio' | 'video'
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB: deterministic stand-in for a real decoder. Produces an 8-dim
    'feature' from the payload bytes via md5 — stable for tests. A real
    deployment replaces this with PIL.Image.open / soundfile / pyav and
    raises on corrupt payloads the same way."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload; real decoder stubbed out")
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32) / 255.0


class MediaFeatureExtractor:
    """Actor-pool stage: 'model' loaded once per actor, small batches
    because payloads are large (map_batches(..., batch_size=32))."""

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim  # real init: load model weights here

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [_fake_decode(p) for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        })


def synthesize_media_table(n: int = 64) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes) for tests."""
    rng = np.random.default_rng(7)
    payloads = [rng.integers(0, 256, size=128, dtype=np.uint8).tobytes()
                for _ in range(n)]
    types = ["image", "audio", "video"]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array([types[i % 3] for i in range(n)], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([64] * n, pa.int32()),
        "height": pa.array([64] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    })


def extract_features(ds, concurrency: int = 2):
    """ds of MEDIA_SCHEMA rows → (media_id, media_type, feature) rows."""
    return ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                          batch_size=32, concurrency=concurrency)
