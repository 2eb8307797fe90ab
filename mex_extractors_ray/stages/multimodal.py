"""Multimodal (image/audio/video) column stages — Ray plumbing real,
codecs stubbed.

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type``, ``width``/``height``/``duration_ms``), processed by
actor-pool ``map_batches`` stages with SMALL batch sizes (large payload
rows: size batches by bytes, not rows — SURVEY.md §7.4 "wide rows" note).
The decode kernels themselves are stubbed behind
``DeterministicFakeCodec`` (this container ships no image/audio libs); the
schema, actor signature, batch sizing and output layout are real and
tested, so swapping in a real codec is a one-method change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mex_extractors_ray.hashing import hash_string_array
from .. import runtime as _rt

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image/png", "audio/wav", ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DeterministicFakeCodec:
    """Stand-in decode: a seeded pure function of the payload bytes. Replace
    ``decode`` with a real library (PIL/libav) in production."""

    def decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if media_type.startswith("image/"):
            rng = np.random.default_rng(len(payload))
            return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        if media_type.startswith("audio/"):
            rng = np.random.default_rng(len(payload) + 1)
            return rng.standard_normal(256).astype(np.float32)
        raise NotImplementedError(f"no codec for {media_type}")


class MediaFeatures:
    """Actor-pool stage: payload → fixed-size feature vector.

    __init__ loads the codec once per actor (the model-load slot); __call__
    decodes per batch. Use small ``batch_size`` (e.g. 64) — payload rows are
    large, and batch bytes × concurrency must fit the worker heap.
    """

    FEATURE_DIM = 16

    def __init__(self, codec=None):
        self.codec = codec or DeterministicFakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.zeros((batch.num_rows, self.FEATURE_DIM), dtype=np.float32)
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        for i, (p, t) in enumerate(zip(payloads, types)):
            raw = self.codec.decode(p, t).astype(np.float32).ravel()
            chunks = np.array_split(raw, self.FEATURE_DIM)
            feats[i] = [c.mean() if len(c) else 0.0 for c in chunks]
        flat = pa.array(feats.reshape(-1))
        offs = pa.array(np.arange(0, (batch.num_rows + 1) * self.FEATURE_DIM, self.FEATURE_DIM, dtype=np.int32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.ListArray.from_arrays(offs, flat),
            }
        )


def media_content_hash(batch: pa.Table) -> pa.Table:
    """Exact-dup key for media payloads (binary column → uint64)."""
    h = hash_string_array(batch["payload"])
    return batch.append_column("payload_hash", pa.array(h.astype(np.int64)))


def extract_media_features(ds, concurrency=None, batch_size: int = 64):
    """The real Ray plumbing: actor pool, small batches, typed output."""
    concurrency = concurrency or _rt.auto_pool()
    return ds.map_batches(
        MediaFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
