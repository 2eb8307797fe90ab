"""Multimodal (image/audio/video) column stages.

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type``, ``width``/``height``/``duration_ms``), processed by
actor-pool ``map_batches`` stages with SMALL batch sizes (large payload
rows: size batches by bytes, not rows — SURVEY.md §7.4 "wide rows" note).

Codec status (honest inventory):

- **REAL, dependency-free**: PPM/PGM images (``decode_ppm``/``encode_ppm``
  — P5/P6 binary netpbm) and PCM-16 WAV audio (``decode_wav``/
  ``encode_wav`` — RIFF parsed with ``struct``), plus a real
  nearest-neighbor ``resize_nearest``. ``StdlibCodec`` dispatches these.
- **Stubbed**: compressed codecs (PNG/JPEG/MP3/video) need libs this
  container doesn't ship; ``StdlibCodec`` gates them behind an import-try
  (PIL if present) and raises ``NotImplementedError`` otherwise.
  ``DeterministicFakeCodec`` remains for plumbing tests.

Per-row decode loops are inherent to variable-size codecs; everything
around them (schema, actor pools, batch sizing, output layout) is
vectorized Ray plumbing.
"""

from __future__ import annotations

import struct

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


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6); (h, w) uint8 → PGM (P5)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"encode_ppm: bad shape {img.shape}")
    h, w = img.shape[:2]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 rgb) → uint8 array (h, w[, 3])."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"decode_ppm: not binary netpbm: {magic!r}")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comments '#…' allowed); pixel data starts after the single whitespace
    # byte following maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("decode_ppm: 16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
    return data.reshape((h, w, 3) if ch == 3 else (h, w))


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Real nearest-neighbor resize (pure indexing, any channel count)."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[rows][:, cols]


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32 [-1, 1] or int16 mono samples → PCM-16 RIFF/WAVE bytes."""
    if samples.dtype != np.int16:
        samples = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
        samples = np.floor(samples * 32767 + 0.5).astype(np.int16)
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 RIFF/WAVE bytes → (int16 mono samples, rate). Walks RIFF
    chunks, so extra chunks (LIST/fact) are tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", payload, pos)
            if fmt != 1 or bits != 16:
                raise NotImplementedError(f"decode_wav: only PCM-16 (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            data = payload[pos:pos + size]
        pos += size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("decode_wav: missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype=np.int16)
    if channels and channels > 1:
        pcm = pcm.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return pcm, rate


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 RIFF/WAVE bytes → (float32 mono samples in [-1, 1], rate)."""
    pcm, rate = decode_wav_pcm16(payload)
    return (pcm.astype(np.float32) / 32767.0), rate


class StdlibCodec:
    """REAL decode for uncompressed formats; import-gated fallback (PIL)
    for compressed ones, honest ``NotImplementedError`` otherwise."""

    def decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if media_type in ("image/x-portable-pixmap", "image/x-portable-graymap"):
            return decode_ppm(payload)
        if media_type in ("audio/wav", "audio/x-wav"):
            return decode_wav(payload)[0]
        if media_type.startswith("image/"):
            try:
                import io

                from PIL import Image  # noqa: F401 — absent in this container
            except ImportError as e:
                raise NotImplementedError(
                    f"no codec for {media_type} (PIL not installed)") from e
            return np.asarray(Image.open(io.BytesIO(payload)))
        raise NotImplementedError(f"no codec for {media_type}")


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


class MediaStats:
    """Actor-pool stage: REAL decode (netpbm / PCM WAV) → exact-integer
    stats, so the encode→decode round trip is oracle-checkable: image rows
    emit (width, height, per-channel pixel SUMS — exact ints, no float
    mean), audio rows emit (n_samples, duration_ms, peak int16 amplitude).
    Inapplicable columns are 0. Per-row decode is inherent to
    variable-size payloads; keep ``batch_size`` small (payload bytes ×
    concurrency must fit the worker heap)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        width = np.zeros(n, np.int64)
        height = np.zeros(n, np.int64)
        sums = np.zeros((n, 3), np.int64)
        n_samples = np.zeros(n, np.int64)
        duration_ms = np.zeros(n, np.int64)
        peak = np.zeros(n, np.int64)
        kinds: list[str] = []
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        for i, (p, t) in enumerate(zip(payloads, types)):
            if t in ("image/x-portable-pixmap", "image/x-portable-graymap"):
                img = decode_ppm(p)
                kinds.append("image")
                height[i], width[i] = img.shape[:2]
                if img.ndim == 2:
                    img = img[:, :, None]
                s = img.reshape(-1, img.shape[2]).sum(axis=0, dtype=np.int64)
                sums[i, : len(s)] = s
            elif t in ("audio/wav", "audio/x-wav"):
                pcm, rate = decode_wav_pcm16(p)
                kinds.append("audio")
                n_samples[i] = len(pcm)
                duration_ms[i] = len(pcm) * 1000 // rate
                peak[i] = int(np.abs(pcm.astype(np.int64)).max()) if len(pcm) else 0
            else:
                raise NotImplementedError(f"MediaStats: no codec for {t}")
        return pa.table({
            "media_id": batch["media_id"],
            "kind": pa.array(kinds),
            "width": pa.array(width),
            "height": pa.array(height),
            "sum_r": pa.array(sums[:, 0]),
            "sum_g": pa.array(sums[:, 1]),
            "sum_b": pa.array(sums[:, 2]),
            "n_samples": pa.array(n_samples),
            "duration_ms": pa.array(duration_ms),
            "peak_int16": pa.array(peak),
        })


def media_stats(ds, concurrency=None, batch_size: int = 64):
    concurrency = concurrency or _rt.auto_pool()
    return ds.map_batches(MediaStats, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


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
