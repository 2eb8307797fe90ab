"""Similarity search over embedding columns (``list<float>``).

No analog exists in the reference (its matching is exact-key identity via
``stableTargetId``); this is the training-data-pipeline extension: top-k
cosine ANN against a broadcast query matrix.

- :class:`BruteForceTopK` — the exact baseline: the query matrix is
  ``ray.put`` ONCE and read per actor in ``__init__``; each batch is one
  numpy matmul; per-batch partial top-k rows flow to a tiny driver-side
  merge (k × n_queries rows — never the corpus).
- :class:`LSHBucketedTopK` — the scale path: random-hyperplane LSH assigns
  each vector a bucket; queries only score vectors in their (multi-probe)
  buckets, turning a full scan into a bucket-join. Approximate by design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, d) float64 from a fixed-length list<float> column, zero-copy-ish."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = np.asarray(col.flatten(), dtype=np.float64)
    offsets = np.asarray(col.offsets, dtype=np.int64)
    d = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    return values.reshape(len(col), d) if d else values.reshape(len(col), 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches actor: exact cosine top-k per query against each batch.

    Emits per-batch partial candidates (query_id, key, cosine); finalize
    with :func:`finalize_topk` on the (tiny) union of partials.
    """

    def __init__(self, queries_ref, k: int, vec_col: str = "embedding", key_col: str = "vec_id"):
        import ray

        q = ray.get(queries_ref) if hasattr(queries_ref, "hex") else queries_ref
        self.qids = np.asarray(q["query_id"])
        self.qmat = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k
        self.vec_col, self.key_col = vec_col, key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.vec_col]))
        sims = self.qmat @ m.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        keys = np.asarray(batch[self.key_col])
        nq = sims.shape[0]
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.qids, k)),
                self.key_col: pa.array(keys[idx.reshape(-1)]),
                "cosine": pa.array(np.take_along_axis(sims, idx, axis=1).reshape(-1)),
            }
        )


def finalize_topk(partials: pd.DataFrame, k: int, key_col: str = "vec_id") -> pd.DataFrame:
    """Merge per-batch partials into the exact global top-k per query.
    Deterministic tie-break: (-cosine, key)."""
    out = (
        partials.sort_values(["query_id", "cosine", key_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False, sort=True)
        .head(k)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


def ann_topk(ds, query_matrix: np.ndarray, query_ids: np.ndarray, k: int = 10,
             vec_col: str = "embedding", key_col: str = "vec_id") -> pd.DataFrame:
    """Exact distributed top-k: broadcast queries once, partial top-k per
    batch, tiny driver merge."""
    import ray

    ref = ray.put({"query_id": query_ids, "matrix": query_matrix})
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_args=(ref, k, vec_col, key_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    return finalize_topk(partials.to_pandas(), k, key_col)


class RandomHyperplaneLSH:
    """map_batches stage: bucket id per vector from ``n_bits`` random
    hyperplanes (seeded — same planes on every actor). The scale path for
    near-dup / ANN: group by ``bucket`` and compare only within buckets."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 42, vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[self.vec_col])
        bits = (m @ self.planes) > 0
        bucket = (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)
        return batch.append_column("bucket", pa.array(bucket.astype(np.int64)))


def embedding_near_duplicates(ds, dim: int, threshold: float = 0.95, n_bits: int = 10,
                              vec_col: str = "embedding", key_col: str = "vec_id"):
    """Embedding-cosine near-dup pairs via LSH bucketing: ONE shuffle on the
    bucket, exact cosine verification inside each bucket group."""
    bucketed = ds.map_batches(
        RandomHyperplaneLSH,
        fn_constructor_args=(dim, n_bits),
        fn_constructor_kwargs={"vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        m = _normalize(np.stack(g[vec_col].to_numpy()))
        sims = m @ m.T
        ia, ib = np.triu_indices(len(g), 1)
        keep = sims[ia, ib] >= threshold
        keys = g[key_col].to_numpy()
        a, b = keys[ia[keep]], keys[ib[keep]]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"a": a2, "b": b2, "cosine": sims[ia, ib][keep]})

    return bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
