"""Distributed k-means over an embedding column — cluster assignment as a
streaming ``map_batches`` matmul, Lloyd iterations as map-side partial sums.

Training-data pipelines cluster embeddings for semantic dedup, topic
balancing, and curriculum bucketing. Both halves are Ray-Data-native:

- ``kmeans_assign``: centroids are a tiny (k × d) matrix broadcast to every
  task (``ray.put`` once when large, closure capture when k·d is small —
  both ship ONE copy per node, never per batch); each batch does one
  vectorized ``V @ C.T`` and an argmin. No shuffle at any scale.
- ``kmeans_train`` (Lloyd's): per iteration ONE streaming pass emitting
  per-batch partial sums (k × d + k doubles per batch — constant size), a
  driver-side reduce of those constants, and a centroid update. Driver
  state is O(k·d), never O(rows); the corpus is re-streamed, not cached,
  so it works at any input size. Deterministic: init centroids are the
  embeddings of the k smallest ids (no RNG).

Ties (equal distance) break toward the lowest centroid index on both the
numpy side (``argmin`` takes the first minimum) and the SQL oracle
(``ORDER BY dist, cid``). Distances are computed in float64.

The reference has no numeric clustering; this extends its get-or-create
dimension grouping (``mex/extractors/grippeweb/transform.py:191-223``) to
learned groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _vecs(col) -> np.ndarray:
    """Arrow list<float> column → (n, d) float64 matrix, zero-copy flatten."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # .flatten() respects slices/offsets and returns exactly this array's values
    flat = np.asarray(col.flatten(), dtype=np.float64)
    offsets = np.asarray(col.offsets, dtype=np.int64)
    widths = np.diff(offsets)
    d = int(widths[0]) if len(widths) else 0
    if len(widths) and not (widths == d).all():
        raise ValueError("kmeans: ragged embedding column")
    return flat.reshape(-1, d)


class KMeansAssign:
    """Actor stage: nearest-centroid assignment. ``centroids`` is either the
    (k, d) array itself or a ``ray.ObjectRef`` to one (``ray.put`` the array
    when k·d is large so each node materializes it once)."""

    def __init__(self, centroids, vec_col: str = "embedding",
                 out_col: str = "cluster"):
        import ray

        if isinstance(centroids, ray.ObjectRef):
            centroids = ray.get(centroids)
        self.c = np.asarray(centroids, dtype=np.float64)
        self.c_sq = (self.c * self.c).sum(axis=1)
        self.vec_col, self.out_col = vec_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _vecs(batch[self.vec_col])
        # argmin ||v-c||^2 = argmin (||c||^2 - 2 v.c); ||v||^2 is constant
        # per row. argmin returns the FIRST minimum -> lowest cluster id.
        scores = self.c_sq[None, :] - 2.0 * (v @ self.c.T)
        assign = np.argmin(scores, axis=1).astype(np.int32)
        return batch.append_column(self.out_col, pa.array(assign))


def kmeans_assign(ds, centroids, vec_col: str = "embedding",
                  out_col: str = "cluster", concurrency: int | None = None):
    import ray

    ref = centroids if isinstance(centroids, ray.ObjectRef) else ray.put(
        np.asarray(centroids, dtype=np.float64))
    # stateless tasks: the centroid matrix is numpy in plasma (zero-copy
    # ray.get per task); a fixed actor pool would only add startup cost
    from mex_extractors_ray.runtime import stateless

    return ds.map_batches(
        stateless(KMeansAssign, centroids=ref, vec_col=vec_col, out_col=out_col),
        batch_format="pyarrow",
    )


def seed_centroids(ds, k: int, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> np.ndarray:
    """Deterministic init: embeddings of the k smallest ids. The filter is
    predicate-pushed; only k rows reach the driver."""
    small = ds.filter(expr=f"{id_col} < {k}")
    t = pa.Table.from_pylist(small.select_columns([id_col, vec_col]).take_all())
    t = t.sort_by(id_col)
    if t.num_rows != k:
        raise ValueError(f"seed_centroids: expected ids 0..{k-1}, got {t.num_rows} rows")
    return _vecs(t[vec_col])


def kmeans_train(ds, k: int, n_iter: int = 5, vec_col: str = "embedding",
                 id_col: str = "vec_id", return_history: bool = False):
    """Lloyd's iterations. Each pass streams the corpus once; per-batch
    output is ONE row of constant size (k×d sums + k counts + an inertia
    double), so the driver-side reduce handles O(batches) tiny rows,
    never the corpus. With ``return_history`` also returns the
    per-iteration inertia (Σ min‖v−c‖² under that iteration's
    assignment centroids) — Lloyd's guarantees it non-increasing, the
    trainability SLA the ``kmeans_train_check`` oracle pins."""
    c = seed_centroids(ds, k, vec_col, id_col)
    d = c.shape[1]
    history: list[float] = []

    for _ in range(n_iter):
        c_sq = (c * c).sum(axis=1)
        c_mat = c  # closure-captured: k×d doubles, one copy per task ship

        def partials(t: pa.Table) -> pa.Table:
            v = _vecs(t[vec_col])
            scores = c_sq[None, :] - 2.0 * (v @ c_mat.T)
            assign = np.argmin(scores, axis=1)
            sums = np.zeros((k, d))
            np.add.at(sums, assign, v)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            cols = {"sums": pa.array([sums.ravel()]),
                    "counts": pa.array([counts])}
            if return_history:  # inertia terms only when asked: the
                # ||v||^2 + gather is a per-row tax plain trains skip
                dmin = (scores[np.arange(len(v)), assign]
                        + (v * v).sum(axis=1))
                cols["inertia"] = pa.array([float(dmin.sum())])
            return pa.table(cols)

        acc_s = np.zeros((k, d))
        acc_n = np.zeros(k, dtype=np.int64)
        acc_i = 0.0
        for b in ds.map_batches(partials, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for row in range(b.num_rows):
                acc_s += np.asarray(b["sums"][row].as_py()).reshape(k, d)
                acc_n += np.asarray(b["counts"][row].as_py(), dtype=np.int64)
                if return_history:
                    acc_i += b["inertia"][row].as_py()
        history.append(acc_i)
        nz = acc_n > 0
        c = c.copy()
        c[nz] = acc_s[nz] / acc_n[nz, None]
    if return_history:
        return c, history
    return c


def kmeans_assign_sql(emb_table: str, k: int, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    """DuckDB mirror of ``kmeans_assign`` with ``seed_centroids`` init:
    centroids are rows ``id < k``; L2 argmin, ties to the lowest cid."""
    return f"""
WITH c AS (
  SELECT {id_col} AS cid, CAST({vec_col} AS DOUBLE[]) AS ce
  FROM {emb_table} WHERE {id_col} < {k}
), scored AS (
  SELECT e.{id_col} AS {id_col}, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.{id_col}
           ORDER BY list_distance(CAST(e.{vec_col} AS DOUBLE[]), c.ce), c.cid
         ) AS rn
  FROM {emb_table} e CROSS JOIN c
)
SELECT {id_col}, CAST(cid AS INTEGER) AS cluster FROM scored WHERE rn = 1
"""
