"""Similarity search over embedding columns (``list<float>``).

No analog exists in the reference (its matching is exact-key identity via
``stableTargetId``); this is the training-data-pipeline extension: top-k
cosine ANN against a broadcast query matrix.

- :class:`BruteForceTopK` — the exact baseline: the query matrix is
  ``ray.put`` ONCE and read per actor in ``__init__``; each batch is one
  numpy matmul; per-batch partial top-k rows flow to a tiny driver-side
  merge (k × n_queries rows — never the corpus).
- :class:`RandomHyperplaneLSH` / :func:`embedding_near_duplicates` — LSH
  bucketing: one shuffle on the bucket, exact verification within buckets.
- :class:`IVFIndex` / :func:`ivf_topk` — the scale path: a deterministic
  coarse quantizer buckets the corpus; queries score only their ``nprobe``
  nearest buckets. ``nprobe == n_centroids`` degrades to exact search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import runtime as _rt


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

    def _emit(self, sims: np.ndarray, keys: np.ndarray) -> pa.Table:
        """Partial top-k per query with the SAME deterministic tie-break as
        finalize_topk — lexicographic (-cosine, key) — so a candidate tied at
        the k-boundary can never be dropped batch-side in a way that depends
        on Ray's block splitting. Rows with -inf cosine (masked by a probed
        subclass) are dropped."""
        nq, nb = sims.shape
        k = min(self.k, nb)
        sel = np.empty((nq, k), dtype=np.int64)
        for qi in range(nq):  # nq is small (the broadcast query set)
            sel[qi] = np.lexsort((keys, -sims[qi]))[:k]
        cos = np.take_along_axis(sims, sel, axis=1).reshape(-1)
        finite = np.isfinite(cos)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.qids, k)[finite]),
                self.key_col: pa.array(keys[sel.reshape(-1)][finite]),
                "cosine": pa.array(cos[finite]),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.vec_col]))
        sims = self.qmat @ m.T  # (nq, nb)
        return self._emit(sims, np.asarray(batch[self.key_col]))


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
        _rt.stateless(BruteForceTopK, ref, k, vec_col, key_col),
        batch_format="pyarrow",
        batch_size=4096,
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


class EmbeddingLSHBands:
    """map_batches stage: vector → exploded (t, band, key, vec32) rows — the
    multi-table random-hyperplane analog of :class:`~dedup.SimHashBands`.

    ``n_tables`` independent hyperplane sets of ``n_bits`` planes each; two
    vectors within angle θ share a table-t band with prob (1-θ/π)^n_bits, so
    recall is OR-ed across tables while each table's bucket population is
    corpus/2^n_bits in expectation — raise ``n_bits`` with corpus size to
    bound in-bucket verify work (the fix for the unsalted O(bucket²) verify
    of round 2). Table 0 uses the base ``seed``, so its buckets equal the
    single-table :class:`RandomHyperplaneLSH` — candidates are a superset.

    Vectors ship as float32 fixed-size lists (half the shuffle bytes; the
    verify recomputes exact cosine in float64 from them)."""

    def __init__(self, dim: int, vec_col: str, key_col: str, n_bits: int = 10,
                 n_tables: int = 4, seed: int = 42):
        self.planes = [
            np.random.default_rng(seed + t).standard_normal((dim, n_bits))
            for t in range(n_tables)
        ]
        self.vec_col, self.key_col = vec_col, key_col
        self.n_tables, self.dim = n_tables, dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[self.vec_col])
        n = len(m)
        bands = np.empty((n, self.n_tables), dtype=np.int64)
        for t, planes in enumerate(self.planes):
            bits = (m @ planes) > 0
            bands[:, t] = (
                (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64))
                .sum(axis=1)
                .astype(np.int64)
            )
        keys = batch[self.key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), self.n_tables))
        vec32 = pa.FixedSizeListArray.from_arrays(
            pa.array(np.repeat(m, self.n_tables, axis=0).astype(np.float32).reshape(-1)),
            self.dim,
        )
        return pa.table(
            {
                "t": pa.array(np.tile(np.arange(self.n_tables, dtype=np.int32), n)),
                "band": pa.array(bands.reshape(-1)),
                self.key_col: keys.take(rep),
                "_vec32": vec32,
            }
        )


def embedding_near_duplicates(ds, dim: int, threshold: float = 0.95, n_bits: int = 10,
                              vec_col: str = "embedding", key_col: str = "vec_id",
                              n_tables: int = 4, salt: int = 8):
    """Embedding-cosine near-dup pairs, scale-safe: multi-table hyperplane
    banding → ONE shuffle on the salted (t, band) bucket → vectorized
    in-block exact-cosine verify → distributed pair dedup — the same shape
    as :func:`~dedup.simhash_near_duplicates`, with the vector as payload.

    Block size is bounded by corpus×n_tables/(n_tables×salt·effective
    buckets); in-bucket pair work is bounded by (corpus/2^n_bits)² per
    bucket — scale ``n_bits`` with the corpus (12 bits ⇒ 4096 buckets/table)
    instead of letting buckets grow. Nothing corpus-sized reaches the
    driver, and no per-bucket pandas group dispatch remains."""
    exploded = ds.map_batches(
        _rt.stateless(EmbeddingLSHBands, dim, vec_col, key_col, n_bits, n_tables),
        batch_format="pyarrow",
    )

    n_groups = n_tables * salt

    def add_salt(t: pa.Table) -> pa.Table:
        g = np.asarray(t["t"], dtype=np.int64) * salt + (
            np.asarray(t["band"], dtype=np.int64) % salt
        )
        from mex_extractors_ray.hashing import shard_tags

        return t.append_column("_g", shard_tags(g, n_groups))

    from mex_extractors_ray.stages.dedup import _pair_tag, _pairs_from_buckets, exact_dedup

    def pairs_in_block(g: pa.Table) -> pa.Table:
        t = g.sort_by([("t", "ascending"), ("band", "ascending"), (key_col, "ascending")])
        kt = g[key_col].type
        empty = pa.table({"a": pa.array([], kt), "b": pa.array([], kt),
                          "cosine": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        # payload = row position into the block's (sorted) vector matrix
        a, b, ra, rb = _pairs_from_buckets(
            [np.asarray(t["t"], dtype=np.int64), np.asarray(t["band"], dtype=np.int64)],
            np.asarray(t[key_col]),
            payload=np.arange(t.num_rows, dtype=np.int64),
        )
        if ra is None or len(a) == 0:
            return empty
        vc = t["_vec32"]
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        m = _normalize(
            np.asarray(vc.flatten(), dtype=np.float64).reshape(t.num_rows, dim)
        )
        cos = np.einsum("ij,ij->i", m[ra], m[rb])
        keep = cos >= threshold
        a, b, cos = a[keep], b[keep], cos[keep]
        swap = a > b
        return pa.table(
            {
                "a": pa.array(np.where(swap, b, a), kt),
                "b": pa.array(np.where(swap, a, b), kt),
                "cosine": pa.array(cos),
            }
        )

    salted = exploded.map_batches(add_salt, batch_format="pyarrow")
    try:
        grouped = salted.groupby("_g", num_partitions=n_groups)
    except TypeError:
        grouped = salted.groupby("_g")
    cand = grouped.map_groups(pairs_in_block, batch_format="pyarrow").map_batches(
        _pair_tag, batch_format="pyarrow"
    )
    # the same pair found by several tables carries the same cosine —
    # distributed first-wins dedup on the pair id
    deduped = exact_dedup(cand, "pair")
    return deduped.map_batches(
        lambda t: t.drop_columns(["pair"]), batch_format="pyarrow"
    )


class IVFIndex:
    """IVF (inverted-file) ANN — the scale path beyond brute force.

    Coarse quantizer: deterministic k-means (seeded init from the sample,
    fixed iteration count — pure function of the sample, so every actor
    derives identical centroids). Vectors are bucketed by nearest centroid
    in a vectorized map_batches stage; a query scores only its ``nprobe``
    nearest buckets, turning a full corpus scan into a bucket-join.
    ``nprobe == n_centroids`` degrades gracefully to exact search.
    """

    def __init__(self, sample: np.ndarray, n_centroids: int = 16, iters: int = 10, seed: int = 42):
        x = _normalize(np.asarray(sample, dtype=np.float64))
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)
        c = x[np.sort(idx)].copy()
        for _ in range(iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                members = x[assign == j]
                if len(members):
                    m = members.mean(axis=0)
                    n = np.linalg.norm(m)
                    if n > 0:
                        c[j] = m / n
        self.centroids = c

    def assign(self, m: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(m) @ self.centroids.T, axis=1)

    def probe(self, queries: np.ndarray, nprobe: int) -> np.ndarray:
        sims = _normalize(queries) @ self.centroids.T
        return np.argsort(-sims, axis=1)[:, :nprobe]


class IVFBucketAssign:
    """map_batches actor: tag each vector with its IVF bucket (centroids are
    broadcast once per actor via the object store)."""

    def __init__(self, index_ref, vec_col: str = "embedding"):
        import ray

        self.index = ray.get(index_ref) if hasattr(index_ref, "hex") else index_ref
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[self.vec_col])
        return batch.append_column("ivf_bucket", pa.array(self.index.assign(m).astype(np.int32)))


def ivf_topk(ds, query_matrix: np.ndarray, query_ids: np.ndarray, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4, sample_size: int = 2048,
             vec_col: str = "embedding", key_col: str = "vec_id") -> pd.DataFrame:
    """Approximate distributed top-k: train the coarse quantizer on a seeded
    corpus sample (driver-side, tiny), bucket the corpus in one map_batches
    pass, then brute-force ONLY the probed buckets per query."""
    import ray

    sample = ds.limit(sample_size).to_pandas()[vec_col]
    index = IVFIndex(np.stack(sample.to_numpy()), n_centroids=n_centroids)
    index_ref = ray.put(index)
    bucketed = ds.map_batches(
        _rt.stateless(IVFBucketAssign, index_ref, vec_col=vec_col),
        batch_format="pyarrow",
    )
    probes = index.probe(np.asarray(query_matrix, dtype=np.float64), nprobe)
    wanted = sorted({int(b) for row in probes for b in row})
    pruned = bucketed.filter(expr=f"ivf_bucket in {wanted}")

    # (nq, n_centroids) bool probe matrix — vectorized bucket masking
    probe_mask = np.zeros((len(query_ids), len(index.centroids)), dtype=bool)
    for qi, row in enumerate(probes):
        probe_mask[qi, row] = True
    qref = ray.put({"query_id": query_ids, "matrix": query_matrix, "probe_mask": probe_mask})

    class ProbedTopK(BruteForceTopK):
        def __init__(self, queries_ref, k, vec_col, key_col):
            super().__init__(queries_ref, k, vec_col, key_col)
            import ray as _r

            q = _r.get(queries_ref) if hasattr(queries_ref, "hex") else queries_ref
            self.probe_mask = q["probe_mask"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(batch[self.vec_col]))
            sims = self.qmat @ m.T  # (nq, nb)
            # -inf where the vector's bucket was not probed by the query —
            # one boolean gather, no per-row Python
            allowed = self.probe_mask[:, np.asarray(batch["ivf_bucket"], dtype=np.int64)]
            sims = np.where(allowed, sims, -np.inf)
            return self._emit(sims, np.asarray(batch[self.key_col]))

    partials = pruned.map_batches(
        _rt.stateless(ProbedTopK, qref, k, vec_col, key_col),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return finalize_topk(partials.to_pandas(), k, key_col)


class PQCodebooks:
    """Product quantization — the MEMORY-scale ANN path: each normalized
    vector is split into ``m`` subspaces and each subvector replaced by
    the id of its nearest per-subspace k-means centroid, so the corpus
    lives as ``m`` bytes/vector (+ codebooks of ``m·ksub·dsub`` floats,
    broadcast once) instead of ``4d`` — at 10^10 vectors the difference
    between fitting in cluster RAM and not. Scores come from the ADC
    (asymmetric distance computation) trick: a per-query lookup table of
    subvector·centroid dot products, summed by code gather — no float
    reconstruction per corpus vector.

    Training is a pure function of the seeded sample (the ``IVFIndex``
    determinism discipline): per-subspace Lloyd with first-k seeded init,
    fixed iteration count — every actor derives identical codebooks."""

    def __init__(self, sample: np.ndarray, m: int = 8, ksub: int = 16,
                 iters: int = 10, seed: int = 42):
        x = _normalize(np.asarray(sample, dtype=np.float64))
        n, d = x.shape
        if d % m:
            raise ValueError(f"PQCodebooks: dim {d} not divisible by m={m}")
        if ksub > 256:
            raise ValueError("PQCodebooks: ksub > 256 breaks uint8 codes")
        self.m, self.dsub = m, d // m
        rng = np.random.default_rng(seed)
        books = []
        for s in range(m):
            xs = x[:, s * self.dsub:(s + 1) * self.dsub]
            k = min(ksub, n)
            idx = rng.choice(n, size=k, replace=False)
            c = xs[np.sort(idx)].copy()
            for _ in range(iters):
                d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d2, axis=1)
                for j in range(len(c)):
                    members = xs[assign == j]
                    if len(members):
                        c[j] = members.mean(axis=0)
            books.append(c)
        self.books = books  # m arrays of (ksub, dsub)

    def encode(self, mtx: np.ndarray) -> np.ndarray:
        """(n, d) normalized matrix → (n, m) uint8 codes."""
        n = len(mtx)
        codes = np.empty((n, self.m), dtype=np.uint8)
        for s, c in enumerate(self.books):
            xs = mtx[:, s * self.dsub:(s + 1) * self.dsub]
            d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
        return codes

    def lut(self, queries: np.ndarray) -> np.ndarray:
        """(nq, d) normalized queries → (nq, m, ksub) inner-product LUT."""
        nq = len(queries)
        out = np.empty((nq, self.m, len(self.books[0])), dtype=np.float64)
        for s, c in enumerate(self.books):
            qs = queries[:, s * self.dsub:(s + 1) * self.dsub]
            out[:, s, :] = qs @ c.T
        return out


class PQScanTopK(BruteForceTopK):
    """map_batches actor: encode the batch with the broadcast codebooks
    and score every query via LUT gather — ADC, never a reconstructed
    float matrix."""

    def __init__(self, queries_ref, k: int, vec_col: str = "embedding",
                 key_col: str = "vec_id"):
        super().__init__(queries_ref, k, vec_col, key_col)
        import ray as _r

        q = _r.get(queries_ref) if hasattr(queries_ref, "hex") else queries_ref
        self.pq: PQCodebooks = q["pq"]
        self.luts = self.pq.lut(self.qmat)  # (nq, m, ksub)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mtx = _normalize(_to_matrix(batch[self.vec_col]))
        codes = self.pq.encode(mtx)  # (nb, m)
        nq = len(self.qids)
        sims = np.zeros((nq, len(mtx)), dtype=np.float64)
        for s in range(self.pq.m):
            sims += self.luts[:, s, codes[:, s]]
        return self._emit(sims, np.asarray(batch[self.key_col]))


def pq_topk(ds, query_matrix: np.ndarray, query_ids: np.ndarray,
            k: int = 10, m: int = 8, ksub: int = 16,
            sample_size: int = 2048, vec_col: str = "embedding",
            key_col: str = "vec_id") -> pd.DataFrame:
    """Approximate distributed top-k via product quantization: train the
    codebooks on a seeded bounded sample (driver-side, tiny), then one
    streaming encode+ADC-scan pass with per-batch partial top-k. With
    ``ksub >= distinct subvectors`` the quantization is lossless and the
    result converges to :func:`ann_topk`'s exact ranking."""
    import ray

    sample = ds.limit(sample_size).to_pandas()[vec_col]
    pq_ = PQCodebooks(np.stack(sample.to_numpy()), m=m, ksub=ksub)
    qref = ray.put({"query_id": query_ids, "matrix": query_matrix,
                    "pq": pq_})
    partials = ds.map_batches(
        _rt.stateless(PQScanTopK, qref, k, vec_col, key_col),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return finalize_topk(partials.to_pandas(), k, key_col)
