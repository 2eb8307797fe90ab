"""Deduplication operators — exact and near-dup families.

Reference parity (SURVEY.md §2.8):
- exact first-seen dedup (``seen`` sets, ``mex/extractors/synopse/transform.py:286-289``,
  ``synopse/extract.py:107-115``)    → :func:`exact_dedup`
- drop-ALL-duplicates (row kept iff its key count == 1,
  ``mex/extractors/ff_projects/filter.py:144-157``) → :func:`drop_all_duplicates`
- uniqueness assertion (fail/flag when a person has >1 consent,
  ``mex/extractors/publisher/filter.py:40-52``)     → :func:`uniqueness_violations`

Training-data near-dup additions (no analog in the reference): MinHash+LSH,
SimHash, and n-gram Jaccard verification, all as vectorized batch stages +
one groupby each. Design for scale: per-batch numpy minhashing → explode to
(band, band_hash) rows → ONE shuffle on the LSH bucket → verify candidate
pairs inside groups; never a driver-side O(n²) loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.hashing import _mix, hash_string_array

# ---------------------------------------------------------------------------
# exact dedup family
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, column: str, out: str = "content_hash") -> pa.Table:
    """Vectorized uint64 content hash (hot path of exact dedup)."""
    h = hash_string_array(batch[column])
    return batch.append_column(out, pa.array(h.astype(np.int64)))


def exact_dedup(ds, key: str, order_by: str | None = None, batch_format: str = "pandas"):
    """Keep the first row per key (hash-partition + per-group head — the
    distributed form of the reference's first-seen ``seen`` set).
    ``order_by`` defines "first" deterministically (unordered otherwise)."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        if order_by:
            g = g.sort_values(order_by, kind="mergesort")
        return g.head(1)

    return ds.groupby(key).map_groups(first, batch_format=batch_format)


def drop_all_duplicates(ds, key: str):
    """ff_projects semantics: a key that appears more than once is removed
    ENTIRELY (not first-kept)."""

    def only_singletons(g: pd.DataFrame) -> pd.DataFrame:
        return g if len(g) == 1 else g.iloc[0:0]

    return ds.groupby(key).map_groups(only_singletons, batch_format="pandas")


def uniqueness_violations(ds, key: str):
    """publisher-consent semantics: emit one row per key with >1 occurrence
    (the validation stream; the caller decides to raise or route)."""

    def viol(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) <= 1:
            return pd.DataFrame({key: pd.Series([], dtype=g[key].dtype), "n": pd.Series([], dtype="int64")})
        return pd.DataFrame({key: [g[key].iloc[0]], "n": [len(g)]})

    return ds.groupby(key).map_groups(viol, batch_format="pandas")


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(texts: pa.ChunkedArray | pa.Array, k: int) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hash of every k-word shingle of every doc (flat), plus row
    offsets. Vectorized: one split_pattern + one rolling combine."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
    flat = words.flatten()
    word_h = hash_string_array(flat)
    offsets = np.asarray(words.offsets, dtype=np.int64)
    lens = offsets[1:] - offsets[:-1]
    n_sh = np.maximum(lens - (k - 1), np.where(lens > 0, 1, 0))  # short docs → 1 shingle
    # rolling combine of k word hashes: h_i ^ rot(h_{i+1}) ^ ... (order-aware mix)
    comb = word_h.copy()
    with np.errstate(over="ignore"):
        for j in range(1, k):
            shifted = np.empty_like(word_h)
            shifted[:-j] = word_h[j:]
            shifted[-j:] = 0
            comb = comb * np.uint64(1099511628211) + shifted
    sh_offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(n_sh, out=sh_offsets[1:])
    starts = offsets[:-1]
    local = np.arange(int(sh_offsets[-1]), dtype=np.int64) - np.repeat(sh_offsets[:-1], n_sh)
    flat_idx = np.repeat(starts, n_sh) + local
    return _mix(comb[flat_idx]), sh_offsets


_MINHASH_A: np.ndarray | None = None
_MINHASH_B: np.ndarray | None = None


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    global _MINHASH_A, _MINHASH_B
    if _MINHASH_A is None or len(_MINHASH_A) < num_perm:
        rng = np.random.default_rng(42)
        _MINHASH_A = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64) | np.uint64(1)
        _MINHASH_B = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return _MINHASH_A[:num_perm], _MINHASH_B[:num_perm]


def minhash_signatures(
    texts: pa.ChunkedArray | pa.Array, k: int = 3, num_perm: int = 64
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signature matrix, vectorized."""
    sh, offsets = _shingle_hashes(texts, k)
    a, b = _minhash_params(num_perm)
    n = len(offsets) - 1
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # permuted[i, p] = a[p]*sh[i] + b[p]; reduce min per row segment
        permuted = sh[:, None] * a[None, :] + b[None, :]
    np.minimum.at(sig, np.repeat(np.arange(n), np.diff(offsets)), permuted)
    return sig


class MinHashLSH:
    """map_batches actor stage: text → exploded (band, band_hash, key) rows.

    ``groupby(["band", "band_hash"])`` downstream buckets candidate
    duplicates; same-bucket pairs are verified with true shingle Jaccard.
    Bands/rows trade recall vs. precision (b bands of r rows ⇒ s-curve at
    (1/b)^(1/r)).
    """

    def __init__(self, text_col: str, key_col: str, k: int = 3, num_perm: int = 64, bands: int = 16):
        assert num_perm % bands == 0
        self.text_col, self.key_col = text_col, key_col
        self.k, self.num_perm, self.bands = k, num_perm, bands
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch[self.text_col], self.k, self.num_perm)
        n = sig.shape[0]
        band_view = sig.reshape(n, self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            bh = band_view[:, :, 0].copy()
            for j in range(1, self.rows_per_band):
                bh = bh * np.uint64(1099511628211) ^ band_view[:, :, j]
        keys = batch[self.key_col]
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
                self.key_col: pa.array(np.repeat(np.asarray(keys), self.bands)),
            }
        )


def minhash_candidate_pairs(ds, text_col: str, key_col: str, k: int = 3,
                            num_perm: int = 64, bands: int = 16):
    """Full MinHash-LSH candidate generation: explode bands → ONE shuffle on
    the bucket → distinct candidate pairs (a<b) per bucket."""
    exploded = ds.map_batches(
        MinHashLSH,
        fn_constructor_args=(text_col, key_col, k, num_perm, bands),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    # ONE coarse group per band (bands are few) — inside, a C-speed pandas
    # groupby over band_hash emits pairs per bucket. A per-(band,band_hash)
    # map_groups would pay Ray's per-group dispatch for every near-singleton
    # bucket (tens of thousands at corpus scale).
    def pairs_in_band(g: pd.DataFrame) -> pd.DataFrame:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        sizes = g.groupby("band_hash")[key_col].nunique()
        hot = set(sizes[sizes >= 2].index)
        for bh, sub in g[g["band_hash"].isin(hot)].groupby("band_hash"):
            ks = pd.unique(np.sort(sub[key_col].to_numpy()))
            ia, ib = np.triu_indices(len(ks), 1)
            out_a.append(ks[ia])
            out_b.append(ks[ib])
        if not out_a:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=g[key_col].dtype),
                 "b": pd.Series([], dtype=g[key_col].dtype)}
            )
        return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})

    cand = exploded.groupby("band").map_groups(pairs_in_band, batch_format="pandas")
    # candidate pairs are tiny relative to the corpus (LSH's whole point);
    # cross-band duplicates are dropped on the driver
    import ray.data

    df = cand.to_pandas().drop_duplicates(["a", "b"]).reset_index(drop=True)
    df["pair"] = df["a"].astype(str) + "|" + df["b"].astype(str)
    return ray.data.from_pandas(df)


def jaccard_verify_pairs(pairs_df: pd.DataFrame, texts_by_key: dict, k: int = 3,
                         threshold: float = 0.8) -> pd.DataFrame:
    """Verify candidate pairs with true k-shingle Jaccard (small candidate
    sets: runs inside map_groups / driver; texts_by_key is a broadcast dict)."""

    def shingles(text: str) -> set:
        ws = text.lower().split()
        if len(ws) < k:
            return {" ".join(ws)} if ws else set()
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    out = []
    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        sa, sb = shingles(texts_by_key[a]), shingles(texts_by_key[b])
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out.append((a, b, j))
    return pd.DataFrame(out, columns=["a", "b", "jaccard"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(texts: pa.ChunkedArray | pa.Array, k: int = 2) -> np.ndarray:
    """64-bit SimHash per doc over k-word shingles, vectorized with bit-plane
    popcount accumulation."""
    sh, offsets = _shingle_hashes(texts, k)
    n = len(offsets) - 1
    rows = np.repeat(np.arange(n), np.diff(offsets))
    acc = np.zeros((n, 64), dtype=np.int64)
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    np.add.at(acc, rows, 2 * bits - 1)
    out = (acc > 0).astype(np.uint64)
    return (out << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)


def hamming_candidates(sim: np.ndarray, keys: np.ndarray, max_dist: int = 3,
                       n_tables: int = 4) -> pd.DataFrame:
    """Near-dup candidates by banding the 64-bit simhash into ``n_tables``
    bands of 64/n_tables bits. Pigeonhole guarantee: docs within Hamming
    distance d < n_tables ALWAYS share ≥1 band; beyond that recall decays,
    so pick n_tables > the max_dist you care about (more tables = more
    candidates to verify). Returns verified pairs with hamming <= max_dist."""
    shift = 64 // n_tables
    buckets: dict[tuple[int, int], list[int]] = {}
    for t in range(n_tables):
        band = ((sim >> np.uint64(t * shift)) & np.uint64((1 << shift) - 1)).astype(np.int64)
        for i, b in enumerate(band):
            buckets.setdefault((t, int(b)), []).append(i)
    seen, out = set(), []
    for members in buckets.values():
        if len(members) < 2:
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                if (i, j) in seen:
                    continue
                seen.add((i, j))
                d = int(bin(int(sim[i]) ^ int(sim[j])).count("1"))
                if d <= max_dist:
                    out.append((keys[i], keys[j], d))
    return pd.DataFrame(out, columns=["a", "b", "hamming"])
