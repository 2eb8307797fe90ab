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
from mex_extractors_ray.stages import joins

from .. import runtime as _rt

# ---------------------------------------------------------------------------
# exact dedup family
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, column: str, out: str = "content_hash") -> pa.Table:
    """Vectorized uint64 content hash (hot path of exact dedup)."""
    h = hash_string_array(batch[column])
    return batch.append_column(out, pa.array(h.astype(np.int64)))


def _run_starts(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Bool mask over a SORTED column: True where a new key run starts.

    Null-safe: ``pc.not_equal(null, x)`` is null, which would coerce to
    False and silently merge a null-key run into its neighbor; nulls are a
    run of their own (Arrow sorts group nulls together, so null-vs-null
    adjacency stays one run — fill_null(True) only fires at the
    null/non-null boundary)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=bool)
    hi, lo = col.slice(1), col.slice(0, n - 1)
    neq = pc.not_equal(hi, lo)
    if col.null_count:
        # null vs non-null = new run; null vs null = same run
        both_null = pc.and_(pc.is_null(hi), pc.is_null(lo))
        neq = pc.if_else(both_null, False, pc.fill_null(neq, True))
    arr = neq.to_numpy(zero_copy_only=False)
    return np.append(True, np.asarray(arr, dtype=bool))


def _keyed_blocks(ds, key: str, block_fn, num_partitions: int = 64):
    """Coarse hash shuffle on ``key`` then ONE vectorized call per block —
    the scale-safe form of per-key grouping: Ray dispatches ``num_partitions``
    group calls, not one per key (millions of keys ⇒ millions of dispatches
    with a naive ``groupby(key).map_groups``). All rows of a key land in the
    same block, so any per-key reduction is exact."""
    from mex_extractors_ray.hashing import assign_partitions, shard_tags

    def tag(t: pa.Table) -> pa.Table:
        # coarse partition routed through the bijective shard labels: under
        # hash shuffle every aggregator bucket is non-empty (schema-stable
        # blocks); under sort shuffle the labels are just as good a key
        return t.append_column(
            "_kpart", shard_tags(assign_partitions(t[key], num_partitions), num_partitions)
        )

    def run(g: pa.Table) -> pa.Table:
        return block_fn(g.drop_columns(["_kpart"]))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    try:
        grouped = tagged.groupby("_kpart", num_partitions=num_partitions)
    except TypeError:
        grouped = tagged.groupby("_kpart")
    return grouped.map_groups(run, batch_format="pyarrow")


def exact_dedup(ds, key: str, order_by: str | list[str] | None = None,
                num_partitions: int = 64):
    """Keep the first row per key — the distributed form of the reference's
    first-seen ``seen`` set. ``order_by`` defines "first" deterministically
    (unordered otherwise). One coarse shuffle; inside each block a single
    Arrow sort + run-boundary mask (no per-key Python dispatch)."""
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by or [])
    sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_cols]

    def first_per_key(g: pa.Table) -> pa.Table:
        t = g.sort_by(sort_keys)
        return t.filter(pa.array(_run_starts(t[key])))

    return _keyed_blocks(ds, key, first_per_key, num_partitions)


def drop_all_duplicates(ds, key: str, num_partitions: int = 64):
    """ff_projects semantics (``mex/extractors/ff_projects/filter.py:144-157``):
    a key that appears more than once is removed ENTIRELY (not first-kept).
    Vectorized: sort block by key, keep rows whose run length == 1."""

    def singletons(g: pa.Table) -> pa.Table:
        t = g.sort_by([(key, "ascending")])
        starts = _run_starts(t[key])
        if len(starts) == 0:
            return t
        idx = np.flatnonzero(starts)
        run_len = np.diff(np.append(idx, len(starts)))
        keep = np.repeat(run_len == 1, run_len)
        return t.filter(pa.array(keep))

    return _keyed_blocks(ds, key, singletons, num_partitions)


def uniqueness_violations(ds, key: str, num_partitions: int = 64):
    """publisher-consent semantics (``mex/extractors/publisher/filter.py:40-52``):
    emit one (key, n) row per key with >1 occurrence (the validation stream;
    the caller decides to raise or route)."""

    def viol(g: pa.Table) -> pa.Table:
        t = g.sort_by([(key, "ascending")])
        starts = _run_starts(t[key])
        empty = pa.table({key: pa.array([], t[key].type), "n": pa.array([], pa.int64())})
        if len(starts) == 0:
            return empty
        idx = np.flatnonzero(starts)
        run_len = np.diff(np.append(idx, len(starts)))
        bad = run_len > 1
        if not bad.any():
            return empty
        keys_arr = t[key].combine_chunks().take(pa.array(idx[bad]))
        return pa.table({key: keys_arr, "n": pa.array(run_len[bad].astype(np.int64))})

    return _keyed_blocks(ds, key, viol, num_partitions)


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(texts: pa.ChunkedArray | pa.Array, k: int,
                    lower: bool = True, split: str = r"\s+") -> tuple[np.ndarray, np.ndarray]:
    """uint64 hash of every k-word shingle of every doc (flat), plus row
    offsets. Vectorized: one split_pattern + one rolling combine.
    ``lower=False, split=" "`` gives exact case-sensitive single-space
    tokenization (the ngram-overlap oracle's semantics)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if lower:
        texts = pc.utf8_lower(texts)
    if split == r"\s+":
        words = pc.split_pattern_regex(texts, split)
    else:
        words = pc.split_pattern(texts, split)
    flat = words.flatten()
    word_h = hash_string_array(flat)
    offsets = np.asarray(words.offsets, dtype=np.int64)
    if len(offsets) and offsets[0]:
        offsets = offsets - offsets[0]  # sliced list array: rebase to flat
    lens = offsets[1:] - offsets[:-1]
    n_sh = np.maximum(lens - (k - 1), np.where(lens > 0, 1, 0))  # short docs → 1 shingle
    # rolling combine of k word hashes: h_i ^ rot(h_{i+1}) ^ ... (order-aware mix)
    ends = np.repeat(offsets[1:], lens)  # each flat word's own doc end
    idx = np.arange(len(word_h), dtype=np.int64)
    comb = word_h.copy()
    with np.errstate(over="ignore"):
        for j in range(1, k):
            shifted = np.empty_like(word_h)
            shifted[:-j] = word_h[j:]
            shifted[-j:] = 0
            # docs shorter than k words keep ONE shingle (n_sh clamps to 1);
            # zero-pad past each doc's end so that shingle is a function of
            # the doc alone — never of whichever doc follows in the batch
            shifted[idx + j >= ends] = 0
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
    with np.errstate(over="ignore"):
        # permuted[i, p] = a[p]*sh[i] + b[p]; reduce min per row segment
        permuted = sh[:, None] * a[None, :] + b[None, :]
    if len(permuted) == 0:
        return np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    # segmented min via reduceat (buffered; ~2x the unbuffered minimum.at).
    # reduceat quirks: an empty segment (offsets[i]==offsets[i+1]) returns
    # the NEXT segment's first row, and a start index == len raises — clip
    # the starts and patch empty docs to the identity afterwards.
    starts = np.minimum(offsets[:-1], len(permuted) - 1)
    sig = np.minimum.reduceat(permuted, starts, axis=0)
    empty = np.diff(offsets) == 0
    if empty.any():
        sig[empty] = np.iinfo(np.uint64).max
    return sig


class MinHashLSH:
    """map_batches actor stage: text → exploded (band, band_hash, key) rows.

    Downstream, :func:`minhash_candidate_pairs` shuffles on the SALTED
    bucket ``(band, band_hash % salt)`` and recovers exact buckets in-block;
    same-bucket pairs are then verified with true shingle Jaccard. Bands/rows
    trade recall vs. precision (b bands of r rows ⇒ s-curve at (1/b)^(1/r)).
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


from mex_extractors_ray.runtime import stateless as _stateless  # noqa: E402


def _pairs_from_buckets(bucket_cols: list[np.ndarray], keys: np.ndarray,
                        payload: np.ndarray | None = None):
    """Emit all unique-key pairs (a<b) within each exact bucket.

    Inputs must be PRE-SORTED by (*bucket_cols, key). Runs are found with
    one boundary scan; only buckets with ≥2 distinct keys pay any per-run
    work (the numpy ``triu_indices`` pair expansion). Returns (a, b) and,
    when ``payload`` is given, the payload of a and b (first occurrence per
    key)."""
    n = len(keys)
    if n == 0:
        e = keys[:0]
        return (e, e, None, None) if payload is not None else (e, e)
    new_bucket = np.zeros(n, dtype=bool)
    new_bucket[0] = True
    for c in bucket_cols:
        new_bucket[1:] |= c[1:] != c[:-1]
    # distinct (bucket, key) representatives
    new_key = new_bucket.copy()
    new_key[1:] |= keys[1:] != keys[:-1]
    rep = np.flatnonzero(new_key)  # first row of each distinct key in bucket
    rep_bucket_start = np.cumsum(new_bucket)[rep] - 1  # bucket ordinal per rep
    # run lengths in distinct-key space
    starts = np.flatnonzero(np.append(True, rep_bucket_start[1:] != rep_bucket_start[:-1]))
    run_len = np.diff(np.append(starts, len(rep)))
    out_a, out_b, pay_a, pay_b = [], [], [], []
    for s, m in zip(starts[run_len >= 2], run_len[run_len >= 2]):
        rows = rep[s : s + m]
        ks = keys[rows]
        ia, ib = np.triu_indices(m, 1)
        out_a.append(ks[ia])
        out_b.append(ks[ib])
        if payload is not None:
            pv = payload[rows]
            pay_a.append(pv[ia])
            pay_b.append(pv[ib])
    if not out_a:
        e = keys[:0]
        return (e, e, None, None) if payload is not None else (e, e)
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    if payload is not None:
        return a, b, np.concatenate(pay_a), np.concatenate(pay_b)
    return a, b


def _pair_tag(t: pa.Table) -> pa.Table:
    """Canonical string pair id for distributed pair dedup."""
    pair = pc.binary_join_element_wise(
        pc.cast(t["a"], pa.string()), pc.cast(t["b"], pa.string()), "|"
    )
    return t.append_column("pair", pair)


def minhash_candidate_pairs(ds, text_col: str, key_col: str, k: int = 3,
                            num_perm: int = 64, bands: int = 16, salt: int = 8):
    """Full MinHash-LSH candidate generation: explode bands → ONE shuffle on
    the salted bucket → vectorized pair emission per block → distributed
    pair dedup. Nothing corpus-sized ever reaches the driver.

    The shuffle groups on ``(band, band_hash % salt)`` — parallelism is
    bands×salt (not just bands), and each block holds ≈ corpus/(bands×salt)
    exploded rows, so block size stays bounded as the corpus grows (raise
    ``salt`` with corpus size). Exact buckets are recovered inside the block
    by one sort + boundary scan."""
    exploded = ds.map_batches(
        _stateless(MinHashLSH, text_col, key_col, k, num_perm, bands),
        batch_format="pyarrow",
    )

    n_groups = bands * salt

    def add_salt(t: pa.Table) -> pa.Table:
        g = np.asarray(t["band"], dtype=np.int64) * salt + (
            np.asarray(t["band_hash"], dtype=np.int64) % salt
        )
        from mex_extractors_ray.hashing import shard_tags

        return t.append_column("_g", shard_tags(g, n_groups))

    def pairs_in_block(g: pa.Table) -> pa.Table:
        t = g.sort_by(
            [("band", "ascending"), ("band_hash", "ascending"), (key_col, "ascending")]
        )
        a, b = _pairs_from_buckets(
            [np.asarray(t["band"], dtype=np.int64), np.asarray(t["band_hash"], dtype=np.int64)],
            np.asarray(t[key_col]),
        )
        kt = t[key_col].type
        return pa.table({"a": pa.array(a, kt), "b": pa.array(b, kt)})

    salted = exploded.map_batches(add_salt, batch_format="pyarrow")
    try:
        grouped = salted.groupby("_g", num_partitions=n_groups)
    except TypeError:
        grouped = salted.groupby("_g")
    cand = grouped.map_groups(pairs_in_block, batch_format="pyarrow").map_batches(
        _pair_tag, batch_format="pyarrow"
    )
    # a pair found by several bands is deduped DISTRIBUTED (coarse hash
    # shuffle on the pair id + boundary mask), not with a driver to_pandas
    return exact_dedup(cand, "pair")


def _distinct_per_row(rows: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    order = np.lexsort((vals, rows))
    r, v = rows[order], vals[order]
    if len(r) == 0:
        return r, v
    keep = np.append(True, (r[1:] != r[:-1]) | (v[1:] != v[:-1]))
    return r[keep], v[keep]


def jaccard_rows(col_a, col_b, k: int = 3) -> np.ndarray:
    """Vectorized per-row k-shingle Jaccard between two aligned text columns
    (shingle sets as uint64 hashes; intersection/union via one lexsort +
    boundary scan — no per-row Python sets). Rows with an empty side get 0."""
    ha, oa = _shingle_hashes(col_a, k)
    hb, ob = _shingle_hashes(col_b, k)
    n = len(oa) - 1
    ra, ha = _distinct_per_row(np.repeat(np.arange(n), np.diff(oa)), ha)
    rb, hb = _distinct_per_row(np.repeat(np.arange(n), np.diff(ob)), hb)
    rows = np.concatenate([ra, rb])
    vals = np.concatenate([ha, hb])
    if len(rows) == 0:
        return np.zeros(n)
    order = np.lexsort((vals, rows))
    rows, vals = rows[order], vals[order]
    dup = (rows[1:] == rows[:-1]) & (vals[1:] == vals[:-1])  # shingle in both sides
    inter = np.bincount(rows[1:][dup], minlength=n).astype(np.float64)
    union = np.bincount(rows[np.append(True, ~dup)], minlength=n).astype(np.float64)
    return inter / np.maximum(union, 1.0)


# auto-select ceiling for the verify broadcast: above this many DISTINCT
# candidate docs the pruned text table stops being a credibly-small
# broadcast side (100k docs ≈ 50 MB at the corpus' ~500 B/doc; the
# switchover is deliberately conservative — the bucketed path is only
# ~2 extra small shuffles, while an oversized broadcast is a driver OOM).
# Both paths are hash-checked (BASELINE.md "broadcast vs bucketed" A/B).
JACCARD_BROADCAST_MAX_DOCS = 100_000


def jaccard_verify_distributed(cand_ds, docs_ds, text_col: str, key_col: str,
                               k: int = 3, threshold: float = 0.8,
                               num_buckets: int = 32,
                               broadcast: bool | None = None):
    """Distributed candidate verification: candidates ⋈ texts → vectorized
    per-batch Jaccard. The corpus never funnels through the driver; only
    candidate-proportional state does (LSH's whole point is that candidates
    are tiny relative to the corpus).

    ``broadcast=None`` (default) AUTO-SELECTS from the measured build side:
    an upper bound on the candidate-pruned text table's rows —
    ``min(2 * pairs, corpus rows)`` — against
    ``JACCARD_BROADCAST_MAX_DOCS``. At 100 TB an LSH candidate set can
    itself outgrow one object, and no default should quietly assume it
    doesn't; conversely a dense candidate set over a small corpus still
    broadcasts only the corpus's texts. ``True``: the candidate-pruned text table is pulled once,
    ``ray.put``, and attached per batch with two ``pc.index_in`` probes —
    ZERO shuffles (right whenever candidate texts fit one object).
    ``False``: the scale path — two bucketed co-partition joins, nothing
    leaves the cluster.

    ``cand_ds`` needs columns (a, b); extra columns pass through."""
    import pyarrow as _pa

    # candidates are small by design (LSH's point); pin them once so the
    # key-list read and the joins don't re-execute the LSH pipeline
    cand_ds = cand_ds.materialize()
    if cand_ds.count() == 0:
        # zero candidates: an empty Dataset's pandas frame has no columns,
        # so build the (a, b, jaccard) result schema explicitly
        import ray.data as _rd

        return _rd.from_arrow(_pa.table({
            "a": _pa.array([], _pa.int64()),
            "b": _pa.array([], _pa.int64()),
            "jaccard": _pa.array([], _pa.float64()),
        }))
    n_cand = cand_ds.count()
    if broadcast is None:
        # the broadcast build side is the candidate-pruned TEXT table:
        # bounded by 2 docs per pair AND by the corpus itself (a dense
        # candidate set over a small corpus still broadcasts only the
        # corpus's texts) — both bounds are known BEFORE anything is
        # pulled to the driver (pair count + dataset count, which for a
        # plain parquet read answers from footer metadata)
        bound = 2 * n_cand
        if bound > JACCARD_BROADCAST_MAX_DOCS:
            bound = min(bound, docs_ds.count())
        broadcast = bound <= JACCARD_BROADCAST_MAX_DOCS

    def verify(t: _pa.Table) -> _pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["_text_a", "_text_b"]).append_column("jaccard", _pa.array([], _pa.float64()))
        j = jaccard_rows(t["_text_a"].combine_chunks(), t["_text_b"].combine_chunks(), k)
        out = t.drop_columns(["_text_a", "_text_b"]).append_column("jaccard", _pa.array(j))
        return out.filter(_pa.array(j >= threshold))

    if broadcast:
        # driver pull is bounded by the auto-select ceiling above
        keys_df = cand_ds.select_columns(["a", "b"]).to_pandas()
        needed = pd.unique(pd.concat([keys_df["a"], keys_df["b"]],
                                     ignore_index=True))
        texts = joins.semi_join(
            docs_ds.select_columns([key_col, text_col]), key_col, list(needed))
        tt = texts.to_pandas()  # ∝ candidates, NOT the corpus
        with_a = joins.broadcast_lookup(
            cand_ds, tt[key_col].to_numpy(), tt[text_col].to_numpy(), "a", "_text_a"
        )
        with_b = joins.broadcast_lookup(
            with_a, tt[key_col].to_numpy(), tt[text_col].to_numpy(), "b", "_text_b"
        )
        return with_b.map_batches(verify, batch_format="pyarrow")

    # scale path: NOTHING candidate-shaped touches the driver. Prune the
    # corpus to candidate docs with an exact Bloom semi join (distributed
    # bitmap build + fixed-size broadcast), then two bucketed co-partition
    # joins attach the texts.
    from mex_extractors_ray.stages import bloom as _bloom

    def _keys(side: str):
        def _k(t: _pa.Table) -> _pa.Table:
            return _pa.table({key_col: t[side]})

        return _k

    cand_keys = cand_ds.map_batches(_keys("a"), batch_format="pyarrow").union(
        cand_ds.map_batches(_keys("b"), batch_format="pyarrow"))
    texts = _bloom.bloom_semi_join(
        docs_ds.select_columns([key_col, text_col]), cand_keys, on=key_col,
        num_buckets=num_buckets,
    ).materialize()

    def rename(side: str):
        def _r(t: _pa.Table) -> _pa.Table:
            return t.rename_columns([side, f"_text_{side}"])

        return _r

    with_a = joins.bucketed_join(
        cand_ds, texts.map_batches(rename("a"), batch_format="pyarrow"),
        on="a", num_buckets=num_buckets,
    )
    with_b = joins.bucketed_join(
        with_a, texts.map_batches(rename("b"), batch_format="pyarrow"),
        on="b", num_buckets=num_buckets,
    )
    return with_b.map_batches(verify, batch_format="pyarrow")


def jaccard_verify_pairs(pairs_df: pd.DataFrame, texts_by_key: dict, k: int = 3,
                         threshold: float = 0.8) -> pd.DataFrame:
    """Verify candidate pairs with true k-shingle Jaccard — SMALL-SCALE
    driver-side helper (tests / ad-hoc); the pipeline path is
    :func:`jaccard_verify_distributed`."""

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


def ngram_overlap_pairs(ds, text_col: str, key_col: str, k: int = 3,
                        min_common: int = 5, num_partitions: int = 64,
                        lower: bool = False, split: str = " ",
                        max_doc_freq: int | None = None):
    """n-gram (word k-gram) overlap pairs, fully distributed: explode each
    doc's DISTINCT shingle hashes → coarse shuffle on the shingle → pairs
    per shingle bucket → coarse shuffle on the pair id → run-length count =
    exact intersection size → filter ≥ ``min_common``.

    ``max_doc_freq`` drops shingles present in more than that many docs of a
    block (the scale guard: a stop-phrase shared by 10^6 docs would emit
    10^12 pairs; real corpora prune or idf-weight frequent shingles). Leave
    None for exact semantics (the oracle-checked mode)."""

    def explode(t: pa.Table) -> pa.Table:
        h, offsets = _shingle_hashes(t[text_col], k, lower=lower, split=split)
        rows = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        rows, h = _distinct_per_row(rows, h)
        keys = np.asarray(t[key_col])
        return pa.table(
            {"sh": pa.array(h.view(np.int64)), key_col: pa.array(keys[rows], t[key_col].type)}
        )

    ex = ds.map_batches(explode, batch_format="pyarrow")

    def pairs_per_shingle(g: pa.Table) -> pa.Table:
        t = g.sort_by([("sh", "ascending"), (key_col, "ascending")])
        sh = np.asarray(t["sh"], dtype=np.int64)
        keys = np.asarray(t[key_col])
        if max_doc_freq is not None and len(sh):
            starts = _run_starts(t["sh"])
            idx = np.flatnonzero(starts)
            run_len = np.diff(np.append(idx, len(sh)))
            keep = np.repeat(run_len <= max_doc_freq, run_len)
            sh, keys = sh[keep], keys[keep]
        a, b = _pairs_from_buckets([sh], keys)
        kt = t[key_col].type
        return pa.table({"a": pa.array(a, kt), "b": pa.array(b, kt)})

    cand = _keyed_blocks(ex, "sh", pairs_per_shingle, num_partitions).map_batches(
        _pair_tag, batch_format="pyarrow"
    )

    def count_pairs(g: pa.Table) -> pa.Table:
        t = g.sort_by([("pair", "ascending")])
        starts = _run_starts(t["pair"])
        kt = t["a"].type
        if len(starts) == 0:
            return pa.table({"a": pa.array([], kt), "b": pa.array([], kt),
                             "n_common": pa.array([], pa.int64())})
        idx = np.flatnonzero(starts)
        run_len = np.diff(np.append(idx, len(starts)))
        keep = run_len >= min_common
        take = pa.array(idx[keep])
        return pa.table(
            {
                "a": t["a"].combine_chunks().take(take),
                "b": t["b"].combine_chunks().take(take),
                "n_common": pa.array(run_len[keep].astype(np.int64)),
            }
        )

    return _keyed_blocks(cand, "pair", count_pairs, num_partitions)


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


class SimHashBands:
    """map_batches stage: text → exploded (table, band, key, simhash) rows.

    Banding the 64-bit simhash into ``n_tables`` bands of 64/n_tables bits
    gives the pigeonhole guarantee: docs within Hamming distance
    d < n_tables ALWAYS share ≥1 band. One downstream shuffle on the salted
    band bucket finds candidates; Hamming is verified vectorized in-block.
    """

    def __init__(self, text_col: str, key_col: str, k: int = 2, n_tables: int = 4):
        self.text_col, self.key_col = text_col, key_col
        self.k, self.n_tables = k, n_tables
        self.shift = 64 // n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        sim = simhash64(batch[self.text_col], self.k)
        n = len(sim)
        t_idx = np.arange(self.n_tables, dtype=np.uint64)
        bands = (sim[:, None] >> (t_idx * np.uint64(self.shift))[None, :]) & np.uint64(
            (1 << self.shift) - 1
        )
        keys = np.asarray(batch[self.key_col])
        return pa.table(
            {
                "t": pa.array(np.tile(t_idx.astype(np.int32), n)),
                "band": pa.array(bands.reshape(-1).astype(np.int64)),
                self.key_col: pa.array(np.repeat(keys, self.n_tables), batch[self.key_col].type),
                "sim": pa.array(np.repeat(sim, self.n_tables).view(np.int64)),
            }
        )


def _popcount64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(np.ascontiguousarray(x).view(np.uint8)).reshape(len(x), 8 * x.itemsize).sum(axis=1)


def simhash_near_duplicates(ds, text_col: str, key_col: str, k: int = 2,
                            max_dist: int = 3, n_tables: int = 4, salt: int = 8):
    """Distributed SimHash near-dup pipeline: map_batches simhash+banding →
    ONE shuffle on the salted (t, band) bucket → vectorized in-block Hamming
    verify → distributed pair dedup. Returns a Dataset of (a, b, hamming).
    Nothing corpus-sized touches the driver."""
    exploded = ds.map_batches(
        _stateless(SimHashBands, text_col, key_col, k, n_tables),
        batch_format="pyarrow",
    )

    n_groups = n_tables * salt

    def add_salt(t: pa.Table) -> pa.Table:
        g = np.asarray(t["t"], dtype=np.int64) * salt + (
            np.asarray(t["band"], dtype=np.int64) % salt
        )
        from mex_extractors_ray.hashing import shard_tags

        return t.append_column("_g", shard_tags(g, n_groups))

    def pairs_in_block(g: pa.Table) -> pa.Table:
        t = g.sort_by([("t", "ascending"), ("band", "ascending"), (key_col, "ascending")])
        a, b, sa, sb = _pairs_from_buckets(
            [np.asarray(t["t"], dtype=np.int64), np.asarray(t["band"], dtype=np.int64)],
            np.asarray(t[key_col]),
            payload=np.asarray(t["sim"], dtype=np.int64),
        )
        kt = t[key_col].type
        if sa is None or len(a) == 0:
            return pa.table({"a": pa.array([], kt), "b": pa.array([], kt),
                             "hamming": pa.array([], pa.int64())})
        d = _popcount64(sa.view(np.uint64) ^ sb.view(np.uint64)).astype(np.int64)
        keep = d <= max_dist
        return pa.table({"a": pa.array(a[keep], kt), "b": pa.array(b[keep], kt),
                         "hamming": pa.array(d[keep])})

    salted = exploded.map_batches(add_salt, batch_format="pyarrow")
    try:
        grouped = salted.groupby("_g", num_partitions=n_groups)
    except TypeError:
        grouped = salted.groupby("_g")
    cand = grouped.map_groups(pairs_in_block, batch_format="pyarrow").map_batches(
        _pair_tag, batch_format="pyarrow"
    )
    # same pair from several tables carries the same hamming — distributed
    # first-wins dedup on the pair id
    return exact_dedup(cand, "pair")


def simhash_sql(table: str, id_col: str = "doc_id", text_col: str = "text",
                k: int = 2) -> str:
    """DuckDB mirror of :func:`simhash64`, bit-for-bit (the
    ``string_hash_sql`` / ``fingerprint_sql`` discipline): regex word split
    + lowercase, per-word polynomial byte hash, the k-word rolling FNV
    combine with doc-boundary zero padding, splitmix finalizer, signed bit
    votes (+1/−1 per shingle occurrence — duplicates COUNT, no dedup), and
    the vote>0 bit assembly. Yields ``(doc_id, simhash UBIGINT)`` per row
    of ``table`` (any table expression). ASCII-only contract, as
    :func:`text.string_hash_sql`."""
    from mex_extractors_ray.stages.text import (
        _M64,
        _mulmod_c_sql,
        splitmix_sql,
        string_hash_sql,
    )

    fnv = 1099511628211
    word_h = string_hash_sql("(SELECT word AS kid, word AS k FROM sh_vocab)",
                             "kid", "k")
    # fold the k-word rolling combine: c_j = c_{j-1}*FNV + wordhash[i+j]
    # (0 past the doc end — the kernel's boundary zero padding)
    folds = []
    prev = "c0"
    for j in range(1, k):
        folds.append(f"""
sh_c{j} AS (
  SELECT a.doc_id, a.i, a.nw,
         CAST((CAST({_mulmod_c_sql(f'a.{prev}', fnv)} AS HUGEINT)
               + coalesce(b.h, 0)) % {_M64} AS UBIGINT) AS c{j}
  FROM sh_c{j - 1} a
  LEFT JOIN sh_hw b ON b.doc_id = a.doc_id AND b.i = a.i + {j}
)""")
        prev = f"c{j}"
    fold_sql = ("," + ",".join(folds)) if folds else ""
    mixed = splitmix_sql("sh_sel", "doc_id", "raw", "s")
    return f"""
WITH sh_docs AS (
  SELECT {id_col} AS doc_id,
         regexp_split_to_array(lower(coalesce({text_col}, '')), '\\s+') AS w
  FROM {table}
),
sh_pos AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, w[i] AS word, len(w) AS nw
  FROM sh_docs, UNNEST(generate_series(1, len(w))) AS t(i)
),
sh_vocab AS (SELECT DISTINCT word FROM sh_pos),
sh_wh AS (SELECT * FROM ({word_h})),
sh_hw AS (
  SELECT p.doc_id, p.i, p.nw, v.h
  FROM sh_pos p JOIN sh_wh v ON v.kid = p.word
),
sh_c0 AS (SELECT doc_id, i, nw, h AS c0 FROM sh_hw){fold_sql},
sh_sel AS (
  SELECT doc_id, {prev} AS raw FROM sh_c{k - 1}
  WHERE i <= GREATEST(nw - {k - 1}, 1)
),
sh_mix AS ({mixed}),
sh_bits AS (
  SELECT doc_id, CAST(b AS INT) AS b,
         SUM(CASE WHEN (s >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM sh_mix, UNNEST(generate_series(0, 63)) AS t(b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN vote > 0
                     THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT)
                     ELSE 0 END) AS UBIGINT) AS simhash
FROM sh_bits GROUP BY doc_id
"""


def hamming_candidates(sim: np.ndarray, keys: np.ndarray, max_dist: int = 3,
                       n_tables: int = 4) -> pd.DataFrame:
    """SMALL-SCALE driver-side helper (tests / ad-hoc over in-memory
    arrays); the pipeline path is :func:`simhash_near_duplicates`.

    Near-dup candidates by banding the 64-bit simhash into ``n_tables``
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


# ---------------------------------------------------------------------------
# Decontamination: flag corpus docs sharing any k-word shingle with a
# (small) benchmark set — the standard train/test-leak scan.
# ---------------------------------------------------------------------------

def collect_shingle_hashes(ds, text_col: str, k: int = 5, *,
                           lower: bool = False, split: str = " ") -> np.ndarray:
    """Sorted distinct uint64 shingle hashes of a SMALL dataset, collected
    to the driver — the build side of :func:`decontaminate`. The benchmark
    set is broadcast-small by contract (eval suites are KBs–MBs next to a
    100 TB corpus); only the per-batch distinct hashes ever leave the
    workers, never the texts."""
    def sh(t: pa.Table) -> pa.Table:
        h, _ = _shingle_hashes(t[text_col], k, lower=lower, split=split)
        return pa.table({"sh": pa.array(np.unique(h).view(np.int64))})

    parts = [np.asarray(b["sh"], dtype=np.int64)
             for b in ds.map_batches(sh, batch_format="pyarrow").iter_batches(
                 batch_size=None, batch_format="pyarrow")]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts).view(np.uint64))


class ShingleContamination:
    """map_batches actor: per doc, count DISTINCT k-word shingles that hit
    the broadcast benchmark shingle set; emit only the hits.

    The benchmark hashes are deref'd ONCE per actor from a ``ray.put``
    handle (never re-shipped per batch) and probed with a vectorized
    ``searchsorted`` membership test. Matching is on the 64-bit shingle
    hash — a cross-collision (two different shingles, equal hash) is a
    false POSITIVE at ~1e-19 per comparison, the conventional trade for
    never shipping benchmark text to every worker."""

    def __init__(self, shingles_ref, text_col: str, key_col: str, k: int = 5,
                 lower: bool = False, split: str = " "):
        import ray

        self.bench = np.sort(np.asarray(ray.get(shingles_ref), dtype=np.uint64))
        self.text_col, self.key_col, self.k = text_col, key_col, k
        self.lower, self.split = lower, split

    def __call__(self, batch: pa.Table) -> pa.Table:
        kt = batch[self.key_col].type
        h, offsets = _shingle_hashes(batch[self.text_col], self.k,
                                     lower=self.lower, split=self.split)
        n_sh = np.diff(offsets)
        rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_sh)
        pos = np.searchsorted(self.bench, h)
        pos[pos == len(self.bench)] = 0
        hit = len(self.bench) > 0 and self.bench[pos] == h
        if np.isscalar(hit):  # empty bench set
            return pa.table({self.key_col: pa.array([], kt),
                             "n_hits": pa.array([], pa.int64())})
        r, v = _distinct_per_row(rows[hit], h[hit])
        counts = np.bincount(r, minlength=batch.num_rows)
        keep = np.flatnonzero(counts > 0)
        keys = batch[self.key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.table({self.key_col: keys.take(pa.array(keep)),
                         "n_hits": pa.array(counts[keep].astype(np.int64))})


def decontaminate(ds, bench_shingles: np.ndarray, text_col: str, key_col: str,
                  k: int = 5, *, lower: bool = False, split: str = " "):
    """(key, n_hits) for every corpus doc sharing ≥1 distinct k-word
    shingle with the benchmark set — one streaming pass over the corpus,
    benchmark broadcast via ``ray.put``, no shuffle at all."""
    import ray

    ref = ray.put(np.ascontiguousarray(np.sort(np.asarray(bench_shingles, dtype=np.uint64))))
    return ds.map_batches(
        _stateless(ShingleContamination, ref, text_col, key_col, k,
                   lower=lower, split=split),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# chunk-level dedup (explode → corpus dedup → reassemble)
# ---------------------------------------------------------------------------

def explode_chunks(batch: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 16) -> pa.Table:
    """Split each doc into fixed ``k``-word chunks → (id, chunk_idx, chunk)
    rows. Fully vectorized: one split, one flatten, offset arithmetic, one
    ``binary_join`` — no per-doc Python. The last chunk of a doc may be
    short; chunks never span docs."""
    words = pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    nonempty = pc.greater(pc.utf8_length(flat), 0)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    # drop empty words while keeping per-doc counts consistent
    keep_np = nonempty.to_numpy(zero_copy_only=False).astype(bool)
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), lens)[keep_np]
    flat = flat.filter(nonempty)
    lens = np.bincount(parent, minlength=len(batch)).astype(np.int64)

    n_chunks = -(-lens // k)  # ceil; 0 for empty docs
    doc_starts = np.cumsum(lens) - lens
    total_chunks = int(n_chunks.sum())
    if total_chunks == 0:
        return pa.table({id_col: batch[id_col].slice(0, 0),
                         "chunk_idx": pa.array([], pa.int64()),
                         "chunk": pa.array([], pa.string())})
    chunk_doc = np.repeat(np.arange(len(batch), dtype=np.int64), n_chunks)
    first_chunk_of_doc = np.cumsum(n_chunks) - n_chunks
    chunk_idx = np.arange(total_chunks, dtype=np.int64) - np.repeat(
        first_chunk_of_doc, n_chunks)
    starts = doc_starts[chunk_doc] + chunk_idx * k
    # docs are contiguous in flat space, so each chunk ends where the next
    # starts (the last ends at the total) — one monotone offsets vector
    offsets = np.append(starts, len(flat)).astype(np.int64)
    # int64 offsets unconditionally — a 2^31-word batch would silently
    # overflow int32 list offsets
    chunk_lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), flat)
    chunks = pc.binary_join(chunk_lists, " ")
    return pa.table({
        id_col: batch[id_col].take(pa.array(chunk_doc)),
        "chunk_idx": pa.array(chunk_idx),
        "chunk": chunks,
    })


def chunk_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                k: int = 16, num_partitions: int = 64):
    """Corpus-wide chunk-level dedup with reassembly — the RefinedWeb-style
    span dedup a training pipeline runs when whole-doc dedup is too blunt
    (boilerplate headers, license blocks, repeated paragraphs).

    1. explode: (doc, chunk_idx, chunk) via :func:`explode_chunks`;
    2. corpus dedup: one chunk shuffle, keeper = min (doc, chunk_idx) per
       distinct chunk text (``exact_dedup`` — total order, deterministic);
    3. reassemble: one doc shuffle, surviving chunks re-joined in
       chunk_idx order → (doc, clean_text, n_kept).

    Docs whose every chunk was dropped disappear (their content exists
    verbatim elsewhere). Duplicate chunks WITHIN a doc dedup too (the
    first occurrence wins corpus-wide)."""
    exploded = ds.map_batches(
        lambda b: explode_chunks(b, id_col, text_col, k), batch_format="pyarrow")
    kept = exact_dedup(exploded, "chunk", order_by=[id_col, "chunk_idx"],
                       num_partitions=num_partitions)

    def reassemble(g: pa.Table) -> pa.Table:
        t = g.sort_by([(id_col, "ascending"), ("chunk_idx", "ascending")])
        n = t.num_rows
        if n == 0:
            return pa.table({id_col: g[id_col].slice(0, 0),
                             "clean_text": pa.array([], pa.string()),
                             "n_kept": pa.array([], pa.int64())})
        idx = np.flatnonzero(_run_starts(t[id_col]))
        offsets = np.append(idx, n).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), t["chunk"].combine_chunks())
        return pa.table({
            id_col: t[id_col].combine_chunks().take(pa.array(idx)),
            "clean_text": pc.binary_join(lists, " "),
            "n_kept": pa.array(np.diff(offsets)),
        })

    return _keyed_blocks(kept, id_col, reassemble, num_partitions)
