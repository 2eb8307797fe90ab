"""Bloom-prefiltered EXACT semi/anti joins — the broadcast-small-side trick
extended to build sides too big for a broadcast hash set.

``broadcast_lookup`` ships the build side's exact key array (fine to ~10^7
keys). Past that, an exact set blows the object store — but a Bloom bitmap
at ~12.5 bits/key (m_log2=23 ≈ 1 MiB per 10^6 keys, FP ≈ 1% at k=4) still
broadcasts: ``ray.put`` once, zero-copy numpy view in every task. The probe
side is prefiltered BEFORE the bucketed-join shuffle, so shuffle bytes drop
by the true non-match fraction (Bloom has no false negatives — no match is
ever lost); the surviving false positives are removed by the exact
per-bucket verify. Net: the same exact result as ``bucketed_join``
semi/anti, at a shuffle volume ∝ matches instead of ∝ probe size.

Hashing: one vectorized 64-bit key hash (``hashing.hash_key_array``) split
Kirsch–Mitzenmacher style into k positions ``(h1 + i·h2) mod m`` — k probes
for the price of two hashes (public construction, "Less Hashing, Same
Performance", Kirsch & Mitzenmacher 2006).

The reference's closest analog is the is-in semi-join filter family
(``mex/extractors/ifsg/filter.py``-style membership filters); the Bloom
stage is the 100-TB-scale path for the same semantics.

When to use which (measured, BASELINE.md "Bloom-prefilter A/B"): on a
single node at sf0.1 the bitmap build's extra build-side pass COSTS more
than the few MB of shuffle it saves (plain 4.0 s vs bloom 7.0 s) — use
``_bucketed_membership`` (the same exact semi/anti, no Bloom) when the
build side fits a broadcast set or the probe payload is narrow; reach
for the Bloom when shuffle bytes are the bottleneck: wide payload
columns crossing a real network and build sides past ~10^7 keys.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.hashing import assign_partitions, hash_key_array, shard_tags

_STRIDE_SEED = 0x9E3779B9  # golden-ratio offset for the second hash


@dataclass
class BloomFilter:
    words: np.ndarray  # uint64[m/64] packed bitmap
    m_log2: int
    k: int
    seed: int

    @property
    def fill_fraction(self) -> float:
        """Fraction of bits set — FP rate ≈ fill_fraction**k."""
        set_bits = int(np.unpackbits(self.words.view(np.uint8)).sum())
        return set_bits / (1 << self.m_log2)


def _positions(col, bf_seed: int, m_log2: int):
    """(h1, h2) for Kirsch–Mitzenmacher double hashing; h2 forced odd so the
    stride cycles the full power-of-two table."""
    h1 = hash_key_array(col, bf_seed)
    h2 = hash_key_array(col, bf_seed + _STRIDE_SEED) | np.uint64(1)
    return h1, h2


def _set_bits(words: np.ndarray, col, m_log2: int, k: int, seed: int) -> None:
    mask = np.uint64((1 << m_log2) - 1)
    h1, h2 = _positions(col, seed, m_log2)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))


def bloom_maybe_contains(col, bf: BloomFilter) -> np.ndarray:
    """Vectorized membership probe: bool[n], no false negatives."""
    mask = np.uint64((1 << bf.m_log2) - 1)
    h1, h2 = _positions(col, bf.seed, bf.m_log2)
    ok = np.ones(len(h1), dtype=bool)
    for i in range(bf.k):
        pos = (h1 + np.uint64(i) * h2) & mask
        bits = (bf.words[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))) & np.uint64(1)
        ok &= bits.astype(bool)
    return ok


def build_bloom(ds, key_col: str, m_log2: int = 23, k: int = 4,
                seed: int = 0) -> BloomFilter:
    """Distributed Bloom build: per-block bitmaps OR-merged by Ray Data's
    aggregate tree — the accumulator is the fixed-size bitmap (m/8 bytes),
    so wire cost is ∝ blocks × bitmap, never ∝ rows."""
    from ray.data.aggregate import AggregateFn

    words_len = (1 << m_log2) >> 6

    agg = AggregateFn(
        init=lambda _key: np.zeros(words_len, dtype=np.uint64),
        accumulate_block=lambda state, block: _acc_block(
            state, block, key_col, m_log2, k, seed),
        merge=lambda a, b: np.bitwise_or(a, b),
        name="bloom",
    )
    out = ds.aggregate(agg)
    words = out["bloom"] if out and out.get("bloom") is not None else np.zeros(
        words_len, dtype=np.uint64)
    return BloomFilter(words=words, m_log2=m_log2, k=k, seed=seed)


def _acc_block(state: np.ndarray, block, key_col: str, m_log2: int, k: int,
               seed: int) -> np.ndarray:
    t = pa.table(block) if not isinstance(block, pa.Table) else block
    col = t[key_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    if len(col):
        _set_bits(state, col, m_log2, k, seed)
    return state


def bloom_prefilter(ds, key_col: str, bf: BloomFilter, invert: bool = False):
    """Drop rows whose key CANNOT be in the filter (semi) — or, with
    ``invert``, rows whose key cannot be ABSENT is ill-defined for a Bloom,
    so invert keeps maybe-present rows too; anti-join verification happens
    at the exact stage. The bitmap is ``ray.put`` once and viewed zero-copy
    per task."""
    import ray

    ref = ray.put(bf)

    def fil(batch: pa.Table) -> pa.Table:
        import ray as _ray

        b = _ray.get(ref)
        ok = bloom_maybe_contains(batch[key_col].combine_chunks()
                                  if isinstance(batch[key_col], pa.ChunkedArray)
                                  else batch[key_col], b)
        return batch.filter(pa.array(ok))

    if invert:
        raise ValueError("bloom_prefilter cannot prove absence; use "
                         "bloom_anti_join (exact verify) instead")
    return ds.map_batches(fil, batch_format="pyarrow")


def _bucketed_membership(left, right, on: str, num_buckets: int, keep: str,
                         right_on: str | None = None):
    """Co-partition probe rows and build KEYS on hash(key)%B; per bucket an
    exact ``pc.is_in`` keeps (semi) or drops (anti) probe rows. The build
    side is reduced to per-batch-distinct keys before the shuffle."""
    l_schema = left.schema()
    left_cols = list(l_schema.names)

    def _arrow_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    l_types = dict(zip(l_schema.names, (_arrow_type(t) for t in l_schema.types)))

    def prep_left(t: pa.Table) -> pa.Table:
        out = t.append_column("_side", pa.array(["l"] * t.num_rows))
        return out.append_column(
            "_bucket", shard_tags(assign_partitions(t[on], num_buckets), num_buckets))

    def prep_right(t: pa.Table) -> pa.Table:
        keys = pc.unique(t[on].combine_chunks()
                         if isinstance(t[on], pa.ChunkedArray) else t[on])
        keys = keys.cast(l_types[on])
        n = len(keys)
        cols = {c: (keys if c == on else pa.nulls(n, l_types[c])) for c in left_cols}
        out = pa.table(cols)
        out = out.append_column("_side", pa.array(["r"] * n))
        return out.append_column(
            "_bucket", shard_tags(assign_partitions(keys, num_buckets), num_buckets))

    r_on = right_on or on
    both = left.map_batches(prep_left, batch_format="pyarrow").union(
        right.select_columns([r_on])
        .map_batches(lambda t: t.rename_columns([on]), batch_format="pyarrow")
        .map_batches(prep_right, batch_format="pyarrow"))

    def bucket(g: pa.Table) -> pa.Table:
        side = g["_side"]
        l = g.filter(pc.equal(side, "l"))
        rkeys = g.filter(pc.equal(side, "r"))[on].combine_chunks()
        hit = pc.is_in(l[on], value_set=rkeys)
        mask = hit if keep == "semi" else pc.invert(hit)
        return l.filter(mask).select(left_cols)

    try:
        grouped = both.groupby("_bucket", num_partitions=num_buckets)
    except TypeError:
        grouped = both.groupby("_bucket")
    return grouped.map_groups(bucket, batch_format="pyarrow")


def bloom_semi_join(left, right, on: str, num_buckets: int = 64,
                    m_log2: int = 23, k: int = 4, seed: int = 0,
                    right_on: str | None = None):
    """EXACT large-large semi join, Bloom-prefiltered: build a bitmap of the
    right side's keys (distributed OR-merge), drop left rows that cannot
    match BEFORE the shuffle, then exact per-bucket ``is_in`` verify. Same
    result as an unfiltered bucketed semi join; shuffle bytes ∝ matches
    plus the Bloom FP residue (≈1% at the defaults)."""
    bf = build_bloom(right, right_on or on, m_log2=m_log2, k=k, seed=seed)
    pre = bloom_prefilter(left, on, bf)
    return _bucketed_membership(pre, right, on, num_buckets, keep="semi",
                                right_on=right_on)


def bloom_anti_join(left, right, on: str, num_buckets: int = 64,
                    m_log2: int = 23, k: int = 4, seed: int = 0,
                    right_on: str | None = None):
    """EXACT large-large anti join. The Bloom splits the probe side
    LOCALLY: definite-misses (no false negatives ⇒ provably unmatched) are
    emitted WITHOUT shuffling; only maybe-matches — the match fraction plus
    FP residue — go through the bucketed exact verify, where anti rows are
    the is_in complement."""
    import ray

    bf = build_bloom(right, right_on or on, m_log2=m_log2, k=k, seed=seed)
    ref = ray.put(bf)

    def split(batch: pa.Table, want_miss: bool) -> pa.Table:
        import ray as _ray

        b = _ray.get(ref)
        ok = bloom_maybe_contains(batch[on].combine_chunks()
                                  if isinstance(batch[on], pa.ChunkedArray)
                                  else batch[on], b)
        return batch.filter(pa.array(~ok if want_miss else ok))

    definite_miss = left.map_batches(lambda t: split(t, True), batch_format="pyarrow")
    maybe = left.map_batches(lambda t: split(t, False), batch_format="pyarrow")
    verified = _bucketed_membership(maybe, right, on, num_buckets, keep="anti",
                                    right_on=right_on)
    return definite_miss.union(verified)
