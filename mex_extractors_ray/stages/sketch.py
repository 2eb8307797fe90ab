"""Mergeable sketches — approximate aggregates whose partials combine
associatively, so the shuffle ships fixed-size state instead of raw rows.

First member: KMV (k-minimum-values) approximate COUNT(DISTINCT).
Reference analog: the per-asset count checks
(``mex/extractors/pipeline/checks/main.py:120-218``) promoted to the
cardinality question a 100 TB corpus actually asks ("how many distinct
users/domains/shingles?") where an exact distinct is itself a full
shuffle of every key.

Scale shape (the whole point of a sketch):
- map side: per batch, per key, the k smallest distinct 64-bit value
  hashes — at most k rows per key per batch cross the wire, independent
  of batch row count;
- ONE coarse hash shuffle on the key (``dedup._keyed_blocks``) — all
  partials of a key land in one block;
- block finalize: merge partials (sort + run-boundary distinct), keep the
  k smallest, estimate.

Estimator (standard KMV): with U(k) = kth smallest hash / 2^64,
n̂ = (k-1) / U(k). When a key has FEWER than k distinct hashes the sketch
degenerates to the exact distinct count — which is what the catalog's
oracle-checked entry exercises (same discipline as ``ann_topk_ivf_full``:
pick the parameter so the machinery is verifiable bit-for-bit, keep the
approximate regime covered by an error-bound unit test).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.hashing import hash_key_array

_TWO64 = float(2**64)


def _k_min_per_key(t: pa.Table, key: str, k: int) -> pa.Table:
    """Given (key, _h) rows, keep per key the k smallest DISTINCT hashes.
    One sort + run-boundary scan + run ordinal — no per-key dispatch."""
    from mex_extractors_ray.stages.dedup import _run_starts

    t = t.sort_by([(key, "ascending"), ("_h", "ascending")])
    n = t.num_rows
    if n == 0:
        return t
    keys_arr = t[key]
    # distinct (key, h) pairs: new key run OR new hash run
    pair_start = _run_starts(keys_arr) | _run_starts(t["_h"])
    keep = np.flatnonzero(pair_start)
    t = t.take(pa.array(keep))
    n = t.num_rows
    starts = np.flatnonzero(_run_starts(t[key]))
    counts = np.diff(np.append(starts, n))
    ordinal = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    return t.filter(pa.array(ordinal < k))


def approx_distinct(ds, key: str, value: str, k: int = 1024,
                    num_partitions: int = 64, seed: int = 0):
    """Per-key approximate COUNT(DISTINCT ``value``) with a KMV sketch.

    Returns a Dataset of (key, n_distinct: int64, exact: bool). ``exact``
    is True when the key had fewer than k distinct hashes — the estimate
    IS the exact distinct count then (modulo 64-bit hash collisions,
    ~n²/2⁶⁵ — negligible below billions of values per key). Relative
    standard error of the approximate regime ≈ 1/√(k−1).
    """

    def partial(b: pa.Table) -> pa.Table:
        h = hash_key_array(b[value], seed)
        t = pa.table({key: b[key], "_h": pa.array(h)})
        return _k_min_per_key(t, key, k)

    def finalize(g: pa.Table) -> pa.Table:
        from mex_extractors_ray.stages.dedup import _run_starts

        merged = _k_min_per_key(g, key, k)
        n = merged.num_rows
        kt = g[key].type
        if n == 0:
            return pa.table({key: pa.array([], kt),
                             "n_distinct": pa.array([], pa.int64()),
                             "exact": pa.array([], pa.bool_())})
        starts = np.flatnonzero(_run_starts(merged[key]))
        counts = np.diff(np.append(starts, n))
        exact = counts < k
        # kth smallest hash per saturated key: the run's last kept row
        kth = merged["_h"].combine_chunks().take(
            pa.array(starts + counts - 1)).to_numpy(zero_copy_only=False)
        est = np.where(
            exact,
            counts.astype(np.float64),
            # n̂ = (k-1)/U(k); uint64 → float64 loses <11 low bits of the
            # hash — far below the estimator's own 1/√(k−1) error
            (k - 1) * _TWO64 / np.maximum(kth.astype(np.float64), 1.0),
        )
        return pa.table({
            key: merged[key].combine_chunks().take(pa.array(starts)),
            "n_distinct": pa.array(np.rint(est).astype(np.int64)),
            "exact": pa.array(exact),
        })

    combined = ds.map_batches(partial, batch_format="pyarrow")
    from mex_extractors_ray.stages.dedup import _keyed_blocks

    return _keyed_blocks(combined, key, finalize, num_partitions)
