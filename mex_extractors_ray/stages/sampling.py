"""Deterministic stratified sampling — per-stratum keep rates decided by a
pure function of the row key, so a re-run (or a resumed partial run, or
the oracle) selects exactly the same rows.

This is the training-mix downsampler (keep 1/2 of German, 1/4 of English,
…): no RNG state, no shuffle, one streaming ``map_batches`` pass. The
reference's closest analog is the per-source skip-list filter
(``mex/extractors/settings.py`` skip lists) — a 0%-or-100% special case.

Selection rule: keep a row iff ``key % den < num`` for its stratum's rate
``num/den``. The key must already be uniformly distributed in its low
bits (a sequence id is fine); for clustered or string keys, hash first
(``hashing.hash_string_array``) and sample on the hash — the oracle here
uses the raw-key variant because SQL can mirror it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def stratified_sample(ds, stratum_col: str, key_col: str,
                      rates: dict[str, tuple[int, int]],
                      default: tuple[int, int] = (1, 1)):
    """Keep rows per stratum at ``rates[stratum] = (num, den)``; strata not
    listed use ``default``. ``(0, 1)`` drops a stratum entirely, ``(1, 1)``
    keeps all of it."""
    for s, (num, den) in list(rates.items()) + [("<default>", default)]:
        if den <= 0 or num < 0 or num > den:
            raise ValueError(f"stratified_sample: bad rate {num}/{den} for {s!r}")
    strata = list(rates)
    nums = np.array([rates[s][0] for s in strata] + [default[0]], dtype=np.int64)
    dens = np.array([rates[s][1] for s in strata] + [default[1]], dtype=np.int64)
    lookup = pa.array(strata, pa.string())

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.index_in(t[stratum_col], lookup)  # null -> default slot
        slot = np.asarray(idx.combine_chunks() if isinstance(idx, pa.ChunkedArray) else idx,
                          dtype=np.float64)
        slot = np.where(np.isnan(slot), len(strata), slot).astype(np.int64)
        key = np.asarray(t[key_col].combine_chunks()
                         if isinstance(t[key_col], pa.ChunkedArray) else t[key_col],
                         dtype=np.int64)
        mask = (key % dens[slot]) < nums[slot]
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
