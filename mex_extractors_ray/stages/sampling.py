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


def negative_samples(ds, id_col: str, n_items: int, k: int, seed: int = 0,
                     j_col: str = "j", out_col: str = "neg_id"):
    """Deterministic negative sampling for contrastive training: ``k``
    pseudo-random negative item ids per anchor row, a pure function of
    ``(anchor id, j, seed)`` — re-runs, resumed shards and the SQL oracle
    all mint the identical negatives (the ``epoch_shuffle`` fmix64
    discipline; no RNG state anywhere).

    ``neg = fmix64((id·k + j) XOR salt) mod n_items``, bumped by one
    (mod n) on self-collision. ``n_items`` is the corpus size — at scale a
    manifest/footer constant, never a driver scan. One streaming
    ``map_batches`` pass, no shuffle; output is k rows per anchor
    (``id_col``, ``j_col``, ``out_col``). Items must be densely ided
    0..n_items-1 (the standard embedding-table layout); for sparse ids,
    sample a dense ordinal and translate through the id map."""
    from mex_extractors_ray.stages.shuffle import shuffle_keys

    if k <= 0 or n_items <= 1:
        raise ValueError(f"negative_samples: need k>0, n_items>1 (got {k}, {n_items})")

    def mint(t: pa.Table) -> pa.Table:
        ids = np.asarray(
            t[id_col].combine_chunks()
            if isinstance(t[id_col], pa.ChunkedArray) else t[id_col],
            dtype=np.int64,
        )
        n = len(ids)
        anchors = np.repeat(ids, k)
        j = np.tile(np.arange(k, dtype=np.int64), n)
        base = anchors.astype(np.uint64) * np.uint64(k) + j.astype(np.uint64)
        neg = (shuffle_keys(base, seed, 0) % np.uint64(n_items)).astype(np.int64)
        hit = neg == anchors
        neg[hit] = (neg[hit] + 1) % n_items
        return pa.table({
            id_col: pa.array(anchors), j_col: pa.array(j), out_col: pa.array(neg),
        })

    return ds.map_batches(mint, batch_format="pyarrow")


def negative_samples_sql(table: str, id_col: str, k: int, seed: int = 0,
                         j_col: str = "j", out_col: str = "neg_id") -> str:
    """DuckDB mirror of ``negative_samples`` (fmix64 via the split-multiply
    HUGEINT arithmetic of ``epoch_shuffle_sql``); ``n_items`` = COUNT(*) of
    the same table, matching the footer-count the Ray side uses."""
    from mex_extractors_ray.stages.shuffle import epoch_shuffle_sql

    base = (f"(SELECT {id_col}, CAST(t.j AS BIGINT) AS {j_col}, "
            f"CAST({id_col} AS UBIGINT) * {k} + CAST(t.j AS UBIGINT) AS _nsbase "
            f"FROM {table} CROSS JOIN range({k}) t(j))")
    keyed = epoch_shuffle_sql(base, "_nsbase", seed, 0, out_col="_nskey")
    return f"""
SELECT {id_col}, {j_col},
       CAST(CASE WHEN m = CAST({id_col} AS UBIGINT)
                 THEN (m + 1) % CAST(n AS UBIGINT) ELSE m END AS BIGINT) AS {out_col}
FROM (SELECT {id_col}, {j_col},
             _nskey % CAST((SELECT COUNT(*) FROM {table}) AS UBIGINT) AS m,
             (SELECT COUNT(*) FROM {table}) AS n
      FROM {keyed})
"""


def weighted_bernoulli_sample(ds, id_col: str, weight_col: str, den: int,
                              seed: int = 0):
    """Importance sampling: keep each row independently with probability
    ``min(weight, den) / den`` — weight-proportional training-mix
    downsampling (sample ∝ quality score / length / domain priority),
    deterministic like every sampler here: the coin is
    ``fmix64(id XOR salt) % den < weight``, a pure function of
    ``(id, seed)``, so re-runs, resumed shards and the SQL oracle keep
    exactly the same rows. One streaming ``map_batches``, no shuffle.

    Expected sample size is Σ min(w,den)/den (Bernoulli, not exact-k);
    for exact-k weighted reservoirs an order statistic over float keys
    would be needed, which breaks the bit-exact-oracle discipline."""
    import pyarrow.compute as pc

    from mex_extractors_ray.stages.shuffle import shuffle_keys

    if den <= 0:
        raise ValueError(f"weighted_bernoulli_sample: den must be > 0, got {den}")

    def keep(t: pa.Table) -> pa.Table:
        ids = np.asarray(
            t[id_col].combine_chunks()
            if isinstance(t[id_col], pa.ChunkedArray) else t[id_col],
            dtype=np.int64,
        )
        w = np.asarray(
            t[weight_col].combine_chunks()
            if isinstance(t[weight_col], pa.ChunkedArray) else t[weight_col],
            dtype=np.int64,
        )
        coin = (shuffle_keys(ids, seed, 0) % np.uint64(den)).astype(np.int64)
        return t.filter(pa.array(coin < np.minimum(w, den)))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_bernoulli_sample_sql(table: str, id_col: str, weight_expr: str,
                                  den: int, seed: int = 0) -> str:
    """DuckDB mirror: identical fmix64 coin, identical keep rule."""
    from mex_extractors_ray.stages.shuffle import epoch_shuffle_sql

    keyed = epoch_shuffle_sql(table, id_col, seed, 0, out_col="_wbkey")
    return f"""
SELECT * EXCLUDE (_wbkey) FROM {keyed}
WHERE CAST(_wbkey % {den} AS BIGINT) < LEAST(CAST(({weight_expr}) AS BIGINT), {den})
"""


def mixture_upsample(ds, id_col: str, group_col: str,
                     factors: dict[str, tuple[int, int]],
                     default: tuple[int, int] = (1, 1), seed: int = 0,
                     out_col: str = "repeat_idx"):
    """Training-mix repeat-upsampling: each row is emitted ``num/den`` times
    in expectation for its group's rational factor — the data-mixing step
    of weighting high-quality sources up (factor > 1) or down (< 1, 0
    drops) when composing an LM training epoch.

    The integer part of the factor repeats every row; the fractional part
    is a deterministic fmix64 coin per row id (the
    :func:`weighted_bernoulli_sample` discipline), so re-runs, resumed
    shards and the SQL oracle emit exactly the same multiset. One
    streaming ``map_batches`` — no shuffle, no RNG state; output rows
    carry ``out_col`` (1-based copy index) so downstream epoch shuffles
    can key on ``(id, repeat_idx)``."""
    from mex_extractors_ray.stages.shuffle import shuffle_keys

    for g, (num, den) in factors.items():
        if den <= 0 or num < 0:
            raise ValueError(f"mixture_upsample: bad factor {g}: {num}/{den}")
    if default[1] <= 0 or default[0] < 0:
        raise ValueError(f"mixture_upsample: bad default {default}")

    def expand(t: pa.Table) -> pa.Table:
        ids = np.asarray(
            t[id_col].combine_chunks()
            if isinstance(t[id_col], pa.ChunkedArray) else t[id_col],
            dtype=np.int64,
        )
        groups = t[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(ids)
        base = np.full(n, default[0] // default[1], dtype=np.int64)
        rem = np.full(n, default[0] % default[1], dtype=np.int64)
        den = np.full(n, default[1], dtype=np.int64)
        # bounded loop over the batch's DISTINCT groups, not its rows
        for g in np.unique(groups):
            if g in factors:
                m = groups == g
                num_g, den_g = factors[g]
                base[m], rem[m], den[m] = num_g // den_g, num_g % den_g, den_g
        coin = (shuffle_keys(ids, seed, 0)
                % den.astype(np.uint64)).astype(np.int64)
        reps = base + (coin < rem)
        idx = np.repeat(np.arange(n, dtype=np.int64), reps)
        out = t.take(pa.array(idx))
        starts = np.cumsum(reps) - reps
        ridx = (np.arange(len(idx), dtype=np.int64)
                - np.repeat(starts, reps) + 1)
        return out.append_column(out_col, pa.array(ridx))

    return ds.map_batches(expand, batch_format="pyarrow")


def mixture_upsample_sql(table: str, id_col: str, group_col: str,
                         factors: dict[str, tuple[int, int]],
                         default: tuple[int, int] = (1, 1), seed: int = 0,
                         out_col: str = "repeat_idx") -> str:
    """DuckDB mirror of :func:`mixture_upsample`: identical fmix64 coin,
    identical repeat rule, copies via ``unnest(generate_series(...))``."""
    from mex_extractors_ray.stages.shuffle import epoch_shuffle_sql

    keyed = epoch_shuffle_sql(table, id_col, seed, 0, out_col="_mxkey")
    cases_base = " ".join(
        f"WHEN '{g}' THEN {num // den}" for g, (num, den) in factors.items())
    cases_rem = " ".join(
        f"WHEN '{g}' THEN {num % den}" for g, (num, den) in factors.items())
    cases_den = " ".join(
        f"WHEN '{g}' THEN {den}" for g, (num, den) in factors.items())
    d_base, d_rem, d_den = (default[0] // default[1], default[0] % default[1],
                            default[1])
    return f"""
SELECT * EXCLUDE (_mxkey, _reps),
       CAST(unnest(generate_series(1, _reps)) AS BIGINT) AS {out_col}
FROM (
  SELECT *,
         (CASE {group_col} {cases_base} ELSE {d_base} END)
         + (CASE WHEN CAST(_mxkey % (CASE {group_col} {cases_den} ELSE {d_den} END) AS BIGINT)
                      < (CASE {group_col} {cases_rem} ELSE {d_rem} END)
                 THEN 1 ELSE 0 END) AS _reps
  FROM {keyed})
"""
