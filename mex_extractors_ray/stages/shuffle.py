"""Deterministic epoch shuffle — global training-order randomization as a
pure function of ``(row key, seed, epoch)``.

Training pipelines re-shuffle the corpus every epoch. ``ds.random_shuffle()``
does that but its order depends on runtime block layout, so a resumed or
re-run epoch sees a DIFFERENT order — unacceptable for reproducible training
and for skip-ahead resume ("continue from sample 3.2B of epoch 7"). Here the
shuffle key is murmur3's fmix64 finalizer (public constant mixer) over
``key XOR seed XOR fmix64(epoch)``: a bijection on uint64, so sorting by it
is a uniform permutation that ANY worker can recompute locally. Resume =
filter ``shuffle_key > watermark``; sharding = ``shuffle_key % n_shards``.

Scale story: one vectorized ``map_batches`` to mint keys (no shuffle), then
one ``ds.sort`` — Ray Data's sort is a distributed range-partition exchange,
the one unavoidable all-to-all. For consumers that only need determinism
*within* shards (data loaders), skip the sort and route on
``shuffle_key % n_shards`` instead — zero global exchange.

The reference has no training loop; its closest analog is deterministic
ordering for reproducible outputs (``mex/extractors/synopse/transform.py``
sorted sets). The SQL mirror (``epoch_shuffle_sql``) reproduces fmix64 with
HUGEINT modular arithmetic so DuckDB can oracle-check the permutation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_C1 = 0xFF51AFD7ED558CCD
_C2 = 0xC4CEB9FE1A85EC53


def fmix64(x: np.ndarray) -> np.ndarray:
    """murmur3 fmix64 over a uint64 array — a bijection with avalanche."""
    x = np.asarray(x, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(33)
        x *= np.uint64(_C1)
        x ^= x >> np.uint64(33)
        x *= np.uint64(_C2)
        x ^= x >> np.uint64(33)
    return x


def shuffle_keys(ids: np.ndarray, seed: int, epoch: int) -> np.ndarray:
    """uint64 shuffle key per id; distinct ids → distinct keys (bijection)."""
    base = np.asarray(ids).astype(np.uint64)
    salt = np.uint64(seed) ^ fmix64(np.uint64([epoch]))[0]
    return fmix64(base ^ salt)


def epoch_shuffle(ds, key_col: str, seed: int = 0, epoch: int = 0,
                  out_col: str = "shuffle_key", sort: bool = True):
    """Append the epoch-``epoch`` shuffle key and (optionally) globally sort
    by it. With ``sort=False`` the dataset keeps its layout and downstream
    shards on ``shuffle_key % n`` — the cheap path for data loaders."""

    def mint(t: pa.Table) -> pa.Table:
        ids = np.asarray(
            t[key_col].combine_chunks()
            if isinstance(t[key_col], pa.ChunkedArray) else t[key_col],
            dtype=np.int64,
        )
        return t.append_column(out_col, pa.array(shuffle_keys(ids, seed, epoch)))

    out = ds.map_batches(mint, batch_format="pyarrow")
    return out.sort(out_col) if sort else out


def _mulmod64_sql(x: str, c: int) -> str:
    """``(x * c) mod 2^64`` in DuckDB without overflowing INT128: split x
    into 32-bit halves so each partial product stays below 2^96."""
    m64, m32 = "18446744073709551616", "4294967296"
    lo = f"(CAST({x} % {m32} AS HUGEINT) * {c}) % {m64}"
    hi = f"((CAST({x} >> 32 AS HUGEINT) * {c}) % {m32}) * {m32}"
    return f"CAST(({lo} + {hi}) % {m64} AS UBIGINT)"


def epoch_shuffle_sql(table: str, key_col: str, seed: int, epoch: int,
                      out_col: str = "shuffle_key") -> str:
    """DuckDB subquery computing the identical shuffle key (fmix64 via
    split-multiply HUGEINT modular arithmetic). SELECTs ``table.*`` plus
    ``out_col``."""
    salt = int(np.uint64(seed) ^ fmix64(np.uint64([epoch]))[0])
    return f"""(
SELECT * EXCLUDE (s1, s2, s3, s4, s5),
       CAST(xor(s5, s5 >> 33) AS UBIGINT) AS {out_col}
FROM (SELECT *, {_mulmod64_sql('s4', _C2)} AS s5
      FROM (SELECT *, xor(s3, s3 >> 33) AS s4
            FROM (SELECT *, {_mulmod64_sql('s2', _C1)} AS s3
                  FROM (SELECT *, xor(s1, s1 >> 33) AS s2
                        FROM (SELECT *, xor(CAST({key_col} AS UBIGINT),
                                            CAST({salt} AS UBIGINT)) AS s1
                              FROM {table})))))
)"""


def hash_sample_quantiles(ds, id_col: str, value_col: str, k: int = 2048,
                          qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                          seed: int = 0, epoch: int = 0) -> "pa.Table":
    """Approximate quantiles of an UNBOUNDED (float or wide-int) column via
    a DETERMINISTIC uniform sample — the k rows with the globally smallest
    fmix64 shuffle keys. fmix64 is a bijection with avalanche, so ranking
    by it over distinct row ids is a uniform permutation: the k-smallest-
    key rows are a uniform k-sample, and — unlike reservoir sampling — a
    pure function of (ids, seed, epoch). That makes this APPROXIMATE
    operator EXACTLY oracle-checkable: DuckDB recomputes the identical
    sample (``hash_sample_quantiles_sql``) and must match bit-for-bit.

    DKW bound: sup-norm CDF error ≤ sqrt(ln(2/δ)/(2k)) w.p. 1−δ — k=2048
    gives ±3% rank error at δ=1%. Complements ``aggregates.
    bounded_quantiles`` (exact, but bounded-cardinality values only).

    Scale shape: per-batch k-smallest partial (≤ k rows per batch cross
    the wire), one small sort+limit over partials, O(k) driver finalize.
    Null values are excluded (both sides)."""
    import pyarrow.compute as pc

    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"hash_sample_quantiles: q={q} outside (0, 1]")

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        ids = np.asarray(
            t[id_col].combine_chunks()
            if isinstance(t[id_col], pa.ChunkedArray) else t[id_col],
            dtype=np.int64,
        )
        keys = shuffle_keys(ids, seed, epoch)
        out = pa.table({"shuffle_key": pa.array(keys), "v": t[value_col]})
        return out.sort_by([("shuffle_key", "ascending")]).slice(0, k)

    sample = (ds.map_batches(partial, batch_format="pyarrow")
              .sort("shuffle_key").limit(k).take_all())  # ≤ k rows on the driver
    vals = np.sort(np.array([r["v"] for r in sample]))
    n = len(vals)
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        rank = int(np.ceil(q * n))
        out_q.append(int(round(q * 100)))
        out_v.append(vals[rank - 1])
    return pa.table({"q_c100": pa.array(out_q, pa.int64()),
                     "value": pa.array(out_v, pa.float64())})


def hash_sample_quantiles_sql(table: str, id_col: str, value_col: str,
                              k: int, qs: tuple[float, ...],
                              seed: int = 0, epoch: int = 0) -> str:
    """DuckDB mirror: identical deterministic sample (fmix64 order, LIMIT k
    over non-null values), identical nearest-rank finalize."""
    mirror = epoch_shuffle_sql(
        f"(SELECT {id_col}, {value_col} FROM {table} "
        f"WHERE {value_col} IS NOT NULL)", id_col, seed, epoch)
    legs = [f"""
SELECT CAST({int(round(q * 100))} AS BIGINT) AS q_c100,
       CAST(value AS DOUBLE) AS value
FROM o, nn WHERE rn = CEIL({q} * n)""" for q in qs]
    return (
        f"""
WITH smp AS (SELECT {value_col} AS value FROM {mirror}
             ORDER BY shuffle_key LIMIT {k}),
     o AS (SELECT value, row_number() OVER (ORDER BY value) AS rn FROM smp),
     nn AS (SELECT COUNT(*) AS n FROM smp)
"""
        + " UNION ALL ".join(legs)
    )
