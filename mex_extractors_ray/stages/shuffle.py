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
