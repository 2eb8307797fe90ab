"""Exact substring-duplicate detection (character/byte L-grams) with an
optional winnowed scale path.

The training-data dedup the MinHash family can't give you: docs sharing at
least one EXACT run of ``L`` consecutive characters (the memorization-risk
signal of Lee et al.'s "Deduplicating Training Data Makes Language Models
Better" — their suffix-array substring dedup, re-expressed Ray-Data-first
as an L-gram explode + one bucket shuffle instead of a global suffix sort).

Pipeline shape (mirrors stages/dedup.py's LSH discipline):

    map_batches(explode L-grams, vectorized strided windows over the Arrow
        data buffer — no per-row Python)
    → ONE coarse shuffle on hash(gram) (bytes ride along: buckets only
        co-locate; equality is decided on the exact gram bytes in-block)
    → per-block sort + boundary runs → pair emission (same
        ``_pairs_from_buckets`` kernel as MinHash)
    → distributed pair dedup (``exact_dedup`` on the canonical pair id).

Scale levers, in the order a 100-TB run reaches for them:

- ``winnow=W`` keeps only each W-window's min-hash gram per doc (MOSS
  winnowing, Schleimer et al. 2003): shuffle bytes shrink ~W×, and any
  shared substring of length ≥ L+W-1 is still guaranteed detected (docs
  with fewer than W grams keep all grams, so short docs stay represented).
- ``max_docs_per_gram`` drops grams shared by more than that many docs
  (boilerplate stop-grams — headers, licence blocks) BEFORE the quadratic
  pair expansion; dropped grams mean dropped pairs, so the default (None)
  is exact and the cap is an explicit, documented trade.
- grams are fixed-size binary: the shuffle moves L bytes + an 8-byte hash
  per gram, partitioned by hash — no all-pairs step, no whole-corpus
  materialization, block size ∝ corpus/num_partitions.

Byte-gram caveat: windows are byte windows over UTF-8 (== character
windows for ASCII corpora; a multi-byte corpus dedups on byte runs, which
is still exact substring sharing, just measured in bytes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.stages.dedup import (
    _pair_tag,
    _pairs_from_buckets,
    exact_dedup,
)

_P = np.uint64(1099511628211)  # FNV-1a prime as the polynomial base


def _string_bytes(arr: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated utf-8 bytes, int64 row offsets) of a string column —
    zero-copy views into the Arrow buffers."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    a = a.cast(pa.large_string())
    offs = np.frombuffer(a.buffers()[1], dtype=np.int64, count=a.offset + len(a) + 1)
    offs = offs[a.offset:]
    buf = np.frombuffer(a.buffers()[2], dtype=np.uint8, count=int(offs[-1]))
    return buf, offs


def _gram_windows(buf: np.ndarray, offs: np.ndarray, L: int):
    """Global start index of every in-row L-byte window + the row of each."""
    g = np.maximum(offs[1:] - offs[:-1] - (L - 1), 0)
    total = int(g.sum())
    row_of = np.repeat(np.arange(len(g), dtype=np.int64), g)
    first = np.cumsum(g) - g
    local = np.arange(total, dtype=np.int64) - np.repeat(first, g)
    starts = offs[:-1][row_of] + local
    return starts, row_of


def _poly_hash(grams: np.ndarray) -> np.ndarray:
    """Vectorized base-P polynomial hash of a (G, L) uint8 matrix → uint64
    (wraparound mod 2^64; L vector ops, no per-gram loop)."""
    h = np.zeros(len(grams), dtype=np.uint64)
    for j in range(grams.shape[1]):
        h = h * _P + grams[:, j].astype(np.uint64)
    return h


class GramExploder:
    """Actor-pool explode stage: one (key, gram, ghash) row per selected
    L-byte window. Window selection (winnow) and in-batch (gram, doc)
    dedup are vectorized; nothing is per-row Python."""

    def __init__(self, text_col: str, key_col: str, L: int, winnow: int = 0):
        self.text_col, self.key_col, self.L, self.W = text_col, key_col, L, winnow

    def __call__(self, batch: pa.Table) -> pa.Table:
        L, W = self.L, self.W
        buf, offs = _string_bytes(batch[self.text_col])
        starts, row_of = _gram_windows(buf, offs, L)
        if len(starts) == 0:
            return pa.table(
                {
                    self.key_col: batch[self.key_col].slice(0, 0),
                    "gram": pa.array([], pa.binary(L)),
                    "ghash": pa.array([], pa.int64()),
                }
            )
        win = np.lib.stride_tricks.sliding_window_view(buf, L)
        grams = np.ascontiguousarray(win[starts])
        h = _poly_hash(grams)
        if W > 1 and len(h) >= W:
            hw = np.lib.stride_tricks.sliding_window_view(h, W)
            ok = row_of[: len(hw)] == row_of[W - 1 :]
            pos = np.flatnonzero(ok)
            sel = np.argmin(hw[pos], axis=1) + pos
            # short docs (fewer than W grams) keep every gram
            counts = np.bincount(row_of, minlength=len(offs) - 1)
            short = counts[row_of] < W
            keep = np.union1d(sel, np.flatnonzero(short))
            grams, h, row_of = grams[keep], h[keep], row_of[keep]
        # in-batch (gram, doc) dedup: lexsort + boundary mask
        gview = grams.view(f"S{L}").ravel()
        order = np.lexsort((row_of, gview))
        gs, rs = gview[order], row_of[order]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = (gs[1:] != gs[:-1]) | (rs[1:] != rs[:-1])
        gs, rs, hs = gs[first], rs[first], h[order][first]
        keys = batch[self.key_col].combine_chunks().take(pa.array(rs))
        return pa.table(
            {
                self.key_col: keys,
                "gram": pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(L), len(gs), [None, pa.py_buffer(gs.tobytes())]
                ),
                "ghash": pa.array(hs.view(np.int64)),
            }
        )


def _block_grams(t: pa.Table, L: int) -> np.ndarray:
    col = t["gram"].combine_chunks()
    raw = np.frombuffer(
        col.buffers()[1], dtype=np.uint8, count=(col.offset + len(col)) * L
    )
    return raw[col.offset * L :].reshape(len(col), L).view(f"S{L}").ravel()


def substring_dup_pairs(ds, text_col: str, key_col: str, L: int = 30,
                        winnow: int = 0, num_partitions: int = 64,
                        max_docs_per_gram: int | None = None):
    """Distinct (a, b) key pairs (a < b) of docs sharing ≥1 exact L-byte
    substring. ``winnow=0`` is EXACT (and SQL-oracle-checkable); see the
    module docstring for the scale levers."""
    from mex_extractors_ray.hashing import shard_tags

    exploded = ds.map_batches(
        GramExploder(text_col, key_col, L, winnow), batch_format="pyarrow"
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.asarray(t["ghash"], dtype=np.int64).view(np.uint64) % np.uint64(
            num_partitions
        )
        return t.append_column("_g", shard_tags(b.astype(np.int64), num_partitions))

    def pairs_in_block(g: pa.Table) -> pa.Table:
        gview = _block_grams(g, L)
        keys = np.asarray(g[key_col])
        order = np.lexsort((keys, gview))
        gs, ks = gview[order], keys[order]
        if max_docs_per_gram is not None:
            # stop-gram cap: drop whole grams shared by too many docs
            # BEFORE the quadratic expansion (explicit, documented trade —
            # capped grams contribute no pairs)
            new_g = np.ones(len(gs), dtype=bool)
            new_g[1:] = gs[1:] != gs[:-1]
            gid = np.cumsum(new_g) - 1
            new_k = new_g.copy()
            new_k[1:] |= ks[1:] != ks[:-1]
            distinct = np.bincount(gid[new_k])
            ok = distinct[gid] <= max_docs_per_gram
            gs, ks = gs[ok], ks[ok]
        a, b = _pairs_from_buckets([gs], ks)
        kt = g[key_col].type
        return pa.table({"a": pa.array(a, kt), "b": pa.array(b, kt)})

    bucketed = exploded.map_batches(add_bucket, batch_format="pyarrow")
    try:
        grouped = bucketed.groupby("_g", num_partitions=num_partitions)
    except TypeError:
        grouped = bucketed.groupby("_g")
    cand = grouped.map_groups(
        lambda g: pairs_in_block(g.drop_columns(["_g"])), batch_format="pyarrow"
    ).map_batches(_pair_tag, batch_format="pyarrow")
    return exact_dedup(cand, "pair")
