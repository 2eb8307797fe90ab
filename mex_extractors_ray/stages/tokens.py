"""Token-array analytics over the tokenized-sequence table (the
BASELINE.json payload: ``tokens:list<int32>``) — corpus-level n-gram
statistics an LM-data pipeline wants straight off the lake.

Shape: per-batch vectorized extraction over the Arrow list offsets (no
per-row Python), per-batch ``np.unique`` combiner, then the engine's
coarse-shuffle ``keyed_sums`` reduceat merge, then a per-block partial
top-k so the driver only ever sees ≤ k·num_partitions rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _bigram_keys(col: pa.ListArray, vocab_size: int) -> np.ndarray:
    """int64 keys ``t_i·V + t_{i+1}`` of every WITHIN-ROW adjacent token
    pair in one list column — one subtraction mask, no row loop."""
    values = np.asarray(col.flatten(), dtype=np.int64)
    if len(values) < 2:
        return values[:0]
    offsets = np.asarray(col.offsets, dtype=np.int64)
    bg = values[:-1] * vocab_size + values[1:]
    valid = np.ones(len(bg), dtype=bool)
    b = offsets[1:-1]  # interior row starts: pair (b-1, b) crosses rows
    b = b[(b > 0) & (b < len(values))]
    valid[b - 1] = False
    return bg[valid]


def token_bigram_topk(ds, list_col: str = "tokens", vocab_size: int = 50_000,
                      k: int = 20, num_partitions: int = 32):
    """Top-k most frequent token bigrams (ties broken by smaller key —
    deterministic). Returns a SMALL pa.Table (bg:int64, n:int64)."""
    from mex_extractors_ray.stages.aggregates import keyed_sums

    def partials(t: pa.Table) -> pa.Table:
        bg = _bigram_keys(t[list_col].combine_chunks(), vocab_size)
        u, c = np.unique(bg, return_counts=True)
        return pa.table({"bg": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64))})

    sums = keyed_sums(
        ds.map_batches(partials, batch_format="pyarrow"), ["bg"], ["n"],
        num_partitions=num_partitions,
    )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        order = t.sort_by([("n", "descending"), ("bg", "ascending")])
        return order.slice(0, k)

    # each block holds DISTINCT keys (keyed_sums co-partitions them), so
    # the global top-k is contained in the union of per-block top-ks —
    # the driver sees ≤ k·num_partitions rows, never the key space
    rows = sums.map_batches(local_topk, batch_format="pyarrow").take_all()
    small = pa.Table.from_pylist(
        rows, schema=pa.schema([("bg", pa.int64()), ("n", pa.int64())])
    ).sort_by([("n", "descending"), ("bg", "ascending")])
    return small.slice(0, k).select(["bg", "n"])
