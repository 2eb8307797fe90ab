"""Deterministic sequence packing — concat-and-chunk docs into fixed-size
training sequences.

The standard LM-training layout: within each shard, docs in a canonical
order are conceptually concatenated and cut every ``max_len`` units
(tokens/chars); a doc belongs to the pack its first unit lands in. The
assignment is a pure function of (shard, order, weights), so a re-run —
or the oracle — reproduces it exactly.

The reference has no packer (it ships metadata items, not token streams);
this is a training-data extension over the tokenized-sequence table
(``n_tok``/``n_chars`` as the weight).

Scale shape: ONE coarse hash shuffle on the shard key
(``dedup._keyed_blocks``), then per block one Arrow sort + numpy
cumsum/reduceat. Pack ids never cross shards, so shards parallelize
freely and a failed shard re-packs independently (resumable output).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts


def pack_sequences(ds, shard_key: str, weight_col: str, order_col: str,
                   max_len: int, num_partitions: int = 64):
    """One row per (shard, pack): ``pack_id`` (0-based per shard),
    ``n_docs``, ``weight_sum``. ``pack_id = floor(prefix_weight / max_len)``
    where ``prefix_weight`` is the shard's cumulative weight BEFORE the doc
    (docs may straddle a boundary; they count toward their starting pack).
    ``order_col`` must be unique within a shard for determinism."""
    if max_len <= 0:
        raise ValueError("max_len must be positive")

    def block(g: pa.Table) -> pa.Table:
        kt = g[shard_key].type
        empty = pa.table({
            shard_key: pa.array([], kt),
            "pack_id": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "weight_sum": pa.array([], pa.int64()),
        })
        n = g.num_rows
        if n == 0:
            return empty
        t = g.sort_by([(shard_key, "ascending"), (order_col, "ascending")])
        w = np.asarray(t[weight_col].combine_chunks()
                       if isinstance(t[weight_col], pa.ChunkedArray) else t[weight_col],
                       dtype=np.int64)
        if (w < 0).any():
            raise ValueError("pack_sequences: negative weights")
        cum = np.cumsum(w)
        new_key = _run_starts(t[shard_key])
        starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(starts, n))
        # cumulative weight within the shard, EXCLUDING the row itself
        base = np.repeat(cum[starts] - w[starts], counts)
        prev = cum - w - base
        pack = prev // max_len

        # rollup per (shard, pack): contiguous runs in the sorted block
        new_pack = new_key.copy()
        new_pack[1:] |= pack[1:] != pack[:-1]
        p_starts = np.flatnonzero(new_pack)
        p_counts = np.diff(np.append(p_starts, n))
        w_sums = np.add.reduceat(w, p_starts) if n else np.empty(0, np.int64)
        return pa.table({
            shard_key: t[shard_key].take(pa.array(p_starts)),
            "pack_id": pa.array(pack[p_starts].astype(np.int64)),
            "n_docs": pa.array(p_counts.astype(np.int64)),
            "weight_sum": pa.array(w_sums.astype(np.int64)),
        })

    return _keyed_blocks(ds, shard_key, block, num_partitions)
