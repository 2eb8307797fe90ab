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


def doc_stream_offsets(ds, shard_key: str, order_col: str, weight_col: str,
                       num_partitions: int = 64):
    """Per-doc EXCLUSIVE prefix offsets in the shard's concatenated stream
    (docs in ``order_col`` order): Dataset of ``(order_col, _start:int64)``.

    KEYS-ONLY pass — callers project the payload away before this, so the
    shuffle ships ~24 bytes/doc while the tokens stay on disk. The whole
    shard's KEY rows land in one block (the ``_keyed_blocks`` contract);
    at ~10^8+ docs per shard, pre-shard the stream key."""

    def block(g: pa.Table) -> pa.Table:
        kt = g[order_col].type
        empty = pa.table({order_col: pa.array([], kt),
                          "_start": pa.array([], pa.int64())})
        n = g.num_rows
        if n == 0:
            return empty
        t = g.sort_by([(shard_key, "ascending"), (order_col, "ascending")])
        w = np.asarray(t[weight_col].combine_chunks()
                       if isinstance(t[weight_col], pa.ChunkedArray)
                       else t[weight_col], dtype=np.int64)
        if (w < 0).any():
            raise ValueError("doc_stream_offsets: negative weights")
        cum = np.cumsum(w)
        starts = np.flatnonzero(_run_starts(t[shard_key]))
        counts = np.diff(np.append(starts, n))
        base = np.repeat(cum[starts] - w[starts], counts)
        return pa.table({order_col: t[order_col],
                         "_start": pa.array(cum - w - base)})

    return _keyed_blocks(ds, shard_key, block, num_partitions)


def chunk_token_stream(ds, shard_key: str, order_col: str, list_col: str,
                       seq_len: int, num_partitions: int = 64,
                       num_buckets: int = 32):
    """GPT-style packing of the tokenized payload: per shard, docs in
    ``order_col`` order are concatenated into one token stream and cut
    every ``seq_len`` tokens — docs SPLIT across chunk boundaries (unlike
    :func:`pack_sequences`, which only assigns whole docs to packs).
    Output: one row per (shard, chunk) with ``n_in_chunk`` (== seq_len
    except each shard's tail chunk) and the ORDER-SENSITIVE content
    checksum ``wsum = Σ (pos_in_chunk+1)·token`` — every token's value and
    position in the training sequence is pinned by the oracle.

    Scale shape (the reason this is two passes): the offsets pass is
    KEYS-ONLY (doc_id + length through one shard shuffle — payload bytes
    never concentrate); the payload pass is a bucketed doc_id co-partition
    join (two hash exchanges over (doc, start)) followed by per-batch
    chunk partials — each doc's tokens are read once, contribute
    ``bincount`` partials bounded by the batch, and only (shard, chunk)
    partial rows cross the final exchange (``keyed_sums``). No stage ever
    holds a shard's token stream in memory.

    Checksum exactness: per-token term ≤ seq_len·max_token and per-chunk
    sums ≤ seq_len²·max_token — the float64 path inside the per-batch
    ``bincount`` stays integer-exact below 2^53; guarded here."""
    from mex_extractors_ray.stages.aggregates import keyed_sums
    from mex_extractors_ray.stages.joins import bucketed_join

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def keys_view(t: pa.Table) -> pa.Table:
        col = t[list_col].combine_chunks()
        offs = np.asarray(col.offsets, dtype=np.int64)
        return pa.table({shard_key: t[shard_key], order_col: t[order_col],
                         "_w": pa.array(np.diff(offs - offs[0]))})

    offsets = doc_stream_offsets(
        ds.map_batches(keys_view, batch_format="pyarrow"),
        shard_key, order_col, "_w", num_partitions)

    payload = ds.map_batches(
        lambda t: t.select([shard_key, order_col, list_col]),
        batch_format="pyarrow")
    joined = bucketed_join(payload, offsets, on=order_col,
                           num_buckets=num_buckets)

    def partials(t: pa.Table) -> pa.Table:
        out_empty = pa.table({shard_key: pa.array([], pa.string()),
                              "chunk_id": pa.array([], pa.int64()),
                              "n_in_chunk": pa.array([], pa.int64()),
                              "wsum": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return out_empty
        col = t[list_col].combine_chunks()
        vals = np.asarray(col.flatten(), dtype=np.int64)
        if len(vals) == 0:
            return out_empty
        if vals.max(initial=0) * seq_len >= (1 << 53) // seq_len:
            raise ValueError("chunk_token_stream: token·seq_len² exceeds "
                             "the exact-float53 window of the partial sum")
        offs = np.asarray(col.offsets, dtype=np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        start = np.asarray(t["_start"].combine_chunks(), dtype=np.int64)
        gp = (np.repeat(start, lens)
              + np.arange(offs[-1], dtype=np.int64)
              - np.repeat(offs[:-1], lens))
        chunk = gp // seq_len
        w = gp % seq_len + 1
        shards = t[shard_key].combine_chunks().to_numpy(zero_copy_only=False)
        codes, inv_s = np.unique(shards, return_inverse=True)
        tok_code = np.repeat(inv_s, lens)
        # composite (shard code, chunk) group key; bincount partials
        ck = tok_code * (int(chunk.max(initial=0)) + 1) + chunk
        u, inv = np.unique(ck, return_inverse=True)
        n_part = np.bincount(inv)
        wsum_part = np.bincount(inv, weights=w * vals)
        u_shard = codes[(u // (int(chunk.max(initial=0)) + 1))]
        u_chunk = u % (int(chunk.max(initial=0)) + 1)
        return pa.table({
            shard_key: pa.array(u_shard),
            "chunk_id": pa.array(u_chunk.astype(np.int64)),
            "n_in_chunk": pa.array(n_part.astype(np.int64)),
            "wsum": pa.array(wsum_part.astype(np.int64)),
        })

    return keyed_sums(
        joined.map_batches(partials, batch_format="pyarrow"),
        [shard_key, "chunk_id"], ["n_in_chunk", "wsum"],
        num_partitions=num_partitions)
