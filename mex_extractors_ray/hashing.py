"""Vectorized hashing over Arrow string columns.

The engine needs one deterministic, process-stable, *vectorized* hash of a
string column for:

- hash-partitioning the change log by ``doc_id`` (the one required wide op,
  SURVEY.md §7.3),
- exact dedup by content hash (reference analog: first-seen ``seen`` sets,
  ``mex/extractors/synopse/transform.py:286-289``),
- rolling-hash document fingerprinting.

Python's builtin ``hash`` is salted per process and ``hashlib`` is a per-row
Python loop, so we implement a polynomial hash (base-31 mod 2**64 with a
finalizer mix) directly over the Arrow string buffer with numpy: per-row byte
ranges are resolved from the offsets buffer and reduced with
``np.add.reduceat`` — no per-row Python.
"""

from __future__ import annotations

import functools as _functools

import numpy as np
import pyarrow as pa

_POW31: np.ndarray = np.ones(1, dtype=np.uint64)


def _pow31(n: int) -> np.ndarray:
    """Powers of 31 mod 2**64, grown lazily and cached."""
    global _POW31
    if len(_POW31) < n:
        size = max(n, 2 * len(_POW31), 1024)
        out = np.empty(size, dtype=np.uint64)
        out[0] = 1
        base = np.uint64(31)
        with np.errstate(over="ignore"):
            for i in range(1, size):
                out[i] = out[i - 1] * base
        _POW31 = out
    return _POW31


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64-style finalizer so low bits are well distributed."""
    with np.errstate(over="ignore"):
        h = h.copy()
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def hash_string_array(arr: pa.Array | pa.ChunkedArray, seed: int = 0) -> np.ndarray:
    """uint64 hash per row of a string/large_string/binary Arrow array.

    Nulls and empty strings hash to ``mix(seed)``. Fully vectorized: touches
    the Arrow data buffer once, no per-row Python.
    """
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 1:
            return hash_string_array(arr.chunk(0), seed)
        parts = [hash_string_array(c, seed) for c in arr.chunks]
        return np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)

    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)

    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    total = int(lens.sum())
    out = np.full(n, np.uint64(seed), dtype=np.uint64)
    if total > 0:
        # flat index of every byte of every row, grouped-arange style
        row_of_byte_start = np.cumsum(lens) - lens  # position of each row's first byte in flat space
        flat_local = np.arange(total, dtype=np.int64) - np.repeat(row_of_byte_start, lens)
        flat_idx = np.repeat(starts, lens) + flat_local
        byte_vals = data[flat_idx].astype(np.uint64)
        weights = _pow31(int(lens.max()))[flat_local]
        with np.errstate(over="ignore"):
            terms = byte_vals * weights
        nonempty = lens > 0
        # reduceat misreads empty segments; reduce only over non-empty rows
        red = np.add.reduceat(terms, row_of_byte_start[nonempty])
        with np.errstate(over="ignore"):
            out[nonempty] = red + np.uint64(seed) * _pow31(int(lens.max()) + 1)[lens[nonempty]]
    if arr.null_count:
        mask = np.asarray(arr.is_null())
        out[mask] = np.uint64(seed)
    return _mix(out)


def hash_int_array(arr: pa.Array | pa.ChunkedArray, seed: int = 0) -> np.ndarray:
    """uint64 hash per row of an integer Arrow array: splitmix64 over the
    values directly — no string cast, no byte expansion. Nulls hash like 0."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    import pyarrow.compute as _pc

    if arr.null_count:
        arr = _pc.fill_null(arr, 0)
    v = arr.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    if seed:
        with np.errstate(over="ignore"):
            v = v + np.uint64(seed)
    return _mix(v)


def hash_key_array(arr: pa.Array | pa.ChunkedArray, seed: int = 0) -> np.ndarray:
    """Type-dispatching row hash: ints via splitmix64 on the value (fast
    path — no cast), strings/binary via the polynomial byte hash."""
    t = arr.type
    if pa.types.is_integer(t):
        return hash_int_array(arr, seed)
    return hash_string_array(arr, seed)


def assign_partitions(keys: pa.Array | pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    """Partition id in [0, num_partitions) per row — the engine's one shuffle
    key. Accepts string (doc_id) or integer (orderkey-style) key columns."""
    return (hash_key_array(keys) % np.uint64(num_partitions)).astype(np.int32)


@_functools.lru_cache(maxsize=32)
def shuffle_labels(num_partitions: int) -> np.ndarray:
    """``labels[i]`` = smallest non-negative int64 whose Ray hash-shuffle
    bucket is ``i`` — a bijection from a controlled key space ``0..P-1``
    onto the P aggregator partitions of a ``groupby(key,
    num_partitions=P)`` hash shuffle.

    Why: Ray 2.49's hash-shuffle aggregators emit EMPTY output blocks with
    no schema for buckets no key hashed to, and map UDFs pass empty input
    blocks through uncalled (``plan_udf_map_op.py``: "For empty input
    blocks, we directly output them without calling the UDF"), so every
    empty bucket becomes a schema-less RefBundle and a streaming-executor
    schema-divergence warning downstream. When the shuffle key space is a
    dense 0..P-1 (every coarse-partition tag in this engine), routing the
    tag through these labels makes key→bucket bijective: no bucket is
    empty, every block carries a real schema.

    Faithfulness: the probe replicates ``hash_partition`` in Ray's
    ``transform_pyarrow`` — ``hash(tuple(col[i] for col in key_cols)) %
    P`` over a single int64 key column. Python int hashes ignore
    PYTHONHASHSEED, so driver and workers agree. Purely an optimization:
    if Ray's partitioner ever changes, keys just collide into shared
    aggregator blocks again and per-group splitting keeps results exact.
    """
    labels = np.full(num_partitions, -1, dtype=np.int64)
    found, base = 0, 0
    while found < num_partitions:
        cand = pa.table(
            {"k": pa.array(range(base, base + 4 * num_partitions), pa.int64())}
        ).column(0)
        for i in range(len(cand)):
            b = hash((cand[i],)) % num_partitions
            if labels[b] < 0:
                labels[b] = base + i
                found += 1
                if found == num_partitions:
                    break
        base += 4 * num_partitions
    return labels


def shard_tags(parts: np.ndarray, num_partitions: int) -> pa.Array:
    """int64 shuffle tag per row for a 0..P-1 coarse-partition array —
    ``shuffle_labels`` applied vectorized (see there for why)."""
    return pa.array(shuffle_labels(num_partitions)[parts], pa.int64())


def rolling_fingerprints(arr: pa.Array | pa.ChunkedArray, window: int = 16) -> np.ndarray:
    """One uint64 fingerprint per document: min over rolling polynomial window
    hashes of the byte stream (a winnowing-style document fingerprint).

    Vectorized per batch: computes all window hashes with cumulative
    polynomial prefix sums, then a grouped min. Short docs (< window bytes)
    fall back to the whole-string hash.
    """
    if isinstance(arr, pa.ChunkedArray):
        parts = [rolling_fingerprints(c, window) for c in arr.chunks]
        return np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    n = len(arr)
    full = hash_string_array(arr)
    if n == 0:
        return full
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return full
    row_start_flat = np.cumsum(lens) - lens
    flat_local = np.arange(total, dtype=np.int64) - np.repeat(row_start_flat, lens)
    flat_idx = np.repeat(starts, lens) + flat_local
    byte_vals = data[flat_idx].astype(np.uint64)
    pw = _pow31(int(lens.max()) + 1)
    # prefix polynomial: P[i] = sum_{j<=i in row} b_j * 31^local_j
    with np.errstate(over="ignore"):
        terms = byte_vals * pw[flat_local]
    prefix = np.cumsum(terms, dtype=np.uint64)
    base = np.where(row_start_flat > 0, prefix[row_start_flat - 1], np.uint64(0))
    with np.errstate(over="ignore"):
        prefix = prefix - np.repeat(base, lens)
    # window hash ending at local pos i (i >= window-1):
    #   H_i = (P_i - P_{i-window}) / 31^{local_{i-window+1}} → instead of dividing,
    #   hash the *undivided* difference; it is still a deterministic function of
    #   the window bytes and the window start position parity-free enough for
    #   fingerprinting because we mix afterwards. To stay position-independent we
    #   multiply by the inverse power via precomputed odd-modulus inverse of 31.
    inv31 = np.uint64(pow(31, -1, 1 << 64))
    inv_pw = np.empty_like(pw)
    inv_pw[0] = 1
    with np.errstate(over="ignore"):
        for i in range(1, len(pw)):
            inv_pw[i] = inv_pw[i - 1] * inv31
    valid = flat_local >= window - 1
    idx_end = np.nonzero(valid)[0]
    if len(idx_end) == 0:
        return full
    loc_end = flat_local[idx_end]
    with np.errstate(over="ignore"):
        prev = np.where(loc_end - window >= 0, prefix[idx_end - window], np.uint64(0))
        wh = (prefix[idx_end] - prev) * inv_pw[loc_end - (window - 1)]
    wh = _mix(wh)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)[idx_end]
    out = full.copy()
    np.minimum.at(out, row_of, wh)
    return out


def composite_gkey(t: pa.Table, cols: list[str]) -> pa.Array:
    """INJECTIVE string encoding of a composite key: each part is
    ``V<len>:<value>`` (null → ``N``), parts joined by ``|``. The length
    prefix makes the encoding prefix-free, so values containing the
    separator (or the literal null marker) can never collide across
    column boundaries — unlike a plain ``join(cast(col), sep)``, which
    fabricates equality for adversarial strings. All vectorized Arrow
    kernels; one output string per row."""
    import pyarrow.compute as pc

    parts = []
    for c in cols:
        s = pc.cast(t[c], pa.string())
        enc = pc.binary_join_element_wise(
            pa.scalar("V"), pc.cast(pc.binary_length(s), pa.string()),
            pa.scalar(":"), pc.if_else(pc.is_valid(s), s, ""),
            pa.scalar(""))
        parts.append(pc.if_else(pc.is_valid(s), enc, pa.scalar("N")))
    gkey = parts[0]
    for p in parts[1:]:
        gkey = pc.binary_join_element_wise(gkey, p, pa.scalar("|"))
    return gkey
