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
    if len(values) and (values.min() < 0 or values.max() >= vocab_size):
        # out-of-range ids would silently alias packed keys (and decode
        # to pairs that never existed) — refuse loudly, like
        # token_histogram does
        raise ValueError(
            f"_bigram_keys: token ids outside [0, {vocab_size})")
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


def token_histogram(ds, list_col: str = "tokens", vocab_size: int = 50_000,
                    num_partitions: int = 32) -> pa.Table:
    """Exact unigram frequency over a ``list<int>`` token column, returned
    as a SMALL pa.Table (token:int64, n:int64) — the driver only ever sees
    ≤ ``vocab_size`` rows because every batch collapses to a ``bincount``
    partial before the exchange. Tokenizer vocabularies are fixed while
    the corpus grows, so this stays O(|V|) at 10^10 rows. Tokens outside
    ``[0, vocab_size)`` raise (loudly) rather than aliasing."""
    from mex_extractors_ray.stages.aggregates import keyed_sums

    def partial(t: pa.Table) -> pa.Table:
        col = t[list_col].combine_chunks()
        vals = np.asarray(col.flatten(), dtype=np.int64)
        if len(vals) and (vals.min() < 0 or vals.max() >= vocab_size):
            raise ValueError(
                f"token_histogram: token ids outside [0, {vocab_size})")
        counts = np.bincount(vals, minlength=vocab_size)
        nz = np.flatnonzero(counts)
        return pa.table({"token": pa.array(nz.astype(np.int64)),
                         "n": pa.array(counts[nz].astype(np.int64))})

    sums = keyed_sums(ds.map_batches(partial, batch_format="pyarrow"),
                      ["token"], ["n"], num_partitions=num_partitions)
    rows = sums.take_all()  # bounded by |V|, never the corpus
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("token", pa.int64()), ("n", pa.int64())])
    ).sort_by([("n", "descending"), ("token", "ascending")])


def remap_lut(hist: pa.Table, vocab_size: int, top_k: int) -> np.ndarray:
    """Frequency-rank remap table: the ``top_k`` most frequent tokens (ties
    broken by smaller token id — ``row_number() OVER (ORDER BY n DESC,
    token)`` semantics) get new ids ``0..top_k-1`` in rank order; every
    other id maps to the UNK id ``top_k``. O(|V|) memory — broadcastable."""
    tok = np.asarray(hist["token"].combine_chunks(), dtype=np.int64)
    n = np.asarray(hist["n"].combine_chunks(), dtype=np.int64)
    order = np.lexsort((tok, -n))[:top_k]
    lut = np.full(vocab_size, top_k, dtype=np.int64)
    lut[tok[order]] = np.arange(len(order), dtype=np.int64)
    return lut


def vocab_remap(ds, list_col: str = "tokens", key_col: str = "doc_id",
                vocab_size: int = 50_000, top_k: int = 1000,
                num_partitions: int = 32):
    """Frequency-based vocabulary remap over the tokenized-sequence payload
    (the BASELINE.json ``tokens:list<int32>`` column) — the LM-data op of
    shrinking a tokenizer vocabulary to its ``top_k`` most frequent ids
    and folding the tail into one UNK id (= ``top_k``).

    Two passes, both streaming: (1) :func:`token_histogram` — per-batch
    ``bincount`` partials, one O(|V|) exchange, O(|V|) driver finalize;
    (2) the remap LUT (|V| int64s, ~400 KB at 50k — ``ray.put`` once,
    zero-copy plasma read per task) applied per batch over the raw list
    offsets: gather + position-weighted ``np.add.reduceat``, no row loop.

    Returns a Dataset of ``(key_col, remap_wsum:int64, n_unk:int64)`` —
    ``remap_wsum = Σ (i+1)·new_id(tok_i)`` is ORDER-SENSITIVE, so it
    checks every token's remapped value AND position; ``n_unk`` counts
    tokens folded into UNK. (Emitting the remapped lists themselves is
    the same kernel with ``pa.ListArray.from_arrays(offsets, new)``; the
    checksum form keeps the oracle exact and the exchange small.)"""
    import ray

    lut_ref = ray.put(remap_lut(token_histogram(
        ds, list_col, vocab_size, num_partitions), vocab_size, top_k))
    unk = np.int64(top_k)

    def remap(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)  # zero-copy from the local object store
        col = t[list_col].combine_chunks()
        vals = np.asarray(col.flatten(), dtype=np.int64)
        offs = np.asarray(col.offsets, dtype=np.int64)
        offs = offs - offs[0]
        new = lut[vals]
        lens = np.diff(offs)
        n = len(lens)
        pos = (np.arange(offs[-1], dtype=np.int64)
               - np.repeat(offs[:-1], lens) + 1)
        wsum = np.zeros(n, dtype=np.int64)
        unk_n = np.zeros(n, dtype=np.int64)
        nonempty = lens > 0
        if len(vals):
            starts = offs[:-1][nonempty]
            wsum[nonempty] = np.add.reduceat(new * pos, starts)
            unk_n[nonempty] = np.add.reduceat(
                (new == unk).astype(np.int64), starts)
        return pa.table({
            key_col: t[key_col],
            "remap_wsum": pa.array(wsum),
            "n_unk": pa.array(unk_n),
        })

    return ds.map_batches(remap, batch_format="pyarrow")


def apply_bpe_merge(ds, pair: tuple[int, int], new_id: int,
                    list_col: str = "tokens"):
    """One BPE MERGE application: replace every greedy left-to-right
    non-overlapping occurrence of the adjacent pair ``(a, b)`` inside
    each row's token list with ``new_id`` — the second half of a BPE
    training round (:func:`token_bigram_topk` counts, this merges).
    Greedy-left matters only when ``a == b`` ("aaa" → "(aa)a"): runs of
    consecutive matches keep alternate members starting at the run head,
    exactly the sequential tokenizer's behavior.

    Fully vectorized over the flattened list values: one boolean match
    mask, one run-alternation pass (cumulative position within match
    runs), one filtered rebuild of the offsets — no per-row Python. One
    streaming ``map_batches``; each output row is a pure function of one
    input row, so the merge pipelines with the recount at any scale."""
    a, b = int(pair[0]), int(pair[1])

    def merge(t: pa.Table) -> pa.Table:
        col = t[list_col].combine_chunks()
        values = np.asarray(col.flatten(), dtype=np.int64)
        offsets = np.asarray(col.offsets, dtype=np.int64)
        n = len(values)
        if n < 2:
            return t
        match = (values[:-1] == a) & (values[1:] == b)
        # pairs that straddle a row boundary don't exist
        interior = offsets[1:-1]
        interior = interior[(interior > 0) & (interior < n)]
        match[interior - 1] = False
        if a == b and match.any():
            # greedy left-to-right: within each run of consecutive
            # matches keep alternate members starting at the run head
            m = match.astype(np.int64)
            starts = np.flatnonzero(np.diff(np.concatenate(([0], m))) == 1)
            idx = np.arange(len(m), dtype=np.int64)
            is_start = np.zeros(len(m), dtype=np.int64)
            is_start[starts] = 1
            run_id = np.cumsum(is_start)
            run_base = starts[run_id - 1] if len(starts) else idx
            keep_alt = ((idx - run_base) % 2 == 0)
            match &= keep_alt
        kept = np.flatnonzero(match)
        if len(kept) == 0:
            return t
        out_vals = values.copy()
        out_vals[kept] = new_id
        drop = np.zeros(n, dtype=bool)
        drop[kept + 1] = True
        # rebuild offsets: each list loses one slot per kept match in it
        # (kept match j belongs to the list whose offset range contains j)
        owner = np.searchsorted(offsets, kept, side="right") - 1
        removed = np.bincount(owner, minlength=len(offsets) - 1)
        new_counts = np.diff(offsets) - removed
        new_offsets = np.concatenate(([0], np.cumsum(new_counts)))
        # preserve the input offset width: a large_list column must stay
        # large_list (schema drift across batches) and its int64 offsets
        # must not be narrowed through int32
        if pa.types.is_large_list(col.type):
            merged = pa.LargeListArray.from_arrays(
                pa.array(new_offsets, pa.int64()),
                pa.array(out_vals[~drop], col.type.value_type))
        else:
            merged = pa.ListArray.from_arrays(
                pa.array(new_offsets, pa.int32()),
                pa.array(out_vals[~drop], col.type.value_type))
        return t.set_column(t.schema.get_field_index(list_col), list_col,
                            merged)

    return ds.map_batches(merge, batch_format="pyarrow")


def bpe_train(ds, n_merges: int, vocab_size: int,
              list_col: str = "tokens", num_partitions: int = 32,
              on_round=None):
    """Iterative BPE TRAINING over a tokenized corpus: each round counts
    adjacent pairs (:func:`token_bigram_topk`, k=1, ties → smaller packed
    key), mints ``new_id = vocab_size + round`` and applies the merge
    (:func:`apply_bpe_merge`), stopping early when no pair repeats.
    Returns ``(merges: pa.Table(round, a, b, new_id, n), final_ds)``.

    Scale shape per round: the count is the engine's combiner →
    ``keyed_sums`` → per-block top-k path (driver sees O(partitions)
    rows); the merge is one streaming ``map_batches``; a
    ``materialize()`` per round cuts lineage (the pagerank loop
    discipline — without it every round re-executes all prior merges).
    Real tokenizer training runs on a bounded corpus SAMPLE (the
    ``kmeans_train`` discipline) — pass a sampled dataset in, the loop
    doesn't sample for you."""
    if n_merges < 1:
        raise ValueError(f"bpe_train: n_merges={n_merges} must be >= 1")
    # packed keys must stay collision-free as minted ids enter the streams
    V = vocab_size + n_merges
    rounds, cur = [], ds
    for r in range(n_merges):
        top = token_bigram_topk(cur, list_col, vocab_size=V, k=1,
                                num_partitions=num_partitions)
        if top.num_rows == 0:
            break
        bg = top["bg"][0].as_py()
        n = top["n"][0].as_py()
        if n < 2:
            break  # nothing repeats; further merges are noise
        a, b = bg // V, bg % V
        new_id = vocab_size + r
        cur = apply_bpe_merge(cur, (a, b), new_id,
                              list_col=list_col).materialize()
        rounds.append({"round": r, "a": a, "b": b,
                       "new_id": new_id, "n": n})
        if on_round is not None:
            on_round(rounds[-1])  # per-round observer (timing/telemetry)
    merges = pa.Table.from_pylist(rounds, schema=pa.schema([
        ("round", pa.int64()), ("a", pa.int64()), ("b", pa.int64()),
        ("new_id", pa.int64()), ("n", pa.int64())]))
    return merges, cur


def mlm_mask_checksums(ds, key_col: str = "doc_id",
                       list_col: str = "tokens", rate_pct: int = 15,
                       seed: int = 0, mask_id: int = 50_001,
                       key_prefix: str = "doc-"):
    """Deterministic MLM corpus prep: token position ``i`` of doc ``d``
    is replaced by ``mask_id`` iff ``fmix64(docnum·2^20 + i, seed) % 100
    < rate_pct`` — a pure function of (doc, position, seed), so the
    masked corpus is exactly reproducible (and exactly SQL-mirrorable
    via ``epoch_shuffle_sql``'s split-multiply arithmetic), unlike an
    RNG-state masker. Emits the ORDER-SENSITIVE checksum pair per doc —
    ``mlm_wsum = Σ (i+1)·tok'_i`` and ``n_masked`` — the ``vocab_remap``
    discipline: every masked position's identity and value is pinned
    without shipping the rewritten lists (the list-emitting variant is
    the same kernel with a ``ListArray.from_arrays`` tail).

    One streaming ``map_batches``; all offsets/`fmix64` arithmetic is
    vectorized numpy. ``docnum`` parses from ``key_prefix + int`` ids;
    ``n_tok`` must stay below 2^20 (the position field width)."""
    from mex_extractors_ray.stages.shuffle import shuffle_keys

    def mask(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t[list_col].combine_chunks()
        vals = np.asarray(col.flatten(), dtype=np.int64)
        offs = np.asarray(col.offsets, dtype=np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        if lens.size and int(lens.max()) >= (1 << 20):
            raise ValueError("mlm_mask_checksums: n_tok >= 2^20")
        docnum = np.asarray(pc.cast(pc.utf8_slice_codeunits(
            t[key_col], len(key_prefix), 1 << 30), pa.int64()))
        n = len(lens)
        pos = (np.arange(offs[-1], dtype=np.int64)
               - np.repeat(offs[:-1], lens))
        base = np.repeat(docnum, lens) * (1 << 20) + pos
        keys = shuffle_keys(base, seed, 0)
        masked = (keys % np.uint64(100)) < np.uint64(rate_pct)
        tokp = np.where(masked, np.int64(mask_id), vals)
        wsum = np.zeros(n, dtype=np.int64)
        n_masked = np.zeros(n, dtype=np.int64)
        nonempty = lens > 0
        if len(vals):
            starts = offs[:-1][nonempty]
            wsum[nonempty] = np.add.reduceat(tokp * (pos + 1), starts)
            n_masked[nonempty] = np.add.reduceat(
                masked.astype(np.int64), starts)
        return pa.table({key_col: t[key_col],
                         "mlm_wsum": pa.array(wsum),
                         "n_masked": pa.array(n_masked)})

    return ds.map_batches(mask, batch_format="pyarrow")


def span_corrupt_checksums(ds, key_col: str = "doc_id",
                           list_col: str = "tokens",
                           start_permille: int = 50, span_len: int = 3,
                           seed: int = 0, sentinel_id: int = 50_002,
                           key_prefix: str = "doc-"):
    """T5-style SPAN CORRUPTION prep: position i starts a span iff
    ``fmix64(docnum·2^20 + i, seed) % 1000 < start_permille``; a span
    masks ``span_len`` positions (overlaps union); each masked RUN
    collapses to ONE ``sentinel_id`` in the output sequence — the real
    encoder-input shape, not per-position masking. Deterministic like
    :func:`mlm_mask_checksums`, so the collapsed sequence is exactly
    SQL-mirrorable (window MAX for the dilation, LAG for run starts,
    running SUM for the collapsed positions).

    Emits per doc: ``span_wsum = Σ newpos·item`` over the COLLAPSED
    sequence (order-sensitive — pins every survivor's new position) and
    ``n_spans`` (collapsed runs). Vectorized: ``span_len`` shifted ORs
    for the dilation, global-cumsum-rebase for per-doc positions."""
    from mex_extractors_ray.stages.shuffle import shuffle_keys

    L = int(span_len)
    if L < 1:
        raise ValueError(f"span_corrupt_checksums: span_len={L} < 1")

    def corrupt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t[list_col].combine_chunks()
        vals = np.asarray(col.flatten(), dtype=np.int64)
        offs = np.asarray(col.offsets, dtype=np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        if lens.size and int(lens.max()) >= (1 << 20):
            raise ValueError("span_corrupt_checksums: n_tok >= 2^20")
        docnum = np.asarray(pc.cast(pc.utf8_slice_codeunits(
            t[key_col], len(key_prefix), 1 << 30), pa.int64()))
        n = len(lens)
        total = int(offs[-1])
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(offs[:-1], lens))
        base = np.repeat(docnum, lens) * (1 << 20) + pos
        start = ((shuffle_keys(base, seed, 0) % np.uint64(1000))
                 < np.uint64(start_permille))
        # dilation: masked[i] = any start in [i-L+1, i] within the doc
        masked = start.copy()
        for s in range(1, L):
            shifted = np.zeros(total, dtype=bool)
            shifted[s:] = start[:-s]
            shifted &= pos >= s  # don't reach across the doc boundary
            masked |= shifted
        prev = np.zeros(total, dtype=bool)
        prev[1:] = masked[:-1]
        prev &= pos > 0
        run_start = masked & ~prev
        present = (~masked) | run_start
        item = np.where(run_start, np.int64(sentinel_id), vals)
        # collapsed position: per-doc running count of present items;
        # rebase with the EXCLUSIVE prefix sum at each doc start (safe
        # for empty trailing docs whose start offset == total)
        cs = np.cumsum(present.astype(np.int64))
        ex_cs = np.concatenate(([0], cs))
        doc_base = np.repeat(ex_cs[offs[:-1]], lens)
        newpos = cs - doc_base  # 1-based at present items
        contrib = np.where(present, newpos * item, 0)
        wsum = np.zeros(n, dtype=np.int64)
        n_spans = np.zeros(n, dtype=np.int64)
        nonempty = lens > 0
        if total:
            starts_idx = offs[:-1][nonempty]
            wsum[nonempty] = np.add.reduceat(contrib, starts_idx)
            n_spans[nonempty] = np.add.reduceat(
                run_start.astype(np.int64), starts_idx)
        return pa.table({key_col: t[key_col],
                         "span_wsum": pa.array(wsum),
                         "n_spans": pa.array(n_spans)})

    return ds.map_batches(corrupt, batch_format="pyarrow")
