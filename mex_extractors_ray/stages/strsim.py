"""String-similarity join: all vocabulary pairs at Levenshtein distance
EXACTLY 1 — typo/variant mining over a corpus vocabulary (normalization
candidates, OCR-noise clustering, tokenizer-vocab hygiene).

The reference has no string-similarity operator; this is a training-data
extension in the near-dup family (``stages/dedup.py``), built on the same
bucket-shuffle + in-block vectorized pair emission.

Algorithm (deletion neighborhood, the SymSpell discipline — EXACT, no
verify pass needed because membership in a bucket *proves* the distance):

- substitution pairs: two distinct words that share a delete-1 variant at
  the SAME position differ at exactly that position → distance 1. Bucket
  key = ("S", pos, variant); all-pairs within the bucket.
- insert/delete pairs: u is w's delete-1 variant ⇔ distance(u, w) = 1
  with |w| = |u|+1. Bucket key = ("I", variant-or-identity); pair the
  bucket's identity row (the word equal to the key) with every
  variant row. Crucially, variant rows are NOT paired with each other —
  two words sharing a variant at different positions can be distance 2.

Each qualifying pair lands in exactly ONE bucket (a substitution pair's
(pos, variant) is unique; an ins/del pair's variant string is unique), so
an in-block distinct is a global dedup — no second exchange.

Scale shape: the input is a VOCABULARY (aggregate-scale, not the corpus);
minting emits O(Σ word-length) rows in a length-bounded loop of fully
vectorized Arrow slice/concat kernels (no per-word Python); one coarse
hash shuffle on the bucket key; in-block pairs via the shared
``_pairs_from_buckets`` boundary-scan kernel. Distances are over UTF-8
code units (document if the vocabulary is non-ASCII).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.stages.dedup import _keyed_blocks, _pairs_from_buckets, _run_starts

_SEP = "\x1f"


def _mint_buckets(word_col: str):
    def mint(t: pa.Table) -> pa.Table:
        words = t[word_col].combine_chunks()
        n = len(words)
        lens = pc.utf8_length(words)
        max_len = pc.max(lens).as_py() or 0
        keys, out_words, kinds = [], [], []
        # identity rows: the bucket "I<sep>word" owns ins/del pairs
        ident = pc.binary_join_element_wise(
            pa.array(["I"] * n), words, pa.scalar(_SEP))
        keys.append(ident)
        out_words.append(words)
        kinds.append(pa.array(np.zeros(n, dtype=np.int8)))
        for i in range(max_len):
            mask = pc.greater(lens, i)  # deletion position i exists
            w_i = words.filter(mask)
            if len(w_i) == 0:
                continue
            variant = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(w_i, 0, i),
                pc.utf8_slice_codeunits(w_i, i + 1, 2**30), "")
            m = len(w_i)
            kind1 = pa.array(np.ones(m, dtype=np.int8))
            keys.append(pc.binary_join_element_wise(
                pa.array(["S"] * m), pa.array([str(i)] * m), variant,
                pa.scalar(_SEP)))
            out_words.append(w_i)
            kinds.append(kind1)
            keys.append(pc.binary_join_element_wise(
                pa.array(["I"] * m), variant, pa.scalar(_SEP)))
            out_words.append(w_i)
            kinds.append(kind1)
        return pa.table({
            "bkey": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in keys]),
            "word": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_words]),
            "kind": pa.concat_arrays([a for a in kinds]),
        })

    return mint


def _pairs_block(g: pa.Table) -> pa.Table:
    empty = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    if g.num_rows == 0:
        return empty
    t = g.sort_by([("bkey", "ascending"), ("kind", "ascending"),
                   ("word", "ascending")])
    bkey = np.asarray(t["bkey"])
    word = np.asarray(t["word"])
    kind = np.asarray(t["kind"].combine_chunks(), dtype=np.int8)
    is_s = np.char.startswith(bkey.astype(str), "S")
    outs = []
    # substitution buckets: all pairs of distinct words (exact distance 1)
    if is_s.any():
        a, b = _pairs_from_buckets([bkey[is_s]], word[is_s])
        if len(a):
            outs.append(pa.table({"a": pa.array(a, pa.string()),
                                  "b": pa.array(b, pa.string())}))
    # ins/del buckets: identity row (kind 0, sorts first in its bucket)
    # paired with each DISTINCT variant row
    im = ~is_s
    if im.any():
        bk, wd, kd = bkey[im], word[im], kind[im]
        starts = np.zeros(len(bk), dtype=bool)
        starts[0] = True
        starts[1:] = bk[1:] != bk[:-1]
        start_idx = np.flatnonzero(starts)
        counts = np.diff(np.append(start_idx, len(bk)))
        first = np.repeat(start_idx, counts)
        has_ident = kd[first] == 0
        take = (kd == 1) & has_ident
        # distinct (bucket, word) among taken variant rows
        if take.any():
            tb, tw, tf = bk[take], wd[take], first[take]
            keep = np.append(True, (tb[1:] != tb[:-1]) | (tw[1:] != tw[:-1]))
            u = wd[tf[keep]]
            w = tw[keep]
            lo = np.minimum(u, w)
            hi = np.maximum(u, w)
            outs.append(pa.table({"a": pa.array(lo, pa.string()),
                                  "b": pa.array(hi, pa.string())}))
    if not outs:
        return empty
    return pa.concat_tables(outs)


def edit1_pairs(words, word_col: str = "word", num_partitions: int = 64):
    """All unordered pairs (a < b) of DISTINCT words in ``words`` at
    Levenshtein distance exactly 1. ``words`` need not be pre-deduplicated
    (the identity/variant bucket structure collapses duplicates)."""
    minted = words.map_batches(_mint_buckets(word_col), batch_format="pyarrow")
    return _keyed_blocks(minted, "bkey", _pairs_block, num_partitions)
