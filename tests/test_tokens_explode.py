"""Unit tests for split_explode, width_bucket_counts, apply_bpe_merge."""

import numpy as np
import pyarrow as pa

from mex_extractors_ray.stages.profile import width_bucket_counts
from mex_extractors_ray.stages.reshape import split_explode
from mex_extractors_ray.stages.tokens import apply_bpe_merge


def test_split_explode_ordinality_and_nulls(ray_session):
    import ray.data

    t = pa.table({"id": [1, 2, 3], "s": ["a b c", "x", None]})
    df = split_explode(ray.data.from_arrow(t), "s", " ", ["id"],
                       out_part="w", out_idx="i").to_pandas()
    got = sorted(map(tuple, df[["id", "i", "w"]].itertuples(index=False)))
    assert got == [(1, 0, "a"), (1, 1, "b"), (1, 2, "c"), (2, 0, "x")]


def test_width_bucket_counts_clamps(ray_session):
    import ray.data

    t = pa.table({"g": ["a"] * 5 + ["b"],
                  "v": [-10.0, 0.0, 49.9, 50.0, 1000.0, None]})
    df = width_bucket_counts(ray.data.from_arrow(t), "g", "v",
                             lo=0.0, hi=100.0, n_buckets=2,
                             num_partitions=2).to_pandas()
    m = {(r.g, r.bucket): r.n for r in df.itertuples(index=False)}
    # -10 clamps to 0; 0 and 49.9 in bucket 0; 50 in bucket 1; 1000 clamps
    assert m == {("a", 0): 3, ("a", 1): 2}


def _bpe_merge_ref(seq, a, b, new_id):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def test_apply_bpe_merge_basic(ray_session):
    import ray.data

    t = pa.table({"tokens": pa.array(
        [[1, 2, 3, 1, 2], [2, 1], [], [1, 2]],
        type=pa.list_(pa.int32()))})
    df = apply_bpe_merge(ray.data.from_arrow(t), (1, 2), 99).to_pandas()
    assert [list(x) for x in df["tokens"]] == [[99, 3, 99], [2, 1], [], [99]]


def test_apply_bpe_merge_overlapping_same_token(ray_session):
    import ray.data

    # greedy left-to-right on (7,7): "7 7 7" -> "(77) 7"; "7 7 7 7" -> two
    t = pa.table({"tokens": pa.array(
        [[7, 7, 7], [7, 7, 7, 7], [7], [7, 7, 7, 7, 7]],
        type=pa.list_(pa.int32()))})
    df = apply_bpe_merge(ray.data.from_arrow(t), (7, 7), 50).to_pandas()
    assert [list(x) for x in df["tokens"]] == [
        [50, 7], [50, 50], [7], [50, 50, 7]]


def test_apply_bpe_merge_random_equivalence(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    seqs = [rng.integers(0, 4, rng.integers(0, 12)).tolist()
            for _ in range(200)]
    t = pa.table({"tokens": pa.array(seqs, type=pa.list_(pa.int32()))})
    for (a, b) in [(0, 1), (2, 2), (3, 0)]:
        df = apply_bpe_merge(ray.data.from_arrow(t), (a, b), 90).to_pandas()
        got = [list(x) for x in df["tokens"]]
        want = [_bpe_merge_ref(s, a, b, 90) for s in seqs]
        assert got == want, (a, b)


def _bpe_train_ref(seqs, n_merges, vocab_size):
    """Sequential BPE with the engine's tie-break (count desc, smaller
    packed key a*V+b, V = vocab_size + n_merges)."""
    from collections import Counter

    V = vocab_size + n_merges
    merges = []
    cur = [list(s) for s in seqs]
    for r in range(n_merges):
        counts = Counter()
        for s in cur:
            for i in range(len(s) - 1):
                counts[s[i] * V + s[i + 1]] += 1
        if not counts:
            break
        bg, n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        a, b = bg // V, bg % V
        new_id = vocab_size + r
        cur = [_bpe_merge_ref(s, a, b, new_id) for s in cur]
        merges.append((r, a, b, new_id, n))
    return merges, cur


def test_bpe_train_matches_sequential(ray_session):
    import ray.data

    from mex_extractors_ray.stages.tokens import bpe_train

    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, 5, rng.integers(2, 30)).tolist()
            for _ in range(80)]
    t = pa.table({"doc": pa.array(range(80), pa.int64()),
                  "tokens": pa.array(seqs, type=pa.list_(pa.int32()))})
    merges, final_ds = bpe_train(ray.data.from_arrow(t), n_merges=6,
                                 vocab_size=5, num_partitions=4)
    want_merges, want_final = _bpe_train_ref(seqs, 6, 5)
    got = [(r["round"], r["a"], r["b"], r["new_id"], r["n"])
           for r in merges.to_pylist()]
    assert got == want_merges
    df = final_ds.to_pandas().sort_values("doc")
    assert [list(x) for x in df["tokens"]] == want_final


def test_json_fields_mixed_types_degrade_to_string(ray_session):
    import pandas as pd
    import ray.data

    from mex_extractors_ray.stages.jsonx import json_fields

    t = pa.table({"p": ['{"v": 1}', '{"v": "x"}', '{"v": null}']})
    df = json_fields(ray.data.from_arrow(t), "p", {"v": "v"}).to_pandas()
    vals = df["v"].tolist()
    assert vals[0] == "1" and vals[1] == "x" and pd.isna(vals[2])


def test_json_scalar_field_int_rejects_float_literal(ray_session):
    import pandas as pd
    import ray.data

    from mex_extractors_ray.stages.jsonx import json_scalar_field

    t = pa.table({"p": ['{"k": 5.5}', '{"k": 1e5}', '{"k": 7}',
                        '{"k": -2, "z": 1}']})
    got = json_scalar_field(ray.data.from_arrow(t), "p", "k", "k") \
        .to_pandas()["k"].tolist()
    assert pd.isna(got[0]) and pd.isna(got[1])
    assert got[2] == 7 and got[3] == -2


def test_setops_adversarial_separator_strings(ray_session):
    import ray.data

    from mex_extractors_ray.stages.joins import intersect_distinct

    # values containing the old separator / null-marker bytes must NOT
    # fabricate set membership (injective length-prefixed encoding)
    left = ray.data.from_arrow(pa.table({"a": ["p\x1fq"], "b": ["r"]}))
    right = ray.data.from_arrow(pa.table({"a": ["p"], "b": ["q\x1fr"]}))
    assert intersect_distinct(left, right, ["a", "b"],
                              num_partitions=2).count() == 0
    l2 = ray.data.from_arrow(pa.table({"a": ["\x00N"]}))
    r2 = ray.data.from_arrow(pa.table({"a": pa.array([None], pa.string())}))
    assert intersect_distinct(l2, r2, ["a"], num_partitions=2).count() == 0


def test_mlm_mask_checksums_deterministic(ray_session):
    import ray.data

    from mex_extractors_ray.stages.shuffle import shuffle_keys
    from mex_extractors_ray.stages.tokens import mlm_mask_checksums

    toks = [[5, 6, 7, 8, 9], [1, 2], []]
    t = pa.table({"doc_id": ["doc-3", "doc-11", "doc-2"],
                  "tokens": pa.array(toks, type=pa.list_(pa.int32()))})
    df = mlm_mask_checksums(ray.data.from_arrow(t), rate_pct=50, seed=7,
                            mask_id=99).to_pandas().set_index("doc_id")
    for did, seq in zip(["doc-3", "doc-11", "doc-2"], toks):
        dn = int(did[4:])
        base = np.array([dn * (1 << 20) + i for i in range(len(seq))],
                        dtype=np.int64)
        masked = (shuffle_keys(base, 7, 0) % np.uint64(100)) < np.uint64(50)
        tokp = [99 if m else v for v, m in zip(seq, masked)]
        assert df.loc[did, "mlm_wsum"] == sum(
            (i + 1) * v for i, v in enumerate(tokp))
        assert df.loc[did, "n_masked"] == int(masked.sum())


def test_span_corrupt_collapses_runs(ray_session):
    import ray.data

    from mex_extractors_ray.stages.shuffle import shuffle_keys
    from mex_extractors_ray.stages.tokens import span_corrupt_checksums

    toks = [[10, 11, 12, 13, 14, 15, 16, 17], [3], []]
    dids = ["doc-5", "doc-9", "doc-1"]
    t = pa.table({"doc_id": dids,
                  "tokens": pa.array(toks, type=pa.list_(pa.int32()))})
    df = span_corrupt_checksums(
        ray.data.from_arrow(t), start_permille=300, span_len=2, seed=4,
        sentinel_id=77).to_pandas().set_index("doc_id")
    for did, seq in zip(dids, toks):
        dn = int(did[4:])
        base = np.array([dn * (1 << 20) + i for i in range(len(seq))],
                        dtype=np.int64)
        start = (shuffle_keys(base, 4, 0) % np.uint64(1000)) < np.uint64(300)
        # sequential reference: dilate, collapse runs
        masked = [bool(start[max(0, i - 1):i + 1].any())
                  for i in range(len(seq))]
        out, spans = [], 0
        for i, v in enumerate(seq):
            if masked[i] and (i == 0 or not masked[i - 1]):
                out.append(77); spans += 1
            elif not masked[i]:
                out.append(v)
        assert df.loc[did, "span_wsum"] == sum(
            (j + 1) * v for j, v in enumerate(out)), did
        assert df.loc[did, "n_spans"] == spans, did


def test_simhash_banding_pigeonhole_complete(ray_session):
    """max_dist < n_tables guarantees banding finds EVERY pair within the
    Hamming budget (<= max_dist differing bits can dirty at most max_dist
    of the n_tables bands, so one band must match exactly) — banded
    output == exact all-pairs on a small corpus."""
    import itertools

    import ray.data

    from mex_extractors_ray.stages.dedup import (SimHashBands,
                                                 simhash_near_duplicates)

    texts = ["the quick brown fox jumps", "the quick brown fox jumped",
             "a completely different sentence here", "the quick brown cat jumps",
             "unrelated words entirely now", "the quick brown fox jumps"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    got = simhash_near_duplicates(ray.data.from_arrow(t), "text", "doc_id",
                                  k=2, max_dist=6, n_tables=8).to_pandas()
    gset = set(map(tuple, got[["a", "b"]].itertuples(index=False)))
    # exact truth: all-pairs Hamming over the same 64-bit fingerprints
    out = SimHashBands("text", "doc_id", 2, 8)(t)
    fp = {did: sim & 0xFFFFFFFFFFFFFFFF
          for did, sim in zip(out["doc_id"].to_pylist(),
                              out["sim"].to_pylist())}
    want = set()
    for a, b in itertools.combinations(sorted(fp), 2):
        if bin(fp[a] ^ fp[b]).count("1") <= 6:
            want.add((a, b))
    assert gset == want
