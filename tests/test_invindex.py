"""Inverted token index: build, routed lookups, max_df, resume."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.stages import invindex

DOCS = [
    (0, "alpha beta gamma"),
    (1, "beta gamma delta"),
    (2, "gamma delta epsilon"),
    (3, "alpha alpha zeta"),      # repeated token → one posting
    (4, ""),                       # empty doc
    (5, None),                     # null doc
    (6, "beta zeta"),
]


def _corpus_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string()),
    })).repartition(3)


def _brute(terms, mode):
    posts = []
    for term in terms:
        posts.append({d for d, t in DOCS if t and term in t.split(" ")})
    s = set.intersection(*posts) if mode == "all" else set.union(*posts)
    return sorted(s)


@pytest.fixture()
def built_index(ray_session, tmp_path):
    d = tmp_path / "idx"
    report = invindex.build_token_index(_corpus_ds(ray_session), d,
                                        num_buckets=4)
    return d, report


def test_build_report(built_index):
    _, report = built_index
    # 6 distinct tokens; postings = distinct (token, doc) pairs
    assert report["tokens"] == 6
    assert report["postings"] == sum(
        len({w for w in t.split(" ") if w}) for _, t in DOCS if t)
    assert report["dropped_tokens"] == 0


@pytest.mark.parametrize("terms,mode", [
    (("gamma",), "all"),
    (("beta", "gamma"), "all"),
    (("alpha", "delta"), "any"),
    (("alpha", "beta", "gamma", "delta", "epsilon", "zeta"), "any"),
    (("alpha", "epsilon"), "all"),       # disjoint → empty
    (("nosuchword",), "all"),            # unindexed → empty
    (("nosuchword", "beta"), "any"),
])
def test_lookup_matches_brute_force(built_index, terms, mode):
    d, _ = built_index
    got = invindex.lookup_token_docs(d, terms, mode=mode)["doc_id"].to_pylist()
    assert got == _brute(terms, mode)


def test_token_df(built_index):
    d, _ = built_index
    t = invindex.token_df(d, ("gamma", "zeta", "nosuchword"))
    assert dict(zip(t["token"].to_pylist(), t["df"].to_pylist())) == {
        "gamma": 3, "zeta": 2, "nosuchword": 0}


def test_max_df_drops_and_refuses(ray_session, tmp_path):
    d = tmp_path / "idx"
    report = invindex.build_token_index(_corpus_ds(ray_session), d,
                                        num_buckets=4, max_df=2)
    meta = invindex.load_index_meta(d)
    assert "gamma" in meta["dropped_tokens"]          # df=3 > 2
    assert report["dropped_tokens"] == len(meta["dropped_tokens"])
    with pytest.raises(ValueError, match="dropped at build time"):
        invindex.lookup_token_docs(d, ("gamma",))
    # surviving terms still answer
    got = invindex.lookup_token_docs(d, ("zeta",))["doc_id"].to_pylist()
    assert got == [3, 6]


def test_resume_skips_existing_buckets(ray_session, tmp_path):
    d = tmp_path / "idx"
    invindex.build_token_index(_corpus_ds(ray_session), d, num_buckets=4)
    written = sorted(p.name for p in d.glob("bucket=*.parquet"))
    assert written
    # delete one bucket, resume: only the missing one is rewritten
    victim = d / written[0]
    before = {p.name: p.stat().st_mtime_ns for p in d.glob("bucket=*.parquet")}
    victim.unlink()
    report = invindex.build_token_index(_corpus_ds(ray_session), d,
                                        num_buckets=4, resume=True)
    assert report["skipped_buckets"] == len(written) - 1
    after = {p.name: p.stat().st_mtime_ns for p in d.glob("bucket=*.parquet")}
    assert set(after) == set(before)
    for name, mtime in after.items():
        if name == written[0]:
            continue
        assert mtime == before[name]     # untouched
    # and lookups are whole again
    got = invindex.lookup_token_docs(d, ("beta", "gamma"), mode="all")
    assert got["doc_id"].to_pylist() == _brute(("beta", "gamma"), "all")


def test_bucket_files_are_token_sorted_small_row_groups(built_index):
    d, _ = built_index
    for p in d.glob("bucket=*.parquet"):
        t = pq.read_table(p)
        toks = t["token"].to_pylist()
        assert toks == sorted(toks)
        dfs = np.asarray(t["df"])
        lens = np.asarray([len(x) for x in t["doc_ids"].to_pylist()])
        assert (dfs == lens).all()
        for lst in t["doc_ids"].to_pylist():
            assert lst == sorted(lst)


def test_postings_carry_tf_and_dlen(built_index):
    d, _ = built_index
    # brute per-pair tf + per-doc length from the fixture
    want_tf = {}
    want_dl = {}
    for did, txt in DOCS:
        words = [w for w in (txt or "").split(" ") if w]
        want_dl[did] = len(words)
        for w in set(words):
            want_tf[(w, did)] = words.count(w)
    for p in d.glob("bucket=*.parquet"):
        t = pq.read_table(p)
        for i in range(t.num_rows):
            tok = t["token"][i].as_py()
            ids = t["doc_ids"][i].as_py()
            tfs = t["tfs"][i].as_py()
            dls = t["dlens"][i].as_py()
            assert len(ids) == len(tfs) == len(dls)
            for did, tf, dl in zip(ids, tfs, dls):
                assert tf == want_tf[(tok, did)]
                assert dl == want_dl[did]
    meta = invindex.load_index_meta(d)
    assert meta["n_docs"] == len(DOCS)                 # incl. empty + null
    assert meta["total_len"] == sum(want_dl.values())


def _brute_bm25(terms, k, k1=1.25, b=0.75):
    import math

    n_docs = float(len(DOCS))
    dls = {did: len([w for w in (txt or "").split(" ") if w]) for did, txt in DOCS}
    avgdl = float(sum(dls.values())) / n_docs
    scores = {}
    for term in dict.fromkeys(terms):
        post = [(did, [w for w in (txt or "").split(" ") if w].count(term))
                for did, txt in DOCS if txt and term in txt.split(" ")]
        df = float(len(post))
        for did, tf in post:
            tf = float(tf)
            dl = float(dls[did])
            idf = (n_docs - df + 0.5) / (df + 0.5)
            sc = math.floor(1e6 * (idf * ((tf * (k1 + 1.0))
                            / (tf + k1 * (1.0 - b + (b * dl) / avgdl)))) + 0.5)
            scores[did] = scores.get(did, 0) + sc
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


@pytest.mark.parametrize("terms,k", [
    (("alpha",), 3),
    (("beta", "gamma"), 10),
    (("alpha", "zeta", "epsilon"), 4),
    (("alpha", "alpha", "zeta"), 4),     # duplicate terms deduped
    (("nosuchword",), 5),                # unindexed → empty
])
def test_bm25_matches_brute_force(built_index, terms, k):
    d, _ = built_index
    got = invindex.bm25_topk(d, terms, k=k)
    pairs = list(zip(got["doc_id"].to_pylist(), got["score_c6"].to_pylist()))
    assert pairs == _brute_bm25(terms, k)


def test_bm25_validates(built_index, tmp_path):
    d, _ = built_index
    with pytest.raises(ValueError, match="empty term"):
        invindex.bm25_topk(d, ())
    # a stats-free (pre-upgrade) meta must refuse, not mis-score
    import json
    legacy = tmp_path / "legacy"
    legacy.mkdir()
    meta = invindex.load_index_meta(d).copy()
    meta.pop("n_docs"), meta.pop("total_len")
    (legacy / invindex.META_NAME).write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="corpus stats"):
        invindex.bm25_topk(legacy, ("beta",))


def _mk_ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(2)


def test_update_equals_rebuild(ray_session, tmp_path):
    import random

    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

    def txt():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))

    v1 = [(i, txt()) for i in range(40)]
    # change set: delete 10, update 10, insert 10 (incl. an empty insert)
    deletes = v1[:10]
    updates = [(d, txt()) for d, _ in v1[10:20]]
    inserts = [(100 + i, txt()) for i in range(9)] + [(199, "")]
    v2 = updates + v1[20:] + inserts

    import ray.data

    changes = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in deletes] + [d for d, _ in updates]
                           + [d for d, _ in inserts], pa.int64()),
        "op": pa.array(["delete"] * 10 + ["update"] * 10 + ["insert"] * 10),
        "old_text": pa.array([t for _, t in deletes]
                             + [dict(v1)[d] for d, _ in updates]
                             + [None] * 10, pa.string()),
        "new_text": pa.array([None] * 10 + [t for _, t in updates]
                             + [t for _, t in inserts], pa.string()),
    })).repartition(3)

    inc, full = tmp_path / "inc", tmp_path / "full"
    invindex.build_token_index(_mk_ds(v1), inc, num_buckets=4)
    r = invindex.update_token_index(inc, changes, update_id="w1")
    assert not r["noop"] and r["buckets_touched"] >= 1
    invindex.build_token_index(_mk_ds(v2), full, num_buckets=4)

    # byte-equivalent postings per bucket, identical meta stats
    for b in range(4):
        pi, pf = invindex.bucket_path(inc, b), invindex.bucket_path(full, b)
        if not pf.exists():
            assert not pi.exists() or pq.read_table(pi).num_rows == 0
            continue
        ti = pq.read_table(pi) if pi.exists() else None
        assert ti is not None and ti.equals(pq.read_table(pf)), f"bucket {b}"
    mi, mf = invindex.load_index_meta(inc), invindex.load_index_meta(full)
    assert mi["n_docs"] == mf["n_docs"] == len(v2)
    assert mi["total_len"] == mf["total_len"]

    # ranked retrieval agrees end to end
    got = invindex.bm25_topk(inc, ("alpha", "zeta"), k=15)
    want = invindex.bm25_topk(full, ("alpha", "zeta"), k=15)
    assert got.equals(want)

    # idempotency: same update_id is a metadata noop
    assert invindex.update_token_index(inc, changes, update_id="w1")["noop"]
    assert invindex.load_index_meta(inc)["n_docs"] == len(v2)


def test_segment_update_fold_and_compact(ray_session, tmp_path):
    import random

    import ray.data

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

    def txt():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))

    v1 = dict((i, txt()) for i in range(40))

    def window(cur, dels, upds, ins_base):
        rows = ([(d, "delete", cur[d], None) for d in dels]
                + [(d, "update", cur[d], txt()) for d in upds]
                + [(ins_base + i, "insert", None, txt()) for i in range(5)])
        nxt = {k: v for k, v in cur.items() if k not in set(dels)}
        for d, op, _, new in rows:
            if op != "delete":
                nxt[d] = new
        ch = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows]),
            "old_text": pa.array([r[2] for r in rows], pa.string()),
            "new_text": pa.array([r[3] for r in rows], pa.string()),
        })).repartition(2)
        return ch, nxt

    inc = tmp_path / "inc"
    invindex.build_token_index(_mk_ds(sorted(v1.items())), inc, num_buckets=4)
    w1, v2 = window(v1, dels=[0, 1], upds=[5, 6, 7], ins_base=100)
    w2, v3 = window(v2, dels=[5, 100], upds=[2, 101], ins_base=200)
    r1 = invindex.update_token_index(inc, w1, update_id="w1", segment=True)
    assert r1["segment"] and not r1["noop"]
    r2 = invindex.update_token_index(inc, w2, update_id="w2", segment=True)
    assert invindex.load_index_meta(inc)["segments"] == ["w1", "w2"]

    full = tmp_path / "full"
    invindex.build_token_index(_mk_ds(sorted(v3.items())), full, num_buckets=4)

    # BEFORE compaction: read-path folding answers like the full rebuild
    for terms, mode in [(("alpha",), "any"), (("beta", "gamma"), "all")]:
        got = invindex.lookup_token_docs(inc, terms, mode=mode)
        want = invindex.lookup_token_docs(full, terms, mode=mode)
        assert got.equals(want), (terms, mode)
    assert invindex.token_df(inc, tuple(vocab)).equals(
        invindex.token_df(full, tuple(vocab)))
    assert invindex.bm25_topk(inc, ("alpha", "zeta"), k=20).equals(
        invindex.bm25_topk(full, ("alpha", "zeta"), k=20))

    # an UNCOMMITTED segment file is invisible (crash discipline)
    rogue = invindex.segment_path(inc, 0, "crashed")
    pq.write_table(pq.read_table(invindex.segment_path(inc, 0, "w1"))
                   if invindex.segment_path(inc, 0, "w1").exists()
                   else pa.table({"token": pa.array(["alpha"]),
                                  "doc_id": pa.array([999], pa.int64()),
                                  "tf": pa.array([1], pa.int64()),
                                  "dlen": pa.array([1], pa.int64()),
                                  "rank": pa.array([2], pa.int8())}), rogue)
    got = invindex.lookup_token_docs(inc, ("alpha",), mode="any")
    assert got.equals(invindex.lookup_token_docs(full, ("alpha",), mode="any"))
    rogue.unlink()

    # compaction folds to byte-identical bases and clears segments
    rep = invindex.compact_token_index(inc)
    assert not rep["noop"] and rep["segments_folded"] == 2
    assert invindex.load_index_meta(inc)["segments"] == []
    assert not list(inc.glob("*.seg-*.parquet"))
    for b in range(4):
        pi, pf = invindex.bucket_path(inc, b), invindex.bucket_path(full, b)
        if not pf.exists():
            assert not pi.exists() or pq.read_table(pi).num_rows == 0
            continue
        assert pq.read_table(pi).equals(pq.read_table(pf)), f"bucket {b}"
    mi, mf = invindex.load_index_meta(inc), invindex.load_index_meta(full)
    assert (mi["n_docs"], mi["total_len"]) == (mf["n_docs"], mf["total_len"])
    # second compact is a noop; queries unchanged post-compact
    assert invindex.compact_token_index(inc)["noop"]
    assert invindex.bm25_topk(inc, ("alpha", "zeta"), k=20).equals(
        invindex.bm25_topk(full, ("alpha", "zeta"), k=20))
    # a retried window id is a noop even after compaction cleared segments
    assert invindex.update_token_index(inc, w2, update_id="w2")["noop"]


def test_phrase_lookup_positbrute(ray_session, tmp_path):
    d = tmp_path / "pidx"
    invindex.build_token_index(_corpus_ds(ray_session), d, num_buckets=4,
                               positions=True)

    def brute(phrase):
        out = []
        for did, txt in DOCS:
            toks = [w for w in (txt or "").split(" ") if w]
            if any(toks[i:i + len(phrase)] == list(phrase)
                   for i in range(len(toks))):
                out.append(did)
        return out

    for phrase in [("beta", "gamma"), ("gamma", "delta"),
                   ("beta", "gamma", "delta"), ("alpha", "alpha"),
                   ("gamma", "beta"), ("alpha", "epsilon")]:
        got = invindex.phrase_lookup(d, phrase)["doc_id"].to_pylist()
        assert sorted(got) == brute(phrase), phrase
    # validation
    with pytest.raises(ValueError, match="at least 2"):
        invindex.phrase_lookup(d, ("beta",))
    # positionless index refuses
    d2 = tmp_path / "noidx"
    invindex.build_token_index(_corpus_ds(ray_session), d2, num_buckets=4)
    with pytest.raises(ValueError, match="positions"):
        invindex.phrase_lookup(d2, ("beta", "gamma"))


def test_positional_segment_update_phrases(ray_session, tmp_path):
    import ray.data

    d = tmp_path / "pidx"
    invindex.build_token_index(_corpus_ds(ray_session), d, num_buckets=4,
                               positions=True)
    changes = ray.data.from_items([
        {"doc_id": 50, "op": "insert", "old_text": None,
         "new_text": "beta gamma delta beta gamma"},
        {"doc_id": 1, "op": "update", "old_text": "beta gamma delta",
         "new_text": "delta gamma beta"},
    ])
    invindex.update_token_index(d, changes, update_id="w1", segment=True)
    # doc 1 no longer matches 'beta gamma'; doc 50 does (twice)
    got = sorted(invindex.phrase_lookup(d, ("beta", "gamma"))["doc_id"].to_pylist())
    assert got == [0, 50]
    assert invindex.phrase_lookup(d, ("delta", "gamma", "beta"))[
        "doc_id"].to_pylist() == [1]
    # post-compaction answers are identical
    invindex.compact_token_index(d)
    assert sorted(invindex.phrase_lookup(d, ("beta", "gamma"))[
        "doc_id"].to_pylist()) == [0, 50]
    # positional update equals a positional rebuild over the final corpus
    full = tmp_path / "full"
    v2 = {did: txt for did, txt in DOCS}
    v2[50] = "beta gamma delta beta gamma"
    v2[1] = "delta gamma beta"
    invindex.build_token_index(_mk_ds(sorted(v2.items())), full,
                               num_buckets=4, positions=True)
    for b in range(4):
        pi, pf = invindex.bucket_path(d, b), invindex.bucket_path(full, b)
        if pf.exists():
            assert pq.read_table(pi).equals(pq.read_table(pf)), f"bucket {b}"


def test_proximity_lookup_brute(ray_session, tmp_path):
    d = tmp_path / "pidx"
    invindex.build_token_index(_corpus_ds(ray_session), d, num_buckets=4,
                               positions=True)

    def brute(a, b, k):
        out = []
        for did, txt in DOCS:
            toks = [w for w in (txt or "").split(" ") if w]
            pa_ = [i for i, w in enumerate(toks) if w == a]
            pb_ = [i for i, w in enumerate(toks) if w == b]
            if a == b:
                ok = any(abs(x - y) <= k for i, x in enumerate(pa_)
                         for y in pa_[i + 1:])
            else:
                ok = any(abs(x - y) <= k for x in pa_ for y in pb_)
            if ok:
                out.append(did)
        return out

    for a, b, k in [("alpha", "gamma", 2), ("alpha", "gamma", 1),
                    ("beta", "zeta", 1), ("alpha", "alpha", 1),
                    ("alpha", "epsilon", 5), ("nosuch", "beta", 3)]:
        got = sorted(invindex.proximity_lookup(d, a, b, k)["doc_id"].to_pylist())
        assert got == brute(a, b, k), (a, b, k)
    with pytest.raises(ValueError, match="max_dist"):
        invindex.proximity_lookup(d, "a", "b", 0)


def test_update_refuses_max_df_index(ray_session, tmp_path):
    import ray.data

    d = tmp_path / "idx"
    invindex.build_token_index(_corpus_ds(ray_session), d, num_buckets=4,
                               max_df=100)
    changes = ray.data.from_items([
        {"doc_id": 9, "op": "insert", "old_text": None, "new_text": "beta"}])
    with pytest.raises(ValueError, match="max_df"):
        invindex.update_token_index(d, changes, update_id="x")


def test_lookup_modes_validate(built_index):
    d, _ = built_index
    with pytest.raises(ValueError, match="mode"):
        invindex.lookup_token_docs(d, ("beta",), mode="xor")
    with pytest.raises(ValueError, match="empty term"):
        invindex.lookup_token_docs(d, ())
    with pytest.raises(ValueError, match="no token index"):
        invindex.load_index_meta(d.parent / "nope")
