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


def test_lookup_modes_validate(built_index):
    d, _ = built_index
    with pytest.raises(ValueError, match="mode"):
        invindex.lookup_token_docs(d, ("beta",), mode="xor")
    with pytest.raises(ValueError, match="empty term"):
        invindex.lookup_token_docs(d, ())
    with pytest.raises(ValueError, match="no token index"):
        invindex.load_index_meta(d.parent / "nope")
