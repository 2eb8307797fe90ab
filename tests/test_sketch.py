"""KMV approx-distinct sketch + TF-IDF operator tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from mex_extractors_ray.stages.sketch import approx_distinct
from mex_extractors_ray.stages.text import term_doc_frequency, tfidf_topk


def test_kmv_exact_under_k(ray_session):
    # 3 keys with 10/100/1000 distinct values, delivered across many batches
    rng = np.random.default_rng(7)
    keys, vals = [], []
    for key, n in (("a", 10), ("b", 100), ("c", 1000)):
        v = rng.choice(n * 10, size=n, replace=False)
        v = np.repeat(v, 3)  # duplicates must not inflate the count
        keys += [key] * len(v)
        vals += v.tolist()
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(8)
    out = {r["k"]: r for r in approx_distinct(ds, "k", "v", k=2048).take_all()}
    assert {k: r["n_distinct"] for k, r in out.items()} == {"a": 10, "b": 100, "c": 1000}
    assert all(r["exact"] for r in out.values())


def test_kmv_estimator_error_bound(ray_session):
    # 50k distinct values at k=512: rse = 1/sqrt(511) ~ 4.4%; assert < 4 sigma
    n = 50_000
    ds = ray.data.from_arrow(pa.table({"k": ["x"] * n, "v": np.arange(n)})).repartition(8)
    (row,) = approx_distinct(ds, "k", "v", k=512).take_all()
    assert not row["exact"]
    assert abs(row["n_distinct"] - n) / n < 4 / np.sqrt(511)


def test_kmv_null_values_count_once(ray_session):
    t = pa.table({"k": ["a"] * 4, "v": pa.array([None, None, "x", "y"], pa.string())})
    (row,) = approx_distinct(ray.data.from_arrow(t), "k", "v", k=64).take_all()
    # nulls hash like the empty string: one extra distinct, never a crash
    assert row["n_distinct"] == 3


def test_term_doc_frequency(ray_session):
    t = pa.table({"doc_id": [1, 2, 3], "text": ["a b a", "b c", None]})
    df = {r["word"]: r["df"] for r in
          term_doc_frequency(ray.data.from_arrow(t)).take_all()}
    assert df == {"a": 1, "b": 2, "c": 1}


def test_tfidf_ppm_ranking_and_ties(ray_session):
    # doc 1: 'rare' appears once (df=1 -> 1e6), 'common' twice (df=2 -> 1e6)
    # equal scores tie-break word-ASC
    t = pa.table({"doc_id": [1, 2], "text": ["rare common common", "common"]})
    out = tfidf_topk(ray.data.from_arrow(t), m=2).to_pandas()
    d1 = out[out.doc_id == 1].sort_values("rank")
    assert list(d1["word"]) == ["common", "rare"]
    assert list(d1["score"]) == [1_000_000, 1_000_000]
    assert list(d1["rank"]) == [1, 2]


def test_tfidf_log_mode(ray_session):
    t = pa.table({"doc_id": [1, 2], "text": ["aa bb", "bb"]})
    out = tfidf_topk(ray.data.from_arrow(t), m=1, mode="log", n_docs=2).to_pandas()
    d1 = out[out.doc_id == 1].iloc[0]
    # aa: tf=1, df=1 -> idf = ln(3/2)+1 > bb's ln(3/3)+1
    assert d1["word"] == "aa"
    assert abs(d1["score"] - (np.log(3 / 2) + 1)) < 1e-12


def test_explode_chunks_edges(ray_session):
    from mex_extractors_ray.stages.dedup import explode_chunks

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["a b c d e", "", None]})
    out = explode_chunks(t, k=2)
    assert out["doc_id"].to_pylist() == [1, 1, 1]      # empty/null docs: no chunks
    assert out["chunk_idx"].to_pylist() == [0, 1, 2]
    assert out["chunk"].to_pylist() == ["a b", "c d", "e"]  # short last chunk


def test_chunk_dedup_reassembles_and_drops(ray_session):
    from mex_extractors_ray.stages.dedup import chunk_dedup

    t = pa.table({
        "doc_id": [1, 2, 3],
        # doc2 repeats doc1's first chunk; doc3 is entirely doc1's chunks
        "text": ["x y z w", "x y q r", "x y z w"],
    })
    out = {r["doc_id"]: r for r in
           chunk_dedup(ray.data.from_arrow(t), k=2).take_all()}
    assert out[1]["clean_text"] == "x y z w" and out[1]["n_kept"] == 2
    assert out[2]["clean_text"] == "q r" and out[2]["n_kept"] == 1
    assert 3 not in out  # every chunk seen earlier -> doc disappears
