"""Unit tests for the round-3 second-wave training-data operators:
epoch shuffle, k-means assign/train, regex redaction, repetition features."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def test_fmix64_matches_duckdb(ray_session):
    """The numpy fmix64 and the HUGEINT SQL form are bit-identical."""
    import duckdb

    from mex_extractors_ray.stages.shuffle import epoch_shuffle_sql, shuffle_keys

    ids = np.array([0, 1, 2, 7, 123456789, 2**40 + 3], dtype=np.int64)
    expect = shuffle_keys(ids, seed=17, epoch=3)
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT unnest([0,1,2,7,123456789,1099511627779]) AS doc_id")
    sub = epoch_shuffle_sql("t", "doc_id", seed=17, epoch=3)
    got = con.sql(f"SELECT shuffle_key FROM {sub} ORDER BY doc_id").df()
    assert list(got["shuffle_key"].astype(np.uint64)) == list(expect[np.argsort(ids)])


def test_epoch_shuffle_is_permutation_and_epoch_varies(ray_session):
    from mex_extractors_ray.stages.shuffle import epoch_shuffle

    t = pa.table({"doc_id": pa.array(np.arange(500, dtype=np.int64))})
    e0 = epoch_shuffle(_ds(t), "doc_id", seed=1, epoch=0).to_pandas()
    e1 = epoch_shuffle(_ds(t), "doc_id", seed=1, epoch=1).to_pandas()
    # bijection: all keys distinct; sorted output order
    assert e0["shuffle_key"].nunique() == 500
    assert (np.diff(e0["shuffle_key"].to_numpy(dtype=np.uint64)) > 0).all()
    # different epoch -> different order (overwhelming probability)
    assert list(e0["doc_id"]) != list(e1["doc_id"])
    # deterministic: same epoch re-run gives identical order
    e0b = epoch_shuffle(_ds(t), "doc_id", seed=1, epoch=0).to_pandas()
    assert list(e0["doc_id"]) == list(e0b["doc_id"])


def _emb_table(n=40, d=8) -> pa.Table:
    rng = np.random.default_rng(7)
    v = rng.normal(size=(n, d))
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(v.astype(np.float32))),
    })


def test_kmeans_assign_matches_numpy(ray_session):
    from mex_extractors_ray.stages.clustering import kmeans_assign, seed_centroids

    t = _emb_table()
    ds = _ds(t)
    c = seed_centroids(ds, 4)
    out = kmeans_assign(_ds(t), c).to_pandas().sort_values("vec_id")
    v = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    assert list(out["cluster"]) == list(np.argmin(d2, axis=1).astype(np.int32))


def test_kmeans_train_reduces_inertia(ray_session):
    from mex_extractors_ray.stages.clustering import kmeans_train, seed_centroids

    t = _emb_table(n=60)
    v = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])

    def inertia(c):
        return (((v[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)).min(axis=1).sum()

    c0 = seed_centroids(_ds(t), 4)
    c5 = kmeans_train(_ds(t), 4, n_iter=5)
    assert inertia(c5) <= inertia(c0) + 1e-9


def test_regex_redactor_sequential_and_null_safe(ray_session):
    from mex_extractors_ray.stages.text import RegexRedactor

    r = RegexRedactor([(r"\b(cat|dog)\b", "<PII>"), (r"<PII> <PII>", "<PII>")])
    t = pa.table({"text": pa.array(["cat dog bird", "scatter", None])})
    out = r(t)
    assert out["redacted"].to_pylist() == ["<PII> bird", "scatter", ""]
    with pytest.raises(ValueError):
        RegexRedactor([])


def test_repetition_features_known_values(ray_session):
    from mex_extractors_ray.stages.text import repetition_features

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a b a b a", "x y z", "", None]),
    })
    out = repetition_features(t).to_pandas()
    # doc 0: 5 words, 2 distinct -> frac 0.6 -> 6000; top bigram ("a b") x2
    assert list(out["n_words"]) == [5, 3, 0, 0]
    assert list(out["dup_word_frac_c10k"]) == [6000, 0, 0, 0]
    assert list(out["top_bigram_count"]) == [2, 1, 0, 0]


def test_repetition_matches_duckdb_oracle(ray_session):
    import duckdb

    from mex_extractors_ray.stages.text import repetition_features, repetition_sql

    rng = np.random.default_rng(3)
    words = np.array(["aa", "bb", "cc", "dd"])
    texts = [" ".join(rng.choice(words, size=rng.integers(0, 12))) for _ in range(50)]
    t = pa.table({"doc_id": pa.array(np.arange(50, dtype=np.int64)),
                  "text": pa.array(texts)})
    mine = repetition_features(t).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    oracle = con.sql(repetition_sql()).df().sort_values("doc_id").reset_index(drop=True)
    for col in ("n_words", "dup_word_frac_c10k", "top_bigram_count"):
        assert list(mine[col]) == list(oracle[col]), col


def test_interval_join_broadcast_overlaps_and_bounds(ray_session):
    from mex_extractors_ray.stages.joins import interval_join_broadcast

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([1.0, 5.0, 10.0, None]),
    })
    iv = pa.table({
        "bracket": pa.array(["a", "b"]),
        "lo": pa.array([1.0, 5.0]),
        "hi": pa.array([10.0, 10.0]),
    })
    out = interval_join_broadcast(_ds(t), iv, "v").to_pandas()
    pairs = sorted(zip(out["id"], out["bracket"]))
    # [lo, hi): v=10 excluded, v=5 matches both, null never matches
    assert pairs == [(1, "a"), (2, "a"), (2, "b")]

    both = interval_join_broadcast(_ds(t), iv, "v", closed="both").to_pandas()
    pairs = sorted(zip(both["id"], both["bracket"]))
    assert pairs == [(1, "a"), (2, "a"), (2, "b"), (3, "a"), (3, "b")]

    with pytest.raises(ValueError):
        interval_join_broadcast(_ds(t), iv, "v", closed="nope")
    with pytest.raises(ValueError):
        interval_join_broadcast(_ds(t), iv.slice(0, 0), "v")


def test_word_topk_matches_counter(ray_session):
    from collections import Counter

    from mex_extractors_ray.stages.aggregates import word_topk

    rng = np.random.default_rng(9)
    vocab = [f"w{i:02d}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 30))))
             for _ in range(200)]
    t = pa.table({"text": pa.array(texts + ["", None])})
    out = word_topk(_ds(t), "text", k=10, num_partitions=8).to_pandas()
    c = Counter(w for s in texts for w in s.split())
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(out["word"], out["n"])) == expect


def test_bounded_quantiles_nearest_rank(ray_session):
    from mex_extractors_ray.stages.aggregates import bounded_quantiles

    vals = [1, 1, 2, 3, 5, 8, 13, 21, 34, None]
    t = pa.table({"x": pa.array(vals, pa.int64())})
    out = bounded_quantiles(_ds(t), "x", (0.5, 0.9, 1.0)).to_pandas()
    # n=9 non-null: q50 -> rank ceil(4.5)=5 -> 5th smallest = 5;
    # q90 -> rank ceil(8.1)=9 -> 34; q100 -> rank 9 -> 34
    assert dict(zip(out["q_c100"], out["value"])) == {50: 5, 90: 34, 100: 34}
    with pytest.raises(ValueError):
        bounded_quantiles(_ds(t), "x", (0.0,))


def test_hash_sample_quantiles_matches_duckdb(ray_session):
    """The deterministic hash sample (k smallest fmix64 keys) and the
    nearest-rank finalize are bit-identical to the SQL mirror, including
    null exclusion and k >= n (sample = whole table = exact quantiles)."""
    import duckdb

    from mex_extractors_ray.stages.shuffle import (
        hash_sample_quantiles, hash_sample_quantiles_sql)

    rng = np.random.default_rng(3)
    n = 500
    vals = rng.normal(size=n).tolist()
    vals[7] = None
    vals[480] = None
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    for k in (64, 10_000):  # sub-sample and k >= n (exact) regimes
        out = hash_sample_quantiles(
            _ds(t), "id", "v", k=k, qs=(0.25, 0.5, 0.9), seed=5).to_pandas()
        sql = hash_sample_quantiles_sql("t", "id", "v", k,
                                        (0.25, 0.5, 0.9), seed=5)
        exp = duckdb.connect().execute(sql).df()
        got = out.sort_values("q_c100").reset_index(drop=True)
        exp = exp.sort_values("q_c100").reset_index(drop=True)
        assert got["q_c100"].tolist() == exp["q_c100"].tolist()
        assert np.allclose(got["value"], exp["value"], atol=0)
    with pytest.raises(ValueError):
        hash_sample_quantiles(_ds(t), "id", "v", qs=(1.5,))


def test_grouped_bounded_quantiles(ray_session):
    from mex_extractors_ray.stages.aggregates import grouped_bounded_quantiles

    t = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 3),
        "x": pa.array([1, 2, 3, 4, 5, 10, 20, None], pa.int64()),
    })
    out = grouped_bounded_quantiles(_ds(t), "g", "x", (0.5, 1.0)).to_pandas()
    got = {(r.grp, r.q_c100): r.value for r in out.itertuples()}
    # a: n=5 → q50 rank 3 → 3; q100 → 5. b: n=2 (null excluded) → q50 → 10
    assert got == {("a", 50): 3, ("a", 100): 5, ("b", 50): 10, ("b", 100): 20}
    with pytest.raises(ValueError):
        grouped_bounded_quantiles(_ds(t), "g", "x", (0.0,))


def test_funnel_counts_ordering_and_isolation(ray_session):
    from mex_extractors_ray.stages.aggregates import funnel_counts

    def ev(u, ty, ts):
        return {"u": u, "ty": ty, "ts": ts}

    rows = [
        # u1 completes the funnel in order
        ev(1, "view", 10), ev(1, "click", 20), ev(1, "purchase", 30),
        # u2 clicks BEFORE viewing → click doesn't count; no purchase
        ev(2, "click", 5), ev(2, "view", 10),
        # u3 clicks AT the same instant as the view → strict > excludes it
        ev(3, "view", 10), ev(3, "click", 10),
        # u4 purchases without ever viewing → counts nowhere
        ev(4, "purchase", 50),
        # u5 view → click, purchase before click → no step 3
        ev(5, "view", 1), ev(5, "purchase", 2), ev(5, "click", 3),
    ]
    t = pa.table({
        "u": pa.array([r["u"] for r in rows], pa.int64()),
        "ty": pa.array([r["ty"] for r in rows]),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
    })
    out = funnel_counts(_ds(t), "u", "ty", "ts",
                        ["view", "click", "purchase"], num_partitions=4)
    assert out["step"].to_pylist() == ["1-view", "2-click", "3-purchase"]
    # views: u1,u2,u3,u5; ordered clicks: u1,u5; ordered purchases: u1
    assert out["n_users"].to_pylist() == [4, 2, 1]
