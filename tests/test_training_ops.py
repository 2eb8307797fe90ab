"""Unit tests for the training-data operators added in round 3:
sessionize, keyed_topk, pack_sequences, decontaminate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: pa.Table, ray_session):
    import ray.data

    return ray.data.from_arrow(table)


def test_sessionize_gap_boundaries(ray_session):
    from mex_extractors_ray.stages.sessions import sessionize

    # user 1: events at 0s, 10s, 100s with gap 50s -> sessions {0,10}, {100}
    # user 2: single event; user 3: null-free two events inside one gap
    us = lambda s: s * 1_000_000
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "ts": pa.array([us(0), us(10), us(100), us(5), us(0), us(50)],
                       pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })
    out = sessionize(_ds(t, ray_session), "user_id", "ts", gap_s=50,
                     order_cols=("event_id",), num_partitions=4).to_pandas()
    out = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    rows = list(out.itertuples(index=False))
    assert [(r.user_id, r.session_id, r.n_events, r.start_us, r.end_us) for r in rows] == [
        (1, 1, 2, us(0), us(10)),
        (1, 2, 1, us(100), us(100)),
        (2, 1, 1, us(5), us(5)),
        (3, 1, 2, us(0), us(50)),   # gap == 50s is NOT > gap -> same session
    ]


def test_sessionize_rejects_int_and_null_ts(ray_session):
    from mex_extractors_ray.stages.sessions import _epoch_us

    with pytest.raises(TypeError):
        _epoch_us(pa.array([1, 2], pa.int64()))
    with pytest.raises(ValueError):
        _epoch_us(pa.array([1, None], pa.timestamp("us")))


def test_keyed_topk(ray_session):
    from mex_extractors_ray.stages.aggregates import keyed_topk

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "v": pa.array([5.0, 9.0, 9.0, 1.0, 2.0]),
        "id": pa.array([3, 1, 2, 10, 11], pa.int64()),
    })
    out = keyed_topk(_ds(t, ray_session), "k",
                     [("v", "descending"), ("id", "ascending")], k=2,
                     num_partitions=4).to_pandas()
    out = out.sort_values(["k", "rank"]).reset_index(drop=True)
    # key 1: v=9 twice, tie broken by id (1 before 2); key 2: both rows
    assert list(zip(out["k"], out["rank"], out["id"])) == [
        (1, 1, 1), (1, 2, 2), (2, 1, 11), (2, 2, 10)]


def test_pack_sequences_boundaries(ray_session):
    from mex_extractors_ray.stages.packing import pack_sequences

    # shard a: weights 6,6,6 with max_len 10 -> prefixes 0,6,12 -> packs 0,0,1
    # shard b: single doc heavier than max_len -> pack 0
    t = pa.table({
        "source": pa.array(["a", "a", "a", "b"]),
        "n": pa.array([6, 6, 6, 25], pa.int64()),
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = pack_sequences(_ds(t, ray_session), "source", "n", "doc_id",
                         max_len=10, num_partitions=4).to_pandas()
    out = out.sort_values(["source", "pack_id"]).reset_index(drop=True)
    assert list(zip(out["source"], out["pack_id"], out["n_docs"], out["weight_sum"])) == [
        ("a", 0, 2, 12), ("a", 1, 1, 6), ("b", 0, 1, 25)]


def test_pack_sequences_rejects_bad_weights(ray_session):
    from mex_extractors_ray.stages.packing import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(None, "s", "n", "d", max_len=0)


def test_decontaminate_flags_only_overlapping_docs(ray_session):
    from mex_extractors_ray.stages.dedup import collect_shingle_hashes, decontaminate

    bench = pa.table({"text": pa.array(["the quick brown fox jumps over it"])})
    corpus = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "xx the quick brown fox jumps yy",   # shares the 5-gram
            "totally different words here now",  # no overlap
            "quick brown fox jumps over",        # shares a 5-gram
        ]),
    })
    sh = collect_shingle_hashes(_ds(bench, ray_session), "text", k=5)
    assert len(sh) == 3  # 7 words -> 3 shingles
    out = decontaminate(_ds(corpus, ray_session), sh, "text", "doc_id", k=5).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]
    assert (out["n_hits"] >= 1).all()


def test_decontaminate_empty_benchmark(ray_session):
    from mex_extractors_ray.stages.dedup import decontaminate

    corpus = pa.table({"doc_id": pa.array([1], pa.int64()),
                       "text": pa.array(["a b c d e f"])})
    out = decontaminate(_ds(corpus, ray_session), np.empty(0, np.uint64),
                        "text", "doc_id", k=5).to_pandas()
    assert len(out) == 0


def test_stratified_sample_rates_and_default(ray_session):
    from mex_extractors_ray.stages.sampling import stratified_sample

    t = pa.table({
        "lang": pa.array(["de", "de", "en", "xx", None]),
        "doc_id": pa.array([0, 1, 0, 0, 0], pa.int64()),
    })
    out = stratified_sample(_ds(t, ray_session), "lang", "doc_id",
                            {"de": (1, 2), "en": (0, 1)},
                            default=(1, 1)).to_pandas()
    # de: keep doc_id%2<1 -> only 0; en: rate 0 -> dropped;
    # xx and null lang: default keeps all
    assert sorted(zip(out["lang"].fillna("<null>"), out["doc_id"])) == [
        ("<null>", 0), ("de", 0), ("xx", 0)]


def test_stratified_sample_rejects_bad_rates(ray_session):
    from mex_extractors_ray.stages.sampling import stratified_sample

    with pytest.raises(ValueError):
        stratified_sample(None, "l", "k", {"de": (3, 2)})
    with pytest.raises(ValueError):
        stratified_sample(None, "l", "k", {}, default=(1, 0))
