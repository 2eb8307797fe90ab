"""Bloom-prefiltered exact semi/anti joins."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mex_extractors_ray.stages.bloom import (
    BloomFilter,
    bloom_anti_join,
    bloom_maybe_contains,
    bloom_semi_join,
    build_bloom,
)


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def _collect(ds) -> pa.Table:
    import ray

    tabs = [ray.get(r) for r in ds.to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows]
    return pa.concat_tables(tabs) if tabs else pa.table({})


def test_bloom_no_false_negatives_and_low_fp(ray_session):
    rng = np.random.default_rng(1)
    members = rng.choice(1_000_000, size=20_000, replace=False).astype(np.int64)
    right = _ds(pa.table({"k": pa.array(members)}))
    bf = build_bloom(right, "k", m_log2=18, k=4)
    # every member passes
    assert bloom_maybe_contains(pa.array(members), bf).all()
    # non-members pass at ~fill**k
    non = rng.choice(np.setdiff1d(np.arange(1_000_000), members),
                     size=50_000, replace=False).astype(np.int64)
    fp = bloom_maybe_contains(pa.array(non), bf).mean()
    assert fp < 0.05, fp
    assert 0.0 < bf.fill_fraction < 0.5


def test_bloom_semi_and_anti_exact(ray_session):
    rng = np.random.default_rng(2)
    rkeys = rng.choice(100_000, size=4_000, replace=False).astype(np.int64)
    lkeys = rng.integers(0, 100_000, size=30_000).astype(np.int64)
    truth = np.isin(lkeys, rkeys)
    left = _ds(pa.table({"k": pa.array(lkeys), "v": pa.array(np.arange(30_000))}))
    right = _ds(pa.table({"k": pa.array(rkeys)}))
    semi = _collect(bloom_semi_join(left, right, "k", num_buckets=8, m_log2=16))
    assert sorted(semi["v"].to_pylist()) == np.arange(30_000)[truth].tolist()
    anti = _collect(bloom_anti_join(left, right, "k", num_buckets=8, m_log2=16))
    assert sorted(anti["v"].to_pylist()) == np.arange(30_000)[~truth].tolist()


def test_bloom_string_keys_and_right_on(ray_session):
    left = _ds(pa.table({"name": pa.array(["a", "b", "c", "d", "a"]),
                         "v": pa.array([0, 1, 2, 3, 4])}))
    right = _ds(pa.table({"other": pa.array(["a", "c", "zz"])}))
    semi = _collect(bloom_semi_join(left, right, "name", right_on="other",
                                    num_buckets=4, m_log2=10))
    assert sorted(semi["v"].to_pylist()) == [0, 2, 4]
    anti = _collect(bloom_anti_join(left, right, "name", right_on="other",
                                    num_buckets=4, m_log2=10))
    assert sorted(anti["v"].to_pylist()) == [1, 3]


def test_bloom_empty_build_side(ray_session):
    left = _ds(pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                         "v": pa.array([0, 1, 2])}))
    right = _ds(pa.table({"k": pa.array([], pa.int64())}))
    # semi: nothing matches; the Bloom kills everything before the shuffle
    assert _collect(bloom_semi_join(left, right, "k", num_buckets=2,
                                    m_log2=10)).num_rows == 0
    # anti: everything survives as a definite miss
    anti = _collect(bloom_anti_join(left, right, "k", num_buckets=2, m_log2=10))
    assert sorted(anti["v"].to_pylist()) == [0, 1, 2]


def test_bloom_prefilter_rejects_invert():
    from mex_extractors_ray.stages.bloom import bloom_prefilter

    bf = BloomFilter(words=np.zeros(16, np.uint64), m_log2=10, k=2, seed=0)
    with pytest.raises(ValueError):
        bloom_prefilter(None, "k", bf, invert=True)
