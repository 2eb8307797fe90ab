"""Tests for the hash-shuffle runtime context and bijective shard labels.

``hashing.shuffle_labels`` maps a dense 0..P-1 coarse-partition tag space
bijectively onto Ray's hash-shuffle aggregator buckets so no bucket is
ever empty (empty buckets emit schema-less RefBundles and executor
warnings). ``runtime.hash_shuffle`` flips the DataContext shuffle
strategy for the duration of one pipeline and restores it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mex_extractors_ray import runtime as rt
from mex_extractors_ray.hashing import assign_partitions, shard_tags, shuffle_labels


@pytest.mark.parametrize("p", [1, 2, 7, 16, 64])
def test_shuffle_labels_bijective(p):
    labels = shuffle_labels(p)
    assert len(labels) == p
    assert len(set(labels.tolist())) == p
    # faithfulness to the probe's own hash model: label i lands in bucket i
    for bucket, key in enumerate(labels.tolist()):
        assert hash((pa.scalar(key, pa.int64()),)) % p == bucket


def test_shard_tags_vectorized_matches_labels():
    p = 16
    parts = np.array([0, 5, 15, 5, 0], dtype=np.int32)
    tags = shard_tags(parts, p)
    labels = shuffle_labels(p)
    assert tags.type == pa.int64()
    assert tags.to_pylist() == [int(labels[i]) for i in parts]


def test_hash_shuffle_context_restores(ray_session):
    import ray.data
    from ray.data.context import ShuffleStrategy

    ctx = ray.data.DataContext.get_current()
    before_strategy = ctx.shuffle_strategy
    had_cap = hasattr(ctx, "max_hash_shuffle_aggregators")
    before_cap = getattr(ctx, "max_hash_shuffle_aggregators", None)

    with rt.hash_shuffle(agg_per_cpu=0.5) as inner:
        assert inner.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
        assert inner.max_hash_shuffle_aggregators >= 1

    assert ctx.shuffle_strategy == before_strategy
    assert getattr(ctx, "max_hash_shuffle_aggregators", None) == before_cap
    if not had_cap:
        assert not hasattr(ctx, "max_hash_shuffle_aggregators")

    # restored even when the body raises
    with pytest.raises(RuntimeError):
        with rt.hash_shuffle():
            raise RuntimeError("boom")
    assert ctx.shuffle_strategy == before_strategy


def test_keyed_blocks_same_result_under_hash_shuffle(ray_session):
    """The coarse-shuffle dedup kernel returns identical results under the
    sort-based default and the hash-shuffle strategy (strategy is an
    executor concern, never a semantics concern)."""
    import ray.data

    from mex_extractors_ray.stages import dedup

    rng = np.random.default_rng(7)
    n = 5_000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 200, n), pa.int64()),
            "v": pa.array(rng.integers(0, 10**9, n), pa.int64()),
        }
    )

    def run():
        ds = ray.data.from_arrow(t).map_batches(lambda b: b, batch_format="pyarrow")
        out = dedup.exact_dedup(ds, "k", order_by="v").to_pandas()
        return out.sort_values(["k", "v"]).reset_index(drop=True)

    base = run()
    with rt.hash_shuffle():
        hashed = run()
    assert base.equals(hashed)
    assert sorted(base["k"].tolist()) == sorted(set(t["k"].to_pylist()))


def test_cdc_shard_column_not_in_lake(ray_session, tmp_path):
    """`_shard` is shuffle plumbing: it must never appear in committed
    partition files."""
    import pyarrow.parquet as pq

    from mex_extractors_ray.cdc.apply import ingest_change_log
    from mex_extractors_ray.gen import synth_change_log

    log_dir = tmp_path / "log"
    lake = tmp_path / "lake"
    paths = synth_change_log(log_dir, n_events=2000, n_docs=300, seed=11, shard_rows=1000)
    with rt.hash_shuffle():
        ingest_change_log([str(p) for p in paths], str(lake), num_partitions=4)
    files = list(lake.rglob("part-*.parquet"))
    assert files
    for f in files:
        cols = pq.read_schema(f).names
        assert "_shard" not in cols and "pid" not in cols
