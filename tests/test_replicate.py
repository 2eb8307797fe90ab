"""Lake-to-lake replication: the replica equals the source's live state
after bootstrap and after every incremental feed pass; identity guard;
re-sharded replicas; rebase when the source squashed needed history."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.cdc import ingest_change_log
from mex_extractors_ray.cdc.apply import (
    lake_num_partitions,
    read_lake_arrow,
)
from mex_extractors_ray.cdc.replicate import read_replica_state, replicate_lake
from mex_extractors_ray.gen import synth_change_log


def _equal_lakes(a, b):
    ta, tb = read_lake_arrow(a), read_lake_arrow(b)
    assert ta.equals(tb), (ta.num_rows, tb.num_rows)


def test_bootstrap_then_incremental(ray_session, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    paths = synth_change_log(tmp_path / "log", n_events=6000, n_docs=600,
                             seed=3, shard_rows=2000)
    half = len(paths) // 2
    ingest_change_log(paths[:half], src, num_partitions=4)
    m = replicate_lake(src, dst)
    assert m["mode"] == "bootstrap"
    _equal_lakes(src, dst)
    # second window at the source (updates + deletes), then one feed pass
    ingest_change_log(paths[half:], src, num_partitions=4)
    m = replicate_lake(src, dst)
    assert m["mode"] == "incremental"
    _equal_lakes(src, dst)
    # at watermark: metadata-only noop
    assert replicate_lake(src, dst)["mode"] == "noop"
    # crash-resume: a stale marker re-ships, the apply drops re-deliveries
    state = read_replica_state(dst)
    from mex_extractors_ray.cdc.manifest import atomic_write_bytes
    import json

    stale = dict(state, watermark=state["watermark"] // 2)
    atomic_write_bytes(dst / "_replica.json", json.dumps(stale).encode())
    m = replicate_lake(src, dst)
    assert m["mode"] == "incremental"
    _equal_lakes(src, dst)


def test_resharded_replica(ray_session, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    paths = synth_change_log(tmp_path / "log", n_events=3000, n_docs=300,
                             seed=5, shard_rows=1500)
    ingest_change_log(paths, src, num_partitions=2)
    replicate_lake(src, dst, num_partitions=8)
    assert lake_num_partitions(dst) == 8
    _equal_lakes(src, dst)
    # the replica is a first-class lake: point lookups route by ITS hash
    from mex_extractors_ray.cdc.apply import lookup_docs

    ids = read_lake_arrow(src)["doc_id"].to_pylist()[:5]
    got = lookup_docs(dst, ids)
    assert got["doc_id"].to_pylist() == sorted(ids)


def test_identity_guard(ray_session, tmp_path):
    src1, src2, dst = tmp_path / "s1", tmp_path / "s2", tmp_path / "dst"
    for s, seed in [(src1, 1), (src2, 2)]:
        p = synth_change_log(tmp_path / f"log{seed}", n_events=500,
                             n_docs=50, seed=seed, shard_rows=500)
        ingest_change_log(p, s, num_partitions=2)
    replicate_lake(src1, dst)
    with pytest.raises(ValueError, match="forks? doc histories|fork doc"):
        replicate_lake(src2, dst)


def test_tail_chains_replica(ray_session, tmp_path):
    """The sensor tick drives log → lake → replica in one pass; the replica
    tracks the lake segment by segment."""
    import shutil as _sh

    from mex_extractors_ray.cdc.tail import tail_once

    src, dst = tmp_path / "lake", tmp_path / "replica"
    paths = synth_change_log(tmp_path / "log", n_events=2000, n_docs=200,
                             seed=9, shard_rows=1000)
    wal = tmp_path / "wal"
    wal.mkdir()
    for i, p in enumerate(paths):
        _sh.copy(p, wal / f"log-{i:05d}.parquet")
        (wal / f"log-{i:05d}.parquet.closed").touch()
        r = tail_once(wal, src, num_partitions=2, replica_out=dst)
        assert r["replica_mode"] in ("bootstrap", "incremental")
        _equal_lakes(src, dst)
    # caught-up tick: no ingest, no replica pass
    r = tail_once(wal, src, num_partitions=2, replica_out=dst)
    assert r["noop"] and "replica_mode" not in r


def test_rebase_when_source_folded_history(ray_session, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    paths = synth_change_log(tmp_path / "log", n_events=6000, n_docs=400,
                             seed=7, shard_rows=1000)
    ingest_change_log(paths[:2], src, num_partitions=2)
    replicate_lake(src, dst)
    # source takes more windows, then a compaction squashes the history the
    # replica still needs -> the next pass must REBASE, not raise or skew
    for p in paths[2:]:
        ingest_change_log([p], src, num_partitions=2)
    from mex_extractors_ray.cdc.compact import compact

    compact(src)
    m = replicate_lake(src, dst)
    assert m["mode"] == "bootstrap"
    _equal_lakes(src, dst)
