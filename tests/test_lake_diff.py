"""Anti-entropy lake diff: empty on identical lakes, exact verdicts on
prefix-vs-full lakes, payload-hash kernels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mex_extractors_ray.cdc import ingest_change_log, replay_reference
from mex_extractors_ray.cdc.diff import _list_hash, diff_lakes, payload_hash
from mex_extractors_ray.gen import synth_change_log


def _brute_diff(paths_a, paths_b):
    """Expected diff from the pure-python replayer over both logs."""
    out = {}
    la, _ = replay_reference(pa.concat_tables(pq.read_table(p) for p in paths_a))
    lb, _ = replay_reference(pa.concat_tables(pq.read_table(p) for p in paths_b))
    pa_rows = {r["doc_id"]: r for r in la.to_pylist()}
    pb_rows = {r["doc_id"]: r for r in lb.to_pylist()}
    payload = [c for c in la.column_names if c not in ("doc_id", "lsn")]
    for d in set(pa_rows) | set(pb_rows):
        if d not in pa_rows:
            out[d] = "added"
        elif d not in pb_rows:
            out[d] = "removed"
        elif any(pa_rows[d][c] != pb_rows[d][c] for c in payload):
            out[d] = "changed"
    return out


def test_diff_identical_lakes_is_empty(ray_session, tmp_path):
    paths = synth_change_log(tmp_path / "log", n_events=2000, n_docs=200,
                             seed=11, shard_rows=1000)
    a, b = tmp_path / "a", tmp_path / "b"
    ingest_change_log(paths, a, num_partitions=2)
    ingest_change_log(paths, b, num_partitions=4)   # different sharding
    got = diff_lakes(a, b, num_partitions=4).to_pandas()
    assert len(got) == 0


def test_diff_prefix_vs_full_matches_replayer(ray_session, tmp_path):
    paths = synth_change_log(tmp_path / "log", n_events=4000, n_docs=300,
                             seed=13, shard_rows=1000)
    half = len(paths) // 2
    a, b = tmp_path / "a", tmp_path / "b"
    ingest_change_log(paths[:half], a, num_partitions=2)
    ingest_change_log(paths, b, num_partitions=2)
    got = diff_lakes(a, b, num_partitions=4).to_pandas()
    want = _brute_diff(paths[:half], paths)
    assert dict(zip(got["doc_id"], got["status"])) == want
    assert len(got) == len(want)


def test_list_hash_order_and_null_sensitivity(ray_session):
    a = pa.array([[1, 2, 3], [3, 2, 1], [], None, [1, 2, 3]],
                 pa.list_(pa.int32()))
    h = _list_hash(a, seed=7)
    assert h[0] == h[4]            # equal lists agree
    assert h[0] != h[1]            # order matters
    assert h[2] == h[3]            # empty and null both hash to mix(seed)
    # sliced chunked input agrees with its flat equivalent
    t = pa.table({"x": a})
    h2 = payload_hash(t, ["x"])
    t_sliced = pa.table({"x": pa.chunked_array([a.slice(0, 2), a.slice(2)])})
    assert (payload_hash(t_sliced, ["x"]) == h2).all()


def test_payload_hash_column_seeds(ray_session):
    # identical values in swapped columns must NOT cancel to equal hashes
    t1 = pa.table({"x": pa.array([1, 2], pa.int64()),
                   "y": pa.array([2, 1], pa.int64())})
    t2 = pa.table({"x": pa.array([2, 1], pa.int64()),
                   "y": pa.array([1, 2], pa.int64())})
    h1, h2 = payload_hash(t1, ["x", "y"]), payload_hash(t2, ["x", "y"])
    assert not (h1 == h2).all()
