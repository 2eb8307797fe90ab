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


def test_chained_replication(ray_session, tmp_path):
    """Replicas are first-class lakes, so replication chains: src → r1 → r2
    stays equal end to end across incremental windows."""
    src, r1, r2 = tmp_path / "src", tmp_path / "r1", tmp_path / "r2"
    paths = synth_change_log(tmp_path / "log", n_events=3000, n_docs=300,
                             seed=13, shard_rows=1000)
    for p in paths:
        ingest_change_log([p], src, num_partitions=2)
        replicate_lake(src, r1)
        replicate_lake(r1, r2, num_partitions=4)
    _equal_lakes(src, r1)
    _equal_lakes(src, r2)


def test_identity_guard(ray_session, tmp_path):
    src1, src2, dst = tmp_path / "s1", tmp_path / "s2", tmp_path / "dst"
    for s, seed in [(src1, 1), (src2, 2)]:
        p = synth_change_log(tmp_path / f"log{seed}", n_events=500,
                             n_docs=50, seed=seed, shard_rows=500)
        ingest_change_log(p, s, num_partitions=2)
    replicate_lake(src1, dst)
    with pytest.raises(ValueError, match="forks? doc histories|fork doc"):
        replicate_lake(src2, dst)


def _src_rows(rows):
    """rows: (doc_id, lsn, op, source)"""
    n = len(rows)
    return pa.table({
        "lsn": pa.array([r[1] for r in rows], pa.int64()),
        "op": [r[2] for r in rows],
        "doc_id": [r[0] for r in rows],
        "tokens": pa.array([[1]] * n, pa.list_(pa.int32())),
        "n_tok": pa.array([1] * n, pa.int32()),
        "source": [r[3] for r in rows],
        "schema_version": pa.array([2] * n, pa.int32()),
        "lang": ["de"] * n,
    })


def test_filtered_replica_in_out_transitions(ray_session, tmp_path):
    """where= makes the replica a maintained-view LAKE: docs updated out of
    the predicate retract, docs updated into it appear; filter identity is
    marker-recorded (inherit / refuse-mismatch)."""
    import pyarrow.compute as pc

    src, dst = tmp_path / "src", tmp_path / "dst"
    where = [("source", "==", "srcA")]
    w1 = _src_rows([("a", 1, "insert", "srcA"), ("b", 2, "insert", "srcB"),
                    ("c", 3, "insert", "srcB")])
    # a leaves the view, c enters it, b (never in view) deleted
    w2 = _src_rows([("a", 11, "update", "srcB"), ("c", 12, "update", "srcA"),
                    ("b", 13, "delete", "srcB")])
    p1, p2 = tmp_path / "w1.parquet", tmp_path / "w2.parquet"
    pq.write_table(w1, p1)
    pq.write_table(w2, p2)
    ingest_change_log([str(p1)], src, num_partitions=2)
    m = replicate_lake(src, dst, where=where)
    assert m["mode"] == "bootstrap"
    assert read_lake_arrow(dst)["doc_id"].to_pylist() == ["a"]
    ingest_change_log([str(p2)], src, num_partitions=2)
    m = replicate_lake(src, dst)  # unspecified where inherits the marker
    assert m["mode"] == "incremental" and m["where"] == [["source", "==", "srcA"]]
    got = read_lake_arrow(dst)
    assert got["doc_id"].to_pylist() == ["c"]
    assert got["lsn"].to_pylist() == [12]
    live = read_lake_arrow(src)
    assert got.equals(live.filter(pc.equal(live["source"], "srcA")))
    # explicit mismatch refused
    with pytest.raises(ValueError, match="mix views"):
        replicate_lake(src, dst, where=[("source", "==", "srcB")])
    with pytest.raises(ValueError, match="mix views"):
        replicate_lake(src, dst, where=None)


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


def _view_registry():
    from mex_extractors_ray.schema import SchemaRegistry, SchemaVersion

    return SchemaRegistry([SchemaVersion(1, (
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int64()),
        ("source", pa.string()),
        ("lang", pa.string()),
        ("tok_bucket", pa.int64()),
    ), {"lang": "de"})])


def test_transform_view_maintained(ray_session, tmp_path):
    """transform= maintains a select-project view: derived columns stay
    consistent with the source's live rows across update/delete windows."""
    import pyarrow.compute as pc

    def _bucketize(t: pa.Table) -> pa.Table:
        # defined in-test so Ray pickles it by value (workers cannot
        # import the test module)
        import pyarrow.compute as _pc

        return t.append_column(
            "tok_bucket", _pc.divide(t["n_tok"].cast(pa.int64()), 10))

    src, dst = tmp_path / "src", tmp_path / "dst"
    paths = synth_change_log(tmp_path / "log", n_events=4000, n_docs=400,
                             seed=21, shard_rows=1000)
    half = len(paths) // 2
    vr = _view_registry()
    kw = dict(transform=_bucketize, transform_id="bucketize-v1",
              dst_registry=vr)
    ingest_change_log(paths[:half], src, num_partitions=4)
    m = replicate_lake(src, dst, **kw)
    assert m["mode"] == "bootstrap"
    ingest_change_log(paths[half:], src, num_partitions=4)
    m = replicate_lake(src, dst, **kw)
    assert m["mode"] == "incremental"
    live = read_lake_arrow(src)
    got = read_lake_arrow(dst, registry=vr)
    want = _bucketize(live).select(got.column_names)
    assert got.equals(want)
    # a delete-only follow-on window retracts from the view
    doomed = live["doc_id"][0].as_py()
    last = int(pc.max(live["lsn"]).as_py())
    dels = _src_rows([(doomed, last + 1, "delete", "src1")])
    p = tmp_path / "del.parquet"
    pq.write_table(dels, p)
    ingest_change_log([str(p)], src, num_partitions=4)
    replicate_lake(src, dst, **kw)
    assert doomed not in read_lake_arrow(dst, registry=vr)["doc_id"].to_pylist()
    # identity: a bare pass on a transform view refuses
    with pytest.raises(ValueError, match="transform view"):
        replicate_lake(src, dst)
    with pytest.raises(ValueError, match="transform view"):
        replicate_lake(src, dst, transform=_bucketize,
                       transform_id="bucketize-v2", dst_registry=vr)
    # row-dropping transforms are refused (that's where='s job)
    with pytest.raises(Exception, match="row-wise"):
        replicate_lake(tmp_path / "src", tmp_path / "dst2",
                       transform=lambda t: t.slice(0, 0),
                       transform_id="bad", dst_registry=vr)


def test_refuses_to_wipe_unrelated_lake(ray_session, tmp_path):
    src, other = tmp_path / "src", tmp_path / "other"
    for lake, seed in [(src, 1), (other, 2)]:
        p = synth_change_log(tmp_path / f"log{seed}", n_events=300,
                             n_docs=30, seed=seed, shard_rows=300)
        ingest_change_log(p, lake, num_partitions=2)
    before = read_lake_arrow(other)
    with pytest.raises(ValueError, match="no _replica.json"):
        replicate_lake(src, other)  # would otherwise rmtree a real lake
    assert read_lake_arrow(other).equals(before)


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
