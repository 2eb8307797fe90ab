"""Regression tests for the round-3 adversarial-review fixes:

- replication bootstrap cut at src_wm (mixed-time snapshots under a
  concurrently-ingesting source converge instead of dropping changes)
- crashed bootstrap resumes (intent marker) instead of bricking the dir
- replica AHEAD of source raises instead of silently no-oping
- transform views survive delete windows when the transform retypes a column
- count-map pruning canonicalizes probe values through the column type
  (str(True) != 'true', str(5.0) != '5')
- concurrent incremental_export calls are serialized by an export lock
"""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.cdc import ingest_change_log
from mex_extractors_ray.cdc.apply import read_lake_arrow
from mex_extractors_ray.cdc.replicate import read_replica_state, replicate_lake
from mex_extractors_ray.gen import synth_change_log


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


def test_bootstrap_cut_under_concurrent_source_ingest(ray_session, tmp_path, monkeypatch):
    """A bootstrap whose snapshot mixes early- and late-read source
    partitions (a concurrent source ingest landed between the reads) must
    still converge on the next pass. Without the lsn<=src_wm cut, the
    resharded replica's single partition watermarks past the early reads'
    missing changes and the feed re-delivery is dropped as late, forever."""
    import ray

    from mex_extractors_ray.cdc import replicate as rep
    from mex_extractors_ray.hashing import assign_partitions

    src, dst = tmp_path / "src", tmp_path / "dst"
    paths = synth_change_log(tmp_path / "log", n_events=4000, n_docs=300,
                             seed=31, shard_rows=1000)
    half = len(paths) // 2
    ingest_change_log(paths[:half], src, num_partitions=2)
    t0 = read_lake_arrow(src)

    real_read_lake = rep.read_lake

    def racing_read_lake(lake, registry=None):
        # simulate a source ingest landing MID-bootstrap: partition 0 was
        # already read (old state), partition 1 is read after the ingest
        ingest_change_log(paths[half:], src, num_partitions=2)
        t1 = read_lake_arrow(src)
        p0_old = t0.filter(pa.array(
            assign_partitions(t0["doc_id"].combine_chunks(), 2) == 0))
        p1_new = t1.filter(pa.array(
            assign_partitions(t1["doc_id"].combine_chunks(), 2) == 1))
        return ray.data.from_arrow(pa.concat_tables([p0_old, p1_new]))

    monkeypatch.setattr(rep, "read_lake", racing_read_lake)
    m = replicate_lake(src, dst, num_partitions=1)  # resharded: mixes sources
    assert m["mode"] == "bootstrap"
    monkeypatch.setattr(rep, "read_lake", real_read_lake)

    # next pass observes a quiescent source -> replica must converge
    m = replicate_lake(src, dst)
    assert m["mode"] == "incremental"
    assert read_lake_arrow(dst).equals(read_lake_arrow(src))


def test_crashed_bootstrap_resumes(ray_session, tmp_path, monkeypatch):
    """A crash between the bootstrap ingest's manifest commits and the final
    marker write must not brick the replica dir: the intent marker makes the
    next pass re-bootstrap."""
    from mex_extractors_ray.cdc import replicate as rep

    src, dst = tmp_path / "src", tmp_path / "dst"
    paths = synth_change_log(tmp_path / "log", n_events=1500, n_docs=150,
                             seed=33, shard_rows=500)
    ingest_change_log(paths, src, num_partitions=2)

    real_ingest = rep.ingest_change_log

    def crashing_ingest(*a, **kw):
        real_ingest(*a, **kw)
        raise RuntimeError("simulated crash before marker write")

    monkeypatch.setattr(rep, "ingest_change_log", crashing_ingest)
    with pytest.raises(RuntimeError, match="simulated crash"):
        replicate_lake(src, dst)
    # the partial replica IS a lake on disk, with only the intent marker
    assert (dst / "_lake_meta.json").exists()
    assert read_replica_state(dst)["watermark"] == -2
    monkeypatch.setattr(rep, "ingest_change_log", real_ingest)

    m = replicate_lake(src, dst)  # must NOT raise "refusing to overwrite"
    assert m["mode"] == "bootstrap"
    assert read_lake_arrow(dst).equals(read_lake_arrow(src))


def test_replica_ahead_of_source_raises(ray_session, tmp_path):
    """A replica watermark above the source's means the source was wiped
    and rebuilt: raise (the export's guard), never a silent noop."""
    import shutil

    src, dst = tmp_path / "src", tmp_path / "dst"
    paths = synth_change_log(tmp_path / "log", n_events=2000, n_docs=200,
                             seed=35, shard_rows=500)
    ingest_change_log(paths, src, num_partitions=2)
    replicate_lake(src, dst)
    shutil.rmtree(src)
    ingest_change_log(paths[:1], src, num_partitions=2)  # rebuilt, lower wm
    with pytest.raises(ValueError, match="AHEAD"):
        replicate_lake(src, dst)


def _retyping_view_registry():
    from mex_extractors_ray.schema import SchemaRegistry, SchemaVersion

    return SchemaRegistry([SchemaVersion(1, (
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.float64()),  # RETYPED vs the source's int32
        ("source", pa.string()),
        ("lang", pa.string()),
    ), {"lang": "de"})])


def test_transform_view_retyped_column_survives_deletes(ray_session, tmp_path):
    """A transform that keeps a column's name but changes its type must
    still maintain the view through a window containing deletes (the
    delete reshaping must follow the TRANSFORMED schema, not the source's)."""

    def _to_float(t: pa.Table) -> pa.Table:
        i = t.column_names.index("n_tok")
        return t.set_column(i, "n_tok", t["n_tok"].cast(pa.float64()))

    src, dst = tmp_path / "src", tmp_path / "dst"
    vr = _retyping_view_registry()
    kw = dict(transform=_to_float, transform_id="to-float-v1",
              dst_registry=vr)
    w1 = _src_rows([("a", 1, "insert", "s"), ("b", 2, "insert", "s")])
    w2 = _src_rows([("a", 11, "delete", "s"), ("c", 12, "insert", "s")])
    p1, p2 = tmp_path / "w1.parquet", tmp_path / "w2.parquet"
    pq.write_table(w1, p1)
    pq.write_table(w2, p2)
    ingest_change_log([str(p1)], src, num_partitions=2)
    replicate_lake(src, dst, **kw)
    ingest_change_log([str(p2)], src, num_partitions=2)
    replicate_lake(src, dst, **kw)  # delete of "a" rides the feed
    got = read_lake_arrow(dst, registry=vr)
    assert got["doc_id"].to_pylist() == ["b", "c"]
    assert got["n_tok"].type == pa.float64()


def test_transform_dropping_key_column_raises(ray_session, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    p = tmp_path / "w.parquet"
    pq.write_table(_src_rows([("a", 1, "insert", "s")]), p)
    ingest_change_log([str(p)], src, num_partitions=2)
    with pytest.raises(Exception, match="doc_id|lsn"):
        replicate_lake(src, dst, transform=lambda t: t.drop_columns(["lsn"]),
                       transform_id="bad",
                       dst_registry=_retyping_view_registry())


def test_count_probe_keys_canonicalization():
    from mex_extractors_ray.cdc.filtered import _count_probe_keys

    assert _count_probe_keys([True], pa.bool_()) == ["true"]
    assert _count_probe_keys([5.0], pa.int64()) == ["5"]
    assert _count_probe_keys([5], pa.int64()) == ["5"]
    assert _count_probe_keys(["x"], pa.string()) == ["x"]
    # not representable in the column type -> None (no pruning, conservative)
    assert _count_probe_keys([5.5], pa.int64()) is None
    assert _count_probe_keys(["x"], pa.int64()) is None
    # null probes match no row -> dropped from the key list
    assert _count_probe_keys([None, "a"], pa.string()) == ["a"]


def test_tracked_count_pruning_with_float_probe(ray_session, tmp_path):
    """A float-spelled probe against an int-typed tracked column must not
    wrongly prune every partition (str(5.0)='5.0' vs the count key '5')."""
    from mex_extractors_ray.cdc.filtered import (
        plan_filtered_read,
        read_lake_filtered_arrow,
    )

    lake = tmp_path / "lake"
    paths = synth_change_log(tmp_path / "log", n_events=1000, n_docs=100,
                             seed=37, shard_rows=500)
    ingest_change_log(paths, lake, num_partitions=4,
                      track_value_counts=("n_tok",))
    live = read_lake_arrow(lake)
    v = int(live["n_tok"][0].as_py())
    expect = live.filter(pc.equal(live["n_tok"], v))
    got = read_lake_filtered_arrow(lake, "n_tok", "==", float(v))
    assert got.equals(expect)
    assert plan_filtered_read(lake, "n_tok", "==", float(v)) == \
        plan_filtered_read(lake, "n_tok", "==", v)
    # a fractional probe can match nothing but must not crash or mis-prune
    assert read_lake_filtered_arrow(lake, "n_tok", "==", v + 0.5).num_rows == 0


def test_export_lock_serializes_writers(ray_session, tmp_path):
    from mex_extractors_ray.cdc.manifest import ConcurrentWriterError, writer_lock
    from mex_extractors_ray.pipelines.incremental_export import incremental_export

    lake, out = tmp_path / "lake", tmp_path / "export"
    paths = synth_change_log(tmp_path / "log", n_events=500, n_docs=50,
                             seed=39, shard_rows=500)
    ingest_change_log(paths, lake, num_partitions=2)
    out.mkdir()
    with writer_lock(out, "other-exporter"):
        with pytest.raises(ConcurrentWriterError):
            incremental_export(lake, out)
    # lock released -> the export proceeds
    m = incremental_export(lake, out)
    assert m["watermark"] >= 0
