"""Time-travel (AS-OF) read semantics over the delta lake."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.cdc.apply import (
    ingest_change_log,
    read_lake_arrow,
    read_lake_asof,
    read_lake_asof_arrow,
)


def _log(rows) -> pa.Table:
    """rows: (doc_id, lsn, op, source, lang, n_tok, tokens)"""
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "lsn": pa.array([r[1] for r in rows], pa.int64()),
        "op": pa.array([r[2] for r in rows]),
        "source": pa.array(["s"] * len(rows)),
        "lang": pa.array(["de"] * len(rows)),
        "n_tok": pa.array([1] * len(rows), pa.int32()),
        "tokens": pa.array([[7]] * len(rows), pa.list_(pa.int64())),
        "schema_version": pa.array([3] * len(rows), pa.int32()),
    })


def _ingest(tmp_path, name, tables):
    lake = tmp_path / name
    for i, t in enumerate(tables):
        p = tmp_path / f"{name}-log{i}.parquet"
        pq.write_table(t, p)
        ingest_change_log([str(p)], lake, num_partitions=2)
    return lake


def test_asof_rolls_back_overwrites_deletes_and_inserts(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", None, None, None, None),
               ("b", 2, "insert", None, None, None, None),
               ("c", 3, "insert", None, None, None, None)])
    # window 2: overwrite a, delete b, insert d
    w2 = _log([("a", 11, "update", None, None, None, None),
               ("b", 12, "delete", None, None, None, None),
               ("d", 13, "insert", None, None, None, None)])
    # window 3: resurrect b
    w3 = _log([("b", 21, "update", None, None, None, None)])
    lake = _ingest(tmp_path, "lk", [w1, w2, w3])

    live = read_lake_arrow(lake)
    assert sorted(zip(live["doc_id"].to_pylist(), live["lsn"].to_pylist())) == [
        ("a", 11), ("b", 21), ("c", 3), ("d", 13)]

    # as of window-1 boundary: original a/b/c, no d
    s1 = read_lake_asof_arrow(lake, 3)
    assert sorted(zip(s1["doc_id"].to_pylist(), s1["lsn"].to_pylist())) == [
        ("a", 1), ("b", 2), ("c", 3)]

    # as of window-2 boundary: b is DELETED here even though it was later
    # resurrected (the tombstone snapshot forgot this; the delete log didn't)
    s2 = read_lake_asof_arrow(lake, 13)
    assert sorted(zip(s2["doc_id"].to_pylist(), s2["lsn"].to_pylist())) == [
        ("a", 11), ("c", 3), ("d", 13)]

    # as of the current watermark == live
    s3 = read_lake_asof_arrow(lake, 21)
    assert s3.equals(live)

    # distributed reader agrees
    ds = read_lake_asof(lake, 13).to_pandas().sort_values("doc_id")
    assert list(ds["doc_id"]) == ["a", "c", "d"]


def test_asof_before_first_write_is_empty(ray_session, tmp_path):
    w1 = _log([("a", 5, "insert", None, None, None, None),
               ("b", 6, "insert", None, None, None, None)])
    lake = _ingest(tmp_path, "lk2a", [w1])
    # the first base is a fold of NOTHING: state before it was empty and
    # stays answerable
    assert read_lake_asof_arrow(lake, 0).num_rows == 0
    assert read_lake_asof_arrow(lake, 5)["doc_id"].to_pylist() == ["a"]


def test_asof_horizon_raises_below_refold(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", None, None, None, None),
               ("b", 2, "insert", None, None, None, None)])
    lake = tmp_path / "lk2b"
    p1 = tmp_path / "lk2b-log0.parquet"
    pq.write_table(w1, p1)
    ingest_change_log([str(p1)], lake, num_partitions=2)
    # delta=False forces a RE-fold over prior state: history below its
    # watermark is squashed -> unanswerable
    w2 = _log([("a", 11, "update", None, None, None, None),
               ("b", 12, "update", None, None, None, None)])
    p2 = tmp_path / "lk2b-log1.parquet"
    pq.write_table(w2, p2)
    ingest_change_log([str(p2)], lake, num_partitions=2, delta=False)
    with pytest.raises(ValueError, match="history floor"):
        read_lake_asof_arrow(lake, 2)
    # the watermark itself is still answerable and equals live
    assert read_lake_asof_arrow(lake, 12).equals(read_lake_arrow(lake))


def test_asof_after_compaction_floor_is_watermark(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", None, None, None, None),
               ("b", 2, "insert", None, None, None, None)])
    w2 = _log([("a", 11, "update", None, None, None, None),
               ("b", 12, "delete", None, None, None, None)])
    lake = _ingest(tmp_path, "lk4", [w1, w2])
    assert read_lake_asof_arrow(lake, 2).num_rows == 2  # history alive
    from mex_extractors_ray.cdc.compact import compact

    compact(lake)
    # compaction folds: history below the watermark is squashed and the
    # delete logs are GC'd -> as-of below it raises
    with pytest.raises(ValueError, match="history floor"):
        read_lake_asof_arrow(lake, 2)
    # the watermark itself stays answerable and equals live
    assert read_lake_asof_arrow(lake, 12).equals(read_lake_arrow(lake))
    # and the delete-log files are actually gone from disk
    assert not list(lake.glob("partition=*/deletelog-*.parquet"))


def test_asof_after_repartition_floor_is_watermark(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", None, None, None, None),
               ("b", 2, "insert", None, None, None, None)])
    w2 = _log([("b", 12, "delete", None, None, None, None)])
    lake = _ingest(tmp_path, "lk5", [w1, w2])
    from mex_extractors_ray.cdc.compact import repartition_lake

    before = read_lake_arrow(lake)
    repartition_lake(lake, 4)
    assert read_lake_arrow(lake).equals(before)
    # re-sharding rewrites live state at the watermark: history squashed
    with pytest.raises(ValueError, match="history floor"):
        read_lake_asof_arrow(lake, 2)
    assert read_lake_asof_arrow(lake, 12).equals(before)


def test_asof_replay_keeps_delete_logs_idempotent(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", None, None, None, None),
               ("b", 2, "insert", None, None, None, None)])
    w2 = _log([("b", 12, "delete", None, None, None, None)])
    lake = _ingest(tmp_path, "lk3", [w1, w2])
    before = read_lake_asof_arrow(lake, 12)
    # replay both windows (all events <= watermark -> idempotent no-ops)
    _ingest(tmp_path, "lk3", [w1, w2])
    after = read_lake_asof_arrow(lake, 12)
    assert before.equals(after)
    assert after["doc_id"].to_pylist() == ["a"]
