"""Maintained per-partition aggregates (materialized GROUP BY views)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.cdc.apply import (
    ingest_change_log,
    read_lake_arrow,
    read_live_group_sums,
    read_live_value_counts,
)

TRACK = ("source",)
TRACK_SUMS = (("source", "n_tok"),)


def _log(rows) -> pa.Table:
    """rows: (doc_id, lsn, op, source[, n_tok])"""
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "lsn": pa.array([r[1] for r in rows], pa.int64()),
        "op": pa.array([r[2] for r in rows]),
        "source": pa.array([r[3] for r in rows]),
        "lang": pa.array(["de"] * len(rows)),
        "n_tok": pa.array([r[4] if len(r) > 4 else 1 for r in rows], pa.int32()),
        "tokens": pa.array([[7]] * len(rows), pa.list_(pa.int64())),
        "schema_version": pa.array([3] * len(rows), pa.int32()),
    })


def _ingest(tmp_path, name, tables, track=TRACK, mode="last_wins",
            track_sums=TRACK_SUMS):
    lake = tmp_path / name
    for i, t in enumerate(tables):
        p = tmp_path / f"{name}-log{i}.parquet"
        pq.write_table(t, p)
        ingest_change_log([str(p)], lake, num_partitions=2,
                          track_value_counts=track, mode=mode,
                          track_group_sums=track_sums)
    return lake


def _recount(lake) -> dict:
    live = read_lake_arrow(lake)
    vc = pc.value_counts(live["source"].combine_chunks())
    return dict(zip(vc.field("values").to_pylist(),
                    (int(x) for x in vc.field("counts").to_pylist())))


def _view(lake) -> dict:
    t = read_live_value_counts(lake, "source")
    return dict(zip(t["source"].to_pylist(), t["n"].to_pylist()))


def test_view_tracks_inserts_updates_deletes_resurrections(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", "s1"), ("b", 2, "insert", "s1"),
               ("c", 3, "insert", "s2")])
    # window 2: a moves s1->s2, b deleted, d inserted into s3
    w2 = _log([("a", 11, "update", "s2"), ("b", 12, "delete", "s1"),
               ("d", 13, "insert", "s3")])
    # window 3: b resurrected into s3, c deleted (s2 -1)
    w3 = _log([("b", 21, "update", "s3"), ("c", 22, "delete", "s2")])
    lake = _ingest(tmp_path, "mv1", [w1, w2, w3])
    assert _view(lake) == _recount(lake) == {"s2": 1, "s3": 2}


def test_group_sums_track_updates_deletes_moves(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", "s1", 10), ("b", 2, "insert", "s1", 20),
               ("c", 3, "insert", "s2", 5)])
    # a's n_tok changes 10->7; b moves to s2 with 30; c deleted
    w2 = _log([("a", 11, "update", "s1", 7), ("b", 12, "update", "s2", 30),
               ("c", 13, "delete", "s2", 0)])
    lake = _ingest(tmp_path, "gs1", [w1, w2])
    t = read_live_group_sums(lake, "source", "n_tok")
    got = {r["source"]: (r["n"], r["sum_n_tok"]) for r in t.to_pylist()}
    assert got == {"s1": (1, 7), "s2": (1, 30)}
    # cross-check against a full recompute
    live = read_lake_arrow(lake)
    import collections
    exp = collections.defaultdict(lambda: [0, 0])
    for s, n in zip(live["source"].to_pylist(), live["n_tok"].to_pylist()):
        exp[s][0] += 1
        exp[s][1] += n
    assert got == {k: tuple(v) for k, v in exp.items()}


def test_group_sums_survive_compact_repartition_and_inherit(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", "s1", 10), ("b", 2, "insert", "s2", 20)])
    lake = _ingest(tmp_path, "gs2", [w1])
    w2 = _log([("c", 11, "insert", "s2", 40)])
    p = tmp_path / "gs2-follow.parquet"
    pq.write_table(w2, p)
    ingest_change_log([str(p)], lake, num_partitions=2)  # default: inherit both views
    expect = {"s1": (1, 10), "s2": (2, 60)}

    def got():
        t = read_live_group_sums(lake, "source", "n_tok")
        return {r["source"]: (r["n"], r["sum_n_tok"]) for r in t.to_pylist()}

    assert got() == expect
    from mex_extractors_ray.cdc.compact import compact, repartition_lake

    compact(lake)
    assert got() == expect
    repartition_lake(lake, 4)
    assert got() == expect


def test_view_idempotent_under_replay(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", "s1"), ("b", 2, "insert", "s2")])
    w2 = _log([("b", 12, "delete", "s2")])
    lake = _ingest(tmp_path, "mv2", [w1, w2])
    before = _view(lake)
    _ingest(tmp_path, "mv2", [w1, w2])  # replay: all events late -> noop
    assert _view(lake) == before == {"s1": 1}


def test_view_first_enable_on_existing_lake(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", "s1"), ("b", 2, "insert", "s2")])
    lake = _ingest(tmp_path, "mv3", [w1], track=())  # window 1 untracked
    with pytest.raises(ValueError, match="does not maintain"):
        read_live_value_counts(lake, "source")
    w2 = _log([("c", 11, "insert", "s2")])
    _ingest(tmp_path, "mv3", [w2])  # tracked -> recount path
    assert _view(lake) == _recount(lake) == {"s1": 1, "s2": 2}


def test_view_survives_compact_and_repartition(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", "s1"), ("b", 2, "insert", "s2"),
               ("c", 3, "insert", "s2")])
    w2 = _log([("b", 12, "delete", "s2")])
    lake = _ingest(tmp_path, "mv4", [w1, w2])
    expect = {"s1": 1, "s2": 1}
    assert _view(lake) == expect
    from mex_extractors_ray.cdc.compact import compact, repartition_lake

    compact(lake)
    assert _view(lake) == _recount(lake) == expect
    repartition_lake(lake, 4)
    assert _view(lake) == _recount(lake) == expect


def test_view_inherited_by_default(ray_session, tmp_path):
    """A follow-on ingest with the DEFAULT track arg (None) continues the
    lake's established view — the tail-sensor path must not drop it."""
    w1 = _log([("a", 1, "insert", "s1"), ("b", 2, "insert", "s2")])
    lake = _ingest(tmp_path, "mv6", [w1])  # tracked
    w2 = _log([("c", 11, "insert", "s1")])
    p = tmp_path / "mv6-follow.parquet"
    pq.write_table(w2, p)
    ingest_change_log([str(p)], lake, num_partitions=2)  # default: inherit
    assert _view(lake) == {"s1": 2, "s2": 1}
    # explicit () drops the view
    w3 = _log([("d", 21, "insert", "s2")])
    p3 = tmp_path / "mv6-drop.parquet"
    pq.write_table(w3, p3)
    ingest_change_log([str(p3)], lake, num_partitions=2, track_value_counts=())
    with pytest.raises(ValueError, match="does not maintain"):
        read_live_value_counts(lake, "source")


def test_view_first_wins_mode(ray_session, tmp_path):
    w1 = _log([("a", 1, "insert", "s1")])
    # first_wins: the a->s2 update is a no-op; b lands
    w2 = _log([("a", 11, "update", "s2"), ("b", 12, "insert", "s2")])
    lake = _ingest(tmp_path, "mv5", [w1, w2], mode="first_wins")
    assert _view(lake) == {"s1": 1, "s2": 1}


def test_read_file_columns_fills_missing_with_declared_type(tmp_path):
    from mex_extractors_ray.cdc.apply import _read_file_columns
    from mex_extractors_ray.schema import SchemaRegistry, SchemaVersion

    v1 = SchemaVersion(1, (("doc_id", pa.string()), ("n_tok", pa.int32())))
    v2 = SchemaVersion(
        2, (("doc_id", pa.string()), ("n_tok", pa.int32()),
            ("score", pa.int64())), {"score": 0})
    reg = SchemaRegistry([v1, v2])
    pq.write_table(pa.table({
        "doc_id": pa.array(["a"]), "lsn": pa.array([1], pa.int64()),
        "n_tok": pa.array([3], pa.int32())}), tmp_path / "f1.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(["b"]), "lsn": pa.array([2], pa.int64()),
        "n_tok": pa.array([4], pa.int32()),
        "score": pa.array([9], pa.int64())}), tmp_path / "f2.parquet")

    t1 = _read_file_columns(tmp_path, "f1.parquet", ["score"], reg)
    t2 = _read_file_columns(tmp_path, "f2.parquet", ["score"], reg)
    # declared int64 + default, NOT a string fill; canonical column order
    assert t1["score"].type == pa.int64() and t1["score"].to_pylist() == [0]
    assert t1.column_names == t2.column_names
    merged = pa.concat_tables([t1, t2])  # must not raise on mixed-era files
    assert merged["score"].to_pylist() == [0, 9]


def test_tracked_column_name_with_pipe_rejected(tmp_path):
    from mex_extractors_ray.cdc.apply import ingest_change_log

    with pytest.raises(ValueError, match="reserved"):
        ingest_change_log(["/nonexistent.parquet"], tmp_path / "lk",
                          num_partitions=2,
                          track_group_sums=(("a|b", "n_tok"),))
