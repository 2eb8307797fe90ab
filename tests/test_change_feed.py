"""Change-data-feed (read_changes) semantics over the delta lake."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.cdc.apply import (
    ingest_change_log,
    read_changes,
    read_changes_arrow,
    read_lake_arrow,
    read_lake_asof_arrow,
)


def _log(rows) -> pa.Table:
    """rows: (doc_id, lsn, op)"""
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


def _build(tmp_path, name="lk"):
    w1 = _log([("a", 1, "insert"), ("b", 2, "insert"), ("c", 3, "insert"),
               ("x", 4, "insert"), ("x", 5, "delete")])  # net-delete in w1
    # window 2: overwrite a, delete b, insert d
    w2 = _log([("a", 11, "update"), ("b", 12, "delete"), ("d", 13, "insert")])
    # window 3: resurrect b
    w3 = _log([("b", 21, "update")])
    return _ingest(tmp_path, name, [w1, w2, w3])


def _pairs(t: pa.Table):
    return sorted(zip(t["doc_id"].to_pylist(), t["lsn"].to_pylist(),
                      t["op"].to_pylist()))


def test_feed_since_boundaries(ray_session, tmp_path):
    lake = _build(tmp_path)
    # since window-1 end (5): everything from windows 2+3
    f = read_changes_arrow(lake, 5)
    assert _pairs(f) == [("a", 11, "upsert"), ("b", 12, "delete"),
                         ("b", 21, "upsert"), ("d", 13, "upsert")]
    # delete rows carry null payloads; upserts carry real ones
    dmask = f.filter(pc.equal(f["op"], "delete"))
    assert dmask["n_tok"].null_count == dmask.num_rows
    assert dmask["tokens"].null_count == dmask.num_rows
    umask = f.filter(pc.equal(f["op"], "upsert"))
    assert umask["n_tok"].null_count == 0
    # since window-2 end: only window 3
    assert _pairs(read_changes_arrow(lake, 13)) == [("b", 21, "upsert")]
    # since the watermark: empty feed with the full schema
    empty = read_changes_arrow(lake, 21)
    assert empty.num_rows == 0 and "op" in empty.column_names
    # mid-window since: row-level lsn filter (excludes b@12, keeps d@13)
    assert _pairs(read_changes_arrow(lake, 12)) == [
        ("b", 21, "upsert"), ("d", 13, "upsert")]


def test_feed_full_history_includes_first_window_deletes(ray_session, tmp_path):
    lake = _build(tmp_path)
    f = read_changes_arrow(lake, -1)
    # x was inserted AND net-deleted within window 1: the window winner is
    # the delete, preserved by the first-fold delete log even though b's
    # later resurrection erased nothing of x's (and b@12's delete survives
    # b@21's resurrection via the window-2 delete log)
    assert ("x", 5, "delete") in _pairs(f)
    assert ("x", 4, "insert") not in _pairs(f)  # intra-window squash
    assert _pairs(f) == [("a", 1, "upsert"), ("a", 11, "upsert"),
                         ("b", 2, "upsert"), ("b", 12, "delete"),
                         ("b", 21, "upsert"), ("c", 3, "upsert"),
                         ("d", 13, "upsert"), ("x", 5, "delete")]


def test_feed_replay_reconstructs_final_state(ray_session, tmp_path):
    """state_asof(B) + feed(since=B) folded last-wins == final state."""
    lake = _build(tmp_path)
    snap = read_lake_asof_arrow(lake, 5)
    feed = read_changes_arrow(lake, 5)
    state = {d: (lsn, None) for d, lsn in
             zip(snap["doc_id"].to_pylist(), snap["lsn"].to_pylist())}
    for row in feed.sort_by([("lsn", "ascending")]).to_pylist():
        if row["op"] == "delete":
            state.pop(row["doc_id"], None)
        else:
            state[row["doc_id"]] = (row["lsn"], None)
    final = read_lake_arrow(lake)
    assert sorted((d, l) for d, (l, _) in state.items()) == sorted(
        zip(final["doc_id"].to_pylist(), final["lsn"].to_pylist()))


def test_feed_distributed_matches_arrow(ray_session, tmp_path):
    lake = _build(tmp_path)
    ds = read_changes(lake, 5).to_arrow_refs()
    import ray

    got = pa.concat_tables([ray.get(r) for r in ds])
    assert _pairs(got) == _pairs(read_changes_arrow(lake, 5))


def test_feed_floor_after_compaction(ray_session, tmp_path):
    from mex_extractors_ray.cdc.compact import compact

    lake = _build(tmp_path)
    compact(lake)
    # the fold squashed window history: feed below the watermark raises...
    with pytest.raises(ValueError, match="feed floor"):
        read_changes_arrow(lake, 5)
    # ...and at the watermark is exactly empty
    assert read_changes_arrow(lake, 21).num_rows == 0


def test_feed_prunes_files_by_manifest_zone_map(ray_session, tmp_path, monkeypatch):
    """since = watermark must open ZERO parquet files (manifest-only)."""
    import mex_extractors_ray.cdc.apply as apply_mod

    lake = _build(tmp_path)
    opened = []
    real = pq.read_table

    def spy(path, *a, **kw):
        opened.append(str(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(apply_mod.pq, "read_table", spy)
    assert read_changes_arrow(lake, 21).num_rows == 0
    assert opened == []
    # since window-2 end: only window-3 files open (one delta per partition
    # that saw window 3; no base, no window-2 delta, no delete logs)
    opened.clear()
    read_changes_arrow(lake, 13)
    assert opened and all("-00000000000000000021" in p for p in opened)


def test_feed_resolves_schema_versions(ray_session, tmp_path):
    """v1 rows in a delta window come out of the feed at the LATEST
    registry schema: lang filled with the v2 default, n_tok widened to
    int64 — the feed is a consumer-facing surface, so it must never leak
    an old on-disk schema."""
    w1 = _log([("a", 1, "insert")])
    v1_rows = pa.table({
        "doc_id": pa.array(["b"]),
        "lsn": pa.array([11], pa.int64()),
        "op": pa.array(["insert"]),
        "source": pa.array(["s"]),
        "lang": pa.array([None], pa.string()),  # column absent in v1 → null
        "n_tok": pa.array([3], pa.int32()),
        "tokens": pa.array([[1, 2, 3]], pa.list_(pa.int64())),
        "schema_version": pa.array([1], pa.int32()),
    })
    lake = _ingest(tmp_path, "lk", [w1, v1_rows])
    f = read_changes_arrow(lake, 1)
    assert f["doc_id"].to_pylist() == ["b"]
    assert f["lang"].to_pylist() == ["de"]      # v2 additive default applied
    assert f["n_tok"].type == pa.int64()        # v3 widening applied
    assert f["op"].to_pylist() == ["upsert"]
