"""Hot-partition splits (extendible-hash, cdc/compact.split_partition):
routing invariants, state preservation, post-split ingest, crash safety
via meta-controlled visibility, vacuum of split orphans, and point-lookup
routing through the depth table."""

import json
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.cdc import ingest_change_log, replay_reference
from mex_extractors_ray.cdc.apply import (
    _manifested_pids,
    dense_shard_index,
    live_physical_pids,
    load_lake_meta,
    lookup_docs,
    read_lake_arrow,
    route_hashes,
    split_children,
)
from mex_extractors_ray.cdc.compact import (
    _all_partition_dirs,
    split_partition,
    vacuum_lake,
    verify_lake,
)
from mex_extractors_ray.cdc.manifest import partition_dir, read_manifest
from mex_extractors_ray.gen import synth_change_log


# ---------------------------------------------------------------- routing


def test_route_invariants_random_hashes():
    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**63, size=20_000, dtype=np.int64).view(np.uint64)
    P = 8
    splits = {3: 2, 5: 1}
    phys = route_hashes(h, P, splits)
    # base partition always recoverable from the physical id
    assert np.array_equal(phys % P, (h % np.uint64(P)).astype(np.int32))
    # every row lands in the live set, split bases never in their old id
    live = set(live_physical_pids(P, splits))
    assert set(np.unique(phys)) <= live
    assert 3 not in set(np.unique(phys)) and 5 not in set(np.unique(phys))
    # no-splits routing is exactly h % P (the historical layout)
    assert np.array_equal(route_hashes(h, P, None), (h % np.uint64(P)).astype(np.int32))


def test_split_children_ids_fresh_across_depths():
    P = 8
    seen: set[int] = set()
    for d in range(5):
        kids = split_children(3, P, d)
        assert len(kids) == 1 << d
        assert all(k % P == 3 for k in kids)
        assert not (set(kids) & seen) or d == 0
        if d > 0:
            assert not set(kids) & seen
        seen |= set(kids)


def test_dense_shard_index_bijection():
    P = 4
    splits = {1: 1}
    live = live_physical_pids(P, splits)
    phys = np.array(live, dtype=np.int32)
    dense, K = dense_shard_index(phys, P, splits)
    assert K == len(live) == 5
    assert sorted(dense.tolist()) == list(range(K))


# ------------------------------------------------------------- lifecycle


@pytest.fixture()
def split_lake(tmp_path, ray_session):
    paths = synth_change_log(tmp_path / "log", n_events=6000, n_docs=600,
                             seed=11, shard_rows=2000)
    table = pa.concat_tables(pq.read_table(p) for p in paths)
    lake = str(tmp_path / "lake")
    ingest_change_log(paths, lake, num_partitions=8)
    return lake, table, tmp_path


def test_split_preserves_state_and_routes_next_window(split_lake):
    lake, table, tmp = split_lake
    expected, _ = replay_reference(table)
    r = split_partition(lake, 3)
    assert r["depth"] == 1 and r["parents_retired"] == [3]
    assert set(r["children"]) == set(split_children(3, 8, 1))
    # byte-identical live state (including token arrays)
    assert read_lake_arrow(lake).equals(expected)
    # split again: depth 2, fresh ids, still identical
    r2 = split_partition(lake, 3)
    assert r2["depth"] == 2
    assert not set(r2["children"]) & set(r["children"])
    assert read_lake_arrow(lake).equals(expected)
    # the retired parents' dirs are gone; readers enumerate only live ids
    assert 3 not in _manifested_pids(lake)
    live = set(live_physical_pids(8, load_lake_meta(lake)["splits"]))
    assert set(_manifested_pids(lake)) <= live

    # a follow-on ingest window routes into the children and the merged
    # state still matches the single-process replayer
    mx = int(pc.max(table["lsn"]).as_py())
    paths2 = synth_change_log(tmp / "log2", n_events=3000, n_docs=600,
                              seed=12, shard_rows=2000, lsn_start=mx + 1)
    t2 = pa.concat_tables(pq.read_table(p) for p in paths2)
    ingest_change_log(paths2, lake, num_partitions=8)
    exp2, _ = replay_reference(pa.concat_tables([table, t2]))
    assert read_lake_arrow(lake).equals(exp2)
    # verify passes on the split layout
    assert all(x.get("ok", True) for x in verify_lake(lake))


def test_split_routes_point_lookups(split_lake):
    lake, table, _ = split_lake
    expected, _ = replay_reference(table)
    split_partition(lake, 0)
    some = expected["doc_id"].to_pylist()[:25]
    got = lookup_docs(lake, some)
    assert got["doc_id"].to_pylist() == sorted(some)


def test_split_tombstones_follow_their_docs(split_lake):
    lake, table, _ = split_lake
    _, tombs = replay_reference(table)
    before = {}
    for pid in _manifested_pids(lake):
        m = read_manifest(lake, pid)
        if m and m.tombstone_file:
            t = pq.read_table(Path(partition_dir(lake, pid)) / m.tombstone_file)
            before.update(zip(t["doc_id"].to_pylist(), t["lsn"].to_pylist()))
    assert before == tombs
    for pid0 in range(8):
        split_partition(lake, pid0)
    after = {}
    for pid in _manifested_pids(lake):
        m = read_manifest(lake, pid)
        if m and m.tombstone_file:
            t = pq.read_table(Path(partition_dir(lake, pid)) / m.tombstone_file)
            after.update(zip(t["doc_id"].to_pylist(), t["lsn"].to_pylist()))
    assert after == tombs


# ------------------------------------------------------------ crash safety


def test_unflipped_children_invisible_and_vacuumed(split_lake):
    lake, table, _ = split_lake
    expected, _ = replay_reference(table)
    # simulate a crash BEFORE the meta flip: run the split, then restore
    # the old meta and recreate a fake parent — the children's manifests
    # exist on disk but the depth table never flipped
    meta_before = Path(lake, "_lake_meta.json").read_text()
    r = split_partition(lake, 2)
    # "crash": revert the flip (children now outside the live set) and
    # restore the parent from the children (the real crash leaves the
    # parent intact; here we rebuild it for the assertion)
    kid_tables = []
    for kid in r["children"]:
        m = read_manifest(lake, kid)
        for f in m.files:
            kid_tables.append(pq.read_table(Path(partition_dir(lake, kid)) / f))
    Path(lake, "_lake_meta.json").write_text(meta_before)
    # the children are INVISIBLE: readers enumerate the meta's live set
    assert all(k not in _manifested_pids(lake) for k in r["children"])
    # rebuild parent dir so the lake is whole again for the read
    pdir = Path(partition_dir(lake, 2))
    pdir.mkdir(parents=True, exist_ok=True)
    merged = pa.concat_tables(kid_tables).sort_by([("doc_id", "ascending")])
    import os
    import uuid

    from mex_extractors_ray.cdc.manifest import (
        PartitionManifest,
        commit_manifest,
        sha256_file,
    )

    name = f"part-00002-{r['watermark']:020d}.parquet"
    tmp = pdir / f".tmp-{uuid.uuid4().hex}"
    pq.write_table(merged, tmp)
    os.replace(tmp, pdir / name)
    commit_manifest(lake, PartitionManifest(
        partition=2, last_lsn=r["watermark"], files=[name],
        sha256_checksum=sha256_file(pdir / name),
        file_checksums=[sha256_file(pdir / name)],
        row_count=merged.num_rows, history_floor=r["watermark"],
        file_lsns=[r["watermark"]],
    ))
    # live reads still match (tombstones for pid 2 were already applied to
    # the live rows, so the rebuilt parent serves the same live set)
    got = read_lake_arrow(lake)
    assert got.equals(expected)
    # vacuum sweeps the orphaned child directories wholesale
    v = vacuum_lake(lake)
    assert all(k not in _all_partition_dirs(lake) for k in r["children"])
    assert v["files_removed"] > 0


def test_flipped_meta_survives_next_ingest_guard(split_lake):
    lake, table, tmp = split_lake
    split_partition(lake, 1)
    meta = load_lake_meta(lake)
    assert meta["splits"] == {1: 1}
    # the ingest inherits (and must not clobber) the depth table
    mx = int(pc.max(table["lsn"]).as_py())
    paths2 = synth_change_log(tmp / "log3", n_events=500, n_docs=100,
                              seed=13, shard_rows=500, lsn_start=mx + 1)
    ingest_change_log(paths2, lake, num_partitions=8)
    assert load_lake_meta(lake)["splits"] == {1: 1}
    # wrong base P still refused
    with pytest.raises(ValueError, match="num_partitions"):
        ingest_change_log(paths2, lake, num_partitions=16)


def test_split_refuses_partial_commit(split_lake):
    lake, table, _ = split_lake
    # fabricate a partial commit: lake-level completion record behind a
    # partition watermark (the repartition refusal, same failure mode)
    st = json.loads(Path(lake, "_ingest_state.json").read_text())
    st["completed_lsn"] = 0
    Path(lake, "_ingest_state.json").write_text(json.dumps(st))
    with pytest.raises(ValueError, match="partially committed"):
        split_partition(lake, 4)
    # force accepts the collapse
    r = split_partition(lake, 4, force=True)
    assert r["depth"] == 1


def test_split_rejects_physical_or_out_of_range_ids(split_lake):
    lake, _, _ = split_lake
    with pytest.raises(ValueError, match="BASE partition"):
        split_partition(lake, 11)
    with pytest.raises(ValueError, match="BASE partition"):
        split_partition(lake, -1)


def test_split_empty_base_partition_is_metadata_only(tmp_path, ray_session):
    # a base partition with no manifest splits by meta flip alone
    paths = synth_change_log(tmp_path / "log", n_events=40, n_docs=4,
                             seed=3, shard_rows=40)
    lake = str(tmp_path / "lake")
    ingest_change_log(paths, lake, num_partitions=16)
    empty = [p for p in range(16) if read_manifest(lake, p) is None]
    assert empty, "fixture: expected at least one empty base partition"
    r = split_partition(lake, empty[0])
    assert r["rows"] == 0 and r["parents_retired"] == []
    assert load_lake_meta(lake)["splits"] == {empty[0]: 1}


# ---------------------------------------------------------- auto-split policy


def test_split_hot_partitions_policy(split_lake):
    from mex_extractors_ray.cdc.compact import (
        partition_loads,
        split_hot_partitions,
    )

    lake, table, _ = split_lake
    expected, _ = replay_reference(table)
    loads = partition_loads(lake)
    assert all(l["rows"] > 0 or l["bytes"] > 0 for l in loads)
    # threshold below the max live partition → at least one split happens
    threshold = max(l["rows"] for l in loads) - 1
    r = split_hot_partitions(lake, max_rows=threshold)
    assert r["splits"], "expected at least one split"
    assert r["converged"]
    # convergence: every live partition now at or under the threshold
    assert all(l["rows"] <= threshold for l in partition_loads(lake))
    # and the data is untouched
    assert read_lake_arrow(lake).equals(expected)
    # idempotent: nothing hot → no further splits
    r2 = split_hot_partitions(lake, max_rows=threshold)
    assert not r2["splits"] and r2["converged"]


def test_split_policy_dry_run_and_args(split_lake):
    from mex_extractors_ray.cdc.compact import partition_loads, split_hot_partitions

    lake, _, _ = split_lake
    with pytest.raises(ValueError, match="max_rows"):
        split_hot_partitions(lake)
    loads = partition_loads(lake)
    threshold = max(l["rows"] for l in loads) - 1
    before = load_lake_meta(lake)["splits"]
    r = split_hot_partitions(lake, max_rows=threshold, dry_run=True)
    assert r["dry_run"] and r["hot_bases"] and not r["splits"]
    assert load_lake_meta(lake)["splits"] == before  # nothing flipped


def test_tail_autosplit(ray_session, small_log, tmp_path, tmp_lake):
    from mex_extractors_ray.cdc.tail import tail_once

    paths, table = small_log
    log_dir = tmp_path / "wal"
    log_dir.mkdir()
    shutil.copy(paths[0], log_dir / "log-00000.parquet")
    (log_dir / "log-00000.parquet.closed").touch()
    # threshold of 1 row: every non-empty base partition splits once
    r = tail_once(log_dir, tmp_lake, num_partitions=4, split_rows_over=1)
    assert r["applied"] > 0 and r.get("splits", 0) > 0
    assert load_lake_meta(tmp_lake)["splits"]
    # next segment still lands correctly on the split layout
    shutil.copy(paths[1], log_dir / "log-00001.parquet")
    (log_dir / "log-00001.parquet.closed").touch()
    tail_once(log_dir, tmp_lake, num_partitions=4, split_rows_over=1)
    sub = pa.concat_tables([pq.read_table(paths[0]), pq.read_table(paths[1])])
    expected, _ = replay_reference(sub)
    assert read_lake_arrow(tmp_lake).equals(expected)


# ------------------------------------------------- interplay with other jobs


def test_repartition_after_split_resets_depths(split_lake):
    from mex_extractors_ray.cdc.compact import repartition_lake

    lake, table, _ = split_lake
    expected, _ = replay_reference(table)
    split_partition(lake, 3)
    split_partition(lake, 5)
    repartition_lake(lake, 4)
    # repartition rewrites the whole layout: base P changes, depth table
    # resets, state survives byte-identically
    meta = load_lake_meta(lake)
    assert meta["num_partitions"] == 4 and meta["splits"] == {}
    assert read_lake_arrow(lake).equals(expected)


def test_split_on_replica_lake(split_lake):
    from mex_extractors_ray.cdc.replicate import replicate_lake

    lake, table, tmp = split_lake
    dst = str(tmp / "replica")
    replicate_lake(lake, dst)
    # the replica is a normal lake: split it, then keep feeding — the
    # incremental pass must route through the replica's own depth table
    split_partition(dst, 1)
    mx = int(pc.max(table["lsn"]).as_py())
    paths2 = synth_change_log(tmp / "log4", n_events=2000, n_docs=600,
                              seed=21, shard_rows=1000, lsn_start=mx + 1)
    t2 = pa.concat_tables(pq.read_table(p) for p in paths2)
    ingest_change_log(paths2, lake, num_partitions=8)
    replicate_lake(lake, dst)
    exp, _ = replay_reference(pa.concat_tables([table, t2]))
    assert read_lake_arrow(dst).equals(exp)
    assert load_lake_meta(dst)["splits"] == {1: 1}  # replica keeps its layout


def test_asof_across_split(split_lake):
    from mex_extractors_ray.cdc.apply import read_lake_asof_arrow

    lake, table, _ = split_lake
    wm = int(pc.max(table["lsn"]).as_py())
    split_partition(lake, 2)
    expected, _ = replay_reference(table)
    # as-of at the watermark = live state (split children carry it)
    assert read_lake_asof_arrow(lake, wm).equals(expected)
    # the split squashed history: as-of below the floor raises cleanly
    with pytest.raises(ValueError, match="history floor"):
        read_lake_asof_arrow(lake, wm // 2)


def test_maintenance_lineage_records(split_lake):
    from mex_extractors_ray.cdc.compact import compact, repartition_lake
    from mex_extractors_ray.state.checks import read_maintenance_log

    lake, _, _ = split_lake
    split_partition(lake, 3)
    split_partition(lake, 3)  # retry-style second op, distinct marker (d2)
    compact(lake)
    log = read_maintenance_log(lake)
    ops = [r["op"] for r in log]
    assert ops.count("split") == 2
    split_recs = [r for r in log if r["op"] == "split"]
    assert {r["depth"] for r in split_recs} == {1, 2}
    # idempotency: re-running the same marker overwrites, not duplicates
    from mex_extractors_ray.state.checks import record_maintenance

    record_maintenance(lake, "split", "00003-d2", split_recs[-1])
    assert len(read_maintenance_log(lake)) == len(log)
    # repartition survives the dir swap and appends its own record
    repartition_lake(lake, 4)
    assert any(r["op"] == "repartition" for r in read_maintenance_log(lake))


def test_lake_stats_and_vacuum_retention(split_lake):
    from mex_extractors_ray.cdc.compact import lake_stats, vacuum_lake

    lake, table, _ = split_lake
    r = split_partition(lake, 6)
    s = lake_stats(lake)
    assert s["num_partitions"] == 8 and s["splits"] == {"6": 1}
    assert s["live_physical_partitions"] == len(_manifested_pids(lake))
    # lake watermark is the max over ALL partitions ≥ the split's parents'
    assert s["rows"] > 0 and s["watermark"] >= r["watermark"]
    # plant an orphan child dir (crashed-split shape) and show the
    # retention window protects it from the sweep, then expires
    orphan = Path(partition_dir(lake, 6))
    orphan.mkdir(parents=True, exist_ok=True)
    (orphan / "part-00006-x.parquet").write_bytes(b"x")
    v1 = vacuum_lake(lake, retention_seconds=3600)
    assert orphan.exists()  # younger than the window: kept
    v2 = vacuum_lake(lake)  # no window: swept
    assert not orphan.exists()
    assert v2["files_removed"] >= 1


def test_split_depth_cap(split_lake):
    lake, _, _ = split_lake
    meta = json.loads(Path(lake, "_lake_meta.json").read_text())
    meta["splits"] = {"4": 20}
    Path(lake, "_lake_meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="repartition_lake"):
        split_partition(lake, 4)


def test_split_tombstone_only_partition_and_resurrection(tmp_path, ray_session):
    """A fully-deleted (tombstone-only) partition splits cleanly, and a
    doc can resurrect through the split layout."""
    from mex_extractors_ray.cdc.compact import compact

    t = pa.table({
        "doc_id": pa.array(["a", "b", "c", "a", "b", "c"]),
        "lsn": pa.array([1, 2, 3, 10, 11, 12], pa.int64()),
        "op": pa.array(["insert"] * 3 + ["delete"] * 3),
        "source": pa.array(["s"] * 6), "lang": pa.array(["de"] * 6),
        "n_tok": pa.array([1, 1, 1, None, None, None], pa.int64()),
        "tokens": pa.array([[0], [0], [0], None, None, None],
                           pa.list_(pa.int32())),
        "schema_version": pa.array([3] * 6, pa.int32()),
    })
    pq.write_table(t, tmp_path / "log.parquet")
    lake = str(tmp_path / "lake")
    ingest_change_log([str(tmp_path / "log.parquet")], lake, num_partitions=2)
    compact(lake)  # fold: partitions become empty / tombstone-only
    for pid0 in (0, 1):
        split_partition(lake, pid0)
    exp, _ = replay_reference(t)
    assert read_lake_arrow(lake).equals(exp)  # zero live rows
    t2 = pa.table({
        "doc_id": pa.array(["a"]), "lsn": pa.array([20], pa.int64()),
        "op": pa.array(["insert"]), "source": pa.array(["s"]),
        "lang": pa.array(["de"]), "n_tok": pa.array([2], pa.int64()),
        "tokens": pa.array([[1, 2]], pa.list_(pa.int32())),
        "schema_version": pa.array([3], pa.int32()),
    })
    pq.write_table(t2, tmp_path / "log2.parquet")
    ingest_change_log([str(tmp_path / "log2.parquet")], lake, num_partitions=2)
    exp2, _ = replay_reference(pa.concat_tables([t, t2]))
    assert read_lake_arrow(lake).equals(exp2)
