"""Delta-file apply: bytes written per window ∝ delta size, fold at the
compaction threshold, and convergence to the single-process replayer
throughout (the VERDICT r1 #7 contract)."""

import pyarrow as pa
import pyarrow.parquet as pq

from mex_extractors_ray.cdc import ingest_change_log, replay_reference
from mex_extractors_ray.cdc.apply import read_lake_arrow
from mex_extractors_ray.cdc.compact import compact, verify_lake
from mex_extractors_ray.cdc.manifest import partition_dir, read_manifest


def _sizes(lake, pid):
    m = read_manifest(lake, pid)
    pdir = partition_dir(lake, pid)
    return m, [(pdir / f).stat().st_size for f in m.files]


def test_delta_window_writes_delta_not_partition(ray_session, small_log, tmp_path, tmp_lake):
    paths, table = small_log
    # window 1: the bulk of the log; window 2: a genuinely small tail (the
    # steady-state tailing regime: window events ≪ partition size)
    last = pq.read_table(paths[-1])
    head, tail = last.slice(0, last.num_rows - 100), last.slice(last.num_rows - 100)
    head_path, tail_path = tmp_path / "head.parquet", tmp_path / "tail.parquet"
    pq.write_table(head, head_path)
    pq.write_table(tail, tail_path)
    ingest_change_log(list(paths[:-1]) + [str(head_path)], tmp_lake, num_partitions=4)
    ingest_change_log([str(tail_path)], tmp_lake, num_partitions=4)
    expected, _ = replay_reference(table)
    assert read_lake_arrow(tmp_lake).equals(expected)
    assert all(r["ok"] for r in verify_lake(tmp_lake))
    saw_delta = False
    for pid in range(4):
        m, sizes = _sizes(tmp_lake, pid)
        if len(m.files) == 2:
            saw_delta = True
            # the window-2 file is a DELTA: bytes ∝ its ~25-row window,
            # not the ~200-doc partition
            assert sizes[1] < sizes[0] / 2, (m.files, sizes)
            assert len(m.file_checksums) == 2
    assert saw_delta


def test_delta_folds_at_threshold(ray_session, small_log, tmp_lake):
    paths, table = small_log
    # threshold 3: window 3 folds everything into one base again
    for p in paths[:3]:
        ingest_change_log([p], tmp_lake, num_partitions=4, compact_threshold=3)
    expected, _ = replay_reference(
        pa.concat_tables(pq.read_table(x) for x in paths[:3])
    )
    assert read_lake_arrow(tmp_lake).equals(expected)
    for pid in range(4):
        m = read_manifest(tmp_lake, pid)
        assert len(m.files) == 1, m.files  # folded
    assert all(r["ok"] for r in verify_lake(tmp_lake))


def test_standalone_compact_folds_deltas(ray_session, small_log, tmp_lake):
    paths, table = small_log
    ingest_change_log(paths[:-1], tmp_lake, num_partitions=4)
    ingest_change_log(paths[-1:], tmp_lake, num_partitions=4)
    before = read_lake_arrow(tmp_lake)
    results = compact(tmp_lake)
    assert any(r["action"] == "rewritten" for r in results)
    for pid in range(4):
        m = read_manifest(tmp_lake, pid)
        if m:
            assert len(m.files) == 1
    assert read_lake_arrow(tmp_lake).equals(before)
    assert all(r["ok"] for r in verify_lake(tmp_lake))


def test_delta_disabled_keeps_single_file(ray_session, small_log, tmp_lake):
    paths, table = small_log
    ingest_change_log(paths[:-1], tmp_lake, num_partitions=4, delta=False)
    ingest_change_log(paths[-1:], tmp_lake, num_partitions=4, delta=False)
    for pid in range(4):
        m = read_manifest(tmp_lake, pid)
        if m:
            assert len(m.files) == 1
    expected, _ = replay_reference(table)
    assert read_lake_arrow(tmp_lake).equals(expected)
