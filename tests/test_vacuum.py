"""Lake vacuum: crash-orphan GC. ``commit_manifest`` sweeps *superseded*
files at each commit; vacuum reclaims what a crash between phase 1 (data
write) and phase 2 (manifest rename) leaves behind — files no manifest
references. The reference's analog is ``system_clean_up``
(``mex/extractors/system/main.py:15-75``)."""

import pytest

from mex_extractors_ray.cdc import ingest_change_log
from mex_extractors_ray.cdc.apply import read_lake_arrow
from mex_extractors_ray.cdc.compact import vacuum_lake, verify_lake
from mex_extractors_ray.cdc.manifest import (
    ConcurrentWriterError,
    partition_dir,
    read_manifest,
    writer_lock,
)


@pytest.fixture()
def lake_with_orphans(ray_session, small_log, tmp_lake):
    paths, _ = small_log
    # two windows so delete logs + delta files exist (time-travel surface)
    ingest_change_log(list(paths[:-1]), tmp_lake, num_partitions=4)
    ingest_change_log([paths[-1]], tmp_lake, num_partitions=4)
    # simulate a crash between phase 1 and phase 2: orphan data parquet +
    # scratch in a partition dir, scratch at the lake root
    pdir = partition_dir(tmp_lake, 0)
    orphan = pdir / "part-00000-99999999999999999999.parquet"
    orphan.write_bytes(b"not really parquet")
    scratch = pdir / ".tmp-deadbeef"
    scratch.write_bytes(b"half-written")
    root_scratch = partition_dir(tmp_lake, 0).parent / ".tmp-deadbeef-_ingest_state.json"
    root_scratch.write_bytes(b"{}")
    return tmp_lake, [orphan, scratch, root_scratch]


def test_vacuum_removes_orphans_only(lake_with_orphans):
    lake, orphans = lake_with_orphans
    before = read_lake_arrow(lake)
    report = vacuum_lake(lake)
    assert report["files_removed"] == len(orphans)
    assert report["bytes_reclaimed"] > 0
    for p in orphans:
        assert not p.exists()
    # every referenced file intact: state unchanged, audit green
    assert read_lake_arrow(lake).equals(before)
    assert all(r["ok"] for r in verify_lake(lake))
    # idempotent: second pass finds nothing
    assert vacuum_lake(lake)["files_removed"] == 0


def test_vacuum_dry_run_deletes_nothing(lake_with_orphans):
    lake, orphans = lake_with_orphans
    report = vacuum_lake(lake, dry_run=True)
    assert report["dry_run"] is True
    assert report["files_removed"] == len(orphans)
    for p in orphans:
        assert p.exists()


def test_vacuum_requires_writer_lease(lake_with_orphans):
    lake, orphans = lake_with_orphans
    with writer_lock(lake, "ingest"):
        with pytest.raises(ConcurrentWriterError):
            vacuum_lake(lake)
    for p in orphans:
        assert p.exists()  # refused run touched nothing


def test_vacuum_keeps_delete_logs(lake_with_orphans):
    """Time travel survives: delete logs are manifest-listed, never orphans."""
    lake, _ = lake_with_orphans
    logs_before = {
        pid: read_manifest(lake, pid).delete_logs for pid in range(4)
    }
    vacuum_lake(lake)
    saw_logs = False
    for pid, logs in logs_before.items():
        pdir = partition_dir(lake, pid)
        for name in logs:
            saw_logs = True
            assert (pdir / name).exists()
    assert saw_logs  # the fixture's second window must have produced delete logs
