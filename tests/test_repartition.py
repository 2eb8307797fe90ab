"""Lake re-sharding (scale-out / skew remedy) tests."""

import pyarrow.compute as pc

from mex_extractors_ray.cdc import ingest_change_log, replay_reference
from mex_extractors_ray.cdc.apply import read_lake_arrow
from mex_extractors_ray.cdc.compact import repartition_lake, verify_lake
from mex_extractors_ray.cdc.manifest import read_manifest


def test_repartition_preserves_state(ray_session, small_log, tmp_lake):
    paths, table = small_log
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    before = read_lake_arrow(tmp_lake)
    out = repartition_lake(tmp_lake, 8)
    assert out["rows"] == before.num_rows
    after = read_lake_arrow(tmp_lake)
    assert after.equals(before)
    assert all(r["ok"] for r in verify_lake(tmp_lake))
    # watermark preserved on every new partition that exists
    for pid in range(8):
        m = read_manifest(tmp_lake, pid)
        if m:
            assert m.last_lsn == out["watermark"]


def test_repartition_then_resume(ray_session, small_log, tmp_lake):
    """Ingest a prefix at P=4, re-shard to 8, then replay the FULL log at
    P=8 — the suffix applies on the new layout and converges to the oracle."""
    paths, table = small_log
    prefix = paths[: len(paths) // 2]
    ingest_change_log(prefix, tmp_lake, num_partitions=4)
    repartition_lake(tmp_lake, 8)
    ingest_change_log(paths, tmp_lake, num_partitions=8)
    expected, tombs = replay_reference(table)
    lake = read_lake_arrow(tmp_lake)
    assert lake.equals(expected)
    # late events from the prefix were dropped by the inherited watermark
    metrics = ingest_change_log(paths, tmp_lake, num_partitions=8)
    assert pc.all(metrics["noop"]).as_py()


def test_partition_count_guard(ray_session, small_log, tmp_lake):
    """Ingesting an existing lake with a different P must raise, not
    silently fork doc histories."""
    import pytest

    paths, _ = small_log
    ingest_change_log(paths[:1], tmp_lake, num_partitions=4)
    with pytest.raises(ValueError, match="num_partitions"):
        ingest_change_log(paths, tmp_lake, num_partitions=8)
    # repartition is the sanctioned path; afterwards P=8 ingest works
    repartition_lake(tmp_lake, 8)
    ingest_change_log(paths, tmp_lake, num_partitions=8)


def test_repartition_refuses_partial_commit(ray_session, small_log, tmp_lake):
    """A lake whose last ingest only partially committed (some manifests
    ahead of the lake-level completion record) must not repartition
    silently: the collapsed global watermark would drop the lagging
    partitions' un-applied events as late on replay."""
    import json

    import pytest

    from mex_extractors_ray.cdc.manifest import manifest_path

    paths, table = small_log
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    # a FULLY committed lake repartitions fine even though per-partition
    # watermarks differ (each is the max LSN of its own events)
    repartition_lake(tmp_lake, 8)
    # simulate a crash mid-ingest: one manifest advanced past the
    # completion record
    mp = manifest_path(tmp_lake, 0)
    doc = json.loads(mp.read_text())
    doc["last_lsn"] = doc["last_lsn"] + 1000
    mp.write_text(json.dumps(doc))
    with pytest.raises(ValueError, match="partially committed"):
        repartition_lake(tmp_lake, 4)
    out = repartition_lake(tmp_lake, 4, force=True)  # explicit override works
    assert out["partitions"] > 0
