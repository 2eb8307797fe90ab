"""Lake writer lease: one mutating job at a time."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.cdc.apply import ingest_change_log, read_lake_arrow
from mex_extractors_ray.cdc.manifest import ConcurrentWriterError, writer_lock
from tests.test_change_feed import _log


def test_lock_excludes_second_writer(tmp_path):
    with writer_lock(tmp_path, "ingest"):
        with pytest.raises(ConcurrentWriterError, match="another writer"):
            with writer_lock(tmp_path, "repartition"):
                pass
    # released on exit — and a crash releases it too (kernel-held flock)
    with writer_lock(tmp_path, "ingest"):
        pass


def test_ingest_refused_while_lease_held(ray_session, tmp_path):
    lake = tmp_path / "lk"
    p = tmp_path / "log.parquet"
    pq.write_table(_log([("a", 1, "insert")]), p)
    ingest_change_log([str(p)], lake, num_partitions=2)
    with writer_lock(lake, "maintenance"):
        with pytest.raises(ConcurrentWriterError):
            ingest_change_log([str(p)], lake, num_partitions=2)
    # lease released → the (idempotent) re-ingest proceeds
    m = ingest_change_log([str(p)], lake, num_partitions=2)
    assert read_lake_arrow(lake)["doc_id"].to_pylist() == ["a"]


def test_repartition_refused_while_lease_held(ray_session, tmp_path):
    from mex_extractors_ray.cdc.compact import repartition_lake

    lake = tmp_path / "lk"
    p = tmp_path / "log.parquet"
    pq.write_table(_log([("a", 1, "insert"), ("b", 2, "insert")]), p)
    ingest_change_log([str(p)], lake, num_partitions=2)
    with writer_lock(lake, "other"):
        with pytest.raises(ConcurrentWriterError):
            repartition_lake(lake, 4)
    out = repartition_lake(lake, 4)
    assert out["rows"] == 2


def test_failed_acquisition_preserves_holder_metadata(tmp_path):
    import json

    with writer_lock(tmp_path, "ingest"):
        before = json.loads((tmp_path / "_writer.lock").read_text())
        with pytest.raises(ConcurrentWriterError):
            with writer_lock(tmp_path, "intruder"):
                pass
        after = json.loads((tmp_path / "_writer.lock").read_text())
    assert after == before and after["purpose"] == "ingest"
