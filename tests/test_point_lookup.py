"""Point-lookup (key-value GET) semantics over the lake."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.cdc.apply import (
    ingest_change_log,
    lake_num_partitions,
    lookup_docs,
    read_lake_arrow,
)
from tests.test_change_feed import _build, _log


def test_lookup_matches_full_read(ray_session, tmp_path):
    lake = _build(tmp_path)
    full = read_lake_arrow(lake)
    got = lookup_docs(lake, ["a", "b", "c", "d", "x", "nope"])
    # x was net-deleted, nope never existed — both absent
    assert got["doc_id"].to_pylist() == ["a", "b", "c", "d"]
    assert got.equals(full.filter(pc.is_in(full["doc_id"],
                                           value_set=got["doc_id"].combine_chunks())))
    # empty request, duplicate-free result for duplicate ids
    assert lookup_docs(lake, []).num_rows == 0
    assert lookup_docs(lake, ["a", "a"])["doc_id"].to_pylist() == ["a"]


def test_lookup_touches_only_routed_partitions(ray_session, tmp_path, monkeypatch):
    import mex_extractors_ray.cdc.apply as apply_mod
    from mex_extractors_ray.hashing import assign_partitions

    lake = _build(tmp_path)
    P = lake_num_partitions(lake)
    assert P == 2
    pid_a = int(assign_partitions(pa.array(["a"]), P)[0])
    opened = []
    real = pq.read_table

    def spy(path, *args, **kw):
        opened.append(str(path))
        return real(path, *args, **kw)

    monkeypatch.setattr(apply_mod.pq, "read_table", spy)
    lookup_docs(lake, ["a"])
    other = f"partition={1 - pid_a:05d}"
    assert opened and not any(other in p for p in opened)


def test_lookup_requires_lake_meta(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError, match="_lake_meta"):
        lookup_docs(tmp_path / "no-such-lake", ["a"])
