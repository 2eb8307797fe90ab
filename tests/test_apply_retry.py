"""Task-retry idempotence: Ray may re-execute a finished apply task; the
deterministic file names + watermark must make the duplicate a no-op."""

import pyarrow as pa

from mex_extractors_ray.cdc.apply import apply_partition, read_lake_arrow, resolve_and_partition
from mex_extractors_ray.schema import sequence_registry


def _group(rows):
    t = pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows]),
            "doc_id": pa.array([r[2] for r in rows]),
            "tokens": pa.array([r[3] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[3]) if r[3] else None for r in rows], pa.int64()),
            "source": pa.array(["s"] * len(rows)),
            "schema_version": pa.array([1] * len(rows), pa.int32()),
            "lang": pa.array([None] * len(rows), pa.string()),
        }
    )
    return resolve_and_partition(t, sequence_registry().to_json(), 1)


def test_duplicate_apply_call_is_noop(tmp_path):
    rj = sequence_registry().to_json()
    lake = str(tmp_path / "lake")
    g = _group([(1, "insert", "a", [1, 2]), (2, "update", "a", [3]), (3, "insert", "b", [4])])
    m1 = apply_partition(g, lake_dir=lake, registry_json=rj)
    state1 = read_lake_arrow(lake)
    # simulate Ray re-running the same task (same group, same lake)
    m2 = apply_partition(g, lake_dir=lake, registry_json=rj)
    assert m2["noop"][0].as_py() is True
    # the helper routes through resolve_and_partition, whose map-side
    # combiner collapses the superseded insert(1) -> 2 events reach apply
    assert m2["late_dropped"][0].as_py() == 2
    assert read_lake_arrow(lake).equals(state1)
    assert m1["last_lsn"][0].as_py() == m2["last_lsn"][0].as_py() == 3


def test_partial_overlap_applies_only_fresh(tmp_path):
    rj = sequence_registry().to_json()
    lake = str(tmp_path / "lake")
    g1 = _group([(1, "insert", "a", [1]), (2, "insert", "b", [2])])
    apply_partition(g1, lake_dir=lake, registry_json=rj)
    # retry delivers the old events again plus new ones
    g2 = _group([(1, "insert", "a", [1]), (2, "insert", "b", [2]), (5, "delete", "a", None)])
    m = apply_partition(g2, lake_dir=lake, registry_json=rj)
    # combiner already dropped a's superseded insert(1); only b's event 2
    # is late at apply
    assert m["late_dropped"][0].as_py() == 1
    assert m["deletes"][0].as_py() == 1
    lake_t = read_lake_arrow(lake)
    assert lake_t["doc_id"].to_pylist() == ["b"]
