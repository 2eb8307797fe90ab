"""Compaction (schema-upgrade rewrite) + lake audit tests."""

import pyarrow as pa
import pyarrow.parquet as pq

from mex_extractors_ray.cdc import ingest_change_log
from mex_extractors_ray.cdc.apply import read_lake_arrow
from mex_extractors_ray.cdc.compact import compact, verify_lake
from mex_extractors_ray.cdc.manifest import partition_dir, read_manifest


def test_verify_clean_lake(ray_session, small_log, tmp_lake):
    paths, _ = small_log
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    reports = verify_lake(tmp_lake)
    assert len(reports) == 4
    assert all(r["ok"] for r in reports), reports


def test_verify_detects_corruption(ray_session, small_log, tmp_lake):
    paths, _ = small_log
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    m = read_manifest(tmp_lake, 0)
    f = partition_dir(tmp_lake, 0) / m.files[0]
    # corrupt the committed data file: rewrite with a row dropped
    t = pq.read_table(f)
    pq.write_table(t.slice(1), f)
    reports = verify_lake(tmp_lake)
    bad = [r for r in reports if not r["ok"]]
    assert len(bad) == 1 and bad[0]["partition"] == 0
    assert "checksum" in bad[0]["errors"] or "row_count" in bad[0]["errors"]


def test_compact_noop_and_idempotent(ray_session, small_log, tmp_lake):
    paths, _ = small_log
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    before = read_lake_arrow(tmp_lake)
    out = compact(tmp_lake)
    # apply already writes latest-version single files -> all no-ops
    assert all(r["action"] in ("noop", "missing") for r in out)
    assert read_lake_arrow(tmp_lake).equals(before)


def test_compact_upgrades_old_schema_version(ray_session, small_log, tmp_lake):
    """A partition committed at an old schema_version is rewritten to the
    latest by compaction (scan-time cast becomes persistent)."""
    paths, _ = small_log
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    before = read_lake_arrow(tmp_lake)
    # simulate a pre-widening file: rewrite partition 1's data as v2
    # (n_tok int32, lang present) and mark the manifest schema_version=2
    import json

    m = read_manifest(tmp_lake, 1)
    pdir = partition_dir(tmp_lake, 1)
    t = pq.read_table(pdir / m.files[0])
    old = t.set_column(
        t.column_names.index("n_tok"), "n_tok", t["n_tok"].cast(pa.int32())
    )
    pq.write_table(old, pdir / m.files[0])
    from mex_extractors_ray.cdc.manifest import sha256_file

    doc = json.loads((pdir / "manifest.json").read_text())
    doc["schema_version"] = 2
    doc["sha256_checksum"] = sha256_file(pdir / m.files[0])
    (pdir / "manifest.json").write_text(json.dumps(doc))

    out = compact(tmp_lake)
    by_pid = {r["partition"]: r["action"] for r in out}
    assert by_pid[1] == "rewritten"
    after = read_lake_arrow(tmp_lake)
    assert after.equals(before)  # values identical, schema re-upgraded
    assert read_manifest(tmp_lake, 1).schema_version == 3
    reports = verify_lake(tmp_lake)
    assert all(r["ok"] for r in reports)
