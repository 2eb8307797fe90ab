"""Compaction + lake verification.

Compaction is the reference's ``system_clean_up`` analog
(``mex/extractors/system/main.py:15-75``: garbage-collect old run storage)
plus the schema-upgrade rewrite demanded by the north_rule: files written
under an older registry version are up-cast at scan time (schema.py) and
*rewritten to the latest version* here, so scan-time casting is transient,
not permanent debt.

Verification is the "checked load" discipline (asset checks,
``mex/extractors/pipeline/checks/main.py``; manifest checksum,
``mex/extractors/sinks/s3.py:107-109``): re-hash every committed file,
re-count rows, and re-assert the per-row ``n_tok == len(tokens)`` invariant.
Runs distributed — one task per partition via a Dataset over partition ids.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.cdc.manifest import (
    PartitionManifest,
    commit_manifest,
    partition_dir,
    read_manifest,
    sha256_file,
)
from mex_extractors_ray.schema import SchemaRegistry, sequence_registry


def _partition_ids(lake_dir: str | Path) -> list[int]:
    return sorted(
        int(p.name.split("=")[1]) for p in Path(lake_dir).glob("partition=*") if p.is_dir()
    )


def compact_partition(lake_dir: str, pid: int, registry_json: str) -> dict:
    """Rewrite one partition's files at the latest schema version (no-op if
    already current and single-file). Commit is the same two-phase protocol
    as apply: deterministic name, atomic manifest replace."""
    registry = SchemaRegistry.from_json(registry_json)
    m = read_manifest(lake_dir, pid)
    if m is None:
        return {"partition": pid, "action": "missing"}
    if m.schema_version == registry.latest_version and len(m.files) <= 1:
        return {"partition": pid, "action": "noop"}
    pdir = partition_dir(lake_dir, pid)
    cols = [n for n, _ in registry.latest.fields] + ["lsn"]
    merged = pa.concat_tables(
        registry.resolve_table(pq.read_table(pdir / f)).select(cols) for f in m.files
    ).sort_by([("doc_id", "ascending")])
    name = f"part-{pid:05d}-{m.last_lsn:020d}.parquet"
    tmp = pdir / f".tmp-{uuid.uuid4().hex}"
    pq.write_table(merged, tmp, compression="snappy")
    os.replace(tmp, pdir / name)
    commit_manifest(
        lake_dir,
        PartitionManifest(
            partition=pid,
            last_lsn=m.last_lsn,
            files=[name],
            tombstone_file=m.tombstone_file,
            schema_version=registry.latest_version,
            sha256_checksum=sha256_file(pdir / name),
            row_count=merged.num_rows,
            tombstone_count=m.tombstone_count,
        ),
    )
    return {"partition": pid, "action": "rewritten", "rows": merged.num_rows}


def compact(lake_dir: str | Path, registry: SchemaRegistry | None = None) -> list[dict]:
    """Compact every partition (distributed: one task per partition)."""
    import ray.data

    registry = registry or sequence_registry()
    rj = registry.to_json()
    pids = _partition_ids(lake_dir)
    if not pids:
        return []
    lake = str(lake_dir)

    def run(batch: dict) -> pa.Table:
        rows = [compact_partition(lake, int(p), rj) for p in batch["id"]]
        return pa.Table.from_pylist(
            [{"partition": r["partition"], "action": r["action"]} for r in rows]
        )

    out = ray.data.range(max(pids) + 1).map_batches(run, batch_size=1, batch_format="numpy")
    return out.take_all()


def verify_partition(lake_dir: str, pid: int, registry_json: str) -> dict:
    """Audit one partition: checksum, row count, doc_id sort order +
    uniqueness, n_tok==len(tokens) invariant, tombstone/live disjointness."""
    registry = SchemaRegistry.from_json(registry_json)
    m = read_manifest(lake_dir, pid)
    if m is None:
        return {"partition": pid, "ok": True, "errors": []}
    pdir = partition_dir(lake_dir, pid)
    errors: list[str] = []
    rows = 0
    live_ids: set = set()
    for i, f in enumerate(m.files):
        path = pdir / f
        if not path.exists():
            errors.append(f"missing file {f}")
            continue
        if i == 0 and sha256_file(path) != m.sha256_checksum:
            errors.append(f"checksum mismatch {f}")
        t = registry.resolve_table(pq.read_table(path))
        rows += t.num_rows
        ids = t["doc_id"].to_pylist()
        if ids != sorted(ids):
            errors.append(f"{f}: doc_id not sorted")
        if len(set(ids)) != len(ids):
            errors.append(f"{f}: duplicate doc_id")
        live_ids.update(ids)
        bad = pc.sum(
            pc.cast(
                pc.not_equal(
                    pc.list_value_length(t["tokens"]).cast(pa.int64()),
                    t["n_tok"].cast(pa.int64()),
                ),
                pa.int64(),
            )
        ).as_py()
        if bad:
            errors.append(f"{f}: {bad} rows violate n_tok==len(tokens)")
    if rows != m.row_count:
        errors.append(f"row_count {rows} != manifest {m.row_count}")
    if m.tombstone_file and (pdir / m.tombstone_file).exists():
        tt = pq.read_table(pdir / m.tombstone_file)
        overlap = live_ids & set(tt["doc_id"].to_pylist())
        if overlap:
            errors.append(f"{len(overlap)} doc_ids both live and tombstoned")
    return {"partition": pid, "ok": not errors, "errors": errors}


def verify_lake(lake_dir: str | Path, registry: SchemaRegistry | None = None) -> list[dict]:
    """Full-lake audit (distributed). Returns one report per partition."""
    import ray.data

    registry = registry or sequence_registry()
    rj = registry.to_json()
    pids = _partition_ids(lake_dir)
    if not pids:
        return []
    lake = str(lake_dir)

    def run(batch: dict) -> pa.Table:
        rows = [verify_partition(lake, int(p), rj) for p in batch["id"]]
        return pa.Table.from_pylist(
            [
                {"partition": r["partition"], "ok": r["ok"], "errors": "; ".join(r["errors"])}
                for r in rows
            ]
        )

    out = ray.data.range(max(pids) + 1).map_batches(run, batch_size=1, batch_format="numpy")
    return out.take_all()
