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

import json
import os
import uuid
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.cdc.manifest import (
    PartitionManifest,
    commit_manifest,
    file_window_ends,
    partition_dir,
    read_manifest,
    sha256_file,
)
from mex_extractors_ray.schema import SchemaRegistry, sequence_registry


_Z_PREFIX = "z:"


def zorder_cols(cluster_by: str | None) -> list[str] | None:
    """Parse the manifest/CLI cluster spec: ``"z:colA,colB"`` → two-column
    Z-order (Morton-interleaved ranks); any other string = single-column
    sort; None = unclustered."""
    if cluster_by and cluster_by.startswith(_Z_PREFIX):
        cols = [c for c in cluster_by[len(_Z_PREFIX):].split(",") if c]
        if len(cols) != 2:
            raise ValueError(
                f"z-order clustering takes exactly 2 columns, got {cluster_by!r}")
        return cols
    return None


def _spread2(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of each value into every other bit position
    (the classic 2-D Morton magic-number ladder)."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _dense_rank(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Dense rank of each value within the table (0-based, value order);
    nulls rank last. Deterministic from the column content alone, so the
    verify audit can recompute the exact key the compactor sorted by."""
    arr = col if isinstance(col, pa.Array) else col.combine_chunks()
    uniq = pc.unique(arr).drop_null()
    uniq = pc.take(uniq, pc.array_sort_indices(uniq))
    idx = pc.index_in(arr, value_set=uniq)
    idx = pc.fill_null(idx, len(uniq))
    return np.asarray(idx.cast(pa.int64()))


def zorder_key(t: pa.Table, cols: list[str]) -> pa.Array:
    """Z-order (Morton) key over two columns: dense-rank each column,
    SCALE each rank range onto the full 21-bit width (a 6-value source
    column must occupy the same bit ladder as a 10⁶-value numeric one, or
    the interleave degenerates to whichever column has more distinct
    values), and interleave the bits (cols[0] takes the higher bit of
    each pair).

    Sorting one partition's base file by this key makes its parquet
    row-group min/max statistics selective for conjunctive predicates on
    BOTH columns at once — the two-column generalization of single-column
    clustering (a lakehouse Z-ORDER): a (source = x AND n_tok range) read
    prunes row groups on both legs instead of one. Rank-based (not raw
    values) so skewed value domains still split evenly across groups;
    beyond 2²¹ distinct values per column the scaling merges neighboring
    ranks (stated, not silent — order inside a merged rank falls to the
    doc_id tie-break)."""
    cap = np.uint64(0x1FFFFF)
    parts = []
    for c in cols:
        r = _dense_rank(t[c]).astype(np.uint64)
        d = np.uint64(max(int(r.max()) if len(r) else 0, 1))
        parts.append((r * cap) // d)
    z = (_spread2(parts[0]) << np.uint64(1)) | _spread2(parts[1])
    return pa.array(z.astype(np.int64))


def _all_partition_dirs(lake_dir: str | Path) -> list[int]:
    """Every on-disk partition id, INCLUDING split orphans (vacuum's view)."""
    return sorted(
        int(p.name.split("=")[1]) for p in Path(lake_dir).glob("partition=*") if p.is_dir()
    )


def _partition_ids(lake_dir: str | Path) -> list[int]:
    """On-disk partition ids restricted to the meta's live physical set
    (compact/verify must never touch a split's retired parents or a
    crashed split's not-yet-flipped children)."""
    globbed = _all_partition_dirs(lake_dir)
    from mex_extractors_ray.cdc.apply import live_physical_pids, load_lake_meta

    try:
        meta = load_lake_meta(lake_dir)
    except FileNotFoundError:
        return globbed  # hand-built lake (tests) — no routing identity
    # filter even when splits == {}: a crashed first split's children
    # (ids ≥ P) must stay invisible to compact/verify
    live = set(live_physical_pids(meta["num_partitions"], meta["splits"]))
    return [p for p in globbed if p in live]


def compact_partition(lake_dir: str, pid: int, registry_json: str,
                      cluster_by: str | None = None,
                      row_group_rows: int | None = None) -> dict:
    """Rewrite one partition's files at the latest schema version (no-op if
    already current and single-file). Commit is the same two-phase protocol
    as apply: deterministic name, atomic manifest replace.

    ``cluster_by`` sorts the folded base by that column (doc_id as the
    tie-break), and ``row_group_rows`` bounds the parquet row-group size —
    together they make row-group statistics selective for range predicates
    on the cluster column (a partition-sized default row group has ONE
    stats entry: nothing to prune). The trade is explicit: doc_id point
    lookups lose their row-group locality on the clustered base until the
    next plain fold resets it."""
    registry = SchemaRegistry.from_json(registry_json)
    m = read_manifest(lake_dir, pid)
    if m is None:
        return {"partition": pid, "action": "missing", "last_lsn": -1}
    if (m.schema_version == registry.latest_version and len(m.files) <= 1
            and (cluster_by is None or m.cluster_by == cluster_by)):
        return {"partition": pid, "action": "noop", "last_lsn": m.last_lsn}
    pdir = partition_dir(lake_dir, pid)
    cols = [n for n, _ in registry.latest.fields] + ["lsn"]
    # delta fold: last-wins across base+deltas, minus tombstoned docs
    from mex_extractors_ray.cdc.apply import (
        _bounds_of,
        _group_stats_dict,
        _read_partition_live,
        _value_counts_dict,
    )

    merged = _read_partition_live(pdir, m, registry, cols)
    zc = zorder_cols(cluster_by)
    if zc is not None:
        missing = [c for c in zc if c not in merged.column_names]
        if missing:
            raise ValueError(f"z-order columns {missing!r} not in lake schema")
        merged = merged.append_column("_z", zorder_key(merged, zc))
        merged = merged.sort_by(
            [("_z", "ascending"), ("doc_id", "ascending")]).drop_columns(["_z"])
    elif cluster_by is not None:
        if cluster_by not in merged.column_names:
            raise ValueError(f"cluster_by column {cluster_by!r} not in lake schema")
        merged = merged.sort_by(
            [(cluster_by, "ascending"), ("doc_id", "ascending")])
    name = f"part-{pid:05d}-{m.last_lsn:020d}.parquet"
    tmp = pdir / f".tmp-{uuid.uuid4().hex}"
    pq.write_table(merged, tmp, compression="snappy",
                   row_group_size=row_group_rows)
    os.replace(tmp, pdir / name)
    digest = sha256_file(pdir / name)
    commit_manifest(
        lake_dir,
        PartitionManifest(
            partition=pid,
            last_lsn=m.last_lsn,
            files=[name],
            tombstone_file=m.tombstone_file,
            schema_version=registry.latest_version,
            sha256_checksum=digest,
            file_checksums=[digest],
            row_count=merged.num_rows,
            tombstone_count=m.tombstone_count,
            # a compaction is a fold: history below the watermark is
            # squashed and the delete logs are GC'd by commit_manifest
            history_floor=m.last_lsn,
            file_lsns=[m.last_lsn],
            # maintained aggregates recounted from the folded state (the
            # merged table is in hand — self-healing, like the apply fold)
            agg_counts={
                c: _value_counts_dict(merged[c]) for c in (m.agg_counts or {})
            },
            agg_sums={
                k: _group_stats_dict(merged, *k.split("|", 1))
                for k in (m.agg_sums or {})
            },
            # zone maps recomputed EXACTLY from the folded live state —
            # this is where delta-widened conservative bounds tighten
            agg_bounds={c: _bounds_of(merged[c]) for c in (m.agg_bounds or {})},
            cluster_by=cluster_by,
        ),
    )
    return {"partition": pid, "action": "rewritten", "rows": merged.num_rows,
            "last_lsn": m.last_lsn}


def compact(lake_dir: str | Path, registry: SchemaRegistry | None = None,
            cluster_by: str | None = None,
            row_group_rows: int | None = None) -> list[dict]:
    """Compact every partition (distributed: one task per partition).

    Takes the lake's writer lease: a compaction racing an ingest could
    otherwise GC files an in-flight apply has already read from the old
    manifest, committing a manifest that references deleted files. (The
    ingest's own inline fold needs no lease here — it runs UNDER the
    ingest's lease, inside apply_partition, and never calls this.)"""
    import ray.data

    from mex_extractors_ray.cdc.manifest import writer_lock

    registry = registry or sequence_registry()
    rj = registry.to_json()
    pids = _partition_ids(lake_dir)
    if not pids:
        return []
    lake = str(lake_dir)
    with writer_lock(lake_dir, "compact"):
        out = _locked_compact(lake, pids, rj, cluster_by, row_group_rows)
        rewritten = sum(1 for r in out if r["action"] == "rewritten")
        if rewritten:
            from mex_extractors_ray.state.checks import record_maintenance

            # marker from the manifests the LOCKED compaction itself read
            # (threaded back per partition) — never re-read unlocked, where
            # a racing ingest could advance last_lsn past what this compact
            # actually folded and a retry would mint a second record
            marks = [r["last_lsn"] for r in out if r["action"] != "missing"]
            record_maintenance(lake, "compact", f"{max(marks, default=0):020d}", {
                "partitions": len(out), "rewritten": rewritten})
    return out


def _locked_compact(lake: str, pids, rj: str, cluster_by: str | None = None,
                    row_group_rows: int | None = None) -> list[dict]:
    import ray.data

    def run(batch: dict) -> pa.Table:
        rows = [compact_partition(lake, int(p), rj, cluster_by, row_group_rows)
                for p in batch["item"]]
        return pa.Table.from_pylist(
            [{"partition": r["partition"], "action": r["action"],
              "last_lsn": r["last_lsn"]} for r in rows]
        )

    # from_items over the actual ids: split children are sparse
    out = ray.data.from_items(pids).map_batches(run, batch_size=1, batch_format="numpy")
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
    tables = []
    for i, f in enumerate(m.files):
        path = pdir / f
        if not path.exists():
            errors.append(f"missing file {f}")
            continue
        if i < len(m.file_checksums):
            if sha256_file(path) != m.file_checksums[i]:
                errors.append(f"checksum mismatch {f}")
        elif i == 0 and sha256_file(path) != m.sha256_checksum:
            # pre-file_checksums manifests carry only the primary hash
            errors.append(f"checksum mismatch {f}")
        t = registry.resolve_table(pq.read_table(path), fill_null_defaults=False)
        tables.append(t)
        # sortedness/uniqueness via Arrow kernels — no to_pylist (Python
        # objects cost ~10× the Arrow memory inside the audit task).
        # A clustered base (files[0] under manifest cluster_by) is sorted
        # by the cluster column instead of doc_id — audit what was written.
        # A z-ordered base is sorted by a COMPUTED key: recompute it from
        # the file content (dense ranks are deterministic per file) and
        # audit that instead.
        zc = zorder_cols(m.cluster_by) if i == 0 else None
        sort_col = (m.cluster_by if i == 0 and m.cluster_by and zc is None
                    and m.cluster_by in t.column_names else "doc_id")
        ids = t["doc_id"].combine_chunks()
        n = len(ids)
        if n > 1:
            if zc is not None:
                if not all(c in t.column_names for c in zc):
                    errors.append(f"{f}: z-order columns {zc} missing")
                    continue
                sc = zorder_key(t, zc)
                sort_col = m.cluster_by
            else:
                sc = t[sort_col].combine_chunks()
            nxt, prv = sc.slice(1), sc.slice(0, n - 1)
            # null comparisons are skipped (nullable cluster columns sort
            # nulls last; `is False` keeps an all-null file passing)
            if pc.all(pc.greater_equal(nxt, prv)).as_py() is False:
                errors.append(f"{f}: {sort_col} not sorted")
        if n and len(pc.unique(ids)) != n:
            errors.append(f"{f}: duplicate doc_id")
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
    # live state = delta merge (cross-file duplicate doc_ids are expected:
    # deltas shadow the base by LSN); row_count is the MERGED live count
    tomb_arr: pa.Array | None = None
    if m.tombstone_file and (pdir / m.tombstone_file).exists():
        tc = pq.read_table(pdir / m.tombstone_file, columns=["doc_id"])["doc_id"]
        tomb_arr = pc.unique(tc.combine_chunks().sort())
    if tables:
        from mex_extractors_ray.cdc.apply import merge_live

        cols = [n for n, _ in registry.latest.fields] + ["lsn"]
        live = merge_live([t.select(cols) for t in tables], tomb_arr)
        if live.num_rows != m.row_count:
            errors.append(f"row_count {live.num_rows} != manifest {m.row_count}")
        if tomb_arr is not None and len(tomb_arr):
            overlap = pc.sum(
                pc.cast(pc.is_in(live["doc_id"], value_set=tomb_arr), pa.int64())
            ).as_py() or 0
            if overlap:
                errors.append(f"{overlap} doc_ids both live and tombstoned")
        # zone-map soundness: every live non-null value inside the
        # (conservative) manifest bounds; None = provably no such value
        for c, b in (m.agg_bounds or {}).items():
            mm = pc.min_max(live[c])
            lo = mm["min"].as_py()
            if lo is None:
                continue
            if b is None or lo < b[0] or mm["max"].as_py() > b[1]:
                errors.append(f"zone map for {c!r} {b} excludes live values "
                              f"[{lo}, {mm['max'].as_py()}]")
    elif m.row_count:
        errors.append(f"row_count 0 != manifest {m.row_count}")
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
        rows = [verify_partition(lake, int(p), rj) for p in batch["item"]]
        return pa.Table.from_pylist(
            [
                {"partition": r["partition"], "ok": r["ok"], "errors": "; ".join(r["errors"])}
                for r in rows
            ]
        )

    # enumerate the ACTUAL live pids (from_items, not range(max+1)):
    # split children make physical ids sparse — pid0 + P·(2^d−1+c) at
    # depth d — and a dense range would spawn ghost no-op tasks
    out = ray.data.from_items(pids).map_batches(run, batch_size=1, batch_format="numpy")
    return out.take_all()


def vacuum_partition(lake_dir: str, pid: int, dry_run: bool = False) -> dict:
    """Reclaim one partition's crash orphans: files the manifest does not
    reference. ``commit_manifest`` GCs *superseded* files at every commit,
    but a crash between phase 1 (data write) and phase 2 (manifest rename)
    leaves data/tombstone/delete-log parquet — and ``.tmp-*`` scratch —
    that no commit will ever sweep. The manifest is the only source of
    truth, so with the writer lease held every unreferenced file here is a
    crash leftover by definition.

    Scope is deliberately narrow: only ``.tmp-*`` scratch and unreferenced
    ``*.parquet`` inside ``partition=*`` directories. Time travel is
    unaffected — every delete log the as-of / change-feed readers need is
    listed in ``manifest.delete_logs`` and therefore kept.
    """
    pdir = partition_dir(lake_dir, pid)
    m = read_manifest(lake_dir, pid)
    keep: set[str] = {"manifest.json"}
    if m is not None:
        keep |= set(m.files) | set(m.delete_logs)
        if m.tombstone_file:
            keep.add(m.tombstone_file)
    removed: list[str] = []
    bytes_reclaimed = 0
    if pdir.is_dir():
        for p in sorted(pdir.iterdir()):
            name = p.name
            if not p.is_file() or name in keep:
                continue
            if not (name.startswith(".tmp-") or name.endswith(".parquet")):
                continue  # not something this engine writes — leave it
            bytes_reclaimed += p.stat().st_size
            removed.append(name)
            if not dry_run:
                p.unlink()
    return {
        "partition": pid,
        "removed": len(removed),
        "bytes_reclaimed": bytes_reclaimed,
        "names": removed,
    }


def vacuum_lake(lake_dir: str | Path, dry_run: bool = False,
                retention_seconds: float = 0.0) -> dict:
    """Lake-wide orphan GC (Delta Lake VACUUM analog), distributed one task
    per partition. Takes the writer lease — even for ``dry_run`` — so an
    in-flight ingest's phase-1 files (written, not yet manifest-committed)
    can never be mistaken for orphans; with the lease held, unreferenced
    means crashed. Root-level ``.tmp-*`` scratch from ``atomic_write_bytes``
    (``_lake_meta.json`` / ``_ingest_state.json`` writes) is swept on the
    driver — there are O(1) such files per lake.

    ``retention_seconds`` guards whole-directory split orphans only: the
    writer lease serializes WRITERS, but a long-running READER that
    enumerated partitions just before a split's meta flip may still be
    reading a retired parent dir — the retention window (Delta's VACUUM
    retention analog) keeps dirs younger than it. In-partition file
    orphans need no window (readers open only manifest-listed names).
    """
    import ray.data

    from mex_extractors_ray.cdc.manifest import writer_lock

    lake = str(lake_dir)
    with writer_lock(lake, "vacuum"):
        root_removed = 0
        root_bytes = 0
        for p in sorted(Path(lake).iterdir()):
            if p.is_file() and p.name.startswith(".tmp-"):
                root_bytes += p.stat().st_size
                root_removed += 1
                if not dry_run:
                    p.unlink()
        pids = _partition_ids(lake)
        # whole-directory orphans from partition splits: retired parents
        # (crash after the meta flip) and never-flipped children (crash
        # before it) are partition dirs OUTSIDE the live physical set —
        # with the lease held they are sweepable in full
        dead_dirs = sorted(set(_all_partition_dirs(lake)) - set(pids))
        import time as _time

        now = _time.time()
        for dp in dead_dirs:
            ddir = partition_dir(lake, dp)
            if retention_seconds > 0:
                try:
                    # split-retired parents carry an explicit flip-time
                    # marker (_locked_split); crash orphans (never-flipped
                    # children) have none — their dir mtime IS the crash
                    marker = ddir / "_retired.json"
                    if marker.exists():
                        ref = float(json.loads(marker.read_text())["retired_at"])
                    else:
                        ref = ddir.stat().st_mtime
                    age = now - ref
                except (FileNotFoundError, KeyError, ValueError):
                    continue
                if age < retention_seconds:
                    continue  # possibly still open by a pre-flip reader
            for f in ddir.rglob("*"):
                if f.is_file():
                    root_bytes += f.stat().st_size
                    root_removed += 1
            if not dry_run:
                import shutil as _sh

                _sh.rmtree(ddir, ignore_errors=True)
        reports: list[dict] = []
        if pids:
            def run(batch: dict) -> pa.Table:
                rows = [
                    vacuum_partition(lake, int(p), dry_run)
                    for p in batch["item"]
                ]
                return pa.Table.from_pylist(
                    [
                        {
                            "partition": r["partition"],
                            "removed": r["removed"],
                            "bytes_reclaimed": r["bytes_reclaimed"],
                            "names": "; ".join(r["names"]),
                        }
                        for r in rows
                    ],
                    schema=pa.schema(
                        [
                            ("partition", pa.int64()),
                            ("removed", pa.int64()),
                            ("bytes_reclaimed", pa.int64()),
                            ("names", pa.string()),
                        ]
                    ),
                )

            # from_items over the actual ids: split children are sparse
            out = ray.data.from_items(pids).map_batches(
                run, batch_size=1, batch_format="numpy"
            )
            reports = out.take_all()
    return {
        "dry_run": dry_run,
        "partitions": reports,
        "files_removed": root_removed + sum(r["removed"] for r in reports),
        "bytes_reclaimed": root_bytes + sum(r["bytes_reclaimed"] for r in reports),
    }


def repartition_lake(
    lake_dir: str | Path,
    new_num_partitions: int,
    registry: SchemaRegistry | None = None,
    force: bool = False,
) -> dict:
    """Re-shard the lake to a different partition count — the scale-out /
    skew remedy (SURVEY.md §4: split partitions rather than salt keys, so
    key-locality of the merge is preserved).

    Distributed: reads the committed state as a Dataset, re-assigns
    pid = hash(doc_id) % P', and rewrites per-partition files + manifests
    (same two-phase commit). The global LSN watermark is preserved as the
    max of the old per-partition watermarks: after repartitioning, replaying
    any suffix of the log (lsn > watermark) remains correct because every
    partition inherits that watermark.
    """
    from mex_extractors_ray.cdc.manifest import writer_lock

    registry = registry or sequence_registry()
    rj = registry.to_json()
    old = Path(lake_dir)
    with writer_lock(old, "repartition"):
        return _locked_repartition(old, new_num_partitions, registry, rj, force)


def _locked_repartition(old, new_num_partitions, registry, rj, force) -> dict:
    import functools

    import ray.data

    from mex_extractors_ray.cdc.apply import read_lake, resolve_and_partition
    from mex_extractors_ray.cdc.apply import _bounds_of as _bnd
    from mex_extractors_ray.cdc.apply import _group_stats_dict as _gsd
    from mex_extractors_ray.cdc.apply import _value_counts_dict as _vcd

    pids = _partition_ids(old)
    marks = [read_manifest(old, p).last_lsn for p in pids if read_manifest(old, p)]
    watermark = max(marks, default=-1)
    # repartitioning collapses per-partition watermarks into ONE global
    # value. Per-partition marks legitimately differ even when fully
    # committed (each is the max LSN of its OWN events), so divergence alone
    # proves nothing; the partial-commit signal is a manifest AHEAD of the
    # lake-level completion record (_ingest_state.json, written only after
    # every partition committed). Re-running that ingest after a forced
    # repartition would drop the lagging partitions' un-applied events as
    # "late" — silent data loss — hence the refusal.
    from mex_extractors_ray.cdc.apply import read_ingest_state

    completed = read_ingest_state(old)
    if marks and completed >= 0 and watermark > completed and not force:
        raise ValueError(
            f"lake has partition watermarks up to {watermark} but the last "
            f"fully-committed ingest reached only {completed}: an ingest "
            "partially committed. Re-run it to convergence first, or pass "
            "force=True to accept that its events not yet applied to "
            "lagging partitions will be dropped as late on replay."
        )
    tomb_files: list[str] = []
    tracked_cols: set[str] = set()
    for p in pids:
        m = read_manifest(old, p)
        if m and m.tombstone_file and (partition_dir(old, p) / m.tombstone_file).exists():
            tomb_files.append(str(partition_dir(old, p) / m.tombstone_file))
        if m:
            tracked_cols.update(m.agg_counts or {})
            tracked_cols.update(f"sums:{k}" for k in (m.agg_sums or {}))
            tracked_cols.update(f"bounds:{k}" for k in (m.agg_bounds or {}))
    tracked = tuple(sorted(c for c in tracked_cols
                           if not c.startswith(("sums:", "bounds:"))))
    tracked_sums = tuple(sorted(c[5:] for c in tracked_cols if c.startswith("sums:")))
    tracked_bounds = tuple(sorted(c[7:] for c in tracked_cols if c.startswith("bounds:")))

    new = Path(str(old) + f".repart-{new_num_partitions}")
    if new.exists():
        import shutil

        shutil.rmtree(new)
    new.mkdir(parents=True)
    (new / "_registry.json").write_text(rj)

    ds = read_lake(old, registry).map_batches(
        functools.partial(resolve_and_partition, registry_json=rj, num_partitions=new_num_partitions),
        batch_format="pyarrow",
    )

    def write_partition(group: pa.Table) -> pa.Table:
        pid = int(group["pid"][0].as_py())
        pdir = partition_dir(new, pid)
        pdir.mkdir(parents=True, exist_ok=True)
        cols = [n for n, _ in SchemaRegistry.from_json(rj).latest.fields] + ["lsn"]
        t = group.select(cols).sort_by([("doc_id", "ascending")])
        name = f"part-{pid:05d}-{watermark:020d}.parquet"
        tmp = pdir / f".tmp-{uuid.uuid4().hex}"
        pq.write_table(t, tmp, compression="snappy")
        os.replace(tmp, pdir / name)
        digest = sha256_file(pdir / name)
        commit_manifest(
            new,
            PartitionManifest(
                partition=pid,
                last_lsn=watermark,
                files=[name],
                tombstone_file=None,
                schema_version=SchemaRegistry.from_json(rj).latest_version,
                sha256_checksum=digest,
                file_checksums=[digest],
                row_count=t.num_rows,
                # repartition rewrites live state at the watermark —
                # history is squashed, exactly like a fold
                history_floor=watermark,
                file_lsns=[watermark],
                agg_counts={c: _vcd(t[c]) for c in tracked},
                agg_sums={k: _gsd(t, *k.split("|", 1)) for k in tracked_sums},
                agg_bounds={c: _bnd(t[c]) for c in tracked_bounds},
            ),
        )
        return pa.table({"partition": pa.array([pid], pa.int32()), "rows": pa.array([t.num_rows], pa.int64())})

    try:
        # `_shard` = bijective pid relabeling from resolve_and_partition:
        # no empty aggregator buckets, no schema-less RefBundles
        grouped = ds.groupby("_shard", num_partitions=new_num_partitions)
    except TypeError:
        grouped = ds.groupby("_shard")
    out = grouped.map_groups(write_partition, batch_format="pyarrow").take_all()

    # redistribute tombstones to their new partitions — DISTRIBUTED: the
    # tombstone set is corpus-scale under a delete-heavy mix, so it goes
    # through the same groupby(pid) shuffle as the data (never a
    # driver-side dict; the old O(T×P) per-partition list scan is gone)
    if tomb_files:
        from mex_extractors_ray.hashing import assign_partitions as _ap, shard_tags as _st

        def tag_tomb(t: pa.Table) -> pa.Table:
            npid = _ap(t["doc_id"], new_num_partitions)
            t = t.append_column("_npid", pa.array(npid))
            return t.append_column("_tshard", _st(npid, new_num_partitions))

        def write_tombstones(g: pa.Table) -> pa.Table:
            pid = int(g["_npid"][0].as_py())
            tt = g.drop_columns(["_npid", "_tshard"]).sort_by([("doc_id", "ascending")])
            pdir = partition_dir(new, pid)
            pdir.mkdir(parents=True, exist_ok=True)
            name = f"tombstones-{pid:05d}-{watermark:020d}.parquet"
            tmp = pdir / f".tmp-{uuid.uuid4().hex}"
            pq.write_table(tt, tmp, compression="snappy")
            os.replace(tmp, pdir / name)
            m = read_manifest(new, pid) or PartitionManifest(
                partition=pid, last_lsn=watermark, files=[],
                schema_version=SchemaRegistry.from_json(rj).latest_version,
                history_floor=watermark,
                # tombstone-only partition: zero live docs, but the views
                # must stay answerable for the tracked columns
                agg_counts={c: {} for c in tracked},
                agg_sums={k: {} for k in tracked_sums},
            )
            m.tombstone_file = name
            m.tombstone_count = tt.num_rows
            commit_manifest(new, m)
            return pa.table(
                {"partition": pa.array([pid], pa.int32()),
                 "tombstones": pa.array([tt.num_rows], pa.int64())}
            )

        (
            ray.data.read_parquet(tomb_files, columns=["doc_id", "lsn"])
            .map_batches(tag_tomb, batch_format="pyarrow")
            .groupby("_tshard", num_partitions=new_num_partitions)
            .map_groups(write_tombstones, batch_format="pyarrow")
            .take_all()
        )

    # carry lake-level state over: lineage history, tail sensor state, and
    # the (new) partition-count metadata
    import shutil

    from mex_extractors_ray.cdc.manifest import atomic_write_bytes

    # carry the apply mode (part of the lake's merge identity) through the
    # re-shard; splits intentionally reset (the new layout has none)
    old_meta_p = Path(old) / "_lake_meta.json"
    new_meta: dict = {"num_partitions": new_num_partitions}
    if old_meta_p.exists():
        old_mode = json.loads(old_meta_p.read_text()).get("mode")
        if old_mode is not None:
            new_meta["mode"] = old_mode
    atomic_write_bytes(new / "_lake_meta.json", json.dumps(new_meta).encode())
    # every new partition carries the collapsed watermark, so that IS the
    # fully-committed level of the new layout
    atomic_write_bytes(
        new / "_ingest_state.json", json.dumps({"completed_lsn": int(watermark)}).encode()
    )
    if (old / "_lineage").exists():
        shutil.copytree(old / "_lineage", new / "_lineage", dirs_exist_ok=True)
    if (old / "_tail_state.json").exists():
        shutil.copy(old / "_tail_state.json", new / "_tail_state.json")

    # atomic swap: retire the old layout, promote the new one
    backup = Path(str(old) + ".old")
    if backup.exists():
        shutil.rmtree(backup)
    os.replace(old, backup)
    os.replace(new, old)
    shutil.rmtree(backup)
    from mex_extractors_ray.state.checks import record_maintenance

    record_maintenance(old, "repartition", f"p{new_num_partitions}-{watermark:020d}", {
        "num_partitions": new_num_partitions, "watermark": watermark,
        "rows": sum(r["rows"] for r in out)})
    return {"partitions": len(out), "rows": sum(r["rows"] for r in out), "watermark": watermark}


# ---------------------------------------------------------------------------
# hot-partition split — the in-place skew remedy
# ---------------------------------------------------------------------------


def split_partition(
    lake_dir: str | Path,
    pid0: int,
    registry: SchemaRegistry | None = None,
    force: bool = False,
) -> dict:
    """Double ONE base partition's physical fan-out (extendible-hash split,
    see ``cdc/apply.py`` routing notes) — the 100-TB skew remedy SURVEY.md
    §4 calls for: a hot partition is rewritten at a cost ∝ that partition,
    where ``repartition_lake`` rewrites the whole lake.

    Zero-shuffle by construction: a child at depth d+1 has exactly one
    parent at depth d (its child index mod 2^d), so the split runs as one
    independent task per parent partition — read the parent's live rows +
    tombstone snapshot, route each by hash bit d, write the two children's
    files and manifests. Child ids are FRESH (disjoint id ranges per
    depth), so nothing is visible to readers until the final atomic
    ``_lake_meta.json`` depth flip; a crash before the flip leaves orphan
    child directories the vacuum sweeps, and a crash after it leaves
    orphan PARENT directories — same sweep, no reader ever sees both.

    Children carry the collapsed parent watermark and a squashed history
    (``history_floor = last_lsn``): change-feed consumers behind that
    floor rebase from live state, exactly as after a fold or compaction.
    """
    from mex_extractors_ray.cdc.manifest import writer_lock

    registry = registry or sequence_registry()
    with writer_lock(Path(lake_dir), "split"):
        return _locked_split(Path(lake_dir), int(pid0), registry, force)


def _split_one_parent(lake: str, parent: int, pid0: int, P: int, new_d: int,
                      watermark: int, rj: str, tracked: tuple,
                      tracked_sums: tuple, tracked_bounds: tuple) -> list[dict]:
    """Write BOTH children of one parent physical partition (task body)."""
    from mex_extractors_ray.cdc.apply import (
        _bounds_of,
        _group_stats_dict,
        _read_partition_live,
        _value_counts_dict,
        split_children,
    )
    from mex_extractors_ray.hashing import hash_key_array

    registry = SchemaRegistry.from_json(rj)
    cols = [n for n, _ in registry.latest.fields] + ["lsn"]
    m = read_manifest(lake, parent)
    pdir = partition_dir(lake, parent)
    live = _read_partition_live(pdir, m, registry, cols)
    tomb = None
    if m.tombstone_file and (pdir / m.tombstone_file).exists():
        tomb = pq.read_table(pdir / m.tombstone_file, columns=["doc_id", "lsn"])
    kids = split_children(pid0, P, new_d)
    half = len(kids) >> 1
    # this parent's child index at depth d = parent's own index; its two
    # children at depth d+1 are c_old and c_old + 2^d
    c_old = (parent - pid0) // P - (half - 1) if new_d > 1 else 0
    mask_bits = np.uint64((1 << new_d) - 1)

    def child_index(doc_ids) -> np.ndarray:
        h = hash_key_array(doc_ids)
        return ((h // np.uint64(P)) & mask_bits).astype(np.int64)

    c_live = child_index(live["doc_id"]) if live.num_rows else np.empty(0, np.int64)
    c_tomb = (child_index(tomb["doc_id"])
              if tomb is not None and tomb.num_rows else np.empty(0, np.int64))
    out = []
    for c_new in (c_old, c_old + (1 << (new_d - 1))):
        kid = kids[c_new]
        kdir = partition_dir(lake, kid)
        kdir.mkdir(parents=True, exist_ok=True)
        t = live.filter(pa.array(c_live == c_new)).sort_by([("doc_id", "ascending")])
        files, checksums, lsns, digest = [], [], [], ""
        if t.num_rows:
            name = f"part-{kid:05d}-{watermark:020d}.parquet"
            tmp = kdir / f".tmp-{uuid.uuid4().hex}"
            pq.write_table(t, tmp, compression="snappy")
            os.replace(tmp, kdir / name)
            digest = sha256_file(kdir / name)
            files, checksums, lsns = [name], [digest], [watermark]
        tomb_name, tomb_rows = None, 0
        if tomb is not None:
            tt = tomb.filter(pa.array(c_tomb == c_new))
            if tt.num_rows:
                tomb_name = f"tombstones-{kid:05d}-{watermark:020d}.parquet"
                tmp = kdir / f".tmp-{uuid.uuid4().hex}"
                pq.write_table(tt.sort_by([("doc_id", "ascending")]), tmp,
                               compression="snappy")
                os.replace(tmp, kdir / tomb_name)
                tomb_rows = tt.num_rows
        commit_manifest(lake, PartitionManifest(
            partition=kid,
            last_lsn=watermark,
            files=files,
            tombstone_file=tomb_name,
            schema_version=registry.latest_version,
            sha256_checksum=digest,
            file_checksums=checksums,
            row_count=t.num_rows,
            tombstone_count=tomb_rows,
            history_floor=watermark,
            file_lsns=lsns,
            agg_counts={c: _value_counts_dict(t[c]) for c in tracked},
            agg_sums={k: _group_stats_dict(t, *k.split("|", 1)) for k in tracked_sums},
            agg_bounds={c: _bounds_of(t[c]) for c in tracked_bounds},
        ))
        out.append({"partition": kid, "rows": t.num_rows, "tombstones": tomb_rows})
    return out


def _locked_split(lake: Path, pid0: int, registry: SchemaRegistry, force: bool) -> dict:
    import time as _time

    import ray.data

    from mex_extractors_ray.cdc.apply import (
        load_lake_meta,
        read_ingest_state,
        split_children,
    )
    from mex_extractors_ray.cdc.manifest import atomic_write_bytes

    meta = load_lake_meta(lake)
    P, splits = int(meta["num_partitions"]), dict(meta["splits"])
    if not 0 <= pid0 < P:
        raise ValueError(f"pid0 must be a BASE partition id in [0, {P}), got {pid0}")
    d = splits.get(pid0, 0)
    new_d = d + 1
    # id-space insurance: phys = pid0 + P*(2^d-1+c) must stay well inside
    # int32; depth 20 is a 1,048,576× fan-out of ONE base partition —
    # beyond it the remedy is repartition_lake (raise P), not more splits
    if new_d > 20:
        raise ValueError(
            f"partition {pid0} is already at split depth {d}; use "
            "repartition_lake to raise the base partition count instead")
    parents = [p for p in split_children(pid0, P, d) if read_manifest(lake, p)]
    marks = [read_manifest(lake, p).last_lsn for p in parents]
    watermark = max(marks, default=-1)
    # same partial-commit refusal as repartition_lake: collapsing parent
    # watermarks onto the children would drop a lagging parent's
    # un-applied replayed events as "late" — silent data loss
    completed = read_ingest_state(lake)
    if marks and completed >= 0 and watermark > completed and not force:
        raise ValueError(
            f"partition {pid0} has watermarks up to {watermark} but the last "
            f"fully-committed ingest reached only {completed}: an ingest "
            "partially committed. Re-run it to convergence first, or pass "
            "force=True."
        )
    tracked_cols: set[str] = set()
    for p in parents:
        m = read_manifest(lake, p)
        tracked_cols.update(m.agg_counts or {})
        tracked_cols.update(f"sums:{k}" for k in (m.agg_sums or {}))
        tracked_cols.update(f"bounds:{k}" for k in (m.agg_bounds or {}))
    tracked = tuple(sorted(c for c in tracked_cols
                           if not c.startswith(("sums:", "bounds:"))))
    tracked_sums = tuple(sorted(c[5:] for c in tracked_cols if c.startswith("sums:")))
    tracked_bounds = tuple(sorted(c[7:] for c in tracked_cols if c.startswith("bounds:")))

    rj = registry.to_json()
    rows: list[dict] = []
    if parents:
        lk = str(lake)

        def run(batch: dict) -> pa.Table:
            recs: list[dict] = []
            for p in batch["item"]:
                recs.extend(_split_one_parent(
                    lk, int(p), pid0, P, new_d, watermark, rj,
                    tracked, tracked_sums, tracked_bounds))
            return pa.Table.from_pylist(recs, schema=pa.schema(
                [("partition", pa.int64()), ("rows", pa.int64()),
                 ("tombstones", pa.int64())]))

        rows = (
            ray.data.from_items(parents)
            .map_batches(run, batch_size=1, batch_format="numpy")
            .take_all()
        )

    # THE atomic visibility flip: readers enumerate children iff this
    # write lands; until then every child manifest above is invisible
    new_splits = dict(splits)
    new_splits[pid0] = new_d
    atomic_write_bytes(lake / "_lake_meta.json", json.dumps(
        {**meta, "num_partitions": P,
         "splits": {str(k): v for k, v in sorted(new_splits.items())}}
    ).encode())
    # retire the superseded parents WITHOUT deleting: a long-running reader
    # that enumerated partitions from the pre-flip meta may still be
    # scanning these dirs, so they stay on disk for vacuum_lake's retention
    # window to sweep — the same supersede-then-vacuum discipline
    # compact_partition follows. The marker records the actual flip time so
    # vacuum's age check doesn't lean on dir mtime (which for these dirs
    # predates the flip by the partition's whole write history).
    retired_at = _time.time()
    for p in parents:
        atomic_write_bytes(
            Path(partition_dir(lake, p)) / "_retired.json",
            json.dumps({"retired_at": retired_at, "op": "split",
                        "pid0": pid0, "depth": new_d}).encode())
    out = {
        "pid0": pid0, "depth": new_d,
        "children": split_children(pid0, P, new_d),
        "parents_retired": parents,
        "rows": sum(r["rows"] for r in rows),
        "tombstones": sum(r["tombstones"] for r in rows),
        "watermark": watermark,
    }
    # layout-change audit record (deterministic marker: a retried split of
    # the same base to the same depth overwrites its own record)
    from mex_extractors_ray.state.checks import record_maintenance

    record_maintenance(lake, "split", f"{pid0:05d}-d{new_d}", out)
    return out


def partition_loads(lake_dir: str | Path) -> list[dict]:
    """Per live physical partition: live rows (manifest counter) and
    on-disk bytes (file stats) — O(P) manifest reads, no data files
    opened. The split policy's input."""
    out = []
    for pid in _partition_ids(lake_dir):
        m = read_manifest(lake_dir, pid)
        if m is None:
            continue
        pdir = partition_dir(lake_dir, pid)
        names = list(m.files) + list(m.delete_logs)
        if m.tombstone_file:
            names.append(m.tombstone_file)
        nbytes = 0
        for f in names:
            try:
                nbytes += (pdir / f).stat().st_size
            except FileNotFoundError:
                pass
        out.append({"partition": pid, "rows": m.row_count, "bytes": nbytes})
    return out


def split_hot_partitions(
    lake_dir: str | Path,
    *,
    max_rows: int | None = None,
    max_bytes: int | None = None,
    max_rounds: int = 4,
    force: bool = False,
    dry_run: bool = False,
) -> dict:
    """The auto-split POLICY: scan manifests, split every base partition
    with a live physical child above ``max_rows`` / ``max_bytes``, repeat
    until all are under (or ``max_rounds`` splits of the same base).

    This is the maintenance job that keeps the 100-TB invariant
    "partition state ≪ worker heap" true as a lake grows or skews —
    thresholds come from the operator (e.g. rows such that one
    partition's live state fits a worker). Scan cost is O(P) manifest
    reads; split cost is ∝ the hot partitions only.

    Granularity note: the depth table is per BASE partition, so a split
    rewrites all of the base's current children even when only one is
    hot (uniform local depth — the directory-per-bucket refinement of
    classic extendible hashing is deliberately not modeled; at depth d
    that amplifies one hot child's rewrite by 2^d, bounded by
    ``max_rounds``)."""
    if max_rows is None and max_bytes is None:
        raise ValueError("give max_rows and/or max_bytes")
    from mex_extractors_ray.cdc.apply import load_lake_meta

    def scan_hot() -> list[int]:
        P = int(load_lake_meta(lake_dir)["num_partitions"])
        hot: set[int] = set()
        for load in partition_loads(lake_dir):
            if ((max_rows is not None and load["rows"] > max_rows)
                    or (max_bytes is not None and load["bytes"] > max_bytes)):
                hot.add(load["partition"] % P)
        return sorted(hot)

    done: list[dict] = []
    for _ in range(max_rounds):
        hot = scan_hot()
        if not hot or dry_run:
            return {"splits": done, "hot_bases": hot,
                    "converged": not hot, "dry_run": dry_run}
        for pid0 in hot:
            r = split_partition(lake_dir, pid0, force=force)
            done.append({"pid0": pid0, "depth": r["depth"], "rows": r["rows"]})
    # max_rounds exhausted: one more scan so the report reflects the FINAL
    # layout — the last round's splits may well have cooled every base, and
    # claiming non-convergence with an empty hot list would misreport that
    hot = scan_hot()
    return {"splits": done, "hot_bases": hot, "converged": not hot,
            "dry_run": False}


def lake_stats(lake_dir: str | Path) -> dict:
    """Operator-facing lake summary from manifests + meta alone (O(P)
    metadata reads, zero data files): layout (base P, depth table, live
    physical count), totals, watermarks, feed floors, and the per-
    partition load extremes the split policy acts on."""
    from mex_extractors_ray.cdc.apply import (
        load_lake_meta,
        read_ingest_state,
    )

    meta = load_lake_meta(lake_dir)
    loads = partition_loads(lake_dir)
    marks, floors, tombs = [], [], 0
    cluster_specs: dict[str, int] = {}
    for pid in _partition_ids(lake_dir):
        m = read_manifest(lake_dir, pid)
        if m is None:
            continue
        marks.append(m.last_lsn)
        floors.append(m.last_lsn if m.history_floor == -2 else m.history_floor)
        tombs += m.tombstone_count
        spec = m.cluster_by or "(doc_id)"
        cluster_specs[spec] = cluster_specs.get(spec, 0) + 1
    rows = [l["rows"] for l in loads]
    return {
        # partitions per clustering spec — "(doc_id)" = unclustered base,
        # "n_tok" = single-column, "z:a,b" = Morton; a mixed lake means a
        # clustered compact is in flight or a fold reset part of it
        "clustering": cluster_specs,
        "num_partitions": meta["num_partitions"],
        "splits": {str(k): v for k, v in sorted(meta["splits"].items())},
        "live_physical_partitions": len(loads),
        "rows": sum(rows),
        "bytes": sum(l["bytes"] for l in loads),
        "tombstones": tombs,
        "watermark": max(marks, default=-1),
        "completed_lsn": read_ingest_state(lake_dir),
        "feed_floor": max(floors, default=-1),
        "max_partition_rows": max(rows, default=0),
        "min_partition_rows": min(rows, default=0),
    }
