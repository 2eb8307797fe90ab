"""Per-partition manifests: the exactly-once commit protocol.

Generalizes the reference's S3 sink commit (``mex/extractors/sinks/s3.py:85-133``:
stream data → sha256 checksum → put data object → write ``metadata.json``
manifest with versions/checksum/``write_completed_at``) into a per-partition
two-phase commit:

1. write the partition's data + tombstone files under deterministic names
   derived from (partition, last_lsn) — a retried task rewrites identical
   bytes, so duplicated work is a no-op;
2. atomically ``os.replace`` the manifest JSON into place. The manifest is
   the *only* source of truth: readers open exactly the files it lists, so a
   crash between (1) and (2) leaves ignorable orphans and replay resumes
   from the previous watermark.

``last_lsn`` is the partition's LSN watermark (the analog of the reference's
run-timestamp sensor watermark, ``mex/extractors/pipeline/base.py:51-105``):
events at or below it are dropped idempotently on replay.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import asdict, dataclass, field
from datetime import datetime, timezone
from pathlib import Path


@dataclass
class PartitionManifest:
    partition: int
    last_lsn: int
    files: list[str] = field(default_factory=list)
    tombstone_file: str | None = None
    schema_version: int = 1
    sha256_checksum: str = ""
    # one sha256 per entry of ``files`` (same order) — the audit re-hashes
    # EVERY committed file (manifests from before this field verify files[0]
    # only, via sha256_checksum, which remains = file_checksums[0])
    file_checksums: list[str] = field(default_factory=list)
    row_count: int = 0
    tombstone_count: int = 0
    # append-only per-window delete-event logs (doc_id, lsn) — the history
    # that AS-OF reads need (the tombstone_file is a point-in-time SNAPSHOT:
    # resurrections erase entries, newer deletes overwrite lsn)
    delete_logs: list[str] = field(default_factory=list)
    # window-end LSN per entry of ``files`` / ``delete_logs`` (same order):
    # the zone map that lets the CHANGE FEED (``read_changes``) select files
    # by LSN range from the manifest alone — zero data files opened for
    # pruning. Older manifests lack these; ``file_window_ends`` falls back
    # to the deterministic ``*-{lsn:020d}.parquet`` name contract.
    file_lsns: list[int] = field(default_factory=list)
    delete_log_lsns: list[int] = field(default_factory=list)
    # time-travel horizon: the watermark of the newest FOLD (history at or
    # below it is squashed into the base). -2 = unknown (manifest written by
    # a pre-feature engine or a compactor) — readers treat it as last_lsn,
    # i.e. no history guaranteed before the current watermark.
    history_floor: int = -2
    # MAINTAINED AGGREGATES: per tracked column, the live value→count map
    # of THIS partition ({col: {value: n}}), updated transactionally with
    # every window commit — a lake-wide GROUP BY col answers from P
    # manifests without touching a data file. Bounded-cardinality columns
    # only (the bounded-vocab contract). Empty = tracking off.
    agg_counts: dict = field(default_factory=dict)
    # grouped SUM views: {"group_col|value_col": {group: [n_docs, sum]}} —
    # count and sum kept together so a group prunes exactly when its last
    # live doc goes (a sum alone cannot distinguish "empty" from "sums to
    # zero"). Integer value columns only (exact +/- arithmetic).
    agg_sums: dict = field(default_factory=dict)
    # ZONE MAPS: {col: [lo, hi] | None} — CONSERVATIVE bounds over this
    # partition's live non-null values. Delta windows only WIDEN (a delete
    # never shrinks them — recomputing the true min/max would need a data
    # read), folds/compactions recompute them EXACTLY (tightening,
    # self-healing). None = tracked but no live non-null value provable →
    # every range/equality predicate on the column prunes the partition.
    # Sound for pruning by construction: live values ⊆ [lo, hi] always.
    agg_bounds: dict = field(default_factory=dict)
    # secondary-column clustering: when set, files[0] (the base from the
    # last clustered compaction) is sorted by THIS column — parquet
    # row-group statistics then prune range predicates on it at the
    # reader. Delta files are always doc_id-sorted; delta windows carry
    # the flag forward (the base is untouched), folds reset it to None
    # (the folded base is doc_id-sorted again).
    cluster_by: str | None = None
    write_completed_at: str = ""  # informational only; excluded from equality checks

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=1, sort_keys=True)


def _lsn_from_name(fname: str) -> int:
    """Window-end LSN from the deterministic ``*-{lsn:020d}.parquet`` name."""
    return int(Path(fname).stem.rsplit("-", 1)[-1])


def file_window_ends(names: list[str], lsns: list[int]) -> list[int]:
    """Per-file window-end LSNs: the recorded list when complete, else the
    name-contract fallback (manifests written before ``file_lsns`` existed)."""
    if len(lsns) == len(names):
        return list(lsns)
    return [_lsn_from_name(n) for n in names]


def partition_dir(lake_dir: str | Path, pid: int) -> Path:
    return Path(lake_dir) / f"partition={pid:05d}"


def manifest_path(lake_dir: str | Path, pid: int) -> Path:
    return partition_dir(lake_dir, pid) / "manifest.json"


_MANIFEST_FIELDS = {f.name for f in PartitionManifest.__dataclass_fields__.values()}


def read_manifest(lake_dir: str | Path, pid: int) -> PartitionManifest | None:
    p = manifest_path(lake_dir, pid)
    try:
        doc = json.loads(p.read_text())
    except FileNotFoundError:
        return None
    # forward-compat: a manifest written by a NEWER engine may carry fields
    # this version doesn't know; ignoring them keeps rolling upgrades (and
    # mixed-version clusters) readable — new fields are always additive
    return PartitionManifest(**{k: v for k, v in doc.items()
                                if k in _MANIFEST_FIELDS})


def sha256_file(path: str | Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def atomic_write_bytes(path: Path, data: bytes) -> None:
    tmp = path.parent / f".tmp-{uuid.uuid4().hex}-{path.name}"
    tmp.write_bytes(data)
    os.replace(tmp, path)


def commit_manifest(lake_dir: str | Path, manifest: PartitionManifest) -> None:
    """Phase 2: atomic manifest replace; then best-effort GC of superseded files."""
    pdir = partition_dir(lake_dir, manifest.partition)
    pdir.mkdir(parents=True, exist_ok=True)
    old = read_manifest(lake_dir, manifest.partition)
    manifest.write_completed_at = datetime.now(timezone.utc).isoformat()
    atomic_write_bytes(manifest_path(lake_dir, manifest.partition), manifest.to_json().encode())
    if old is not None:
        keep = set(manifest.files) | {manifest.tombstone_file} | set(manifest.delete_logs)
        for name in [*old.files, old.tombstone_file, *old.delete_logs]:
            if name and name not in keep:
                try:
                    os.unlink(pdir / name)
                except FileNotFoundError:
                    pass


class ConcurrentWriterError(RuntimeError):
    """Another process holds this lake's writer lease."""


class writer_lock:
    """Lake-level writer lease: one mutating job (ingest / repartition) at a
    time. Per-partition commits are individually atomic and watermark-
    guarded, so interleaved writers cannot corrupt state — but they CAN
    interleave windows, leaving `_ingest_state.json` claiming completion of
    an LSN range another writer only partially applied. The lease keeps the
    window-monotone contract the change feed and export rely on.

    Mechanism: `flock(LOCK_EX | LOCK_NB)` on `_writer.lock` — a crash
    releases it automatically (kernel-held), so no stale-lease sweeper is
    needed on a local/POSIX filesystem. On object storage (the 100-TB
    deployment) replace with a TTL lease object + heartbeat; the context
    manager is the single place to swap."""

    def __init__(self, lake_dir: str | Path, purpose: str = "ingest"):
        self.path = Path(lake_dir) / "_writer.lock"
        self.purpose = purpose
        self._f = None

    def __enter__(self):
        import fcntl

        self.path.parent.mkdir(parents=True, exist_ok=True)
        # "a", not "w": opening must not truncate — a FAILED acquisition
        # would otherwise wipe the current holder's lease metadata
        self._f = open(self.path, "a")
        try:
            fcntl.flock(self._f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            self._f.close()
            self._f = None
            raise ConcurrentWriterError(
                f"another writer holds the lease on {self.path.parent} "
                f"(wanted: {self.purpose})"
            ) from None
        self._f.truncate(0)
        self._f.write(json.dumps({
            "purpose": self.purpose,
            "pid": os.getpid(),
            "acquired_at": datetime.now(timezone.utc).isoformat(),
        }))
        self._f.flush()
        return self

    def __exit__(self, *exc):
        import fcntl

        if self._f is not None:
            fcntl.flock(self._f, fcntl.LOCK_UN)
            self._f.close()
            self._f = None
        return False
