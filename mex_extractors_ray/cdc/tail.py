"""Continuous change-log tailing — the scheduled-ingest driver.

The reference runs on a daily cron plus a sensor that fires when new
extractor runs exist (``mex/extractors/settings.py:88-91``,
``mex/extractors/pipeline/base.py:51-105``). Here the same roles:

- :func:`discover_new_segments` — the sensor: list log segment files not yet
  recorded as applied in the lake's ``_tail_state.json``.
- :func:`tail_once` — one incremental ingest over the new segments; the
  per-partition LSN watermark makes re-delivery of old segments a no-op, so
  the file-level filter is an *optimization*, never a correctness mechanism.
- :func:`tail_loop` — poll → tail_once → sleep, with lineage appended per
  non-empty run (the cron).

Segment files must be named so lexicographic order == LSN order (the
generator's ``log-{shard:05d}.parquet`` satisfies this); a segment is
eligible once it stops growing (size stable across a poll, observed sizes
persisted in the tail state) or carries a ``.closed`` marker — the
WAL-segment-rotation convention, enforced in :func:`discover_new_segments`.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.cdc.apply import ingest_change_log
from mex_extractors_ray.cdc.manifest import read_manifest
from mex_extractors_ray.schema import SchemaRegistry
from mex_extractors_ray.state.checks import append_lineage


def lake_watermark(lake_dir: str | Path) -> int:
    """Min per-partition watermark = the LSN below which EVERY partition has
    applied everything (the safe replay point)."""
    marks = []
    for mpath in Path(lake_dir).glob("partition=*/manifest.json"):
        pid = int(mpath.parent.name.split("=")[1])
        m = read_manifest(lake_dir, pid)
        if m:
            marks.append(m.last_lsn)
    return min(marks) if marks else -1


def segment_max_lsn(path: str | Path) -> int:
    """Max LSN of a segment from parquet column statistics (no data read)."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index("lsn")
    mx = -1
    for rg in range(md.num_row_groups):
        stats = md.row_group(rg).column(idx).statistics
        if stats is not None and stats.has_min_max:
            mx = max(mx, stats.max)
        else:  # no stats → must assume the segment is new
            return 1 << 62
    return mx


TAIL_STATE = "_tail_state.json"


def _read_tail_state(lake_dir: str | Path) -> dict:
    try:
        return json.loads((Path(lake_dir) / TAIL_STATE).read_text())
    except (FileNotFoundError, json.JSONDecodeError):
        return {"applied_segments": []}


def _commit_tail_state(lake_dir: str | Path, state: dict) -> None:
    from mex_extractors_ray.cdc.manifest import atomic_write_bytes

    Path(lake_dir).mkdir(parents=True, exist_ok=True)
    atomic_write_bytes(Path(lake_dir) / TAIL_STATE, json.dumps(state, indent=1).encode())


def discover_new_segments(log_dir: str | Path, lake_dir: str | Path,
                          require_stable: bool = True) -> list[str]:
    """Segments not yet recorded as applied AND eligible for ingest.

    Eligibility gate (the WAL-segment-rotation convention): a segment still
    being written must NOT be ingested — a partial read would be recorded in
    ``applied_segments`` and rows flushed later would be skipped forever
    (the LSN watermark cannot recover file-level skips). A segment is
    eligible once it (a) carries a ``<name>.closed`` marker, or (b) its size
    is unchanged since the previous poll (observed sizes are persisted in
    the tail state). ``require_stable=False`` disables the gate for logs
    whose producers write segments atomically (e.g. rename-into-place).

    The applied record itself is committed AFTER the ingest, so a crash in
    between re-lists the segments — and the per-partition LSN watermark
    turns the re-apply into a no-op (that record is an optimization; the
    watermark is the correctness mechanism). A min-watermark-only sensor
    cannot retire the newest segment (only one partition ever holds the
    global max LSN), hence the explicit record."""
    state = _read_tail_state(lake_dir)
    applied = set(state["applied_segments"])
    seen: dict = dict(state.get("segment_sizes", {}))
    eligible: list[str] = []
    changed = False
    for p in sorted(Path(log_dir).glob("*.parquet")):
        if p.name in applied:
            if p.name in seen:
                seen.pop(p.name)  # GC observation once applied
                changed = True
            continue
        size = p.stat().st_size
        if (
            not require_stable
            or Path(str(p) + ".closed").exists()
            or seen.get(p.name) == size
        ):
            eligible.append(str(p))
        if seen.get(p.name) != size:
            seen[p.name] = size
            changed = True
    if changed:
        state["segment_sizes"] = seen
        _commit_tail_state(lake_dir, state)
    return eligible


def tail_once(
    log_dir: str | Path,
    lake_dir: str | Path,
    num_partitions: int = 32,
    registry: SchemaRegistry | None = None,
    require_stable: bool = True,
    export_out: str | Path | None = None,
    replica_out: str | Path | None = None,
    split_rows_over: int | None = None,
    split_bytes_over: int | None = None,
    mode: str | None = None,
) -> dict:
    """One sensor-check + incremental ingest. Returns a small report.

    ``mode=None`` INHERITS the apply mode recorded in the lake's meta
    (``last_wins`` for a brand-new lake) — the tracked-column ``None``
    discipline: an established append/patch lake keeps its semantics
    without every caller re-stating them, and the ingest-side mode guard
    refuses an explicit mismatch.

    ``export_out`` chains the downstream consumer into the same poll: after
    a non-empty ingest, ``pipelines.incremental_export`` brings the sharded
    training export current off the change feed — the full WAL-segment →
    lake → export loop in one sensor tick, each leg costing ∝ the window.
    ``replica_out`` chains a replica lake the same way (one feed pass per
    non-empty tick; its own marker makes re-runs idempotent).

    ``split_rows_over`` / ``split_bytes_over`` arm the AUTO-SPLIT policy
    (``compact.split_hot_partitions``) after each non-empty ingest: any
    base partition whose live state outgrew the threshold doubles its
    physical fan-out before the next window — the lake keeps the
    "partition state ≪ worker heap" invariant unattended as it grows."""
    segments = discover_new_segments(log_dir, lake_dir, require_stable=require_stable)
    if not segments:
        return {"segments": 0, "applied": 0, "noop": True}
    if mode is None:
        try:
            from mex_extractors_ray.cdc.apply import load_lake_meta

            mode = load_lake_meta(lake_dir).get("mode") or "last_wins"
        except Exception:
            mode = "last_wins"
    metrics = ingest_change_log(segments, lake_dir, num_partitions=num_partitions,
                                registry=registry, mode=mode)
    state = _read_tail_state(lake_dir)
    state["applied_segments"] = sorted(set(state["applied_segments"]) | {Path(s).name for s in segments})
    _commit_tail_state(lake_dir, state)
    applied = int(pc.sum(metrics["upserts"]).as_py() or 0) + int(pc.sum(metrics["deletes"]).as_py() or 0)
    if applied:
        run_id = f"{int(pc.max(metrics['last_lsn']).as_py() or 0):020d}"
        append_lineage(lake_dir, metrics, run_id=run_id)
    report = {
        "segments": len(segments),
        "applied": applied,
        "late_dropped": int(pc.sum(metrics["late_dropped"]).as_py() or 0),
        "row_count": int(pc.sum(metrics["row_count"]).as_py() or 0),
        "noop": applied == 0,
    }
    if applied and (split_rows_over is not None or split_bytes_over is not None):
        from mex_extractors_ray.cdc.compact import split_hot_partitions

        s = split_hot_partitions(lake_dir, max_rows=split_rows_over,
                                 max_bytes=split_bytes_over)
        report["splits"] = len(s["splits"])
    if export_out is not None and applied:
        from mex_extractors_ray.pipelines.incremental_export import incremental_export

        m = incremental_export(lake_dir, export_out, registry=registry)
        report["export_windows"] = len(m["windows"])
        report["export_watermark"] = m["watermark"]
    if replica_out is not None and applied:
        from mex_extractors_ray.cdc.replicate import replicate_lake

        r = replicate_lake(lake_dir, replica_out, registry=registry)
        report["replica_mode"] = r["mode"]
        report["replica_watermark"] = r["watermark"]
    return report


def tail_loop(
    log_dir: str | Path,
    lake_dir: str | Path,
    poll_seconds: float = 5.0,
    max_polls: int | None = None,
    num_partitions: int = 32,
    export_out: str | Path | None = None,
    replica_out: str | Path | None = None,
    split_rows_over: int | None = None,
    split_bytes_over: int | None = None,
    mode: str | None = None,
) -> None:
    """Poll-and-ingest loop (Ctrl-C or max_polls to stop)."""
    polls = 0
    while max_polls is None or polls < max_polls:
        report = tail_once(log_dir, lake_dir, num_partitions=num_partitions,
                           export_out=export_out, replica_out=replica_out,
                           split_rows_over=split_rows_over,
                           split_bytes_over=split_bytes_over, mode=mode)
        print(json.dumps({"poll": polls, **report}), flush=True)
        polls += 1
        if max_polls is None or polls < max_polls:
            time.sleep(poll_seconds)
