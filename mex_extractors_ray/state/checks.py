"""Lineage table + declarative drift checks.

Re-expresses the reference's asset-check machinery: per-asset ``num_items``
metadata (``mex/extractors/synopse/main.py:263-272``), YAML check rules
(``mex/extractors/pipeline/checks/models/check.py:8-30``) and historical
count comparison with static / percent / absolute drift rules evaluated
against prior materializations
(``mex/extractors/pipeline/checks/main.py:120-218``), blocking on failure
(``pipeline/base.py:107-127``).

Here: every ingest appends its per-partition metrics table to
``<lake>/_lineage/`` as one Parquet file per run; checks run post-commit
over (current run, previous runs) and return violations. Callers decide to
raise (the reference's ``blocking=True``) or route to a report.

Rule forms (JSON/YAML-able):
    {"type": "x_items_less_than", "value": N}          total rows < N → fail
    {"type": "x_items_more_than", "value": N}
    {"type": "x_percent_less_than", "value": P}        drop >P% vs prev run
    {"type": "x_percent_more_than", "value": P}        grow >P% vs prev run
    {"type": "x_items_abs_decrease_more_than", "value": N}   prev-current > N
    {"type": "x_items_abs_increase_more_than", "value": N}   current-prev > N
    {"type": "x_items_abs_change_more_than", "value": N}     |current-prev| > N

The three absolute forms complete the reference's historical-rule matrix
(``mex/extractors/pipeline/checks/main.py:199-210``: its
``x_items_more_than``/``x_items_less_than`` compare current vs historic by
an absolute item threshold).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def lineage_dir(lake_dir: str | Path) -> Path:
    return Path(lake_dir) / "_lineage"


def append_lineage(lake_dir: str | Path, metrics: pa.Table, run_id: str) -> str:
    """Append one run's per-partition metrics (deterministic file name: a
    rerun of the same run_id overwrites identically)."""
    d = lineage_dir(lake_dir)
    d.mkdir(parents=True, exist_ok=True)
    metrics = metrics.append_column("run_id", pa.array([run_id] * metrics.num_rows))
    path = d / f"run-{run_id}.parquet"
    pq.write_table(metrics, path, compression="snappy")
    return str(path)


def read_lineage(lake_dir: str | Path) -> pa.Table | None:
    files = sorted(lineage_dir(lake_dir).glob("run-*.parquet"))
    if not files:
        return None
    return pa.concat_tables(pq.read_table(f) for f in files)


def run_totals(lineage: pa.Table) -> list[tuple[str, int]]:
    """(run_id, total row_count) ordered by run file order (run ids sort)."""
    g = lineage.group_by("run_id").aggregate([("row_count", "sum")])
    rows = sorted(zip(g["run_id"].to_pylist(), g["row_count_sum"].to_pylist()))
    return rows


def evaluate_checks(lake_dir: str | Path, rules: list[dict]) -> list[dict]:
    """Evaluate drift rules for the latest run vs. history; returns
    violations (empty = all checks pass)."""
    lineage = read_lineage(lake_dir)
    if lineage is None:
        return [{"rule": "no_lineage", "detail": "no runs recorded"}]
    totals = run_totals(lineage)
    current_run, current = totals[-1]
    prev = totals[-2][1] if len(totals) > 1 else None
    violations: list[dict] = []
    for rule in rules:
        t, v = rule["type"], rule["value"]
        if t == "x_items_less_than" and current < v:
            violations.append({"rule": t, "value": v, "observed": current, "run": current_run})
        elif t == "x_items_more_than" and current > v:
            violations.append({"rule": t, "value": v, "observed": current, "run": current_run})
        elif t in ("x_percent_less_than", "x_percent_more_than") and prev not in (None, 0):
            pct = 100.0 * (current - prev) / prev
            if t == "x_percent_less_than" and -pct > v:
                violations.append({"rule": t, "value": v, "observed_pct": pct, "run": current_run})
            if t == "x_percent_more_than" and pct > v:
                violations.append({"rule": t, "value": v, "observed_pct": pct, "run": current_run})
        elif t.startswith("x_items_abs_") and prev is not None:
            delta = current - prev
            bad = (
                (t == "x_items_abs_decrease_more_than" and -delta > v)
                or (t == "x_items_abs_increase_more_than" and delta > v)
                or (t == "x_items_abs_change_more_than" and abs(delta) > v)
            )
            if bad:
                violations.append(
                    {"rule": t, "value": v, "observed_delta": delta, "run": current_run}
                )
    return violations


class DriftCheckError(RuntimeError):
    """Raised by callers that want the reference's blocking=True behavior."""


def assert_checks(lake_dir: str | Path, rules: list[dict]) -> None:
    violations = evaluate_checks(lake_dir, rules)
    if violations:
        raise DriftCheckError(str(violations))


def partition_skew_report(metrics: pa.Table) -> dict:
    """Partition-size skew summary from one run's metrics — the signal that
    drives partition-split decisions at scale (SURVEY.md §4 skew row)."""
    rc = metrics["row_count"]
    n = metrics.num_rows
    total = pc.sum(rc).as_py() or 0
    mx = pc.max(rc).as_py() or 0
    mean = total / n if n else 0
    return {
        "partitions": n,
        "rows_total": total,
        "rows_max": mx,
        "rows_mean": mean,
        "skew_ratio": (mx / mean) if mean else 0.0,
    }


def record_maintenance(lake_dir: str | Path, op: str, marker: str,
                       detail: dict) -> str:
    """Append one maintenance-op record (split / repartition / compact /
    vacuum) to the lake's lineage — the layout-change audit trail next to
    the per-partition ingest metrics. ``marker`` makes the file name
    deterministic: a retried op overwrites its own record, never
    duplicates it (the same idempotency discipline as run lineage)."""
    import json as _json

    d = lineage_dir(lake_dir)
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"maint-{op}-{marker}.json"
    from mex_extractors_ray.cdc.manifest import atomic_write_bytes

    atomic_write_bytes(path, _json.dumps({"op": op, **detail}).encode())
    return str(path)


def read_maintenance_log(lake_dir: str | Path) -> list[dict]:
    """All maintenance records, file-name order (ops sort within a kind)."""
    import json as _json

    return [
        _json.loads(p.read_text())
        for p in sorted(lineage_dir(lake_dir).glob("maint-*.json"))
    ]
