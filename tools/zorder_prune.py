"""Reproduce the Z-order row-group pruning measurement (BASELINE.md
§Z-order clustering): build a synthetic lake, compact it three ways
(doc_id order / single-column cluster / z-order), and count the row
groups whose parquet min/max statistics overlap two predicate shapes.

Usage: python tools/zorder_prune.py [n_events] [row_group_rows]
"""

from __future__ import annotations

import json
import shutil
import sys

sys.path.insert(0, "/root/repo")

import ray

ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")
import ray.data

ray.data.DataContext.get_current().enable_progress_bars = False

import pyarrow.parquet as pq

from mex_extractors_ray.cdc import ingest_change_log
from mex_extractors_ray.cdc.compact import compact
from mex_extractors_ray.cdc.filtered import read_lake_filtered_arrow
from mex_extractors_ray.cdc.manifest import read_manifest
from mex_extractors_ray.gen import synth_change_log

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
RG_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 256
P = 8
LAKE = "/tmp/zorder_prune/lake"

shutil.rmtree("/tmp/zorder_prune", ignore_errors=True)
paths = synth_change_log("/tmp/zorder_prune/log", n_events=N_EVENTS,
                         n_docs=max(N_EVENTS * 3 // 10, 100), seed=21,
                         shard_rows=max(N_EVENTS // 2, 1))
ingest_change_log(paths, LAKE, num_partitions=P)

PREDS = {
    "narrow_both": ("src2", 60, 89),          # equality AND range leg
    "equality_only": ("src2", 8, 127),        # range leg unselective
}


def overlapping(src: str, lo: int, hi: int) -> tuple[int, int]:
    tot = hit = 0
    for pid in range(P):
        m = read_manifest(LAKE, pid)
        pf = pq.ParquetFile(f"{LAKE}/partition={pid:05d}/{m.files[0]}")
        si = next(i for i, f in enumerate(pf.schema_arrow) if f.name == "source")
        ni = next(i for i, f in enumerate(pf.schema_arrow) if f.name == "n_tok")
        for i in range(pf.metadata.num_row_groups):
            tot += 1
            ss = pf.metadata.row_group(i).column(si).statistics
            ns = pf.metadata.row_group(i).column(ni).statistics
            if ss.max < src or ss.min > src:
                continue
            if ns.max < lo or ns.min > hi:
                continue
            hit += 1
    return hit, tot


results: dict[str, dict] = {}
baseline_rows = None
for label, kw in [
    ("docid_order", dict(row_group_rows=RG_ROWS)),
    ("cluster_n_tok", dict(cluster_by="n_tok", row_group_rows=RG_ROWS)),
    ("zorder", dict(cluster_by="z:source,n_tok", row_group_rows=RG_ROWS)),
]:
    compact(LAKE, **kw)
    entry = {}
    for pname, (s, lo, hi) in PREDS.items():
        h, t = overlapping(s, lo, hi)
        entry[pname] = {"row_groups_hit": h, "row_groups_total": t}
    # filtered reads stay exact across every layout
    rows = read_lake_filtered_arrow(
        LAKE, [("source", "==", "src2"), ("n_tok", ">=", 60), ("n_tok", "<", 90)]
    ).num_rows
    if baseline_rows is None:
        baseline_rows = rows
    assert rows == baseline_rows, f"{label}: filtered read changed ({rows} != {baseline_rows})"
    entry["filtered_rows"] = rows
    results[label] = entry

print(json.dumps(results, indent=2))
ray.shutdown()
