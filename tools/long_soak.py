"""Long-soak tail loop (round-4 verdict item #7): 50+ WAL windows through
the full sensor lifecycle — tail ingest + maintained group-sum view +
sharded incremental export + replica lake + auto-split + periodic compact
and vacuum, all chained on the SAME lake — then assert the invariants the
per-window tests state, once, over the whole horizon:

  1. replica live state == lake live state (bit-exact);
  2. maintained view (manifest-answered GROUP BY) == recount from the
     live rows;
  3. export content == live lake content (doc_id + payload);
  4. lake verify_lake() clean (manifests consistent with files);
  5. watermarks monotone across windows; lineage row per non-empty window.

Usage: python tools/long_soak.py   (writes SOAK_r4.json, prints one line)
Env: MEX_SOAK_WINDOWS (default 60), MEX_SOAK_EVENTS (per window, 20000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_TUNABLES = {"MALLOC_MMAP_THRESHOLD_": "2147483648",
             "MALLOC_TRIM_THRESHOLD_": "2147483648"}
if os.environ.get("MALLOC_MMAP_THRESHOLD_") != _TUNABLES["MALLOC_MMAP_THRESHOLD_"]:
    os.environ.update(_TUNABLES)
    os.execv(sys.executable, [sys.executable] + sys.argv)

WINDOWS = int(os.environ.get("MEX_SOAK_WINDOWS", "60"))
EVENTS_PER_WINDOW = int(os.environ.get("MEX_SOAK_EVENTS", "20000"))
N_DOCS = int(os.environ.get("MEX_SOAK_DOCS", "8000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
NUM_PARTITIONS = 16
ROOT = Path("/tmp/mex_ray_soak")


def main() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import pyarrow.compute as pc
    import ray.data

    from mex_extractors_ray.cdc.apply import (
        ingest_change_log,
        read_lake_arrow,
        read_live_group_sums,
    )
    from mex_extractors_ray.cdc.compact import compact, vacuum_lake, verify_lake
    from mex_extractors_ray.cdc.tail import lake_watermark, tail_once
    from mex_extractors_ray.gen import synth_change_log
    from mex_extractors_ray.runtime import silence_empty_block_schema_warnings
    from mex_extractors_ray.state.checks import read_lineage

    silence_empty_block_schema_warnings()
    ray.data.DataContext.get_current().enable_progress_bars = False

    shutil.rmtree(ROOT, ignore_errors=True)
    log_dir = ROOT / "wal"
    lake = ROOT / "lake"
    export = ROOT / "export"
    replica = ROOT / "replica"
    log_dir.mkdir(parents=True)

    t_start = time.time()

    # window 0 establishes the lake AND enables the maintained view; every
    # later window inherits the tracked set from the manifests (the
    # None-inherits discipline), exactly as an unattended tail would.
    w0 = ROOT / "w0"
    synth_change_log(w0, n_events=EVENTS_PER_WINDOW, n_docs=N_DOCS, seed=100,
                     shard_rows=1 << 30, lsn_start=0)
    ingest_change_log(sorted(str(p) for p in w0.glob("*.parquet")), lake,
                      num_partitions=NUM_PARTITIONS,
                      track_group_sums=(("source", "n_tok"),))

    # generator LSN gaps are 1..3, so a window started at L tops out at
    # ≤ L + 3n; stride 3n+1 keeps windows strictly disjoint in LSN space
    lsn_stride = EVENTS_PER_WINDOW * 3 + 1
    lsn = lsn_stride
    watermarks = [lake_watermark(lake)]
    split_total = 0
    maint = {"compacts": 0, "vacuumed_files": 0}
    # arm auto-split BELOW the saturated per-partition live size (~0.9 *
    # N_DOCS / P once the doc space is fully touched) so the policy actually
    # fires mid-lifecycle — each base partition crosses the threshold as the
    # lake fills and splits once, and the end-of-horizon invariants then
    # hold over a lake whose physical layout changed under the tail loop
    split_rows_over = max(1, int(0.75 * N_DOCS / NUM_PARTITIONS))

    for w in range(1, WINDOWS + 1):
        seg_dir = ROOT / f"seg-{w}"
        synth_change_log(seg_dir, n_events=EVENTS_PER_WINDOW, n_docs=N_DOCS,
                         seed=100 + w, shard_rows=1 << 30, lsn_start=lsn)
        lsn += lsn_stride
        seg = next(seg_dir.glob("*.parquet"))
        dst = log_dir / f"log-{w:05d}.parquet"
        shutil.move(str(seg), dst)
        Path(str(dst) + ".closed").write_text("")  # rotated := eligible

        r = tail_once(log_dir, lake, num_partitions=NUM_PARTITIONS,
                      export_out=export, replica_out=replica,
                      split_rows_over=split_rows_over)
        split_total += r.get("splits", 0)
        wm = lake_watermark(lake)
        assert wm >= watermarks[-1], f"watermark regressed at window {w}"
        watermarks.append(wm)

        if w % 10 == 0:  # periodic maintenance, mid-lifecycle
            # alternate plain and CLUSTERED folds (row-group pruning on
            # n_tok); both must keep every downstream surface coherent
            kw = ({"cluster_by": "n_tok", "row_group_rows": 4096}
                  if w % 20 == 0 else {})
            maint["compacts"] += sum(
                1 for r in compact(lake, **kw) if r["action"] == "rewritten")
            maint["vacuumed_files"] += int(
                vacuum_lake(lake, retention_seconds=0.0)["files_removed"])
        if w % 15 == 0 and w < WINDOWS:  # GDPR deletes mid-lifecycle: the
            # next window's tail propagates them to export + replica
            from mex_extractors_ray.cdc.filtered import delete_where

            src = f"src{(w // 15) % 6}"
            maint["deleted_docs"] = maint.get("deleted_docs", 0) + int(
                delete_where(lake, [("source", "==", src)])["matched"])
        if w % 20 == 0:
            print(f"window {w}/{WINDOWS} wm={wm} splits={split_total}",
                  file=sys.stderr)

    soak_sec = time.time() - t_start

    # ---- end-of-horizon invariants -------------------------------------
    live = read_lake_arrow(lake).sort_by([("doc_id", "ascending")])
    rep = read_lake_arrow(replica).sort_by([("doc_id", "ascending")])
    assert live.num_rows == rep.num_rows, "replica row drift"
    assert live.select(sorted(live.column_names)).equals(
        rep.select(sorted(live.column_names))), "replica content drift"

    mv = read_live_group_sums(lake, "source", "n_tok")
    want = live.group_by("source").aggregate([("n_tok", "sum")])
    mv_d = {r["source"]: r["sum_n_tok"] for r in mv.to_pylist()}
    want_d = {r["source"]: r["n_tok_sum"] for r in want.to_pylist()}
    assert mv_d == want_d, f"maintained view drift: {mv_d} != {want_d}"

    from mex_extractors_ray.pipelines.incremental_export import read_export_arrow

    exp = read_export_arrow(export)
    assert exp.num_rows == live.num_rows, "export row drift"
    assert pc.sum(exp["n_tok"]).as_py() == pc.sum(live["n_tok"]).as_py(), \
        "export payload drift"

    bad = [r for r in verify_lake(lake) if not r["ok"]]
    assert not bad, f"verify_lake failures: {bad}"

    lineage = read_lineage(lake)

    report = {
        "metric": "long_soak",
        "windows": WINDOWS,
        "events_per_window": EVENTS_PER_WINDOW,
        "sec": round(soak_sec, 1),
        "sec_per_window": round(soak_sec / (WINDOWS + 1), 2),
        "final_watermark": watermarks[-1],
        "watermark_monotone": True,
        "splits": split_total,
        "maintenance": maint,
        "live_rows": live.num_rows,
        "replica_equal": True,
        "maintained_view_equal": True,
        "export_equal": True,
        "verify_clean": True,
        "lineage_rows": lineage.num_rows,
    }
    ray.shutdown()
    return report


if __name__ == "__main__":
    out = main()
    Path("SOAK_r4.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
