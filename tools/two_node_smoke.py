"""Two-node-on-one-host cluster smoke (round-5 verdict item #7): start a
head raylet + a second worker raylet on this box (`ray start` twice —
Ray's supported multi-node-local topology), connect a driver to the
cluster address, and run the two surfaces whose object-locality
assumptions matter most:

1. **Ingest**: `ingest_change_log` across both nodes must produce a lake
   byte-identical to the single-process reference replay — the shuffle,
   manifests, and atomic commits must not care which node ran which
   partition task.
2. **Static-edge PageRank**: bit-identical to the stock loop ON the
   cluster, and the pinned edge-bucket refs' physical locations are
   recorded per round via `ray.experimental.get_object_locations` — the
   direct evidence for "edges cross the network at most once per node":
   after round 1 each bucket should be resident on every node that
   probed it (node-local cache), not re-fetched.

`ray job submit` needs the dashboard job server, which this sandbox
doesn't ship — the driver-connects-to-cluster-address path exercises the
same scheduling/transfer machinery.

Usage: python tools/two_node_smoke.py   (writes TWONODE_r5.json, prints it)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path("/tmp/mex_ray_twonode")
PORT = 6379
ADDR = f"127.0.0.1:{PORT}"
N_EVENTS = int(os.environ.get("MEX_TWONODE_EVENTS", "500000"))
N_DOCS = int(os.environ.get("MEX_TWONODE_DOCS", "50000"))


def sh(cmd: list[str]) -> str:
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    if r.returncode != 0:
        raise RuntimeError(f"{cmd}: {r.stderr[-800:]}")
    return r.stdout


def raylet_pid_for_node(node_id: str) -> int | None:
    """The raylet process serving ray NodeID ``node_id`` (two raylets
    share this host; each carries --node_id=<hex> in its cmdline)."""
    needle = f"--node_id={node_id}".encode()
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read()
        except OSError:
            continue
        if cmd.split(b"\0", 1)[0].endswith(b"raylet") and needle in cmd:
            return int(p)
    return None


def main() -> dict:
    os.environ.pop("RAY_ADDRESS", None)  # the preset 'local' would shadow
    sh(["ray", "stop", "--force"])
    time.sleep(2)
    report: dict = {"metric": "two_node_smoke", "events": N_EVENTS}
    sh(["ray", "start", "--head", f"--port={PORT}", "--num-cpus=8",
        "--include-dashboard=false", "--disable-usage-stats"])
    sh(["ray", "start", f"--address={ADDR}", "--num-cpus=8",
        "--disable-usage-stats"])
    try:
        import ray

        ray.init(address=ADDR, logging_level="ERROR")
        import ray.data

        ray.data.DataContext.get_current().enable_progress_bars = False
        alive = [n for n in ray.nodes() if n["Alive"]]
        report["nodes"] = len(alive)
        assert len(alive) == 2, f"expected 2 raylets, got {len(alive)}"

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from mex_extractors_ray.cdc import ingest_change_log, replay_reference
        from mex_extractors_ray.cdc.apply import read_lake_arrow
        from mex_extractors_ray.gen import synth_change_log

        ROOT.mkdir(parents=True, exist_ok=True)
        log_dir = ROOT / "log"
        if not (log_dir / "_COMPLETE").exists():
            shutil.rmtree(log_dir, ignore_errors=True)
            synth_change_log(log_dir, n_events=N_EVENTS, n_docs=N_DOCS,
                             seed=19, shard_rows=100_000)
            (log_dir / "_COMPLETE").write_text("ok")
        paths = sorted(str(p) for p in log_dir.glob("log-*.parquet"))

        lake = ROOT / "lake"
        shutil.rmtree(lake, ignore_errors=True)
        t0 = time.time()
        ingest_change_log(paths, lake, num_partitions=16)
        ingest_sec = time.time() - t0
        lake_t = read_lake_arrow(lake)
        expected, _ = replay_reference(
            pa.concat_tables(pq.read_table(p) for p in paths))
        identical = lake_t.equals(expected)
        report["ingest"] = {"sec": round(ingest_sec, 2),
                            "events_per_sec": round(N_EVENTS / ingest_sec, 1),
                            "byte_identical": identical}
        assert identical, "two-node lake != reference replay"

        # ---- static-edge PageRank with per-round pin-location probes
        from mex_extractors_ray.stages.pagerank import pagerank_int

        rng = np.random.default_rng(3)
        edges = pa.table({
            "a": pa.array(rng.integers(0, 20_000, 300_000), pa.int64()),
            "b": pa.array(rng.integers(0, 20_000, 300_000), pa.int64()),
        })
        nodes = pa.table({"node": pa.array(np.arange(20_000), pa.int64())})
        locations: list[dict] = []

        def probe(round_idx, pinned):
            refs = sorted({r for rs in pinned.values() for r in rs},
                          key=lambda r: r.hex())
            try:
                locs = ray.experimental.get_object_locations(refs)
                n_nodes = [len(locs[r].get("node_ids", [])) for r in refs]
                locations.append({
                    "round": round_idx, "buckets": len(refs),
                    "mean_nodes_per_bucket": round(
                        float(np.mean(n_nodes)), 2) if n_nodes else 0,
                    "max_nodes_per_bucket": max(n_nodes, default=0),
                })
            except Exception as e:  # API moved: record, don't fail the smoke
                locations.append({"round": round_idx,
                                  "error": type(e).__name__})

        t0 = time.time()
        static = pagerank_int(
            ray.data.from_arrow(edges), ray.data.from_arrow(nodes),
            iters=4, num_partitions=16, static_edges=True,
            _chaos_hook=probe).to_pandas()
        static_sec = time.time() - t0
        t0 = time.time()
        stock = pagerank_int(
            ray.data.from_arrow(edges), ray.data.from_arrow(nodes),
            iters=4, num_partitions=16, static_edges=False).to_pandas()
        stock_sec = time.time() - t0
        s1 = static.sort_values("node").reset_index(drop=True)
        s2 = stock.sort_values("node").reset_index(drop=True)
        bit_identical = s1.equals(s2)
        report["pagerank"] = {
            "edges": 300_000, "iters": 4,
            "static_sec": round(static_sec, 2),
            "stock_sec": round(stock_sec, 2),
            "bit_identical_to_stock": bit_identical,
            "pin_locations_per_round": locations,
        }
        assert bit_identical, "static-edge != stock on the 2-node cluster"

        # ---- leg 3: NODE LOSS mid-run — SIGKILL the worker node's raylet
        # after round 1 of a fresh static-edge run. The pinned buckets on
        # that node die with it; the loop must take its recovery path
        # (re-pin on the surviving node, or stock fallback) and finish
        # with ranks bit-identical to the undisturbed run.
        import signal as _signal

        # the raylet to kill is the one on the node the DRIVER is NOT
        # attached to (killing the driver's own raylet kills the driver)
        my_node = ray.get_runtime_context().get_node_id()
        other = [n for n in ray.nodes()
                 if n["Alive"] and n["NodeID"] != my_node]
        victim_pid = (raylet_pid_for_node(other[0]["NodeID"])
                      if other else None)
        state = {"killed": False, "pin_ids": []}

        def kill_node(round_idx, pinned):
            state["pin_ids"].append(id(pinned))
            if round_idx == 1 and not state["killed"]:
                state["killed"] = True
                if victim_pid is not None:
                    try:
                        os.kill(victim_pid, _signal.SIGKILL)
                    except OSError:
                        pass

        t0 = time.time()
        survived = pagerank_int(
            ray.data.from_arrow(edges), ray.data.from_arrow(nodes),
            iters=4, num_partitions=16, static_edges=True,
            _chaos_hook=kill_node).to_pandas()
        node_loss_sec = time.time() - t0
        s3 = survived.sort_values("node").reset_index(drop=True)
        node_loss_identical = s3.equals(s2)
        report["pagerank_node_loss"] = {
            "victim_raylet_found": victim_pid is not None,
            "sec": round(node_loss_sec, 2),
            "bit_identical_to_stock": node_loss_identical,
            "repinned": len(set(state["pin_ids"])) > 1,
            "nodes_alive_after": len(
                [n for n in ray.nodes() if n["Alive"]]),
        }
        assert node_loss_identical, "node-loss run diverged"
        ray.shutdown()
    finally:
        subprocess.run(["ray", "stop", "--force"], capture_output=True)
    return report


if __name__ == "__main__":
    out = main()
    Path("TWONODE_r5.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
