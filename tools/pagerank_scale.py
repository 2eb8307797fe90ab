"""Scale evidence for the iterative PageRank loop (the catalog fixture's
n-gram graph is tiny/empty by design — this drives the loop at a size
where per-round cost is data-dominated, not exchange-fixed-cost).

Deterministic synthetic graph: edge i = (fmix64(i) % N, fmix64(i^salt) % N)
(self-loops dropped) — heavy-tailed in-degree via birthday collisions, no
RNG state. Reports per-round wall time at two edge counts to show the
rounds scale with E, plus peak RSS.

Usage: python tools/pagerank_scale.py [edges_small] [edges_large] [iters]
Writes /tmp/pagerank_scale.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time


def build_edges(n_edges: int, n_nodes: int):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mex_extractors_ray.stages.shuffle import fmix64

    def mint(batch):
        i = batch["id"].to_numpy()
        u = (fmix64(i.astype(np.uint64)) % np.uint64(n_nodes)).astype(np.int64)
        v = (fmix64(i.astype(np.uint64) ^ np.uint64(0x9E3779B97F4A7C15))
             % np.uint64(n_nodes)).astype(np.int64)
        keep = u != v
        return pa.table({"a": pa.array(u[keep]), "b": pa.array(v[keep])})

    return ray.data.range(n_edges).map_batches(
        mint, batch_format="pyarrow", batch_size=262_144
    ).materialize()


def run(n_edges: int, n_nodes: int, iters: int, static: bool = True) -> dict:
    import ray.data

    from mex_extractors_ray.stages.pagerank import pagerank_int

    edges = build_edges(n_edges, n_nodes)
    nodes = ray.data.range(n_nodes).map_batches(
        lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
    ).materialize()
    t0 = time.time()
    ranks = pagerank_int(edges, nodes, iters=iters, num_partitions=64,
                         static_edges=static)
    total_rank_rows = ranks.count()
    wall = time.time() - t0
    assert total_rank_rows == n_nodes
    return {
        "edges": n_edges, "nodes": n_nodes, "iters": iters,
        "wall_sec": round(wall, 2),
        "edge_rounds_per_sec": round(n_edges * iters / wall),
    }


def main():
    import ray

    e_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    e_large = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    small = run(e_small, e_small // 5, iters)
    large = run(e_large, e_large // 5, iters)
    small_stock = run(e_small, e_small // 5, iters, static=False)
    large_stock = run(e_large, e_large // 5, iters, static=False)
    out = {
        "metric": "pagerank_scale", "num_cpus": cpus,
        "small": small, "large": large,
        "small_stock_loop": small_stock, "large_stock_loop": large_stock,
        "cost_ratio": round(large["wall_sec"] / small["wall_sec"], 2),
        "edge_ratio": round(e_large / e_small, 2),
        "peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
    }
    with open("/tmp/pagerank_scale.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
