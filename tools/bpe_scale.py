"""BPE-train scale measurement (round-5 verdict item #8): n_merges
rounds over a large synthetic tokenized corpus, per-round wall cost and
peak RSS recorded PAGERANK_SCALE-style.

Each round is one combiner-shuffled bigram count (`token_bigram_topk` —
driver sees O(partitions) rows) + one streaming merge + a `materialize()`
to cut lineage. Cost per round is ∝ corpus (re-streamed every round —
the defined cost shape of Lloyd/BPE-style loops); what this run verifies
is that the per-round cost stays FLAT across hundreds of rounds (no
lineage creep, no driver-state growth, no per-round block-count creep).

Corpus: Zipf-distributed token lists (the natural text token histogram),
deterministic from the seed.

Usage: python tools/bpe_scale.py    (writes BPE_SCALE_r5.json, prints it)
Env: MEX_BPE_DOCS (500000), MEX_BPE_MERGES (256), MEX_BPE_TOKS (100),
     RAY_GRAFT_CPUS (32)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_TUNABLES = {"MALLOC_MMAP_THRESHOLD_": "2147483648",
             "MALLOC_TRIM_THRESHOLD_": "2147483648"}
if os.environ.get("MALLOC_MMAP_THRESHOLD_") != _TUNABLES["MALLOC_MMAP_THRESHOLD_"]:
    os.environ.update(_TUNABLES)
    os.execv(sys.executable, [sys.executable] + sys.argv)

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("MEX_BPE_DOCS", "500000"))
N_MERGES = int(os.environ.get("MEX_BPE_MERGES", "256"))
MEAN_TOKS = int(os.environ.get("MEX_BPE_TOKS", "100"))
VOCAB = 256  # byte-level start, the standard BPE regime


def main() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import pyarrow as pa
    import ray.data

    from mex_extractors_ray.runtime import silence_empty_block_schema_warnings

    silence_empty_block_schema_warnings()
    ray.data.DataContext.get_current().enable_progress_bars = False

    from tools.dress_rehearsal import RssSampler

    from mex_extractors_ray.stages.tokens import bpe_train

    # deterministic zipf token corpus, built in shards (bounded driver heap)
    shard = 50_000
    tables = []
    total_tokens = 0
    for s in range(0, N_DOCS, shard):
        n = min(shard, N_DOCS - s)
        rng = np.random.default_rng([11, s])
        lens = np.maximum(8, rng.poisson(MEAN_TOKS, n)).astype(np.int64)
        flat = ((rng.zipf(1.2, size=int(lens.sum())) - 1) % VOCAB).astype(np.int32)
        offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        total_tokens += int(lens.sum())
        tables.append(pa.table({
            "doc_id": pa.array(np.arange(s, s + n, dtype=np.int64)),
            "tokens": pa.ListArray.from_arrays(pa.array(offs), pa.array(flat)),
        }))
    corpus = ray.data.from_arrow(tables).repartition(NUM_CPUS * 2).materialize()
    report: dict = {"metric": "bpe_train_scale", "num_cpus": NUM_CPUS,
                    "docs": N_DOCS, "total_tokens": total_tokens,
                    "n_merges": N_MERGES, "vocab": VOCAB}

    # untimed warmup: a few merges on a 5% sample (first-touch discipline)
    warm = corpus.limit(max(1000, N_DOCS // 20)).materialize()
    bpe_train(warm, n_merges=3, vocab_size=VOCAB, num_partitions=NUM_CPUS)

    sampler = RssSampler()
    sampler.start()
    times: list[float] = []
    state = {"t": time.time()}

    def on_round(rec):
        now = time.time()
        times.append(now - state["t"])
        state["t"] = now
        if rec["round"] % 32 == 0:
            print(f"round {rec['round']}: {times[-1]:.2f}s "
                  f"merge ({rec['a']},{rec['b']})->{rec['new_id']} "
                  f"n={rec['n']}", file=sys.stderr)

    t0 = time.time()
    merges, final = bpe_train(corpus, n_merges=N_MERGES, vocab_size=VOCAB,
                              num_partitions=NUM_CPUS, on_round=on_round)
    total = time.time() - t0
    report["rounds_completed"] = merges.num_rows
    report["total_sec"] = round(total, 2)
    report["sec_per_round"] = round(total / max(1, merges.num_rows), 3)
    q = np.percentile(np.asarray(times), [50, 90, 99])
    report["round_sec_p50"] = round(float(q[0]), 3)
    report["round_sec_p90"] = round(float(q[1]), 3)
    report["round_sec_p99"] = round(float(q[2]), 3)
    # flatness: mean of last 32 rounds vs first 32 — lineage/creep detector
    if len(times) >= 64:
        head, tail = np.mean(times[:32]), np.mean(times[-32:])
        report["tail_over_head_round_cost"] = round(float(tail / head), 3)
    report["token_rounds_per_sec"] = round(
        total_tokens * merges.num_rows / total, 1)
    report["peak_rss_bytes"] = sampler.stop()
    ray.shutdown()
    return report


if __name__ == "__main__":
    out = main()
    Path("BPE_SCALE_r5.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
