"""Zipf-skew rehearsal (round-5 verdict item #3): the bench mix is
deliberately uniform, so this run measures the engine's hot-key behavior
under a Zipf(α≈1.1) change stream — at α=1.1 the single hottest doc takes
~1/ζ(1.1) ≈ 9% of ALL events, the hostile regime for hash partitioning.

Four legs, each against a same-size uniform control where a tax ratio is
meaningful:

1. **Ingest**: per-partition routed-event p50/p99/max from the ingest
   metrics (the straggler picture — hash partitioning spreads DISTINCT
   docs uniformly, so stored rows stay balanced, but one partition
   receives every event of the hot doc), plus the wall-clock skew tax
   vs the uniform log.
2. **Auto-split**: `split_hot_partitions` armed below the observed max
   stored load; records stored-rows p50/p99 before/after and how many
   splits fired.
3. **Joins / top-k on the skewed key**: `bucketed_join` (fact=zipf
   events, dim=doc table) and `keyed_topk` — the hot key concentrates in
   one bucket; the vectorized block kernels must not stall on it.
4. **MinHash under text skew**: a corpus whose texts repeat with a Zipf
   tail (popular boilerplate) — hot LSH buckets with quadratic pair
   emission inside; records candidate/verified pair counts and wall.

Usage: python tools/skew_rehearsal.py     (writes SKEW_r5.json, prints it)
"""

from __future__ import annotations

import json
import os
import shutil
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
N_EVENTS = int(os.environ.get("MEX_SKEW_EVENTS", str(2_000_000)))
N_DOCS = int(os.environ.get("MEX_SKEW_DOCS", str(200_000)))
ALPHA = float(os.environ.get("MEX_SKEW_ALPHA", "1.1"))
P = 32
ROOT = Path("/tmp/mex_ray_skew")


def pctl(vals, q):
    return float(np.percentile(np.asarray(vals, dtype=np.float64), q))


def main() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    from mex_extractors_ray.runtime import silence_empty_block_schema_warnings

    silence_empty_block_schema_warnings()
    ray.data.DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc

    from mex_extractors_ray.cdc import ingest_change_log
    from mex_extractors_ray.cdc.compact import partition_loads, split_hot_partitions
    from mex_extractors_ray.gen import synth_change_log

    ROOT.mkdir(parents=True, exist_ok=True)
    report: dict = {"metric": "skew_rehearsal", "num_cpus": NUM_CPUS,
                    "events": N_EVENTS, "docs_space": N_DOCS, "alpha": ALPHA,
                    "partitions": P}

    logs = {}
    for name, kw in (("zipf", {"zipf_alpha": ALPHA}), ("uniform", {})):
        d = ROOT / f"log-{name}-{N_EVENTS}"
        if not (d / "_COMPLETE").exists():
            shutil.rmtree(d, ignore_errors=True)
            synth_change_log(d, n_events=N_EVENTS, n_docs=N_DOCS, seed=23,
                             shard_rows=250_000, **kw)
            (d / "_COMPLETE").write_text("ok")
        logs[name] = sorted(str(p) for p in d.glob("log-*.parquet"))

    # untimed warmup (first-touch page-fault discipline, see bench.py)
    warm = ROOT / "warm"
    shutil.rmtree(warm, ignore_errors=True)
    ingest_change_log(logs["zipf"][:2], warm, num_partitions=P)
    shutil.rmtree(warm, ignore_errors=True)

    # ---- leg 1: ingest, zipf vs uniform control
    ing = {}
    for name in ("zipf", "uniform"):
        lake = ROOT / f"lake-{name}"
        shutil.rmtree(lake, ignore_errors=True)
        t0 = time.time()
        metrics = ingest_change_log(logs[name], lake, num_partitions=P)
        sec = time.time() - t0
        # rows_in counts the rows that actually CROSSED the shuffle: the
        # resolve stage's map-side last-wins combiner collapses each
        # batch's repeats before the exchange, so a hot doc contributes
        # ≤1 row per resolve batch — the engine's first line of defense
        # against event-key skew (disabled only for append mode)
        shuffled = metrics["rows_in"].to_pylist()
        ing[name] = {
            "sec": round(sec, 2),
            "events_per_sec": round(N_EVENTS / sec, 1),
            "shuffled_rows": int(sum(shuffled)),
            "combiner_collapse": round(N_EVENTS / max(1, sum(shuffled)), 2),
            "shuffled_p50": pctl(shuffled, 50),
            "shuffled_p99": pctl(shuffled, 99),
            "shuffled_max": int(max(shuffled)),
        }
    ing["skew_tax"] = round(ing["zipf"]["sec"] / ing["uniform"]["sec"], 3)
    report["ingest"] = ing

    # ---- leg 2: auto-split on the zipf lake, armed below the max stored
    lake = ROOT / "lake-zipf"
    before = [d["rows"] for d in partition_loads(lake)]
    thresh = max(1, int(0.8 * max(before)))
    t0 = time.time()
    sp = split_hot_partitions(lake, max_rows=thresh, max_rounds=3)
    after = [d["rows"] for d in partition_loads(lake)]
    report["auto_split"] = {
        "sec": round(time.time() - t0, 2),
        "threshold_rows": thresh,
        "splits": len(sp["splits"]), "converged": sp["converged"],
        "stored_p50_before": pctl(before, 50), "stored_p99_before": pctl(before, 99),
        "stored_p50_after": pctl(after, 50), "stored_p99_after": pctl(after, 99),
    }

    # ---- leg 3: bucketed join + keyed top-k on the skewed key
    from mex_extractors_ray.runtime import read_parquet_clean
    from mex_extractors_ray.stages.aggregates import keyed_topk
    from mex_extractors_ray.stages.joins import bucketed_join

    dim = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"doc-{i}" for i in range(N_DOCS)]),
        "grp": pa.array(np.arange(N_DOCS, dtype=np.int64) % 97),
    })).materialize()
    jn = {}
    for name in ("zipf", "uniform"):
        fact = read_parquet_clean(logs[name], columns=["doc_id", "lsn"])
        t0 = time.time()
        n = bucketed_join(fact, dim, on="doc_id", num_buckets=P).count()
        jn[name] = {"sec": round(time.time() - t0, 2), "rows": n}
    jn["skew_tax"] = round(jn["zipf"]["sec"] / jn["uniform"]["sec"], 3)
    report["bucketed_join"] = jn

    tk = {}
    for name in ("zipf", "uniform"):
        fact = read_parquet_clean(logs[name], columns=["doc_id", "lsn"])
        t0 = time.time()
        n = keyed_topk(fact, "doc_id", [("lsn", "descending")], k=3,
                       num_partitions=P).count()
        tk[name] = {"sec": round(time.time() - t0, 2), "rows": n}
    tk["skew_tax"] = round(tk["zipf"]["sec"] / tk["uniform"]["sec"], 3)
    report["keyed_topk"] = tk

    # ---- leg 4: minhash with zipf-repeated texts (hot LSH buckets)
    from mex_extractors_ray.stages import dedup

    # 95% unique texts + 5% boilerplate drawn zipf-folded over 200
    # templates: hottest template ≈ 0.9% of the corpus (a ~450-doc
    # clique, ~100k true pairs) — hot LSH buckets with bounded-but-
    # painful quadratic pair emission inside. (Raw Zipf over texts is
    # the wrong fixture: at any α the TOP text alone takes 1/ζ(α) ≥ 9%
    # of docs — a 10⁷-pair clique measures pair-materialization, not
    # shuffle skew.)
    n_corpus = 50_000
    rng = np.random.default_rng(7)
    is_boiler = rng.random(n_corpus) < 0.05
    boiler_id = (rng.zipf(1.2, size=n_corpus) - 1) % 200
    text_of = np.where(is_boiler, boiler_id, 200 + np.arange(n_corpus))
    words = np.array([f"w{j}" for j in range(64)])

    def mk_text(ti: int) -> str:
        base = list(words[(ti * 13 + np.arange(24) * (1 + ti % 7)) % 64])
        if ti < 200:  # boilerplate template: the pattern IS the text
            return " ".join(base)
        # non-boilerplate: interleave four doc-unique tokens so same-
        # pattern docs sit far below the jaccard threshold (the word-
        # pattern alone has only 64·7 distinct realizations)
        for j, pos in enumerate((0, 8, 16, 24)):
            base.insert(pos + j, f"u{ti}{'abcd'[j]}")
        return " ".join(base)

    uniq = {int(t) for t in np.unique(text_of)}
    texts = {ti: mk_text(ti) for ti in uniq}
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n_corpus, dtype=np.int64)),
        "text": pa.array([texts[int(t)] for t in text_of]),
    })).materialize()
    top_share = float(np.bincount(text_of[is_boiler]).max()) / n_corpus
    t0 = time.time()
    cand = dedup.minhash_candidate_pairs(corpus, "text", "doc_id",
                                         k=3, num_perm=64, bands=16)
    verified = dedup.jaccard_verify_distributed(
        cand, corpus, text_col="text", key_col="doc_id", k=3, threshold=0.8
    ).materialize()
    n_pairs = verified.count()
    report["minhash_hot_buckets"] = {
        "docs": n_corpus, "distinct_texts": len(texts),
        "hottest_text_share": round(top_share, 4),
        "verified_pairs": n_pairs,
        "sec": round(time.time() - t0, 2),
    }

    ray.shutdown()
    return report


if __name__ == "__main__":
    out = main()
    Path("SKEW_r5.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
