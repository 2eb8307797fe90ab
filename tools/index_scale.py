"""Incremental-index economics at scale: full rebuild vs a CDC update
window, on a deterministic synthetic corpus (the sf tables' documents are
too small to separate fixed costs — 200k docs × ~40 tokens ≈ 8M postings
here; seed-42 closed form, no external data).

Reports (INDEX_SCALE_r4.json + stdout):
- build_s: one-shot full build (corpus shuffle)
- update_s / buckets_touched: a `frac` update window (delete/update/insert
  mix) merged via update_token_index — cost = delta shuffle + touched-
  bucket rewrite bytes, NOT a corpus shuffle
- rebuild_s + equivalent: a fresh rebuild over the post-change corpus must
  equal the updated index byte-for-byte (the unit-test invariant, held at
  scale)

Usage: python tools/index_scale.py [frac=0.01] [n_docs=200000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

os.environ.setdefault("RAY_ADDRESS", "local")

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
NUM_BUCKETS = 64
VOCAB = 50_000


def _texts(ids: np.ndarray) -> list[str]:
    """Deterministic text per doc id: 8 + id%64 tokens 'w<k>' with
    k = (id·2654435761 + i·40503) % VOCAB — the gen.py token formula
    re-used at the string level."""
    out = []
    for d in ids.tolist():
        n_tok = 8 + (d % 64)
        ks = (d * 2654435761 + np.arange(n_tok, dtype=np.int64) * 40503) % VOCAB
        out.append(" ".join("w%d" % k for k in ks))
    return out


def main() -> None:
    frac = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from mex_extractors_ray.stages import invindex

    # corpus as parquet shards so both builds stream the same way
    corpus_dir = Path("/tmp/mex_index_scale_corpus")
    shutil.rmtree(corpus_dir, ignore_errors=True)
    corpus_dir.mkdir(parents=True)
    shard = 25_000
    for s in range(0, n, shard):
        ids = np.arange(s, min(s + shard, n), dtype=np.int64)
        pq.write_table(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(_texts(ids), pa.string())}),
                       corpus_dir / f"part-{s:08d}.parquet")
    docs = pq.read_table(corpus_dir, columns=["doc_id", "text"])
    rng = np.random.default_rng(7)
    k = max(1, int(n * frac))
    picked = rng.choice(n, size=3 * k, replace=False)
    del_idx, upd_idx = picked[:k], picked[k:2 * k]
    ins_src = picked[2 * k:]
    max_id = int(pa.compute.max(docs["doc_id"]).as_py())

    ids = docs["doc_id"].to_numpy()
    texts = docs["text"].to_pylist()
    changes = pa.table({
        "doc_id": pa.array(
            np.concatenate([ids[del_idx], ids[upd_idx],
                            max_id + 1 + np.arange(k)]), pa.int64()),
        "op": pa.array(["delete"] * k + ["update"] * k + ["insert"] * k),
        "old_text": pa.array(
            [texts[i] for i in del_idx] + [texts[i] for i in upd_idx]
            + [None] * k, pa.string()),
        "new_text": pa.array(
            [None] * k + [texts[i] + " updated token" for i in upd_idx]
            + [texts[i] for i in ins_src], pa.string()),
    })

    work = Path("/tmp/mex_index_scale")
    shutil.rmtree(work, ignore_errors=True)
    inc, full = work / "inc", work / "full"

    from mex_extractors_ray.runtime import read_parquet_clean

    ds = read_parquet_clean(
        sorted(str(p) for p in corpus_dir.glob("*.parquet")),
        columns=["doc_id", "text"])
    t0 = time.time()
    rep = invindex.build_token_index(ds, inc, num_buckets=NUM_BUCKETS)
    build_s = time.time() - t0

    seg = work / "seg"
    shutil.copytree(inc, seg)

    t0 = time.time()
    urep = invindex.update_token_index(
        inc, ray.data.from_arrow(changes).repartition(8), update_id="w1")
    update_s = time.time() - t0

    t0 = time.time()
    invindex.update_token_index(
        seg, ray.data.from_arrow(changes).repartition(8), update_id="w1",
        segment=True)
    seg_update_s = time.time() - t0
    t0 = time.time()
    probe = invindex.bm25_topk(seg, ("w17", "w4099", "w31337"), k=10)
    seg_read_s = time.time() - t0
    t0 = time.time()
    invindex.compact_token_index(seg)
    compact_s = time.time() - t0
    assert invindex.bm25_topk(seg, ("w17", "w4099", "w31337"), k=10).equals(probe)

    # post-change corpus for the equivalence rebuild
    del_set = set(ids[del_idx].tolist()) | set(ids[upd_idx].tolist())
    keep = pa.array([i not in del_set for i in ids.tolist()])
    v2 = pa.concat_tables([
        docs.filter(keep),
        pa.table({"doc_id": changes["doc_id"].slice(k, 2 * k),
                  "text": changes["new_text"].slice(k, 2 * k)}),
    ])
    t0 = time.time()
    invindex.build_token_index(ray.data.from_arrow(v2).repartition(32),
                               full, num_buckets=NUM_BUCKETS)
    rebuild_s = time.time() - t0

    same = True
    for d in (inc, seg):
        for b in range(NUM_BUCKETS):
            pi, pf = invindex.bucket_path(d, b), invindex.bucket_path(full, b)
            ti = pq.read_table(pi) if pi.exists() else None
            tf = pq.read_table(pf) if pf.exists() else None
            if tf is None:
                same &= ti is None or ti.num_rows == 0
            else:
                same &= ti is not None and ti.equals(tf)
        mi, mf = invindex.load_index_meta(d), invindex.load_index_meta(full)
        same &= (mi["n_docs"] == mf["n_docs"]
                 and mi["total_len"] == mf["total_len"])

    out = {
        "docs": n, "frac": frac, "num_buckets": NUM_BUCKETS,
        "num_cpus": NUM_CPUS,
        "postings": rep["postings"],
        "build_s": round(build_s, 2),
        "update_inplace_s": round(update_s, 2),
        "update_segment_s": round(seg_update_s, 2),
        "segment_read_s": round(seg_read_s, 3),
        "compact_s": round(compact_s, 2),
        "rebuild_s": round(rebuild_s, 2),
        "buckets_touched": urep["buckets_touched"],
        "inplace_vs_rebuild": round(update_s / rebuild_s, 3),
        "segment_vs_rebuild": round(seg_update_s / rebuild_s, 3),
        "equivalent": bool(same),
    }
    Path("INDEX_SCALE_r4.json").write_text(json.dumps(out))
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
