"""End-to-end training-data export — the composed flagship pipeline.

A user preparing LM training data runs, in order: quality filtering →
repetition filtering → redaction → exact dedup → stratified mix → epoch
shuffle → sharded parquet export. Every stage here is one of the engine's
catalog operators; this module composes them into a single lazy Dataset
pipeline (ONE coarse shuffle for the dedup, everything else streaming) and
lands resumable output: one parquet directory per shard, plus a manifest
with per-shard row counts and content checksums committed atomically after
all shards land (the two-phase discipline of the CDC lake,
``cdc/manifest.py``).

Determinism contract: every stage is a pure function of the row (hash
sampling, fmix64 shuffle keys, content-hash dedup keepers ordered by
doc_id), so a re-run selects exactly the same rows into exactly the same
shards. Physical file layout (block boundaries, file names) follows
runtime scheduling, so equality is at the row-set level; readers recover
a canonical order by sorting a shard on ``shuffle_key``.

Failure discipline: the manifest is the COMMIT MARKER. A re-run over an
out-dir with a valid manifest verifies checksums and returns without
recomputing (idempotent); a crashed run left no manifest, and the re-run
rewrites the directory from scratch (``mode="overwrite"`` — stale partial
files cannot mix into the new export). For multi-epoch 100-TB exports,
drive one ``export_training_data`` per epoch/out-dir so each commit is
independently resumable.

Reference analog: the fan-out ``load()`` sink over transformed sources
(``mex/extractors/pipeline/base.py``), extended to the training-data
domain.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

import numpy as np
import pyarrow as pa

from mex_extractors_ray.cdc.manifest import atomic_write_bytes, sha256_file


def _verified_manifest(out: Path) -> dict | None:
    """Committed-and-intact check: the manifest exists and every listed
    file hashes to its recorded checksum (and no extra parquet strays)."""
    mpath = out / "manifest.json"
    if not mpath.exists():
        return None
    manifest = json.loads(mpath.read_text())
    listed = {f["name"]: f["sha256_checksum"] for f in manifest.get("files", [])}
    on_disk = {str(p.relative_to(out)) for p in out.rglob("*.parquet")}
    if set(listed) != on_disk:
        return None
    for name, digest in listed.items():
        if sha256_file(out / name) != digest:
            return None
    return manifest


def export_training_data(
    docs,
    out_dir: str | Path,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str | None = "lang",
    rates: dict[str, tuple[int, int]] | None = None,
    min_quality: float = 0.0,
    max_dup_word_frac: float = 1.0,
    near_dedup: bool = False,
    near_dedup_params: dict | None = None,
    redact_patterns: list[tuple[str, str]] | None = None,
    seed: int = 0,
    epoch: int = 0,
    num_shards: int = 16,
    concurrency=None,
) -> dict:
    """Run the full export; returns the committed manifest dict.

    Stages (all lazy, executed by one streaming run at ``write_parquet``):

    1. quality gate    — ``text.QualityScore``, keep ``quality >= min_quality``
    2. repetition gate — ``text.repetition_features`` semantics inline
                         (dup-word fraction), keep ``<= max_dup_word_frac``
    3. redaction       — optional ``text.RegexRedactor`` (replaces text)
    4. exact dedup     — 128-bit content hash, keeper = lowest id
    4b. near dedup     — optional: MinHash+LSH pairs → Jaccard verify →
                         connected components → keep the cluster-min doc
                         (``near_dedup=True``; checkpoints the gated set
                         once so pair mining and the keeper filter don't
                         re-run the gate chain)
    5. stratified mix  — deterministic per-stratum keep rates
    6. epoch shuffle   — fmix64 key; shard = key % num_shards (NO global
                         sort: shard routing only needs the key, so the
                         export's only all-to-all is the dedup shuffle;
                         within a shard, readers order by shuffle_key)
    """
    from mex_extractors_ray import runtime as _rt
    from mex_extractors_ray.stages import dedup
    from mex_extractors_ray.stages.sampling import stratified_sample
    from mex_extractors_ray.stages.shuffle import epoch_shuffle
    from mex_extractors_ray.stages.text import QualityScore, RegexRedactor, repetition_features

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    params = {
        "min_quality": min_quality, "max_dup_word_frac": max_dup_word_frac,
        "near_dedup": near_dedup,
        "near_dedup_params": dict(near_dedup_params or {}),
        "redact_patterns": redact_patterns or [], "rates":
        {k: list(v) for k, v in (rates or {}).items()},
        "stratum_col": stratum_col if rates else None,
        "seed": seed, "epoch": epoch, "num_shards": num_shards,
    }
    prior = _verified_manifest(out)
    if prior is not None and prior.get("params") == json.loads(json.dumps(params)):
        return prior

    if near_dedup:
        # fail FAST: connected components casts ids to int64 (the cluster
        # label is the numeric min id); a string id corpus would otherwise
        # crash deep in the run, after the gates and LSH already executed
        id_type = docs.schema().base_schema.field(id_col).type
        if not pa.types.is_integer(id_type):
            raise ValueError(
                f"near_dedup=True requires an integer {id_col!r} column "
                f"(cluster labels are min ids); got {id_type}")

    ds = docs
    if min_quality > 0.0:
        ds = ds.map_batches(_rt.stateless(QualityScore, text_col=text_col),
                            batch_format="pyarrow")

        def quality_gate(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.greater_equal(t["quality"], min_quality)
            return t.filter(keep).drop_columns(
                [c for c in ("n_chars", "n_words", "n_punct", "n_stop",
                             "punct_ratio", "stop_ratio", "mean_word_len",
                             "quality") if c in t.column_names])

        ds = ds.map_batches(quality_gate, batch_format="pyarrow")

    if max_dup_word_frac < 1.0:
        thresh = int(np.floor(max_dup_word_frac * 10000 + 0.5))

        def repetition_gate(t: pa.Table) -> pa.Table:
            feats = repetition_features(t, text_col=text_col, id_col=id_col)
            mask = np.asarray(feats["dup_word_frac_c10k"]) <= thresh
            return t.filter(pa.array(mask))

        ds = ds.map_batches(repetition_gate, batch_format="pyarrow")

    if redact_patterns:
        def swap_text(t: pa.Table) -> pa.Table:
            i = t.column_names.index(text_col)
            return t.set_column(i, text_col, t["redacted"]).drop_columns(["redacted"])

        ds = ds.map_batches(
            _rt.stateless(RegexRedactor, patterns=redact_patterns,
                          text_col=text_col),
            batch_format="pyarrow").map_batches(swap_text, batch_format="pyarrow")

    # exact dedup on content: keeper = lowest id per 128-bit content key
    # (the export's single all-to-all — a coarse hash shuffle on h1)
    def add_keys(t: pa.Table) -> pa.Table:
        from mex_extractors_ray.hashing import hash_string_array

        h1 = hash_string_array(t[text_col])
        h2 = hash_string_array(t[text_col], seed=0x9E3779B97F4A7C15)
        return t.append_column("_h1", pa.array(h1.view(np.int64))).append_column(
            "_h2", pa.array(h2.view(np.int64)))

    def dedup_block(g: pa.Table) -> pa.Table:
        t = g.sort_by([("_h1", "ascending"), ("_h2", "ascending"),
                       (id_col, "ascending")])
        starts = dedup._run_starts(t["_h1"]) | dedup._run_starts(t["_h2"])
        return t.filter(pa.array(starts)).drop_columns(["_h1", "_h2"])

    ds = dedup._keyed_blocks(ds.map_batches(add_keys, batch_format="pyarrow"),
                             "_h1", dedup_block)

    if near_dedup:
        # near-dup CLUSTER dedup: MinHash+LSH candidates → exact Jaccard
        # verify → connected components (large-star/small-star) → keep the
        # cluster-minimum doc. The gated set is checkpointed ONCE (pair
        # mining and the keeper filter both read it; without the cut the
        # whole gate chain would execute twice). The drop side is the set
        # of detected non-keeper members — proportional to duplication
        # found, which is what makes it the broadcastable side; for a
        # corpus where even that overflows one object, swap the probe for
        # stages.bloom.bloom_anti_join (same exactness contract).
        import ray as _ray

        from mex_extractors_ray.stages import components

        p = {"k": 3, "num_perm": 64, "bands": 16, "threshold": 0.5}
        p.update(near_dedup_params or {})
        ds = ds.materialize()
        cand = dedup.minhash_candidate_pairs(
            ds, text_col, id_col, k=p["k"], num_perm=p["num_perm"], bands=p["bands"])
        pairs = dedup.jaccard_verify_distributed(
            cand, ds, text_col=text_col, key_col=id_col, k=p["k"],
            threshold=p["threshold"])
        labels = components.connected_components(pairs, a="a", b="b")

        def non_keepers(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.not_equal(t["node"], t["component"])).select(["node"])

        drop_tbl = pa.concat_tables(
            _ray.get(labels.map_batches(non_keepers,
                                        batch_format="pyarrow").to_arrow_refs()),
            promote_options="default")
        if "node" in drop_tbl.column_names and drop_tbl.num_rows:
            drop_ref = _ray.put(drop_tbl["node"].combine_chunks())

            def keeper_filter(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                drops = _ray.get(drop_ref)
                ids = pc.cast(t[id_col], pa.int64())
                return t.filter(pc.invert(pc.is_in(ids, value_set=drops)))

            ds = ds.map_batches(keeper_filter, batch_format="pyarrow")

    if rates and stratum_col:
        ds = stratified_sample(ds, stratum_col, id_col, rates)

    ds = epoch_shuffle(ds, id_col, seed=seed, epoch=epoch, sort=False)

    def route(t: pa.Table) -> pa.Table:
        shard = (np.asarray(t["shuffle_key"], dtype=np.uint64)
                 % np.uint64(num_shards)).astype(np.int64)
        return t.append_column("shard", pa.array(shard))

    ds = ds.map_batches(route, batch_format="pyarrow")
    # bound file count: coalesce writer blocks to ≥64k rows per file (tiny
    # inputs land one file per shard instead of one per read block); the
    # 2M cap bounds single-file rewrite cost. mode="overwrite" clears any
    # crashed partial output (no manifest = not committed).
    ds.write_parquet(str(out), partition_cols=["shard"],
                     min_rows_per_file=64 * 1024,
                     max_rows_per_file=2 * 1024 * 1024,
                     mode="overwrite")

    files = sorted(p for p in out.rglob("*.parquet"))
    manifest = {
        "num_shards": num_shards,
        "seed": seed,
        "epoch": epoch,
        "params": json.loads(json.dumps(params)),
        "files": [{"name": str(p.relative_to(out)),
                   "sha256_checksum": sha256_file(p)} for p in files],
        "write_completed_at": datetime.now(timezone.utc).isoformat(),
    }
    atomic_write_bytes(out / "manifest.json", json.dumps(manifest, indent=1).encode())
    return manifest
