"""Incremental training export — the change feed driving downstream ETL.

``export_training_data`` (training_export.py) rebuilds its whole output on
every run. At 100 TB that is the wrong shape for a lake that changes by a
small window per ingest: this module keeps the export CURRENT at a cost ∝
the change volume, by mirroring the lake's own delta discipline on the
consumer side.

Layout (all commits via the atomic manifest, like the lake):

    out/
      manifest.json                 — window list + watermark + checksums
      window-{wm:020d}/
        shard=K/*.parquet           — this window's doc versions (upserts)
        retractions/*.parquet       — doc_ids whose OLDER exported versions
                                      this window supersedes (updates) or
                                      removes (deletes)

- The FIRST call writes a base window from the live lake (no feed replay
  needed — exactly-once is the lake's job).
- Each later call reads ``read_changes(lake, last_watermark)``, folds the
  multi-window feed to one winner per doc (exact per block: the feed is
  partition-blocked and a doc never crosses partitions), writes the
  surviving upserts as a new window, and lists EVERY changed doc_id in the
  window's retraction set.
- A reader takes, per window, the shard rows minus doc_ids retracted by
  any LATER window — so the union over windows is exactly the live lake
  payload at the export watermark (asserted against ``read_lake_arrow``
  in tests and against the closed-form SQL oracle in the catalog).
- ``fold_export`` rewrites the window list to a single fresh base when the
  retraction debt has grown (the compactor analog).

The reference's closest analog is its full re-extraction on every
scheduled run (``mex/extractors/pipeline/base.py`` sensors re-run whole
jobs); the incremental export is the 10^10-event-scale replacement.

Scale notes: window cost ∝ feed size (file selection in ``read_changes``
is manifest-only). The driver-side reader materializes retraction id
sets; at corpus-scale retraction debt, route shards through
``stages.bloom.bloom_anti_join`` against the retraction dataset instead
(same exact semantics, no driver set), or fold.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.cdc.manifest import atomic_write_bytes, read_manifest, sha256_file
from mex_extractors_ray.schema import SchemaRegistry, sequence_registry


def lake_high_watermark(lake_dir: str | Path) -> int:
    """Highest committed LSN across partitions (-1 for an empty lake).

    The export positions itself at this HIGH watermark, which is correct
    under the engine's window-monotone LSN contract: every ingest window's
    events carry LSNs above the lake's previous global max (the generator
    and the tail loop both guarantee it; ``gen.synth_change_log`` via
    ``lsn_start``, ``cdc/tail.py`` by ingesting segments in LSN order).
    Under arbitrary cross-window LSN interleaving the lake itself stays
    correct (per-partition watermarks), but an exporter would need
    per-partition positions instead of this scalar — use
    ``cdc.tail.lake_watermark`` (the MIN safe-replay point) as the
    position and rely on the retraction mechanism to absorb the
    re-emitted rows."""
    from mex_extractors_ray.cdc.apply import _manifested_pids

    wms = [m.last_lsn for m in
           (read_manifest(lake_dir, p) for p in _manifested_pids(lake_dir)) if m]
    return max(wms) if wms else -1


def _read_export_manifest(out: Path) -> dict | None:
    try:
        return json.loads((out / "manifest.json").read_text())
    except FileNotFoundError:
        return None


def _commit_export_manifest(out: Path, manifest: dict) -> None:
    manifest["write_completed_at"] = datetime.now(timezone.utc).isoformat()
    atomic_write_bytes(out / "manifest.json", json.dumps(manifest, indent=1).encode())


def _shard_route(num_shards: int, seed: int):
    def route(t: pa.Table) -> pa.Table:
        from mex_extractors_ray.stages.shuffle import shuffle_keys
        from mex_extractors_ray.hashing import hash_key_array

        keys = shuffle_keys(
            hash_key_array(t["doc_id"]).view(np.int64), seed, 0)
        shard = (keys % np.uint64(num_shards)).astype(np.int64)
        return t.append_column("shard", pa.array(shard))

    return route


def _feed_last_wins(t: pa.Table) -> pa.Table:
    """One winner per doc within a feed block. Exact: read_changes blocks
    are partition-local and a doc_id never crosses partitions."""
    from mex_extractors_ray.cdc.apply import _reduce_per_doc

    return _reduce_per_doc(t, "last_wins")


def incremental_export(lake_dir: str | Path, out_dir: str | Path, *,
                       num_shards: int = 16, seed: int = 0,
                       min_n_tok: int = 0,
                       registry: SchemaRegistry | None = None) -> dict:
    """Bring the export current with the lake; returns the manifest.
    No-op (manifest returned unchanged) when already at the watermark."""
    registry = registry or sequence_registry()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest = _read_export_manifest(out)
    wm = lake_high_watermark(lake_dir)
    since = manifest["watermark"] if manifest else None
    if manifest and since == wm:
        return manifest
    if manifest and since > wm:
        raise ValueError(
            f"export watermark {since} is AHEAD of the lake ({wm}) — wrong lake?")

    from mex_extractors_ray.cdc.apply import read_changes, read_lake

    if manifest is None:
        ds = read_lake(lake_dir, registry)
        base = True
    else:
        ds = read_changes(lake_dir, since, registry).map_batches(
            _feed_last_wins, batch_format="pyarrow")
        base = False

    wdir = out / f"window-{wm:020d}"
    import shutil

    shutil.rmtree(wdir, ignore_errors=True)  # crashed partial = uncommitted

    if not base:
        # retractions BEFORE the upsert filter: updates retract their old
        # version, deletes retract outright
        ds.select_columns(["doc_id"]).write_parquet(
            str(wdir / "retractions"), min_rows_per_file=64 * 1024)
        ds = read_changes(lake_dir, since, registry).map_batches(
            _feed_last_wins, batch_format="pyarrow").map_batches(
            lambda t: t.filter(pc.equal(t["op"], "upsert")).drop_columns(["op"]),
            batch_format="pyarrow")
    if min_n_tok > 0:
        ds = ds.map_batches(
            lambda t: t.filter(pc.fill_null(
                pc.greater_equal(t["n_tok"], min_n_tok), False)),
            batch_format="pyarrow")
    ds = ds.map_batches(_shard_route(num_shards, seed), batch_format="pyarrow")
    ds.write_parquet(str(wdir), partition_cols=["shard"],
                     min_rows_per_file=64 * 1024)

    files = sorted(p for p in wdir.rglob("*.parquet"))
    window = {
        "dir": wdir.name,
        "watermark": wm,
        "base": base,
        "files": [{"name": str(p.relative_to(wdir)),
                   "sha256_checksum": sha256_file(p)} for p in files],
    }
    new_manifest = {
        "num_shards": num_shards,
        "seed": seed,
        "min_n_tok": min_n_tok,
        "watermark": wm,
        "windows": ([*manifest["windows"], window] if manifest else [window]),
    }
    _commit_export_manifest(out, new_manifest)
    return new_manifest


def _window_tables(out: Path, w: dict, prefix: str) -> list[pa.Table]:
    wdir = out / w["dir"]
    return [pq.read_table(wdir / f["name"]) for f in w["files"]
            if f["name"].startswith(prefix)]


def read_export_arrow(out_dir: str | Path) -> pa.Table:
    """The live exported corpus (driver-side, doc_id-sorted): per window,
    shard rows minus doc_ids retracted by any LATER window."""
    out = Path(out_dir)
    manifest = _read_export_manifest(out)
    if manifest is None:
        raise FileNotFoundError(f"no committed export at {out}")
    windows = manifest["windows"]
    parts: list[pa.Table] = []
    # later[i] = retraction ids of every window AFTER index i
    later: list[list[pa.Array]] = []
    acc: list[pa.Array] = []
    for w in reversed(windows):
        later.append(list(acc))
        for r in _window_tables(out, w, "retractions"):
            acc.append(r["doc_id"].combine_chunks())
    later.reverse()
    for w, retract in zip(windows, later):
        tabs = _window_tables(out, w, "shard=")
        if not tabs:
            continue
        t = pa.concat_tables(tabs)
        if retract:
            ids = pa.chunked_array(retract).combine_chunks()
            t = t.filter(pc.invert(pc.fill_null(
                pc.is_in(t["doc_id"], value_set=ids), False)))
        parts.append(t.drop_columns([c for c in ("shard",) if c in t.column_names]))
    if not parts:
        reg = sequence_registry()
        return pa.schema(
            [*reg.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table()
    return pa.concat_tables(parts).sort_by([("doc_id", "ascending")])


def fold_export(lake_dir: str | Path, out_dir: str | Path) -> dict:
    """Rewrite the export as one fresh base window at the lake's current
    watermark (clears retraction debt — the compactor analog)."""
    out = Path(out_dir)
    manifest = _read_export_manifest(out)
    if manifest is None:
        return incremental_export(lake_dir, out_dir)
    import shutil

    params = {k: manifest[k] for k in ("num_shards", "seed", "min_n_tok")}
    (out / "manifest.json").unlink()
    for w in manifest["windows"]:
        shutil.rmtree(out / w["dir"], ignore_errors=True)
    return incremental_export(lake_dir, out_dir, **params)
