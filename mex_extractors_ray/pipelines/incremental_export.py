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
  multi-window feed to one winner per doc — exactly, via a doc_id-keyed
  coarse shuffle (partition-locality of the raw feed is not enough: Ray
  splits big task outputs into multiple blocks) — writes the surviving
  upserts as a new window, and lists EVERY changed doc_id in the window's
  retraction set. If the export has lagged below the lake's change-feed
  floor (a lake fold squashed the needed history), the call re-bases from
  the live lake instead of failing.
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
    """One winner per doc within a block. Exact only when every row of a
    doc is in the block — which the doc_id-keyed coarse shuffle in
    :func:`incremental_export` guarantees (Ray splits large task outputs
    at ``target_max_block_size``, so partition-locality of the raw feed is
    NOT enough: a doc's upsert and its later delete can land in different
    blocks of the same partition's feed)."""
    from mex_extractors_ray.cdc.apply import _reduce_per_doc

    return _reduce_per_doc(t, "last_wins")


def _lake_feed_floor(lake_dir: str | Path) -> int:
    """Max over partitions of the change-feed floor (the newest fold's
    watermark; -1 when every partition can serve changes from any since)."""
    from mex_extractors_ray.cdc.apply import _manifested_pids

    floors = []
    for pid in _manifested_pids(lake_dir):
        m = read_manifest(lake_dir, pid)
        if not m:
            continue
        f = m.history_floor
        floors.append(m.last_lsn if f == -2 else f)
    return max(floors, default=-1)


def _gc_unlisted_windows(out: Path, manifest: dict | None) -> None:
    """Remove window dirs not listed in the committed manifest: crashed
    partial windows, and old windows retired by a committed rebase. Safe
    at any time — readers only open manifest-listed dirs."""
    import shutil

    listed = {w["dir"] for w in (manifest or {}).get("windows", [])}
    for d in out.glob("window-*"):
        if d.is_dir() and d.name not in listed:
            shutil.rmtree(d, ignore_errors=True)


# single canonicalizer + inherit sentinel live with the predicate grammar
from mex_extractors_ray.cdc.filtered import INHERIT as _INHERIT
from mex_extractors_ray.cdc.filtered import canon_where as _canon_where


def incremental_export(lake_dir: str | Path, out_dir: str | Path, *,
                       num_shards: int = 16, seed: int = 0,
                       min_n_tok: int | object = _INHERIT,
                       where: list[tuple] | None | object = _INHERIT,
                       registry: SchemaRegistry | None = None,
                       _rebase: bool = False) -> dict:
    """Bring the export current with the lake; returns the manifest.
    No-op (manifest returned unchanged) when already at the watermark.

    ``where`` is a conjunctive predicate list ``[(col, op, value), ...]``
    (the ``cdc.filtered`` grammar): the export becomes a MAINTAINED
    FILTERED VIEW of the lake. Maintenance is sound for free because every
    changed doc_id is retracted regardless of whether its new version
    passes the filter — a doc UPDATED OUT of the predicate is retracted
    and simply not re-added, a doc updated INTO it lands in the window's
    upserts. The rebase path reads through ``read_lake_filtered``
    (partition pruning + row-group pushdown + byte-minimal payload fetch).

    The filter parameters (``where``, ``min_n_tok``) are part of the
    export's identity: they are recorded in the manifest, UNSPECIFIED
    parameters on follow-on calls INHERIT the recorded values (the same
    discipline as the ingest's tracked-view inheritance — the tail loop
    keeps a filtered export fresh without re-stating its filter), and an
    EXPLICIT mismatching value raises — per-window filters would silently
    mix views (docs only re-face the predicate in windows where they
    change).

    Rebase (fresh base window replacing the whole window list) happens
    when: no manifest yet; ``_rebase=True`` (``fold_export``); or the
    export watermark has fallen below the lake's change-feed floor — a
    lake fold squashed the history the feed would need, so the export
    re-bases from the live lake instead of dying on the floor error
    (cost ∝ lake, the price of having lagged past a fold)."""
    from mex_extractors_ray.cdc.manifest import writer_lock

    registry = registry or sequence_registry()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # one exporter at a time per OUT dir (the lake itself is only read):
    # two concurrent calls at the same watermark would write into the same
    # deterministic window dir and the second commit's rglob would list
    # BOTH writers' shard files — duplicated docs blessed by checksums
    with writer_lock(out, "export"):
        return _locked_export(lake_dir, out, num_shards=num_shards,
                              seed=seed, min_n_tok=min_n_tok, where=where,
                              registry=registry, _rebase=_rebase)


def _locked_export(lake_dir: str | Path, out: Path, *, num_shards: int,
                   seed: int, min_n_tok, where,
                   registry: SchemaRegistry, _rebase: bool) -> dict:
    manifest = _read_export_manifest(out)
    prev_min = (manifest or {}).get("min_n_tok", 0)
    prev_where = _canon_where((manifest or {}).get("where"))
    min_n_tok = prev_min if min_n_tok is _INHERIT else min_n_tok
    where = prev_where if where is _INHERIT else _canon_where(where)
    wm = lake_high_watermark(lake_dir)
    since = manifest["watermark"] if manifest else None
    if manifest and (prev_min, prev_where) != (min_n_tok, where):
        raise ValueError(
            f"export at {out} was built with filter {(prev_min, prev_where)}; "
            f"refusing to append a window with {(min_n_tok, where)} — "
            "per-window filters would mix views. Start a new export dir.")
    if manifest and since == wm and not _rebase:
        return manifest
    if manifest and since > wm:
        raise ValueError(
            f"export watermark {since} is AHEAD of the lake ({wm}) — wrong lake?")
    # pre-write GC: anything not in the committed manifest is a crashed
    # partial window or a committed rebase's leftovers
    _gc_unlisted_windows(out, manifest)

    from mex_extractors_ray.cdc.apply import read_changes, read_lake
    from mex_extractors_ray.stages.dedup import _keyed_blocks

    rebase = manifest is None or _rebase or since < _lake_feed_floor(lake_dir)
    folds = (manifest or {}).get("folds", 0)
    if rebase and manifest is not None:
        # a rebase window can share the lake watermark with a listed
        # window (fold while current); the fold counter keeps dir names
        # unique without ever touching committed dirs
        folds += 1
        wname = f"window-{wm:020d}f{folds}"
    else:
        wname = f"window-{wm:020d}"
    wdir = out / wname

    if rebase:
        if where:
            from mex_extractors_ray.cdc.filtered import read_lake_filtered

            # pushdown base build: pruned partitions never become tasks,
            # payload bytes only for predicate-matching rows
            ds = read_lake_filtered(lake_dir, where, registry=registry)
        else:
            ds = read_lake(lake_dir, registry)
    else:
        # doc_id-keyed coarse shuffle → the per-block fold is exact even
        # when Ray splits a partition's feed into many blocks; the folded
        # window (∝ change volume) is materialized ONCE and serves both
        # the retraction list and the upsert shards
        feed = read_changes(lake_dir, since, registry)
        folded = _keyed_blocks(feed, "doc_id", _feed_last_wins).materialize()
        folded.select_columns(["doc_id"]).write_parquet(
            str(wdir / "retractions"), min_rows_per_file=64 * 1024)
        ds = folded.map_batches(
            lambda t: t.filter(pc.equal(t["op"], "upsert")).drop_columns(["op"]),
            batch_format="pyarrow")
    if min_n_tok > 0:
        ds = ds.map_batches(
            lambda t: t.filter(pc.fill_null(
                pc.greater_equal(t["n_tok"], min_n_tok), False)),
            batch_format="pyarrow")
    if where and not rebase:
        # incremental windows face the predicate in-stream (the rebase
        # path already read through the pushdown); retracted-then-filtered
        # docs are exactly the updated-out-of-view case
        from mex_extractors_ray.cdc.filtered import _apply_mask

        def _where(t: pa.Table, _preds=tuple(where)) -> pa.Table:
            for c, o, v in _preds:
                t = _apply_mask(t, c, o, v)
            return t

        ds = ds.map_batches(_where, batch_format="pyarrow")
    ds = ds.map_batches(_shard_route(num_shards, seed), batch_format="pyarrow")
    ds.write_parquet(str(wdir), partition_cols=["shard"],
                     min_rows_per_file=64 * 1024)

    files = sorted(p for p in wdir.rglob("*.parquet"))
    window = {
        "dir": wdir.name,
        "watermark": wm,
        "base": rebase,
        "files": [{"name": str(p.relative_to(wdir)),
                   "sha256_checksum": sha256_file(p)} for p in files],
    }
    new_manifest = {
        "num_shards": num_shards,
        "seed": seed,
        "min_n_tok": min_n_tok,
        "where": where,
        "watermark": wm,
        "folds": folds,
        "windows": ([window] if rebase else [*manifest["windows"], window]),
    }
    # manifest commit LAST (two-phase: the old manifest and its dirs stay
    # valid until this write); post-commit GC retires rebased-away windows
    _commit_export_manifest(out, new_manifest)
    _gc_unlisted_windows(out, new_manifest)
    return new_manifest


def _window_tables(out: Path, w: dict, prefix: str) -> list[pa.Table]:
    wdir = out / w["dir"]
    return [pq.read_table(wdir / f["name"]) for f in w["files"]
            if f["name"].startswith(prefix)]


def read_export_arrow(out_dir: str | Path,
                      registry: SchemaRegistry | None = None) -> pa.Table:
    """The live exported corpus (driver-side, doc_id-sorted): per window,
    shard rows minus doc_ids retracted by any LATER window. ``registry``
    only shapes the EMPTY result (rows carry their written schema)."""
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
        reg = registry or sequence_registry()
        return pa.schema(
            [*reg.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table()
    return pa.concat_tables(parts).sort_by([("doc_id", "ascending")])


def fold_export(lake_dir: str | Path, out_dir: str | Path,
                registry: SchemaRegistry | None = None) -> dict:
    """Rewrite the export as one fresh base window at the lake's current
    watermark (clears retraction debt — the compactor analog). Two-phase
    like every commit here: the new base is written FIRST, the manifest
    swap commits it, and only then are the old windows GC'd — a crash at
    any point leaves either the old export or the new one fully readable
    (never the round-2 behavior of unlinking the manifest up front)."""
    out = Path(out_dir)
    manifest = _read_export_manifest(out)
    if manifest is None:
        return incremental_export(lake_dir, out_dir, registry=registry)
    # filters (min_n_tok / where) inherit from the manifest automatically;
    # the registry must be forwarded too — a fold of an export built under
    # a custom registry must not silently rebase through the default one
    params = {k: manifest[k] for k in ("num_shards", "seed")}
    return incremental_export(lake_dir, out_dir, _rebase=True,
                              registry=registry, **params)
