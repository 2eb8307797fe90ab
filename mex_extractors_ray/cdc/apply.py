"""The Ray-Data CDC apply: change log → hash-partitioned keyed MERGE upsert.

Pipeline shape (SURVEY.md §7.1/§7.3):

    read_parquet(change_log)
      → map_batches(ResolveAndPartition)     stateless, zero-copy Arrow:
                                             schema-resolve to registry latest
                                             + assign pid = hash(doc_id) % P
      → groupby("pid")                       THE one wide op (all-to-all
                                             shuffle keyed on doc_id hash)
      → map_groups(apply_partition)          per-partition merge:
                                             watermark filter → LSN-order
                                             last-wins reduce → COW merge with
                                             the existing partition file →
                                             atomic manifest commit
      → (metrics rows, one per partition)    → lineage table + drift checks

Semantics match the single-process replayer (cdc/replayer.py) exactly; the
equality (including per-row token arrays) is asserted in tests.

Scale notes (100 TB design):
- ``num_partitions`` is the unit of parallelism *and* of state: each
  partition owns its files + manifest + LSN watermark, so a cluster of any
  size can process partitions independently and a failed run resumes by
  re-reading manifests (late events ≤ watermark are dropped idempotently).
- hot doc_ids (skewed update streams) collapse inside the last-wins reduce,
  so skew costs shuffle bandwidth but not apply time; partition counts are
  sized so partition state ≪ worker heap (split, not salt — key locality
  must be preserved for the keyed merge, SURVEY.md §4). When ONE partition
  outgrows that budget, ``compact.split_partition`` doubles its physical
  fan-out in place (extendible-hash, routing notes below) at cost ∝ the
  partition; ``compact.split_hot_partitions`` automates the thresholds.
- the per-batch resolve stage is zero-copy Arrow (``batch_format="pyarrow"``)
  and all kernels are pyarrow.compute / numpy — no per-row Python.

Reference parity: keyed first-seen/last-wins dedup families
(``mex/extractors/synopse/transform.py:286-289``), ordered apply
(``mex/extractors/sorters.py:12-49``), manifest commit
(``mex/extractors/sinks/s3.py:85-133``).
"""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.cdc.manifest import (
    PartitionManifest,
    commit_manifest,
    file_window_ends,
    partition_dir,
    read_manifest,
    sha256_file,
)
from mex_extractors_ray.schema import SchemaRegistry, sequence_registry

SYSTEM_COLS = ("lsn", "op", "schema_version", "pid")

# ---------------------------------------------------------------------------
# partition routing — extendible-hash splits for hot partitions
#
# The lake's identity is its BASE partition count P (pid0 = hash(doc_id) % P)
# plus a per-base-partition split depth table (``_lake_meta.json``:
# ``{"num_partitions": P, "splits": {"<pid0>": d}}``, absent key = depth 0).
# A base partition at depth d is physically stored as 2^d child partitions;
# a key routes to child c = (hash // P) mod 2^d — higher hash bits, so the
# refinement is independent of the base assignment. Physical ids are
#
#     phys = pid0 + P * (2^d - 1 + c)          (d = 0  ⇒  phys = pid0)
#
# which gives three invariants the whole engine leans on:
#   * phys % P == pid0 (the base partition is recoverable from the id),
#   * ids at different depths are disjoint (offsets {0},{1,2}·P,{3..6}·P,…),
#     so a split mints FRESH physical ids — the crash-safety primitive:
#     children are committed under ids no reader enumerates until the meta
#     depth table flips atomically, and the superseded parents become
#     orphan directories the vacuum sweeps,
#   * depth only ever increases, so an id is never reused.
#
# This is the 100-TB skew remedy SURVEY.md §4 calls for: ONE hot partition
# is rewritten (cost ∝ that partition), where repartition_lake rewrites the
# world. Key-locality of the keyed merge is preserved — no salting.
# ---------------------------------------------------------------------------


def _norm_splits(splits) -> dict[int, int]:
    """Normalize a depth table (JSON round-trips stringify keys)."""
    return {int(k): int(v) for k, v in (splits or {}).items() if int(v) > 0}


def split_children(pid0: int, P: int, depth: int) -> list[int]:
    """The physical ids of base partition ``pid0`` at ``depth``."""
    if depth <= 0:
        return [pid0]
    base = (1 << depth) - 1
    return [pid0 + P * (base + c) for c in range(1 << depth)]


def live_physical_pids(P: int, splits) -> list[int]:
    """Every physical partition id the current meta makes visible."""
    splits = _norm_splits(splits)
    out: list[int] = []
    for pid0 in range(P):
        out.extend(split_children(pid0, P, splits.get(pid0, 0)))
    return sorted(out)


class LakeMetaError(FileNotFoundError, ValueError):
    """A directory has no readable ``_lake_meta.json`` — not an ingested
    lake. Derives from BOTH FileNotFoundError (the underlying OS condition)
    and ValueError (what ``lake_num_partitions`` raised before splits
    existed), so callers written against either exception keep working."""


def load_lake_meta(lake_dir: str | Path) -> dict:
    """The lake's routing identity: ``{"num_partitions": P, "splits": {...}}``
    (splits keys normalized to int). Raises :class:`LakeMetaError` if the
    lake has no meta."""
    import json as _json

    meta_path = Path(lake_dir, "_lake_meta.json")
    try:
        meta = _json.loads(meta_path.read_text())
    except FileNotFoundError:
        raise LakeMetaError(
            f"lake at {lake_dir} has no _lake_meta.json — not an ingested lake"
        ) from None
    meta["splits"] = _norm_splits(meta.get("splits"))
    return meta


@functools.lru_cache(maxsize=64)
def _depth_arrays(P: int, splits_key: tuple) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(depth[pid0], offset[pid0], sorted live ids) — the vectorized routing
    tables for one (P, splits) identity. offset[pid0] = P*(2^d - 1)."""
    depth = np.zeros(P, dtype=np.uint64)
    for pid0, d in splits_key:
        depth[pid0] = d
    offset = (np.uint64(P) * ((np.uint64(1) << depth) - np.uint64(1))).astype(np.int64)
    live = np.asarray(live_physical_pids(P, dict(splits_key)), dtype=np.int64)
    return depth, offset, live


def _splits_key(splits) -> tuple:
    return tuple(sorted(_norm_splits(splits).items()))


def route_hashes(h: np.ndarray, P: int, splits=None) -> np.ndarray:
    """Vectorized key-hash → physical partition id (int32). With no splits
    this is exactly ``h % P`` (the historical layout)."""
    pid0 = (h % np.uint64(P)).astype(np.int64)
    key = _splits_key(splits)
    if not key:
        return pid0.astype(np.int32)
    depth, offset, _ = _depth_arrays(P, key)
    d = depth[pid0]
    mask = (np.uint64(1) << d) - np.uint64(1)
    c = ((h // np.uint64(P)) & mask).astype(np.int64)
    return (pid0 + offset[pid0] + np.int64(P) * c).astype(np.int32)


def route_keys(keys: pa.Array | pa.ChunkedArray, P: int, splits=None) -> np.ndarray:
    """doc_id array → physical partition id, meta-aware (the point-lookup
    and predicate-pruning router)."""
    from mex_extractors_ray.hashing import hash_key_array

    return route_hashes(hash_key_array(keys), P, splits)


def dense_shard_index(phys: np.ndarray, P: int, splits=None) -> tuple[np.ndarray, int]:
    """(dense index in [0, K), K) for a physical-id array — the bijection
    the ``_shard`` relabeling needs (physical ids are sparse once any
    partition has split; shuffle buckets must stay dense)."""
    key = _splits_key(splits)
    if not key:
        return phys, P
    _, _, live = _depth_arrays(P, key)
    return np.searchsorted(live, phys.astype(np.int64)).astype(np.int32), len(live)


class ResolveAndPartition:
    """Stateless-per-batch, stateful-per-actor resolve + partition stage.

    The registry is parsed once per actor in ``__init__`` (the reference's
    lru_cache-service discipline, ``mex/extractors/primary_source/helpers.py:12-36``)
    and applied per batch in ``__call__`` — zero-copy Arrow in/out.
    """

    def __init__(self, registry_json: str, num_partitions: int, splits=None,
                 mode: str = "last_wins"):
        self.registry = SchemaRegistry.from_json(registry_json)
        self.num_partitions = num_partitions
        self.splits = _norm_splits(splits)
        self.fill_null_defaults = mode != "patch"

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self.registry.resolve_table(
            batch, fill_null_defaults=self.fill_null_defaults)
        pid = route_keys(batch["doc_id"], self.num_partitions, self.splits)
        return batch.append_column("pid", pa.array(pid))


def resolve_and_partition(
    batch: pa.Table, registry_json: str, num_partitions: int, prereduce: bool = True,
    mode: str = "last_wins", skip_sources: list[str] | None = None,
    splits=None,
) -> pa.Table:
    """Stateless-task form of ResolveAndPartition (same semantics).

    ``prereduce`` applies last-LSN-wins *within the batch* before the
    shuffle — the map-side combiner: an event superseded inside its own
    batch can never win at the apply (which replays last-wins over the
    union), so dropping it early is semantics-preserving and trims shuffle
    bytes exactly where hot keys concentrate (skewed update streams).

    ``skip_sources`` drops events from the listed sources BEFORE the
    shuffle — the reference's skip-list config (``mex/extractors/
    settings.py:74-77``: which extractors/sources not to process)."""
    registry = SchemaRegistry.from_json(registry_json)
    # patch mode: null = "unchanged", not "written pre-evolution" — sparse
    # columns must survive resolution un-defaulted
    batch = registry.resolve_table(batch, fill_null_defaults=(mode != "patch"))
    if skip_sources:
        batch = batch.filter(
            pc.invert(pc.is_in(batch["source"], value_set=pa.array(list(skip_sources))))
        )
    if mode == "first_wins":
        # deletes are no-ops in first-seen-immutable mode; a delete must
        # never shadow a later insert inside the reduce
        batch = batch.filter(pc.not_equal(batch["op"], "delete"))
    if mode == "patch":
        # sparse updates get their OWN combiner: per-doc last-wins would
        # drop patches that still contribute columns, but the per-column
        # set-LSN annotation makes the column-merge fold ASSOCIATIVE, so a
        # batch collapses to one annotated partial per doc exactly
        # (_combine_patch_batch) — shuffle bytes ∝ distinct docs per
        # batch, not events, same as the last-wins combiner.
        data_cols = [n for n, _ in registry.latest.fields if n != "doc_id"]
        batch = (_combine_patch_batch(batch, data_cols) if prereduce
                 else _annotate_patch_rows(batch, data_cols))
        prereduce = False  # the generic last-wins combiner must not run
    if mode == "append":
        # every update row CONTRIBUTES to the append fold — the last-wins
        # combiner would drop contributions. Ship all events; a
        # (prefix, has-reset, suffix) monoid combiner is possible if the
        # shuffle ever dominates this mode.
        prereduce = False
    # ONE doc_id hash serves both the combiner sort key and the partition
    # assignment. Sorting by (_h, doc_id, lsn) keeps equal doc_ids adjacent
    # (exactness does NOT depend on hash collisions — the boundary mask
    # still compares doc_id), but the comparisons are int64-dominated
    # instead of string-dominated: the combiner was the hottest UDF in the
    # ingest profile (151 s of 888 task-seconds at 2M events).
    from mex_extractors_ray.hashing import hash_key_array

    h = hash_key_array(batch["doc_id"])
    if prereduce and batch.num_rows > 1:
        t = batch.append_column("_h", pa.array(h.view(np.int64)))
        t = t.sort_by([("_h", "ascending"), ("doc_id", "ascending"), ("lsn", "ascending")])
        n = t.num_rows
        d = t["doc_id"].combine_chunks()
        neq = pc.not_equal(d.slice(1), d.slice(0, n - 1)).to_numpy(zero_copy_only=False).astype(bool)
        if mode == "first_wins":
            mask = np.append(True, neq)
        else:
            mask = np.append(neq, True)
        t = t.filter(pa.array(mask))
        h = np.asarray(t["_h"], dtype=np.int64).view(np.uint64)
        batch = t.drop_columns(["_h"])
    pid = route_hashes(h, num_partitions, splits)
    batch = batch.append_column("pid", pa.array(pid))
    # `_shard` routes the shuffle through a pid→aggregator-bucket bijection
    # (see hashing.shuffle_labels): no hash-shuffle partition is ever
    # empty, so no schema-less RefBundles reach the streaming executor.
    # Physical ids are sparse once any partition has split, so the tag is
    # computed on the dense rank of the live-id table, K buckets total.
    from mex_extractors_ray.hashing import shard_tags

    dense, K = dense_shard_index(pid, num_partitions, splits)
    return batch.append_column("_shard", shard_tags(dense, K))


def _reduce_per_doc(group: pa.Table, mode: str = "last_wins") -> pa.Table:
    """LSN-order the group and keep one event per doc_id (vectorized).

    ``last_wins``  — the CDC default (latest LSN decides).
    ``first_wins`` — the reference's first-seen dedup semantics
    (``mex/extractors/synopse/transform.py:286-289``) as an apply mode:
    the FIRST event for a doc decides; later events are no-ops.
    """
    t = group.sort_by([("doc_id", "ascending"), ("lsn", "ascending")])
    n = t.num_rows
    if n <= 1:
        return t
    d = t["doc_id"].combine_chunks()
    neq = pc.not_equal(d.slice(1), d.slice(0, n - 1)).to_numpy(zero_copy_only=False).astype(bool)
    if mode == "first_wins":
        mask = np.append(True, neq)  # first row of each doc run
    else:
        mask = np.append(neq, True)  # last row of each doc run
    return t.filter(pa.array(mask))


def _last_wins(group: pa.Table) -> pa.Table:
    return _reduce_per_doc(group, "last_wins")


def _annotate_patch_rows(t: pa.Table, data_cols: list[str]) -> pa.Table:
    """Per-column set-LSN annotations for the patch fold: ``_lsn_<c>`` is
    the LSN at which this row SETS column ``c`` (-1 = doesn't touch it),
    ``_del_lsn`` the LSN of a delete (-1 otherwise).

    - ``patch`` rows set exactly their non-null columns (a patch cannot
      set-to-null — the sparse-update convention);
    - full rows (``insert``/``update``/``live``) set EVERY column at their
      LSN, explicit nulls included (set-to-null) — which makes a full row
      equivalent to a barrier under per-column argmax;
    - ``delete`` rows set nothing; their ``_del_lsn`` kills any column
      whose set-LSN is older.

    Idempotent: already-annotated tables pass through (the combiner's
    merged partials arrive at the apply with annotations attached)."""
    if "_del_lsn" in t.column_names:
        return t
    lsn = np.asarray(t["lsn"], dtype=np.int64)
    ops = t["op"].combine_chunks().to_numpy(zero_copy_only=False)
    is_patch = ops == "patch"
    is_del = ops == "delete"
    t = t.append_column("_del_lsn", pa.array(np.where(is_del, lsn, np.int64(-1))))
    for c in data_cols:
        nonnull = ~pc.is_null(t[c].combine_chunks()).to_numpy(
            zero_copy_only=False).astype(bool)
        sets = np.where(is_patch, nonnull, ~is_del)
        t = t.append_column(f"_lsn_{c}", pa.array(np.where(sets, lsn, np.int64(-1))))
    return t


def _patch_run_fold(t: pa.Table, data_cols: list[str]):
    """Shared core of the patch combiner and the apply fold: per-doc,
    per-column LSN-argmax over annotated rows.

    Per doc: ``D = max(_del_lsn)`` (newest delete), winner lsn ``L = max
    lsn``; column ``c``'s winner is the value whose ``_lsn_c`` is the run
    maximum ``M_c`` — alive iff ``M_c > D`` (a set after the newest delete
    survives; older sets are cleared). The doc is dead iff ``L == D``
    (nothing re-set it after the delete). This argmax formulation is
    ASSOCIATIVE, which is what makes the map-side combiner exact: merged
    partials carry (value, M_c, D, L) and re-fold at the apply in any
    grouping. Replay-safe by the same property: a re-delivered older set
    loses the argmax to the live row's newer synthesized set-LSN.

    All reduceat/boundary-mask vectorized; one ``take`` per column.
    Returns (ends, D, L, doc_ids, {col: (values, M_c)})."""
    t = _annotate_patch_rows(t, data_cols)
    t = t.sort_by([("doc_id", "ascending"), ("lsn", "ascending")])
    n = t.num_rows
    d = t["doc_id"].combine_chunks()
    doc_start = np.ones(n, dtype=bool)
    if n > 1:
        doc_start[1:] = (
            pc.not_equal(d.slice(1), d.slice(0, n - 1))
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
    starts = np.flatnonzero(doc_start)
    run_len = np.diff(np.append(starts, n))
    run_of = np.repeat(np.arange(len(starts), dtype=np.int64), run_len)
    ends = starts + run_len - 1
    D = np.maximum.reduceat(np.asarray(t["_del_lsn"], dtype=np.int64), starts)
    L = np.asarray(t["lsn"], dtype=np.int64)[ends]
    cols: dict[str, tuple] = {}
    for c in data_cols:
        lc = np.asarray(t[f"_lsn_{c}"], dtype=np.int64)
        M = np.maximum.reduceat(lc, starts)
        # argmax index without encode-overflow risk: event LSNs are unique
        # within a run, so the max (when ≥0) is hit exactly once
        pick = np.zeros(len(starts), dtype=np.int64)
        hit = np.flatnonzero((lc == M[run_of]) & (lc >= 0))
        pick[run_of[hit]] = hit
        valid = M > D  # covers M >= 0 too (D >= -1)
        col = t[c].combine_chunks()
        values = col.take(pa.array(np.where(valid, pick, 0), mask=~valid))
        cols[c] = (values, np.where(valid, M, np.int64(-1)))
    return ends, D, L, d, cols


def _fold_patches(t: pa.Table, data_cols: list[str]) -> pa.Table:
    """Column-level merge fold (the ``patch`` apply mode's kernel): one row
    per doc with op ``delete``/``upsert`` and fully-merged columns. Accepts
    raw OR combiner-merged (annotated) rows — same result either way (the
    argmax core is associative). The whole fold is expressible as a
    window/arg_max SQL query — ``_CDC_PATCH_SQL`` in pipelines/catalog.py
    hash-checks it end to end."""
    if t.num_rows == 0:
        return pa.table(
            {"lsn": pa.array([], pa.int64()), "op": pa.array([], pa.string()),
             "doc_id": pa.array([], t["doc_id"].type if "doc_id" in t.column_names else pa.string()),
             **{c: pa.array([], t[c].type) for c in data_cols if c in t.column_names}}
        )
    ends, D, L, d, cols = _patch_run_fold(t, data_cols)
    dead = (D >= 0) & (D == L)
    return pa.table(
        {
            "lsn": pa.array(L),
            "op": pa.array(np.where(dead, "delete", "upsert")),
            "doc_id": d.take(pa.array(ends)),
            **{c: v for c, (v, _) in cols.items()},
        }
    )


def _combine_patch_batch(t: pa.Table, data_cols: list[str]) -> pa.Table:
    """The patch mode's MAP-SIDE COMBINER: merge a batch's events to one
    annotated partial per doc (value + set-LSN per column, newest delete,
    max LSN). Exact because the argmax fold is associative — shuffle bytes
    become ∝ distinct docs per batch instead of ∝ events, which is the
    whole combiner win on skewed sparse-update streams."""
    if t.num_rows <= 1:
        return _annotate_patch_rows(t, data_cols)
    ends, D, L, d, cols = _patch_run_fold(t, data_cols)
    out = {
        "lsn": pa.array(L),
        "op": pa.array(["patch"] * len(L)),
        "doc_id": d.take(pa.array(ends)),
    }
    ann = {"_del_lsn": pa.array(D)}
    for c, (v, m) in cols.items():
        out[c] = v
        ann[f"_lsn_{c}"] = pa.array(m)
    return pa.table({**out, **ann})


def _patch_winners(fresh: pa.Table, pdir: Path, old_files: list[str],
                   registry: SchemaRegistry, old_tomb_ids: pa.Table,
                   lake_cols: list[str]) -> pa.Table:
    """Winners for the ``patch`` apply mode: read the CURRENT live rows of
    the touched docs (column-complete, tombstones honored), inject them as
    ``op='live'`` barriers, and fold this window's events on top.

    The read is ∝ the partition's files restricted to touched docs — the
    inherent read-modify-write of column-merge CDC (any MERGE engine pays
    it); winners come out as FULL rows, so the delta write/read path
    downstream is unchanged (last-wins merge at scan stays correct)."""
    touched = pc.unique(fresh["doc_id"].combine_chunks())
    parts = []
    for f in old_files:
        t = _read_file_columns(pdir, f, lake_cols, registry)
        t = t.filter(pc.is_in(t["doc_id"], value_set=touched))
        if t.num_rows:
            parts.append(t)
    data_cols = [c for c in lake_cols if c not in ("doc_id", "lsn")]
    sel = (["lsn", "op", "doc_id"] + data_cols
           + ["_del_lsn"] + [f"_lsn_{c}" for c in data_cols])
    pieces = [_annotate_patch_rows(fresh, data_cols).select(sel)]
    if parts:
        tomb_arr = (
            old_tomb_ids["doc_id"].combine_chunks()
            if old_tomb_ids.num_rows
            else None
        )
        base = merge_live(parts, tomb_arr)
        if base.num_rows:
            # the live row is a full set at its own LSN — a re-delivered
            # older event then loses every per-column argmax to it
            base = base.append_column("op", pa.array(["live"] * base.num_rows))
            pieces.append(_annotate_patch_rows(base, data_cols).select(sel))
    combined = pa.concat_tables(pieces, promote_options="permissive")
    return _fold_patches(combined, data_cols)


def _append_winners(fresh: pa.Table, pdir: Path, old_files: list[str],
                    registry: SchemaRegistry, old_tomb_ids: pa.Table,
                    lake_cols: list[str]) -> pa.Table:
    """Winners for the ``append`` apply mode — sequence-building CDC (the
    SummingMergeTree / append-log analog a token-sequence lake wants:
    conversation turns, streaming transcripts): per doc in LSN order,
    ``insert`` RESETS the payload, ``update`` APPENDS (list columns
    concatenate in LSN order, integer columns add, other columns
    last-wins; an update with no live row acts as insert), ``delete``
    clears — later updates re-create from their own base. Same
    read-modify-write shape as :func:`_patch_winners`: the touched docs'
    current live rows enter as ``op='live'`` barriers (their LSN ≤ the
    watermark < every fresh LSN, so the (doc, lsn) sort places them
    first), the fold emits FULL rows, and the delta write / tombstone /
    scan-merge downstream is the stock path. Fully vectorized: one sort,
    run-boundary masks, reduceat sums, one offsets rebuild for the list
    concat."""
    from mex_extractors_ray.stages.dedup import _run_starts

    sel = ["op"] + lake_cols
    touched = pc.unique(fresh["doc_id"].combine_chunks())
    pieces = [fresh.select(sel)]
    parts = []
    for f in old_files:
        t = _read_file_columns(pdir, f, lake_cols, registry)
        t = t.filter(pc.is_in(t["doc_id"], value_set=touched))
        if t.num_rows:
            parts.append(t)
    if parts:
        tomb_arr = (old_tomb_ids["doc_id"].combine_chunks()
                    if old_tomb_ids.num_rows else None)
        base = merge_live(parts, tomb_arr)
        if base.num_rows:
            base = base.append_column("op", pa.array(["live"] * base.num_rows))
            pieces.append(base.select(sel))
    t = pa.concat_tables(pieces, promote_options="permissive").sort_by(
        [("doc_id", "ascending"), ("lsn", "ascending")])
    n = t.num_rows
    ops = t["op"].combine_chunks().to_numpy(zero_copy_only=False)
    reset = ops != "update"
    run_start = np.flatnonzero(_run_starts(t["doc_id"]))
    run_end = np.append(run_start[1:], n)              # exclusive
    idx = np.arange(n, dtype=np.int64)
    r_idx = np.where(reset, idx, -1)
    last_reset = np.maximum.reduceat(r_idx, run_start)
    has_reset = last_reset >= 0
    lr = np.maximum(last_reset, 0)
    is_del_reset = np.zeros(len(run_start), dtype=bool)
    is_del_reset[has_reset] = ops[lr[has_reset]] == "delete"
    start_contrib = np.where(~has_reset, run_start,
                             np.where(is_del_reset, lr + 1, lr))
    dead = start_contrib >= run_end                    # nothing survives
    del_rows = t.take(pa.array((run_end - 1)[dead]))   # the delete event
    contrib = idx >= np.repeat(start_contrib, run_end - run_start)
    tc = t.filter(pa.array(contrib))
    if tc.num_rows == 0:
        return del_rows.select(sel)
    cstart = np.flatnonzero(_run_starts(tc["doc_id"]))
    clast = np.append(cstart[1:], tc.num_rows) - 1
    types = dict(registry.latest.fields)
    cols: dict = {"op": pa.array(["update"] * len(cstart))}
    for c in lake_cols:
        col = tc[c].combine_chunks()
        if c == "doc_id":
            cols[c] = col.take(pa.array(cstart))
        elif c == "lsn":
            cols[c] = col.take(pa.array(clast))
        else:
            typ = types.get(c)
            if typ is not None and (pa.types.is_list(typ)
                                    or pa.types.is_large_list(typ)):
                offs = np.asarray(col.offsets, dtype=np.int64)
                lens = np.diff(offs)
                run_lens = np.add.reduceat(lens, cstart) if len(lens) else \
                    np.zeros(len(cstart), np.int64)
                new_off = np.concatenate([[0], np.cumsum(run_lens)])
                cols[c] = pa.ListArray.from_arrays(
                    pa.array(new_off, pa.int32()), col.flatten())
            elif typ is not None and pa.types.is_integer(typ):
                vals = np.asarray(pc.fill_null(col, 0).cast(pa.int64()))
                sums = np.add.reduceat(vals, cstart)
                cols[c] = pa.array(sums).cast(typ)
            else:
                cols[c] = col.take(pa.array(clast))
    live_tbl = pa.table(cols).select(sel)
    return (pa.concat_tables([live_tbl, del_rows.select(sel)],
                             promote_options="permissive")
            if del_rows.num_rows else live_tbl)


_TOMB_SCHEMA = pa.schema([("doc_id", pa.string()), ("lsn", pa.int64())])


def _read_tombstones(pdir: Path, manifest: PartitionManifest | None) -> pa.Table:
    if manifest is None or not manifest.tombstone_file:
        return _TOMB_SCHEMA.empty_table()
    return pq.read_table(pdir / manifest.tombstone_file)


def _update_tombstones(old: pa.Table, deletes: pa.Table, upsert_ids) -> pa.Table:
    """deletes add (latest LSN wins); resurrecting upserts remove — all
    Arrow (sort + boundary mask + anti-join), no Python dict round-trip."""
    merged = pa.concat_tables(
        [old.select(["doc_id", "lsn"]), deletes.select(["doc_id", "lsn"])]
    )
    merged = _reduce_per_doc(merged, "last_wins")
    if len(upsert_ids):
        merged = merged.filter(pc.invert(pc.is_in(merged["doc_id"], value_set=upsert_ids)))
    return merged


def merge_live(tables: list[pa.Table], tombstone_ids: pa.Array | None = None) -> pa.Table:
    """The partition read-merge: last-wins by (doc_id, lsn) across base +
    delta files, minus tombstoned docs. Output sorted by doc_id. For a
    compacted (single-file, no-tombstone-overlap) partition this degrades to
    a no-op reduce, so every reader uses the SAME path."""
    t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
    t = _reduce_per_doc(t, "last_wins")
    if tombstone_ids is not None and len(tombstone_ids):
        t = t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=tombstone_ids)))
    return t


_NULL_KEY = "__null__"


def _value_counts_dict(col: pa.ChunkedArray | pa.Array) -> dict[str, int]:
    """value → count as a JSON-able dict (nulls under ``__null__``).
    Per-partition |V| is bounded (the tracked-column contract), so the
    Python dict is manifest-sized, never data-sized."""
    s = pc.fill_null(pc.cast(col, pa.string()), _NULL_KEY)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    vc = pc.value_counts(s)
    return {
        k: int(v)
        for k, v in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
    }


def _dict_merge(prev: dict[str, int], sub: dict[str, int],
                add: dict[str, int]) -> dict[str, int]:
    out = dict(prev)
    for k, v in sub.items():
        out[k] = out.get(k, 0) - v
    for k, v in add.items():
        out[k] = out.get(k, 0) + v
    bad = {k: v for k, v in out.items() if v < 0}
    if bad:
        raise AssertionError(f"maintained aggregate went negative: {bad}")
    return {k: v for k, v in out.items() if v > 0}


def _read_file_columns(pdir: Path, fname: str, cols: list[str],
                       registry: SchemaRegistry) -> pa.Table:
    """(doc_id, lsn, *cols) of one committed file, column-pruned. A file
    written before a column existed in the registry gets the declared
    default (mirroring resolve_table's fill, so incremental and recompute
    agree)."""
    present = set(pq.read_schema(pdir / fname).names)
    src = {c: registry.source_name(c, present)
           for c in cols if c not in ("doc_id", "lsn")}
    want = ["doc_id", "lsn"] + [s for s in src.values() if s is not None]
    t = pq.read_table(pdir / fname, columns=want)
    types = dict(registry.latest.fields)
    out: dict[str, pa.ChunkedArray | pa.Array] = {"doc_id": t["doc_id"], "lsn": t["lsn"]}
    for c in cols:
        if c in out:
            continue
        typ = types.get(c, pa.string())
        if src.get(c) is not None:
            col = t[src[c]]
            out[c] = col.cast(typ) if col.type != typ else col
        else:
            # missing column: fill with the DECLARED type + default (an
            # int64 tracked column filled as string would poison the
            # concat and the maintained-aggregate arithmetic)
            default = registry.latest.defaults.get(c)
            out[c] = (pa.nulls(t.num_rows, typ) if default is None
                      else pa.array([default] * t.num_rows, typ))
    # canonical column order regardless of each file's present subset, so
    # concat_tables over mixed-era files always aligns
    return pa.table(out)


def _group_stats_dict(tbl: pa.Table, g: str, v: str) -> dict[str, list[int]]:
    """{group: [n_rows, sum(v)]} — one Arrow hash group_by. Integer ``v``
    only (exact arithmetic under incremental +/-)."""
    if not pa.types.is_integer(tbl[v].type):
        raise TypeError(
            f"track_group_sums: value column {v!r} must be integer, got {tbl[v].type}"
        )
    key = pc.fill_null(pc.cast(tbl[g], pa.string()), _NULL_KEY)
    t = pa.table({g: key, v: tbl[v]})
    out = t.group_by(g).aggregate([(v, "sum"), ([], "count_all")])
    return {
        k: [int(n), int(s)]
        for k, s, n in zip(out[g].to_pylist(), out[f"{v}_sum"].to_pylist(),
                           out["count_all"].to_pylist())
    }


def _stats_merge(prev: dict[str, list[int]], sub: dict[str, list[int]],
                 add: dict[str, list[int]]) -> dict[str, list[int]]:
    out = {k: list(v) for k, v in prev.items()}
    for k, (n, s) in sub.items():
        cur = out.get(k, [0, 0])
        out[k] = [cur[0] - n, cur[1] - s]
    for k, (n, s) in add.items():
        cur = out.get(k, [0, 0])
        out[k] = [cur[0] + n, cur[1] + s]
    bad = {k: v for k, v in out.items() if v[0] < 0}
    if bad:
        raise AssertionError(f"maintained group-sum count went negative: {bad}")
    # a group prunes exactly when its last live doc goes
    return {k: v for k, v in out.items() if v[0] > 0}


def _bounds_of(col: pa.ChunkedArray | pa.Array):
    """Exact ``[lo, hi]`` of a column's non-null values (``None`` if there
    are none) as JSON-able Python scalars. Orderable primitives only —
    integer / floating / string — so the manifest stays a plain JSON doc
    and pruning comparisons are well-defined."""
    t = col.type
    if not (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_string(t) or pa.types.is_large_string(t)):
        raise TypeError(
            f"track_bounds: column type {t} is not an orderable primitive "
            "(integer / floating / string)")
    mm = pc.min_max(col)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if lo is None:
        return None
    if pa.types.is_floating(t) and (lo != lo or hi != hi):
        # NaN poisons min_max AND fails every comparison in the pruning
        # check (IEEE), which would wrongly prune real values sharing the
        # partition — degrade to the unbounded (never-prunes) interval
        return [float("-inf"), float("inf")]
    return [lo, hi]


def _bounds_union(a, b):
    """Widen-only merge of two ``[lo, hi] | None`` zone maps."""
    if a is None:
        return None if b is None else list(b)
    if b is None:
        return list(a)
    return [min(a[0], b[0]), max(a[1], b[1])]


def read_live_bounds(lake_dir: str | Path, col: str):
    """Lake-wide ``[lo, hi]`` of ``col`` from the MAINTAINED per-partition
    zone maps alone — O(P) manifest reads, zero data files touched
    (``None`` when no partition proves a live non-null value).

    CONSERVATIVE: delta windows only widen a partition's bounds (a delete
    never shrinks them), so the result is a sound SUPERSET interval of the
    live min/max; it is EXACT right after every partition folded
    (compaction / repartition / ``delta=False``), which recomputes bounds
    from the live state. Raises if any partition does not maintain the
    column (ingest with ``track_bounds=(col,)`` consistently)."""
    out = None
    for pid in _manifested_pids(lake_dir):
        m = read_manifest(lake_dir, pid)
        if m is None:
            continue
        if col not in (m.agg_bounds or {}):
            raise ValueError(
                f"partition {m.partition} does not maintain bounds for "
                f"{col!r}; ingest with track_bounds=({col!r},)")
        out = _bounds_union(out, m.agg_bounds[col])
    return out


def read_live_value_counts(lake_dir: str | Path, col: str) -> pa.Table:
    """Lake-wide GROUP BY ``col`` from the MAINTAINED per-partition
    aggregates alone — O(P) manifest reads, zero data files touched, no
    Ray job. The distributed analog of a materialized view kept fresh by
    the CDC apply (each window commit updates its partition's counts in
    the same atomic manifest rename as the data).

    Raises if any partition does not maintain ``col`` (ingest with
    ``track_value_counts=(col,)`` consistently — a partial view would be
    silently wrong)."""
    sums: dict[str, int] = {}
    for pid in _manifested_pids(lake_dir):
        m = read_manifest(lake_dir, pid)
        if m is None:
            continue
        if col not in (m.agg_counts or {}):
            raise ValueError(
                f"partition {m.partition} does not maintain counts for {col!r}; "
                f"ingest with track_value_counts=({col!r},)"
            )
        for k, v in m.agg_counts[col].items():
            sums[k] = sums.get(k, 0) + int(v)
    keys = sorted(sums)
    return pa.table({
        col: pa.array(keys, pa.string()),
        "n": pa.array([sums[k] for k in keys], pa.int64()),
    })


def read_live_group_sums(lake_dir: str | Path, group_col: str,
                         value_col: str) -> pa.Table:
    """Lake-wide ``GROUP BY group_col: COUNT(*), SUM(value_col)`` from the
    maintained per-partition stats alone — O(P) manifest reads, zero data
    files touched. Raises if any partition does not maintain the pair
    (``track_group_sums=((group_col, value_col),)``)."""
    key = f"{group_col}|{value_col}"
    sums: dict[str, list[int]] = {}
    for pid in _manifested_pids(lake_dir):
        m = read_manifest(lake_dir, pid)
        if m is None:
            continue
        if key not in (m.agg_sums or {}):
            raise ValueError(
                f"partition {m.partition} does not maintain sums for "
                f"({group_col!r}, {value_col!r}); ingest with "
                f"track_group_sums=(({group_col!r}, {value_col!r}),)"
            )
        for k, (n, s) in m.agg_sums[key].items():
            cur = sums.setdefault(k, [0, 0])
            cur[0] += int(n)
            cur[1] += int(s)
    keys = sorted(sums)
    return pa.table({
        group_col: pa.array(keys, pa.string()),
        "n": pa.array([sums[k][0] for k in keys], pa.int64()),
        f"sum_{value_col}": pa.array([sums[k][1] for k in keys], pa.int64()),
    })


def _read_partition_live(pdir: Path, manifest: PartitionManifest,
                         registry: SchemaRegistry, cols: list[str]) -> pa.Table:
    # projection pushdown: only the requested columns leave the parquet
    # reader (the tokens payload dominates lake bytes — a metadata query
    # must not pay for it); additive columns absent from old files are
    # restored from registry defaults by the column-restricted resolve
    tables = []
    for f in manifest.files:
        present = set(pq.read_schema(pdir / f).names)
        # renamed columns: fetch the old spelling from pre-rename files
        fcols = [s for s in (registry.source_name(c, present) for c in cols)
                 if s is not None]
        t = pq.read_table(pdir / f, columns=fcols)
        tables.append(registry.resolve_table(t, columns=cols, fill_null_defaults=False).select(cols))
    if not tables:
        return pa.schema(
            [*registry.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table().select(cols)
    tomb_ids = None
    if manifest.tombstone_file and (pdir / manifest.tombstone_file).exists():
        tomb_ids = pq.read_table(
            pdir / manifest.tombstone_file, columns=["doc_id"]
        )["doc_id"].combine_chunks()
    return merge_live(tables, tomb_ids)


METRICS_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("rows_in", pa.int64()),
        ("late_dropped", pa.int64()),
        ("upserts", pa.int64()),
        ("deletes", pa.int64()),
        ("row_count", pa.int64()),
        ("tombstone_count", pa.int64()),
        ("last_lsn", pa.int64()),
        ("schema_version", pa.int32()),
        ("noop", pa.bool_()),
    ]
)


def _metrics_row(pid: int, **kw) -> pa.Table:
    row = {
        "partition": pid,
        "rows_in": 0,
        "late_dropped": 0,
        "upserts": 0,
        "deletes": 0,
        "row_count": 0,
        "tombstone_count": 0,
        "last_lsn": -1,
        "schema_version": 0,
        "noop": False,
    }
    row.update(kw)
    return pa.Table.from_pylist([row], schema=METRICS_SCHEMA)


def _tracked_aggs_delta(pdir, old_files, registry, manifest, touched,
                        old_tomb_ids, tomb_table, upsert_data,
                        track_value_counts, track_group_sums,
                        track_bounds=()):
    """Incremental update of every tracked aggregate on the delta path.
    ONE filtered, column-pruned read of the old files serves all tracked
    items; items without prior state (first enable on an existing lake)
    recount this partition's after-state once (self-healing). Zone maps
    (``track_bounds``) update widen-only from the window's upserts — no
    old-file read at all once established."""
    prev_counts = (manifest.agg_counts or {}) if manifest else {}
    prev_sums = (manifest.agg_sums or {}) if manifest else {}
    prev_bounds = (manifest.agg_bounds or {}) if manifest else {}
    need: set[str] = set(track_value_counts)
    for g, v in track_group_sums:
        need.update((g, v))
    fresh_bounds = [c for c in track_bounds if c not in prev_bounds]
    need.update(fresh_bounds)
    if not need and not track_bounds:
        return {}, {}, {}
    cols = sorted(need)
    inc_possible = bool(manifest)
    fresh_counts = [c for c in track_value_counts if c not in prev_counts]
    fresh_sums = [(g, v) for g, v in track_group_sums
                  if f"{g}|{v}" not in prev_sums]
    tomb_arr = (tomb_table["doc_id"].combine_chunks()
                if tomb_table.num_rows else None)

    old_live_touched = None
    if inc_possible and (len(fresh_counts) < len(track_value_counts)
                         or len(fresh_sums) < len(track_group_sums)):
        parts = []
        for f in old_files:
            t = _read_file_columns(pdir, f, cols, registry)
            parts.append(t.filter(pc.is_in(t["doc_id"], value_set=touched)))
        old_live_touched = _reduce_per_doc(pa.concat_tables(parts), "last_wins")
        if old_tomb_ids.num_rows:
            old_live_touched = old_live_touched.filter(
                pc.invert(pc.is_in(
                    old_live_touched["doc_id"],
                    value_set=old_tomb_ids["doc_id"].combine_chunks(),
                ))
            )
    full_after = None
    if fresh_counts or fresh_sums or fresh_bounds:
        full_after = merge_live(
            [_read_file_columns(pdir, f, cols, registry) for f in old_files]
            + [upsert_data.select(["doc_id", "lsn", *cols])],
            tomb_arr,
        )

    agg_bounds: dict = {}
    for c in track_bounds:
        if c in prev_bounds:
            # widen-only: previously-live ⊆ prev bounds, new-live ⊆
            # previously-live ∪ upserts — deletes never shrink (the fold
            # recomputes exactly, self-healing)
            agg_bounds[c] = _bounds_union(prev_bounds[c],
                                          _bounds_of(upsert_data[c]))
        else:
            agg_bounds[c] = _bounds_of(full_after[c])

    agg_counts: dict = {}
    for c in track_value_counts:
        if c in prev_counts:
            agg_counts[c] = _dict_merge(
                prev_counts[c],
                _value_counts_dict(old_live_touched[c]),
                _value_counts_dict(upsert_data[c]),
            )
        else:
            agg_counts[c] = _value_counts_dict(full_after[c])
    agg_sums: dict = {}
    for g, v in track_group_sums:
        key = f"{g}|{v}"
        if key in prev_sums:
            agg_sums[key] = _stats_merge(
                prev_sums[key],
                _group_stats_dict(old_live_touched, g, v),
                _group_stats_dict(upsert_data, g, v),
            )
        else:
            agg_sums[key] = _group_stats_dict(full_after, g, v)
    return agg_counts, agg_sums, agg_bounds


def apply_partition(group: pa.Table, lake_dir: str, registry_json: str,
                    mode: str = "last_wins", delta: bool = True,
                    compact_threshold: int = 8,
                    track_value_counts: tuple = (),
                    track_group_sums: tuple = (),
                    track_bounds: tuple = ()) -> pa.Table:
    """Merge one partition's change events into its lake state (one call per
    pid per run; returns a one-row metrics table).

    Delta apply (``delta=True``, the default): each ingest window writes
    ONLY that window's winners as a new delta file — bytes written per
    window ∝ delta size, not partition size. Readers merge at scan time
    (last-wins by (doc_id, lsn) + tombstone anti-join — :func:`merge_live`);
    membership/row-count bookkeeping reads only the column-pruned
    (doc_id, lsn) of committed files, never the token payloads. Once a
    partition accumulates ``compact_threshold`` files the window folds them
    into a single base (read amplification stays bounded; the standalone
    compactor does the same on demand). ``delta=False`` forces the fold
    every window (the v1 merge-on-write behavior).

    Exactly-once: events ≤ the committed watermark are dropped; file names
    are deterministic in (pid, last_lsn) and the manifest commit is an atomic
    rename, so task retries and whole-run replays are idempotent no-ops.
    """
    from mex_extractors_ray.state.chaos import maybe_kill

    maybe_kill("apply_partition")  # no-op unless a chaos test armed it
    registry = SchemaRegistry.from_json(registry_json)
    latest = registry.latest
    pid = int(group["pid"][0].as_py())
    pdir = partition_dir(lake_dir, pid)
    pdir.mkdir(parents=True, exist_ok=True)
    manifest = read_manifest(lake_dir, pid)
    watermark = manifest.last_lsn if manifest else -1

    rows_in = group.num_rows
    fresh = group.filter(pc.greater(group["lsn"], pa.scalar(watermark, pa.int64())))
    late_dropped = rows_in - fresh.num_rows
    if fresh.num_rows == 0:
        old_rows = manifest.row_count if manifest else 0
        old_tomb = manifest.tombstone_count if manifest else 0
        return _metrics_row(
            pid, rows_in=rows_in, late_dropped=late_dropped, noop=True,
            row_count=old_rows, tombstone_count=old_tomb, last_lsn=watermark,
            schema_version=manifest.schema_version if manifest else 0,
        )

    if mode == "first_wins":
        fresh = fresh.filter(pc.not_equal(fresh["op"], "delete"))
        if fresh.num_rows == 0:
            old_rows = manifest.row_count if manifest else 0
            old_tomb = manifest.tombstone_count if manifest else 0
            return _metrics_row(
                pid, rows_in=rows_in, late_dropped=late_dropped, noop=True,
                row_count=old_rows, tombstone_count=old_tomb, last_lsn=watermark,
                schema_version=manifest.schema_version if manifest else 0,
            )
    lake_cols = [n for n, _ in latest.fields] + ["lsn"]
    old_files = list(manifest.files) if manifest else []
    old_checksums = list(manifest.file_checksums) if manifest else []
    old_tomb_ids = _read_tombstones(pdir, manifest)

    if mode == "patch":
        # column-level merge: fold sparse updates onto the live rows; the
        # winners that come out are FULL rows, so everything downstream
        # (delta write, tombstones, read merge) is the stock path
        winners = _patch_winners(fresh, pdir, old_files, registry,
                                 old_tomb_ids, lake_cols)
    elif mode == "append":
        winners = _append_winners(fresh, pdir, old_files, registry,
                                  old_tomb_ids, lake_cols)
    else:
        winners = _reduce_per_doc(fresh, mode)
    is_delete = pc.equal(winners["op"], "delete")
    deletes = winners.filter(is_delete)
    upserts = winners.filter(pc.invert(is_delete))
    last_lsn = int(pc.max(fresh["lsn"]).as_py())

    upsert_data = upserts.select(lake_cols)

    write_delta = delta and old_files and len(old_files) + 1 < compact_threshold
    key_ids = None
    if old_files and (mode == "first_wins" or write_delta):
        # ONE column-pruned key read serves both the first_wins membership
        # filter and the delta live-count bookkeeping — payloads untouched
        key_ids = pa.concat_tables(
            pq.read_table(pdir / f, columns=["doc_id"]) for f in old_files
        )["doc_id"].combine_chunks()

    if mode == "first_wins" and old_files:
        # first-seen-immutable: existing docs never change
        upsert_data = upsert_data.filter(
            pc.invert(pc.is_in(upsert_data["doc_id"], value_set=key_ids))
        )
    if mode == "first_wins":
        deletes = deletes.slice(0, 0)
        upserts = upsert_data

    # tombstones: deletes add; resurrecting upserts remove (all Arrow)
    tomb_table = _update_tombstones(
        old_tomb_ids, deletes, upsert_data["doc_id"].combine_chunks()
    )

    data_name = f"part-{pid:05d}-{last_lsn:020d}.parquet"
    tomb_name = f"tombstones-{pid:05d}-{last_lsn:020d}.parquet"
    dlog_name = f"deletelog-{pid:05d}-{last_lsn:020d}.parquet"

    if write_delta:
        # ---- delta path: write ONLY this window's winners --------------
        data_tbl = upsert_data.sort_by([("doc_id", "ascending")])
        files = old_files + [data_name]
        # live count without touching payloads: |old_live ∖ touched| + |upserts|
        old_live = pc.unique(key_ids)
        if old_tomb_ids.num_rows:
            old_live = old_live.filter(
                pc.invert(pc.is_in(old_live, value_set=old_tomb_ids["doc_id"].combine_chunks()))
            )
        # first_wins: only truly-new docs count as touched (existing docs
        # are immutable, their winners were filtered out of upsert_data)
        touched = (
            upsert_data["doc_id"].combine_chunks()
            if mode == "first_wins"
            else winners["doc_id"].combine_chunks()
        )
        touched_live = int(
            pc.sum(pc.cast(pc.is_in(old_live, value_set=touched), pa.int64())).as_py() or 0
        )
        row_count = len(old_live) - touched_live + upsert_data.num_rows
        # old checksums carried forward (recompute only for manifests
        # predating per-file checksums)
        while len(old_checksums) < len(old_files):
            old_checksums.append(sha256_file(pdir / old_files[len(old_checksums)]))
        # as-of history: append this window's delete EVENTS (the tombstone
        # snapshot forgets them on resurrect/overwrite); floor freezes at
        # the last fold's watermark
        delete_logs = list(manifest.delete_logs) if manifest else []
        delete_log_lsns = (
            file_window_ends(delete_logs, manifest.delete_log_lsns) if manifest else []
        )
        if deletes.num_rows:
            delete_logs = delete_logs + [dlog_name]
            delete_log_lsns = delete_log_lsns + [last_lsn]
        file_lsns = file_window_ends(old_files, manifest.file_lsns if manifest else []) + [last_lsn]
        history_floor = (
            manifest.history_floor
            if manifest and manifest.history_floor != -2
            else watermark
        )
        # ---- maintained aggregates, incremental update ------------------
        # new = prev − stats(old values of touched∩old-live docs)
        #            + stats(values of this window's surviving upserts).
        # Resurrections: not in old-live → no sub, in upserts → add. Deletes
        # of non-live docs: neither side. first_wins: touched = new docs
        # only, so sub is structurally empty (existing docs immutable).
        agg_counts, agg_sums, agg_bounds = _tracked_aggs_delta(
            pdir, old_files, registry, manifest, touched, old_tomb_ids,
            tomb_table, upsert_data, track_value_counts, track_group_sums,
            track_bounds,
        )
    else:
        # ---- fold path: merge base + deltas + this window into one base
        tables = [
            registry.resolve_table(pq.read_table(pdir / f), fill_null_defaults=False).select(lake_cols)
            for f in old_files
        ] + [upsert_data]
        tomb_arr = tomb_table["doc_id"].combine_chunks() if tomb_table.num_rows else None
        data_tbl = merge_live(tables, tomb_arr)
        files = [data_name]
        old_checksums = []
        row_count = data_tbl.num_rows
        # a RE-fold squashes history: as-of below it is unanswerable and
        # prior delete logs are GC'd. A FIRST write (no prior manifest) is
        # a fold of nothing — state before it was empty, which the as-of
        # lsn filter reproduces exactly, so no floor (-1). Its window's
        # delete WINNERS do get a log: every base row is then a window-1
        # winner, so the change feed (read_changes) is exact from any
        # ``since`` for this partition — without the log, first-window
        # deletes would be invisible once a later upsert erased their
        # tombstone entry.
        if manifest is None and deletes.num_rows:
            delete_logs = [dlog_name]
            delete_log_lsns = [last_lsn]
        else:
            delete_logs = []
            delete_log_lsns = []
        file_lsns = [last_lsn]
        history_floor = last_lsn if manifest else -1
        # fold: the full live state is in hand — recount directly
        # (self-healing: any drift in the incremental path is erased here)
        agg_counts = {c: _value_counts_dict(data_tbl[c]) for c in track_value_counts}
        agg_sums = {f"{g}|{v}": _group_stats_dict(data_tbl, g, v)
                    for g, v in track_group_sums}
        agg_bounds = {c: _bounds_of(data_tbl[c]) for c in track_bounds}

    # phase 1: deterministic files (tmp + atomic rename to tolerate concurrent retries)
    import os
    import uuid

    to_write = [(data_name, data_tbl), (tomb_name, tomb_table)]
    if dlog_name in delete_logs:
        to_write.append((dlog_name, deletes.select(["doc_id", "lsn"])))
    for name, tbl in to_write:
        tmp = pdir / f".tmp-{uuid.uuid4().hex}"
        pq.write_table(tbl, tmp, compression="snappy")
        os.replace(tmp, pdir / name)
    # phase 2: atomic manifest commit (+ GC of superseded files).
    # Harshest failpoint: data files already renamed into place, manifest
    # not yet committed — a retry must treat them as orphans and redo
    maybe_kill("apply_commit")
    digest = sha256_file(pdir / data_name)
    checksums = old_checksums + [digest] if write_delta else [digest]
    commit_manifest(
        lake_dir,
        PartitionManifest(
            partition=pid,
            last_lsn=last_lsn,
            files=files,
            tombstone_file=tomb_name,
            schema_version=latest.version,
            sha256_checksum=checksums[0],
            file_checksums=checksums,
            row_count=row_count,
            tombstone_count=tomb_table.num_rows,
            delete_logs=delete_logs,
            file_lsns=file_lsns,
            delete_log_lsns=delete_log_lsns,
            history_floor=history_floor,
            agg_counts=agg_counts,
            agg_sums=agg_sums,
            agg_bounds=agg_bounds,
            # a delta window leaves the clustered base untouched — the flag
            # rides along; a fold rewrites the base doc_id-sorted — reset
            cluster_by=(manifest.cluster_by if write_delta and manifest else None),
        ),
    )
    return _metrics_row(
        pid,
        rows_in=rows_in,
        late_dropped=late_dropped,
        upserts=upserts.num_rows,
        deletes=deletes.num_rows,
        row_count=row_count,
        tombstone_count=tomb_table.num_rows,
        last_lsn=last_lsn,
        schema_version=latest.version,
    )


def ingest_change_log(
    log_paths,  # parquet path(s), or an already-built change-stream Dataset
    lake_dir: str | Path,
    num_partitions: int = 32,
    registry: SchemaRegistry | None = None,
    # batch size trades combiner strength against measurable parallelism:
    # wider batches collapse more superseded events map-side (at 256k rows
    # over the bench's 200k-doc space the whole log nearly collapses and the
    # remaining job is too small to scale), 64k keeps the shuffle realistic
    # for corpora where docs >> batch rows — the 100 TB regime.
    batch_size: int = 65_536,
    resolve_concurrency: int | None = None,
    shuffle: str = "hash",
    mode: str = "last_wins",
    delta: bool = True,
    compact_threshold: int = 8,
    skip_sources: list[str] | None = None,
    track_value_counts: tuple | None = None,
    track_group_sums: tuple | None = None,
    track_bounds: tuple | None = None,
    constraints: list[dict] | None = None,
    rejects_out=None,
) -> pa.Table:
    """Run one ingest over a change log; returns per-partition metrics.

    ``constraints`` is a reject-rule list (``stages.filters`` shape, or
    ``config.filter_yaml_to_rules`` output): violating events are gated
    out BEFORE the shuffle — as if never sent, so last-wins is computed
    over valid events only — and, with ``rejects_out``, side-written to a
    dead-letter parquet dir with ``_reject_reason`` lineage in the same
    pass (see ``cdc.gate`` for why the DLQ is a rebuildable view rather
    than a committed table).

    ``track_value_counts=(col, ...)`` maintains per-partition live
    value→count aggregates in the manifests (bounded-cardinality lake
    columns only); :func:`read_live_value_counts` then answers a lake-wide
    GROUP BY from manifests alone. The default ``None`` INHERITS the
    tracked set from the lake's existing manifests, so follow-on windows
    (tail sensor, replays, other callers) keep an established view fresh
    without re-stating it; pass ``()`` to explicitly drop the view (an
    untracked window would make it stale = silently wrong; the next
    tracked window recounts, self-healing).

    ``track_bounds=(col, ...)`` maintains per-partition ZONE MAPS
    (conservative live [lo, hi] per orderable-primitive column, widen-only
    on deltas, exact on folds) that ``plan_filtered_read`` uses to prune
    partitions for RANGE and equality predicates, and
    :func:`read_live_bounds` answers lake-wide from manifests alone. Same
    ``None``-inherits / ``()``-drops discipline as the count views.

    Streams: read → resolve/partition → shuffle-by-pid → per-partition apply.
    Never materializes the log on the driver; the only driver-side data is
    the P-row metrics table. Ray must already be initialized by the caller.
    """
    import ray.data

    registry = registry or sequence_registry()
    registry_json = registry.to_json()
    # manifest agg_sums keys are encoded "group|value"; a '|' inside a
    # column name would be mis-split by every maintenance job — refuse it
    # here rather than deferring the failure to compaction
    for name in (*(track_value_counts or ()),
                 *(c for gv in (track_group_sums or ()) for c in gv)):
        if "|" in name:
            raise ValueError(
                f"tracked column name {name!r} contains '|' (reserved as the "
                f"manifest agg_sums key separator)")
    Path(lake_dir).mkdir(parents=True, exist_ok=True)
    from mex_extractors_ray.cdc.manifest import writer_lock

    if constraints:
        from mex_extractors_ray.cdc.gate import gate_change_log

        # gate outside the lock: it only reads the log (and rebuilds the
        # caller-owned DLQ dir); the lake is untouched until the apply
        log_paths = gate_change_log(log_paths, constraints, rejects_out)
    elif rejects_out is not None:
        raise ValueError("rejects_out given without constraints")
    with writer_lock(lake_dir, "ingest"):
        return _locked_ingest(
            log_paths, lake_dir, num_partitions, registry, registry_json,
            batch_size, resolve_concurrency, shuffle, mode, delta,
            compact_threshold, skip_sources, track_value_counts,
            track_group_sums, track_bounds,
        )


def _locked_ingest(log_paths, lake_dir, num_partitions, registry,
                   registry_json, batch_size, resolve_concurrency, shuffle,
                   mode, delta, compact_threshold, skip_sources,
                   track_value_counts, track_group_sums,
                   track_bounds=None) -> pa.Table:
    Path(lake_dir, "_registry.json").write_text(registry_json)

    # partition-count guard: pid = hash(doc_id) % P is part of the lake's
    # identity — ingesting an existing lake with a different P would route
    # keys to the WRONG partition state and silently fork doc histories.
    # P changes go through compact.repartition_lake, which rewrites state
    # and this metadata together.
    import json as _json

    from mex_extractors_ray.cdc.manifest import atomic_write_bytes

    meta_path = Path(lake_dir, "_lake_meta.json")
    splits: dict[int, int] = {}
    if meta_path.exists():
        meta = _json.loads(meta_path.read_text())
        if meta.get("num_partitions") != num_partitions:
            raise ValueError(
                f"lake at {lake_dir} was built with num_partitions="
                f"{meta.get('num_partitions')}, got {num_partitions}; "
                "use cdc.compact.repartition_lake to change the layout"
            )
        # apply-mode guard: the merge semantics are part of the lake's
        # identity — folding append windows into a last_wins lake (or any
        # other mix) silently corrupts doc histories. Pre-guard lakes
        # (no recorded mode) adopt this ingest's mode first-write-wins.
        if meta.get("mode") is None:
            meta["mode"] = mode
            atomic_write_bytes(meta_path, _json.dumps(meta).encode())
        elif meta["mode"] != mode:
            raise ValueError(
                f"lake at {lake_dir} was built with mode={meta['mode']!r}, "
                f"got {mode!r}; apply modes cannot be mixed on one lake")
        # the depth table is part of the lake's routing identity — the
        # ingest inherits it (a caller never passes splits explicitly;
        # they change only through compact.split_partition's atomic flip)
        splits = _norm_splits(meta.get("splits"))
    else:
        atomic_write_bytes(meta_path, _json.dumps(
            {"num_partitions": num_partitions, "mode": mode}).encode())

    # the apply only needs co-location by pid, not global order (it
    # re-sorts by (doc_id, lsn) inside the group) — hash shuffle skips
    # the sample + sorted exchange of the sort-based shuffle. The
    # runtime.hash_shuffle context owns the knobs (A/B-measured 1
    # aggregator/CPU cap, half-cluster reservation deadlock guard) and
    # restores them on exit — this function fully materializes its (tiny)
    # metrics output before returning, so nothing leaks.
    import contextlib

    from mex_extractors_ray import runtime as _rt

    # K = live PHYSICAL partition count (= P until a split raises a base
    # partition's depth) — the shuffle width and the map_groups group count
    K = len(live_physical_pids(num_partitions, splits)) if splits else num_partitions
    shuffle_ctx = (
        _rt.hash_shuffle(max_aggregators=K)
        if shuffle == "hash"
        else contextlib.nullcontext()
    )
    if track_value_counts is None or track_group_sums is None or track_bounds is None:
        # inherit: continue whatever views the lake already maintains
        inh_counts: set[str] = set()
        inh_sums: set[tuple[str, str]] = set()
        inh_bounds: set[str] = set()
        for pid in _manifested_pids(lake_dir):
            m = read_manifest(lake_dir, pid)
            if m:
                inh_counts.update(m.agg_counts or {})
                inh_sums.update(
                    tuple(k.split("|", 1)) for k in (m.agg_sums or {})
                )
                inh_bounds.update(m.agg_bounds or {})
        if track_value_counts is None:
            track_value_counts = tuple(sorted(inh_counts))
        if track_group_sums is None:
            track_group_sums = tuple(sorted(inh_sums))
        if track_bounds is None:
            track_bounds = tuple(sorted(inh_bounds))

    with shuffle_ctx:
        metrics = _run_ingest(
            log_paths, lake_dir, num_partitions, registry_json, batch_size,
            resolve_concurrency, mode, delta, compact_threshold, skip_sources,
            track_value_counts, track_group_sums, track_bounds,
            splits=splits, num_shards=K,
        )
        # lake-level completion record: written only after EVERY partition
        # committed. A crash mid-ingest leaves some manifests ahead of this
        # record — the signal repartition_lake uses to detect a partial
        # commit (per-partition watermarks legitimately differ even when
        # fully committed: each is the max LSN of its OWN events).
        from mex_extractors_ray.state.chaos import maybe_kill

        # driver-side failpoint: every partition committed, lake-level
        # completion record NOT yet written — the flock lease dies with
        # the process (kernel-released) and a full re-run must converge
        maybe_kill("ingest_state_commit")
        mx = pc.max(metrics["last_lsn"]).as_py()
        prior = read_ingest_state(lake_dir)
        completed = max(int(mx if mx is not None else -1), prior)
        from mex_extractors_ray.cdc.manifest import atomic_write_bytes as _awb

        import json as _j

        _awb(Path(lake_dir, "_ingest_state.json"),
             _j.dumps({"completed_lsn": completed}).encode())
        return metrics


def _run_ingest(
    log_paths, lake_dir, num_partitions, registry_json, batch_size,
    resolve_concurrency, mode="last_wins", delta=True, compact_threshold=8,
    skip_sources=None, track_value_counts=(), track_group_sums=(),
    track_bounds=(), splits=None, num_shards=None,
) -> pa.Table:
    import ray.data

    # a change stream may arrive as an already-built Dataset (the
    # replicator feeds another lake's change feed straight in) — same
    # semantics, no staging write
    ds = (log_paths if isinstance(log_paths, ray.data.Dataset)
          else ray.data.read_parquet(log_paths))
    # resolve runs as stateless tasks on the shared (pre-warmed) worker
    # pool: the per-call state (a parsed registry) is microseconds to
    # rebuild, and tasks scale elastically with cluster CPUs where a fixed
    # actor pool would cap this stage and break scaling efficiency. Actor
    # pools are reserved for stages with real per-actor state (enrichers,
    # broadcast joins, ANN — see stages/).
    kwargs = {"concurrency": resolve_concurrency} if resolve_concurrency else {}
    splits = _norm_splits(splits)
    num_shards = num_shards or (
        len(live_physical_pids(num_partitions, splits)) if splits else num_partitions
    )
    ds = ds.map_batches(
        functools.partial(
            resolve_and_partition, registry_json=registry_json,
            num_partitions=num_partitions, mode=mode, skip_sources=skip_sources,
            splits=splits,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        **kwargs,
    )
    # CORRECTNESS CONTRACT: map_groups calls the function once per complete
    # group (Ray Data guarantee) — the watermark logic in apply_partition
    # depends on never seeing one pid's events split across two calls in the
    # same run. Size num_partitions so one partition's events per ingest
    # window stay well under the block-size ceiling (at 100 TB: raise P,
    # then `repartition_lake` — never lower P to chase bigger tasks).
    fn = functools.partial(
        apply_partition, lake_dir=str(lake_dir), registry_json=registry_json, mode=mode,
        delta=delta, compact_threshold=compact_threshold,
        track_value_counts=tuple(track_value_counts),
        track_group_sums=tuple(tuple(p) for p in track_group_sums),
        track_bounds=tuple(track_bounds),
    )
    try:
        # shuffle on `_shard` (bijective pid relabeling) — one group per
        # live physical pid, and no aggregator bucket is empty
        grouped = ds.groupby("_shard", num_partitions=num_shards)
    except TypeError:  # older Ray without num_partitions
        grouped = ds.groupby("_shard")
    metrics_ds = grouped.map_groups(fn, batch_format="pyarrow")
    out = pa.Table.from_pylist(metrics_ds.take_all(), schema=METRICS_SCHEMA)
    return out.sort_by([("partition", "ascending")])


def read_ingest_state(lake_dir: str | Path) -> int:
    """LSN through which the last ingest FULLY committed (-1 if none)."""
    import json as _j

    try:
        return int(_j.loads(Path(lake_dir, "_ingest_state.json").read_text())["completed_lsn"])
    except (FileNotFoundError, KeyError, ValueError):
        return -1


def lake_files(lake_dir: str | Path) -> list[str]:
    """All committed data files (manifest-listed only — orphans are invisible)."""
    files: list[str] = []
    for mpath in sorted(Path(lake_dir).glob("partition=*/manifest.json")):
        pid = int(mpath.parent.name.split("=")[1])
        m = read_manifest(lake_dir, pid)
        if m:
            files.extend(str(mpath.parent / f) for f in m.files)
    return files


def _manifested_pids(lake_dir: str | Path) -> list[int]:
    """Partition ids every READER enumerates: manifested dirs, restricted
    to the meta's live physical set once any base partition has split —
    superseded split parents (and a crashed split's not-yet-flipped
    children) have manifests on disk but are invisible by construction."""
    globbed = sorted(
        int(p.parent.name.split("=")[1])
        for p in Path(lake_dir).glob("partition=*/manifest.json")
    )
    try:
        meta = load_lake_meta(lake_dir)
    except FileNotFoundError:
        return globbed  # hand-built lake (tests) — no routing identity
    # filter even when splits == {}: a crashed FIRST split leaves child
    # manifests (ids ≥ P) on disk with the depth table never flipped —
    # they must stay invisible until a vacuum sweeps them
    live = set(live_physical_pids(meta["num_partitions"], meta["splits"]))
    return [p for p in globbed if p in live]


def _lake_read_cols(registry: SchemaRegistry,
                    columns: list[str] | None) -> tuple[list[str], list[str]]:
    """(columns to READ, columns to RETURN) for a lake read. The merge
    always needs (doc_id, lsn) even when the caller projected them away;
    unknown columns fail fast."""
    all_cols = [n for n, _ in registry.latest.fields] + ["lsn"]
    if columns is None:
        return all_cols, all_cols
    unknown = [c for c in columns if c not in all_cols]
    if unknown:
        raise KeyError(f"unknown lake column(s) {unknown}; have {all_cols}")
    read_cols = list(dict.fromkeys([*columns, "doc_id", "lsn"]))
    return read_cols, list(columns)


def read_lake(lake_dir: str | Path, registry: SchemaRegistry | None = None,
              columns: list[str] | None = None):
    """The committed lake state as a ray.data.Dataset: one task per
    partition, each doing the partition-LOCAL delta merge (last-wins +
    tombstone anti-join) — distribution without a shuffle, because doc_ids
    never cross partitions.

    ``columns`` is a PROJECTION PUSHDOWN: only the requested columns are
    read from the parquet files (plus doc_id/lsn internally for the
    merge). The tokens payload dominates lake bytes, so a metadata-only
    consumer must pass ``columns=`` — the read then costs key bytes, not
    payload bytes."""
    import ray.data

    registry = registry or sequence_registry()
    registry_json = registry.to_json()
    cols, out_cols = _lake_read_cols(registry, columns)
    pids = _manifested_pids(lake_dir)
    schema = pa.schema([*registry.latest.to_arrow(), pa.field("lsn", pa.int64())])
    if not pids:
        return ray.data.from_arrow(schema.empty_table().select(out_cols))
    lake = str(lake_dir)

    def load(batch: dict) -> pa.Table:
        reg = SchemaRegistry.from_json(registry_json)
        out = []
        for pid in batch["item"]:
            m = read_manifest(lake, int(pid))
            if m:
                out.append(_read_partition_live(
                    partition_dir(lake, int(pid)), m, reg, cols).select(out_cols))
        return pa.concat_tables(out) if out else pa.schema(
            [*reg.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table().select(out_cols)

    return ray.data.from_items(pids).map_batches(load, batch_size=1, batch_format="numpy")


def read_lake_arrow(lake_dir: str | Path, registry: SchemaRegistry | None = None,
                    columns: list[str] | None = None) -> pa.Table:
    """Driver-side materialized lake state, sorted by doc_id (tests/oracles).
    Same per-partition delta merge — and the same ``columns`` projection
    pushdown — as :func:`read_lake`."""
    registry = registry or sequence_registry()
    cols, out_cols = _lake_read_cols(registry, columns)
    parts = []
    for pid in _manifested_pids(lake_dir):
        m = read_manifest(lake_dir, pid)
        if m:
            parts.append(_read_partition_live(
                partition_dir(lake_dir, pid), m, registry, cols).select(out_cols))
    if not parts:
        return pa.schema(
            [*registry.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table().select(out_cols)
    sort_key = "doc_id" if "doc_id" in out_cols else out_cols[0]
    return pa.concat_tables(parts).sort_by([(sort_key, "ascending")])


def _read_partition_asof(pdir: Path, manifest: PartitionManifest,
                         registry: SchemaRegistry, cols: list[str],
                         lsn: int) -> pa.Table:
    """Partition state AS OF ``lsn`` (exact at ingest-window boundaries):
    last-wins over committed rows with ``lsn <= X``, minus docs whose last
    delete EVENT at or below X is newer than their last surviving row. The
    tombstone snapshot is not consulted — it forgets history; the
    append-only delete logs carry it."""
    # floor semantics: -1 = full history (first write was this partition's
    # base, nothing before it existed); -2 = unknown provenance (pre-feature
    # or compactor manifest) -> only the current watermark is answerable
    floor = manifest.history_floor if manifest.history_floor != -2 else manifest.last_lsn
    if floor != -1 and lsn < floor:
        raise ValueError(
            f"read_lake_asof: partition {manifest.partition} history floor is "
            f"{floor} (a fold squashed earlier state); cannot answer as-of {lsn}"
        )
    cutoff = pa.scalar(lsn, pa.int64())
    tables = []
    for f in manifest.files:
        t = registry.resolve_table(pq.read_table(pdir / f), fill_null_defaults=False).select(cols)
        tables.append(t.filter(pc.less_equal(t["lsn"], cutoff)))
    if not tables:
        return pa.schema(
            [*registry.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table().select(cols)
    live = _reduce_per_doc(pa.concat_tables(tables), "last_wins")
    dl = [pq.read_table(pdir / f) for f in manifest.delete_logs
          if (pdir / f).exists()]
    if dl and live.num_rows:
        d = pa.concat_tables(dl)
        d = d.filter(pc.less_equal(d["lsn"], cutoff))
        if d.num_rows:
            d = _reduce_per_doc(d, "last_wins")
            idx = pc.index_in(live["doc_id"], value_set=d["doc_id"].combine_chunks())
            del_lsn = d["lsn"].combine_chunks().take(idx)
            keep = pc.or_kleene(
                pc.is_null(del_lsn), pc.less(del_lsn, live["lsn"].combine_chunks())
            )
            live = live.filter(pc.fill_null(keep, True))
    return live


def read_lake_asof_arrow(lake_dir: str | Path, lsn: int,
                         registry: SchemaRegistry | None = None) -> pa.Table:
    """Driver-side time-travel read, sorted by doc_id (tests/oracles).

    Semantics: the committed state considering only events with
    ``lsn <= X`` — EXACT when X is an ingest-window boundary (only window
    winners are persisted, so intra-window supersessions below a boundary
    were never visible at any boundary). Horizon: a fold/compaction
    squashes history; as-of below a partition's ``history_floor`` raises.
    The reference has no lake, but this is the distributed analog of its
    run-timestamp-versioned re-extraction (``mex/extractors/pipeline/
    base.py:51-105`` sensor watermarks)."""
    registry = registry or sequence_registry()
    cols = [n for n, _ in registry.latest.fields] + ["lsn"]
    parts = []
    for pid in _manifested_pids(lake_dir):
        m = read_manifest(lake_dir, pid)
        if m:
            parts.append(
                _read_partition_asof(partition_dir(lake_dir, pid), m, registry, cols, lsn)
            )
    if not parts:
        return pa.schema(
            [*registry.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table()
    return pa.concat_tables(parts).sort_by([("doc_id", "ascending")])


def read_lake_asof(lake_dir: str | Path, lsn: int,
                   registry: SchemaRegistry | None = None):
    """Distributed time-travel read: one task per partition (same no-shuffle
    shape as :func:`read_lake`), each doing the partition-local as-of merge."""
    import ray.data

    registry = registry or sequence_registry()
    registry_json = registry.to_json()
    cols = [n for n, _ in registry.latest.fields] + ["lsn"]
    pids = _manifested_pids(lake_dir)
    if not pids:
        schema = pa.schema([*registry.latest.to_arrow(), pa.field("lsn", pa.int64())])
        return ray.data.from_arrow(schema.empty_table())
    lake = str(lake_dir)

    def load(batch: dict) -> pa.Table:
        reg = SchemaRegistry.from_json(registry_json)
        out = []
        for pid in batch["item"]:
            m = read_manifest(lake, int(pid))
            if m:
                out.append(
                    _read_partition_asof(partition_dir(lake, int(pid)), m, reg, cols, lsn)
                )
        return pa.concat_tables(out) if out else pa.schema(
            [*reg.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table().select(cols)

    return ray.data.from_items(pids).map_batches(load, batch_size=1, batch_format="numpy")

# ---------------------------------------------------------------------------
# change data feed — incremental consumption of the lake's own history
# ---------------------------------------------------------------------------


def _changes_schema(registry: SchemaRegistry) -> pa.Schema:
    return pa.schema(
        [*registry.latest.to_arrow(), pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
    )


def _read_partition_changes(pdir: Path, manifest: PartitionManifest,
                            registry: SchemaRegistry, cols: list[str],
                            since: int) -> pa.Table:
    """All change effects of one partition with ``lsn > since``, at
    ingest-window granularity (window winners; intra-window supersessions
    were never committed): upserts from delta files, deletes from the
    append-only delete logs — each row tagged ``op`` in {upsert, delete},
    delete rows carrying null payload columns.

    File selection is manifest-only (the ``file_lsns`` zone map): a file
    whose window end is ≤ ``since`` is never opened, so a tail consumer
    polling a 100-TB lake reads bytes ∝ its lag, not lake size.

    Horizon: a fold squashes window winners into the base (and fold-window
    delete events have no log), so ``since`` must be ≥ the partition's feed
    floor — the newest fold's watermark."""
    ends = file_window_ends(manifest.files, manifest.file_lsns)
    floor = manifest.history_floor
    if floor == -2:
        feed_floor = manifest.last_lsn
    elif floor == -1:
        # never re-folded: every base row is a first-window winner and the
        # first window's delete winners have a log — exact from any since
        feed_floor = -1
    else:
        feed_floor = floor
    if since < feed_floor:
        raise ValueError(
            f"read_changes: partition {manifest.partition} feed floor is "
            f"{feed_floor} (a fold squashed earlier windows); cannot serve "
            f"changes since {since}"
        )
    out_schema = _changes_schema(registry)
    cutoff = pa.scalar(since, pa.int64())
    parts = []
    ups = []
    for f, end in zip(manifest.files, ends):
        if end <= since:
            continue  # pruned from the manifest alone — file never opened
        t = registry.resolve_table(pq.read_table(pdir / f), fill_null_defaults=False).select(cols)
        t = t.filter(pc.greater(t["lsn"], cutoff))
        if t.num_rows:
            ups.append(t)
    if ups:
        u = pa.concat_tables(ups)
        parts.append(
            u.append_column("op", pa.array(["upsert"] * u.num_rows)).cast(out_schema)
        )
    dls = []
    for f, end in zip(manifest.delete_logs,
                      file_window_ends(manifest.delete_logs, manifest.delete_log_lsns)):
        if end <= since or not (pdir / f).exists():
            continue
        d = pq.read_table(pdir / f)
        d = d.filter(pc.greater(d["lsn"], cutoff))
        if d.num_rows:
            dls.append(d)
    if dls:
        d = pa.concat_tables(dls)
        arrays = []
        for field in out_schema:
            if field.name == "doc_id":
                arrays.append(d["doc_id"].combine_chunks().cast(field.type))
            elif field.name == "lsn":
                arrays.append(d["lsn"].combine_chunks())
            elif field.name == "op":
                arrays.append(pa.array(["delete"] * d.num_rows))
            else:
                arrays.append(pa.nulls(d.num_rows, field.type))
        parts.append(pa.Table.from_arrays(arrays, schema=out_schema))
    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables(parts)


def read_changes_arrow(lake_dir: str | Path, since: int,
                       registry: SchemaRegistry | None = None) -> pa.Table:
    """Driver-side change feed, sorted by (lsn, doc_id) — tests/oracles."""
    registry = registry or sequence_registry()
    cols = [n for n, _ in registry.latest.fields] + ["lsn"]
    parts = []
    for pid in _manifested_pids(lake_dir):
        m = read_manifest(lake_dir, pid)
        if m:
            parts.append(
                _read_partition_changes(partition_dir(lake_dir, pid), m, registry, cols, since)
            )
    if not parts:
        return _changes_schema(registry).empty_table()
    return pa.concat_tables(parts).sort_by(
        [("lsn", "ascending"), ("doc_id", "ascending")]
    )


def read_changes(lake_dir: str | Path, since: int,
                 registry: SchemaRegistry | None = None):
    """Distributed change feed (Delta-CDF analog): one task per partition,
    no shuffle; each task prunes its files by the manifest ``file_lsns``
    zone map before opening anything. The downstream-consumer primitive:
    incremental ETL off the lake reads bytes ∝ lag."""
    import ray.data

    registry = registry or sequence_registry()
    registry_json = registry.to_json()
    cols = [n for n, _ in registry.latest.fields] + ["lsn"]
    pids = _manifested_pids(lake_dir)
    if not pids:
        return ray.data.from_arrow(_changes_schema(registry).empty_table())
    lake = str(lake_dir)

    def load(batch: dict) -> pa.Table:
        reg = SchemaRegistry.from_json(registry_json)
        out = []
        for pid in batch["item"]:
            m = read_manifest(lake, int(pid))
            if m:
                out.append(
                    _read_partition_changes(partition_dir(lake, int(pid)), m, reg, cols, since)
                )
        return pa.concat_tables(out) if out else _changes_schema(reg).empty_table()

    return ray.data.from_items(pids).map_batches(load, batch_size=1, batch_format="numpy")

# ---------------------------------------------------------------------------
# point lookups — key-value GET against the lake
# ---------------------------------------------------------------------------


def lake_num_partitions(lake_dir: str | Path) -> int:
    """The lake's committed partition count (part of its identity — the
    ingest guard refuses mismatches, so this is authoritative)."""
    import json as _json

    meta_path = Path(lake_dir, "_lake_meta.json")
    try:
        return int(_json.loads(meta_path.read_text())["num_partitions"])
    except (FileNotFoundError, KeyError, ValueError) as e:
        raise ValueError(
            f"lake at {lake_dir} has no _lake_meta.json — cannot route point "
            "lookups without the partition count"
        ) from e


def lookup_docs(lake_dir: str | Path, doc_ids,
                registry: SchemaRegistry | None = None) -> pa.Table:
    """Key-value GET: the live row for each requested doc_id (absent /
    deleted ids simply don't appear), sorted by doc_id.

    Routing reuses the ingest's own hash partitioner, so only the
    partitions that can hold a requested key are opened — cost ∝ touched
    partitions (≤ |ids|), never lake size. Within a partition, the
    parquet read pushes an ``in`` predicate down to row-group stats (lake
    files are doc_id-sorted at write, so row-group pruning is tight), then
    the standard last-wins + tombstone merge runs on the surviving rows
    only. The driver-side shape is intentional: a GET serves one caller;
    bulk retrieval belongs to read_lake + is_in (streamed)."""
    registry = registry or sequence_registry()
    cols = [n for n, _ in registry.latest.fields] + ["lsn"]
    if not isinstance(doc_ids, (pa.Array, pa.ChunkedArray)):
        doc_ids = pa.array(list(doc_ids), pa.string())
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    doc_ids = doc_ids.drop_null()
    empty = pa.schema(
        [*registry.latest.to_arrow(), pa.field("lsn", pa.int64())]
    ).empty_table()
    if len(doc_ids) == 0:
        return empty
    meta = load_lake_meta(lake_dir)
    pids = route_keys(doc_ids, meta["num_partitions"], meta["splits"])
    parts = [empty]
    for pid in np.unique(pids):
        m = read_manifest(lake_dir, int(pid))
        if not m:
            continue
        pdir = partition_dir(lake_dir, int(pid))
        want = doc_ids.filter(pa.array(pids == pid))
        want_py = want.to_pylist()
        tabs = []
        for f in m.files:
            t = pq.read_table(pdir / f, filters=[("doc_id", "in", want_py)])
            if t.num_rows:
                tabs.append(registry.resolve_table(t, fill_null_defaults=False).select(cols))
        if not tabs:
            continue
        tomb_ids = None
        if m.tombstone_file and (pdir / m.tombstone_file).exists():
            tomb_ids = pq.read_table(
                pdir / m.tombstone_file, columns=["doc_id"]
            )["doc_id"].combine_chunks()
        parts.append(merge_live(tabs, tomb_ids))
    return pa.concat_tables(parts).sort_by([("doc_id", "ascending")])
