"""Predicate-pushdown lake reads: partition pruning + byte-minimal merge.

The reference reads a source table in full and filters in Python
(``mex/extractors/filters.py:18-84``); at lake scale a filtered read must
instead skip bytes *before* they leave storage. Three cooperating levels,
each eliminating work before the next starts:

1. **Partition pruning.** For ``col == v`` / ``col IN (...)`` on a column the
   ingest maintains live value counts for (``track_value_counts``), a
   partition whose maintained count map holds none of the requested values
   has no matching live row — it is never opened (the maintained view
   doubles as a coarse zone map, O(P) manifest reads). ``doc_id`` equality
   instead routes through the ingest's own hash partitioner, same as
   :func:`~mex_extractors_ray.cdc.apply.lookup_docs`.
2. **Row-group pushdown.** Within a surviving partition the predicate is
   handed to ``pq.read_table(filters=...)`` so parquet row-group statistics
   prune at scan time (lake files are doc_id-sorted at write, and
   low-cardinality columns still carry selective row-group stats).
3. **Byte-minimal merge.** Last-wins winner determination needs only
   ``(doc_id, lsn)`` — a few bytes per row — while the wide ``tokens``
   payload dominates the table. So every file contributes its key columns
   in full (cheap, column-pruned) but its payload ONLY for rows that match
   the predicate. A winner whose payload row is absent failed the predicate
   and is dropped: exactly the post-merge filter, paid in key bytes instead
   of payload bytes. Bytes read ≈ keys + matching rows, never the lake.

Why pushdown into *delta* files is safe here and unsafe in the naive
design: filtering a delta at scan could resurrect an older version of a
doc whose newest row fails the predicate. Level 3 sidesteps that by
computing winners from the UNfiltered key stream — supersession is always
visible — and only fetching payloads through the filter.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.cdc.apply import (
    _manifested_pids,
    _reduce_per_doc,
)
from mex_extractors_ray.cdc.manifest import (
    PartitionManifest,
    partition_dir,
    read_manifest,
)
from mex_extractors_ray.schema import SchemaRegistry, sequence_registry

_CMP = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}
_OPS = set(_CMP) | {"in"}


def _check_predicate(registry: SchemaRegistry, column: str, op: str) -> None:
    if op not in _OPS:
        raise ValueError(f"unsupported op {op!r}; one of {sorted(_OPS)}")
    fields = dict(registry.latest.fields)
    typ = fields.get(column, pa.int64() if column == "lsn" else None)
    if typ is None:
        raise KeyError(f"unknown predicate column {column!r}; "
                       f"lake columns: {[*fields, 'lsn']}")
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        raise TypeError(f"cannot filter on list column {column!r}")


INHERIT = object()  # "caller didn't say" — inherit the recorded filter


def canon_where(where) -> list[list] | None:
    """JSON-round-trip-stable canon of a conjunctive predicate list (the
    grammar's single canonicalizer — the export manifest and the replica
    marker both record this shape, so an identity comparison between the
    recorded filter and a caller's spelling is exact regardless of
    tuple-vs-list spelling)."""
    if not where:
        return None
    return [[c, o, list(v) if isinstance(v, (list, tuple)) else v]
            for c, o, v in where]


def _normalize_predicates(column, op, value) -> list[tuple[str, str, object]]:
    """Accept a single (column, op, value) or a conjunctive list of such
    triples passed as ``column=[(c, o, v), ...]`` (op/value then unused)."""
    if isinstance(column, (list, tuple)) and op is None:
        preds = [tuple(p) for p in column]
        if not preds:
            raise ValueError("empty predicate list")
        return preds
    return [(column, op, value)]


def _count_probe_keys(values, typ) -> list[str] | None:
    """Probe keys canonicalized through the SAME cast the maintained count
    maps use (Arrow cast-to-string of the COLUMN's type): ``str(True)`` is
    ``'True'`` but the map key is ``'true'``; ``str(5.0)`` is ``'5.0'`` but
    an int64 column's key is ``'5'``. A probe value the column type cannot
    represent (e.g. 5.5 against int64) returns None → no pruning for this
    predicate (conservative; the row filter still applies downstream).
    Null probe values are dropped: equality with null matches no row."""
    try:
        arr = pa.array(values)
        if typ is not None and not arr.type.equals(typ):
            arr = arr.cast(typ)
        return [k for k in pc.cast(arr, pa.string()).to_pylist()
                if k is not None]
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError,
            ValueError, TypeError):
        return None


def plan_filtered_read(lake_dir: str | Path, column, op: str | None = None,
                       value=None,
                       registry: SchemaRegistry | None = None) -> list[int]:
    """Partition ids a filtered read must open (the pruning plan) — the
    INTERSECTION over all conjunct predicates of each one's surviving set.

    Prunes only where absence is PROVABLE: ``doc_id`` equality/membership
    via the ingest's hash partitioner; tracked columns (maintained live
    value counts) via the per-partition count maps; RANGE and equality
    predicates on zone-mapped columns (``track_bounds``) via the
    per-partition conservative [lo, hi] intervals. Everything else scans
    all manifested partitions (row-group pushdown still applies inside)."""
    pids, _ = _plan_with_manifests(lake_dir, column, op, value, registry)
    return pids


def _plan_with_manifests(lake_dir: str | Path, column, op: str | None = None,
                         value=None,
                         registry: SchemaRegistry | None = None):
    """(surviving pids, {pid: manifest}) — the manifests read for pruning
    are returned so the driver-side read does not parse every one twice."""
    registry = registry or sequence_registry()
    preds = _normalize_predicates(column, op, value)
    for c, o, _ in preds:
        _check_predicate(registry, c, o)
    fields = dict(registry.latest.fields)
    pids = _manifested_pids(lake_dir)
    keep = set(pids)
    manifests = {}
    for pid in pids:
        manifests[pid] = read_manifest(lake_dir, pid)
    for c, o, v in preds:
        values = [v] if o == "==" else (list(v) if o == "in" else None)
        if c == "doc_id" and values is not None:
            from mex_extractors_ray.cdc.apply import load_lake_meta, route_keys

            meta = load_lake_meta(lake_dir)
            keep &= {int(p) for p in np.unique(route_keys(
                pa.array([str(x) for x in values], pa.string()),
                meta["num_partitions"], meta["splits"],
            ))}
            continue
        if o == "!=":
            continue
        probe_keys = None
        if values is not None:
            probe_keys = _count_probe_keys(
                values, fields.get(c, pa.int64() if c == "lsn" else None))
        survive = set()
        for pid in pids:
            m = manifests[pid]
            if m is None:
                continue
            if c == "lsn":
                # free zone map: live lsn ≤ the partition watermark, so
                # upper-bounded ops prune from last_lsn alone ("recent
                # changes" queries skip cold partitions); no lower bound
                # is known unless lsn is bounds-tracked (checked below)
                hi = m.last_lsn
                passes = (o in ("<", "<=")
                          or (o == ">" and hi > v)
                          or (o == ">=" and hi >= v)
                          or (o == "==" and v <= hi)
                          or (o == "in" and any(x <= hi for x in values)))
                if not passes:
                    continue
            counts = (m.agg_counts or {}).get(c) if values is not None else None
            if counts is not None:
                # exact live counts: equality/membership prunes precisely —
                # but only on canonicalized probe keys (None = the probe
                # could not be expressed in the column's type: no pruning)
                if probe_keys is None or any(k in counts for k in probe_keys):
                    survive.add(pid)
                continue
            if c in (m.agg_bounds or {}):
                if _bounds_may_match(m.agg_bounds[c], o, v):
                    survive.add(pid)
                continue
            survive.add(pid)  # untracked: absence not provable
        keep &= survive
    surviving = [p for p in pids if p in keep]
    return surviving, manifests


def _bounds_may_match(bounds, op: str, value) -> bool:
    """Can any live value inside the conservative ``[lo, hi]`` zone map
    satisfy ``op value``? ``bounds is None`` = tracked, provably no live
    non-null value → nothing matches. Incomparable types (caller passed a
    string for an int column, mixed-era manifests): assume a match —
    pruning must stay provable."""
    if bounds is None:
        return False
    lo, hi = bounds
    try:
        if op == "==":
            return lo <= value <= hi
        if op == "in":
            return any(lo <= x <= hi for x in value)
        if op == "<":
            return lo < value
        if op == "<=":
            return lo <= value
        if op == ">":
            return hi > value
        if op == ">=":
            return hi >= value
    except TypeError:
        return True
    return True


def _apply_mask(t: pa.Table, column: str, op: str, value) -> pa.Table:
    mask = (pc.is_in(t[column], value_set=pa.array(list(value)))
            if op == "in" else _CMP[op](t[column], value))
    return t.filter(pc.fill_null(mask, False))


def _read_partition_filtered(pdir: Path, manifest: PartitionManifest,
                             registry: SchemaRegistry, cols: list[str],
                             preds: list[tuple]) -> pa.Table:
    """One partition's live rows matching ALL predicates (sorted by doc_id).

    Keys (doc_id, lsn) are read for EVERY row of every file — supersession
    must stay visible — but the wide payload only for predicate-matching
    rows, via parquet ``filters`` pushdown for every predicate whose column
    the file's schema carries (a flat filters list is a conjunction), with
    an in-memory residual mask for the rest (schema-evolution fallback: an
    old file misses an additive column, whose registry default still has to
    face the predicate)."""
    empty = pa.schema(
        [*registry.latest.to_arrow(), pa.field("lsn", pa.int64())]
    ).empty_table().select(cols)
    if not manifest.files:
        return empty
    # read set: requested columns plus any residual predicate columns
    need = list(dict.fromkeys([*cols, *(c for c, _, _ in preds)]))
    key_tabs, match_tabs = [], []
    for f in manifest.files:
        path = pdir / f
        key_tabs.append(pq.read_table(path, columns=["doc_id", "lsn"]))
        fnames = set(pq.read_schema(path).names)

        def _src(c: str) -> str | None:
            # lsn is a system column outside the registry; renamed data
            # columns resolve to their old spelling in pre-rename files
            return c if c == "lsn" else registry.source_name(c, fnames)

        push = [(_src(c), o, list(v) if o == "in" else v)
                for c, o, v in preds if _src(c) is not None]
        residual = [(c, o, v) for c, o, v in preds if _src(c) is None]
        fcols = [s for s in (_src(c) for c in need) if s is not None]
        mt = pq.read_table(path, columns=fcols, filters=push or None)
        mt = registry.resolve_table(mt, columns=need, fill_null_defaults=False)
        for c, o, v in residual:
            mt = _apply_mask(mt, c, o, v)
        match_tabs.append(mt.select(cols))
    matches = pa.concat_tables(match_tabs)
    if not matches.num_rows:
        return empty
    winners = _reduce_per_doc(pa.concat_tables(key_tabs), "last_wins")
    if manifest.tombstone_file and (pdir / manifest.tombstone_file).exists():
        tomb = pq.read_table(pdir / manifest.tombstone_file, columns=["doc_id"])
        if tomb.num_rows:
            winners = winners.filter(pc.invert(pc.is_in(
                winners["doc_id"], value_set=tomb["doc_id"].combine_chunks())))
    if not winners.num_rows:
        return empty
    # a match survives iff it IS its doc's winner: same doc_id AND same lsn
    idx = pc.index_in(matches["doc_id"], value_set=winners["doc_id"].combine_chunks())
    win_lsn = winners["lsn"].combine_chunks().take(idx)
    keep = pc.and_kleene(
        pc.is_valid(idx),
        pc.equal(matches["lsn"].combine_chunks(), win_lsn),
    )
    return matches.filter(pc.fill_null(keep, False)).sort_by(
        [("doc_id", "ascending")]
    )


def read_lake_filtered_arrow(lake_dir: str | Path, column, op: str | None = None,
                             value=None,
                             registry: SchemaRegistry | None = None,
                             columns: list[str] | None = None) -> pa.Table:
    """Driver-side filtered lake read, sorted by doc_id (tests/oracles).

    ``column`` may be a single column (with ``op``/``value``) or a
    conjunctive predicate list ``[(col, op, value), ...]``. ``columns``
    projects the output (pushdown: unrequested payload columns are never
    read, same contract as ``read_lake``)."""
    from mex_extractors_ray.cdc.apply import _lake_read_cols

    registry = registry or sequence_registry()
    preds = _normalize_predicates(column, op, value)
    cols, out_cols = _lake_read_cols(registry, columns)
    read_cols = list(dict.fromkeys([*cols, "doc_id", "lsn"]))
    pids, manifests = _plan_with_manifests(lake_dir, column, op, value, registry)
    parts = [
        _read_partition_filtered(
            partition_dir(lake_dir, pid), m, registry, read_cols, preds)
        for pid in pids
        if (m := manifests.get(pid))
    ]
    if not parts:
        return pa.schema(
            [*registry.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table().select(out_cols)
    return pa.concat_tables(parts).sort_by(
        [("doc_id", "ascending")]).select(out_cols)


def read_lake_filtered(lake_dir: str | Path, column, op: str | None = None,
                       value=None,
                       registry: SchemaRegistry | None = None,
                       columns: list[str] | None = None):
    """Distributed filtered lake read: one task per SURVIVING partition
    (pruned partitions never become tasks), each doing the byte-minimal
    partition-local merge — the same no-shuffle shape as ``read_lake``.
    Accepts a conjunctive predicate list and a ``columns`` projection, both
    pushed down (see :func:`read_lake_filtered_arrow`)."""
    import ray.data

    from mex_extractors_ray.cdc.apply import _lake_read_cols

    registry = registry or sequence_registry()
    registry_json = registry.to_json()
    preds = _normalize_predicates(column, op, value)
    cols, out_cols = _lake_read_cols(registry, columns)
    read_cols = list(dict.fromkeys([*cols, "doc_id", "lsn"]))
    pids = plan_filtered_read(lake_dir, column, op, value, registry)
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
                out.append(_read_partition_filtered(
                    partition_dir(lake, int(pid)), m, reg, read_cols, preds
                ).select(out_cols))
        return pa.concat_tables(out) if out else pa.schema(
            [*reg.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table().select(out_cols)

    return ray.data.from_items(pids).map_batches(
        load, batch_size=1, batch_format="numpy")


def delete_where(lake_dir: str | Path, where, registry: SchemaRegistry | None = None) -> dict:
    """Bulk predicate delete THROUGH the normal CDC path — the GDPR /
    right-to-be-forgotten maintenance op a training-data lake needs.

    Matching live docs (found by the PRUNED filtered read — zone maps /
    value counts skip partitions that provably hold no match) are turned
    into ordinary ``delete`` events at ``watermark + 1`` and streamed
    through :func:`ingest_change_log`: tombstones, the change feed,
    incremental exports, replicas and as-of history all see them as stock
    deletes — no side-channel state. Cost ∝ matching docs + surviving
    partitions, never lake size.

    Exactly-once across retries: a re-run after partial failure re-mints
    an LSN above the new max watermark; partitions that already committed
    have no matching LIVE docs left (the filtered read sees post-delete
    state), so only the unfinished partitions receive events — the op
    converges with no duplicate work. Returns
    ``{"matched": n, "lsn": lsn, "partitions": touched}``.
    """
    from mex_extractors_ray.cdc.apply import ingest_change_log, lake_num_partitions

    registry = registry or sequence_registry()
    lake = str(lake_dir)
    num_partitions = lake_num_partitions(lake)
    wm = -1
    for pid in _manifested_pids(lake):
        m = read_manifest(lake, pid)
        if m:
            wm = max(wm, m.last_lsn)
    lsn = wm + 1
    latest = registry.latest

    def to_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols: dict = {
            "lsn": pa.array(np.full(n, lsn, dtype=np.int64)),
            "op": pa.array(["delete"] * n),
            "doc_id": t["doc_id"],
        }
        for name, typ in latest.fields:
            if name != "doc_id":
                cols[name] = pa.nulls(n, typ)
        cols["schema_version"] = pa.array(
            np.full(n, registry.latest_version, dtype=np.int32))
        return pa.table(cols)

    ids = read_lake_filtered(lake, where, registry=registry, columns=["doc_id"])
    events = ids.map_batches(to_events, batch_format="pyarrow")
    metrics = ingest_change_log(events, lake, num_partitions=num_partitions,
                                registry=registry)
    deletes = int(pc.sum(metrics["deletes"]).as_py() or 0)
    touched = int(pc.sum(pc.cast(pc.greater(metrics["deletes"], 0),
                                 pa.int64())).as_py() or 0)
    return {"matched": deletes, "lsn": lsn, "partitions": touched}
