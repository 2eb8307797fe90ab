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
    lake_num_partitions,
)
from mex_extractors_ray.cdc.manifest import (
    PartitionManifest,
    partition_dir,
    read_manifest,
)
from mex_extractors_ray.hashing import assign_partitions
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


def plan_filtered_read(lake_dir: str | Path, column: str, op: str, value,
                       registry: SchemaRegistry | None = None) -> list[int]:
    """Partition ids a filtered read must open (the pruning plan).

    Prunes only where absence is PROVABLE: ``doc_id`` equality/membership
    via the ingest's hash partitioner; tracked columns (maintained live
    value counts) via the per-partition count maps. Everything else — range
    ops, untracked columns — scans all manifested partitions (row-group
    pushdown still applies inside)."""
    registry = registry or sequence_registry()
    _check_predicate(registry, column, op)
    pids = _manifested_pids(lake_dir)
    if op == "==":
        values = [value]
    elif op == "in":
        values = list(value)
    else:
        return pids
    if column == "doc_id":
        P = lake_num_partitions(lake_dir)
        want = {int(p) for p in np.unique(
            assign_partitions(pa.array([str(v) for v in values], pa.string()), P)
        )}
        return [p for p in pids if p in want]
    out = []
    for pid in pids:
        m = read_manifest(lake_dir, pid)
        if m is None:
            continue
        counts = (m.agg_counts or {}).get(column)
        if counts is None or any(str(v) in counts for v in values):
            out.append(pid)
    return out


def _read_partition_filtered(pdir: Path, manifest: PartitionManifest,
                             registry: SchemaRegistry, cols: list[str],
                             column: str, op: str, value) -> pa.Table:
    """One partition's live rows matching the predicate (sorted by doc_id).

    Keys (doc_id, lsn) are read for EVERY row of every file — supersession
    must stay visible — but the wide payload only for predicate-matching
    rows, via parquet ``filters`` pushdown when the file's schema carries
    the column, else a resolved in-memory mask (schema-evolution fallback:
    an old file misses an additive column, whose registry default still has
    to face the predicate)."""
    empty = pa.schema(
        [*registry.latest.to_arrow(), pa.field("lsn", pa.int64())]
    ).empty_table().select(cols)
    if not manifest.files:
        return empty
    pred = [(column, op, list(value) if op == "in" else value)]
    key_tabs, match_tabs = [], []
    for f in manifest.files:
        path = pdir / f
        key_tabs.append(pq.read_table(path, columns=["doc_id", "lsn"]))
        if column == "lsn" or column in pq.read_schema(path).names:
            mt = registry.resolve_table(pq.read_table(path, filters=pred))
            match_tabs.append(mt.select(cols))
        else:
            mt = registry.resolve_table(pq.read_table(path)).select(cols)
            mask = (pc.is_in(mt[column], value_set=pa.array(list(value)))
                    if op == "in" else _CMP[op](mt[column], value))
            match_tabs.append(mt.filter(pc.fill_null(mask, False)))
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


def read_lake_filtered_arrow(lake_dir: str | Path, column: str, op: str, value,
                             registry: SchemaRegistry | None = None) -> pa.Table:
    """Driver-side filtered lake read, sorted by doc_id (tests/oracles)."""
    registry = registry or sequence_registry()
    cols = [n for n, _ in registry.latest.fields] + ["lsn"]
    parts = [
        _read_partition_filtered(
            partition_dir(lake_dir, pid), m, registry, cols, column, op, value)
        for pid in plan_filtered_read(lake_dir, column, op, value, registry)
        if (m := read_manifest(lake_dir, pid))
    ]
    if not parts:
        return pa.schema(
            [*registry.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table().select(cols)
    return pa.concat_tables(parts).sort_by([("doc_id", "ascending")])


def read_lake_filtered(lake_dir: str | Path, column: str, op: str, value,
                       registry: SchemaRegistry | None = None):
    """Distributed filtered lake read: one task per SURVIVING partition
    (pruned partitions never become tasks), each doing the byte-minimal
    partition-local merge — the same no-shuffle shape as ``read_lake``."""
    import ray.data

    registry = registry or sequence_registry()
    registry_json = registry.to_json()
    cols = [n for n, _ in registry.latest.fields] + ["lsn"]
    pids = plan_filtered_read(lake_dir, column, op, value, registry)
    if not pids:
        schema = pa.schema([*registry.latest.to_arrow(), pa.field("lsn", pa.int64())])
        return ray.data.from_arrow(schema.empty_table().select(cols))
    lake = str(lake_dir)

    def load(batch: dict) -> pa.Table:
        reg = SchemaRegistry.from_json(registry_json)
        out = []
        for pid in batch["item"]:
            m = read_manifest(lake, int(pid))
            if m:
                out.append(_read_partition_filtered(
                    partition_dir(lake, int(pid)), m, reg, cols, column, op, value))
        return pa.concat_tables(out) if out else pa.schema(
            [*reg.latest.to_arrow(), pa.field("lsn", pa.int64())]
        ).empty_table().select(cols)

    return ray.data.from_items(pids).map_batches(
        load, batch_size=1, batch_format="numpy")
