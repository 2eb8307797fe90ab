"""Single-process reference replayer — the correctness oracle.

Deliberately written in the reference's own style (plain dicts of rows,
sequential, no Ray, no vectorization — cf. the dict-shaped intermediates of
``mex/extractors/synopse/main.py:88-110`` and the first-seen ``seen`` sets of
``mex/extractors/synopse/transform.py:286-289``) so it is an *independent*
implementation of the CDC semantics:

- events applied strictly in LSN order (the analog of ``topological_sort``
  before load, ``mex/extractors/sorters.py:12-49``),
- last-LSN-wins per ``doc_id``; ``delete`` removes the row (and records a
  tombstone); a later ``insert``/``update`` resurrects it,
- events with the same LSN delivered twice are idempotent,
- per-event schema resolution to the registry's latest version.

The acceptance bar (BASELINE.json north_star) is byte-identical final table
state vs. this replayer, with per-row token-array equality — asserted in
tests/test_cdc_apply.py.
"""

from __future__ import annotations

import pyarrow as pa

from mex_extractors_ray.schema import SchemaRegistry, sequence_registry


def replay_reference(
    events: pa.Table,
    registry: SchemaRegistry | None = None,
    base: pa.Table | None = None,
    mode: str = "last_wins",
) -> tuple[pa.Table, dict[str, int]]:
    """Replay a change log sequentially; return (final_table, tombstones).

    ``final_table`` is sorted by doc_id with the registry's latest schema
    plus a trailing ``lsn`` column (the LSN that produced each row).
    ``tombstones`` maps doc_id -> delete LSN for docs whose latest event is a
    delete.
    """
    registry = registry or sequence_registry()
    latest = registry.latest
    field_names = [n for n, _ in latest.fields]

    state: dict[str, dict] = {}
    tombstones: dict[str, int] = {}
    if base is not None:
        for row in base.to_pylist():
            rec = dict(row)
            rec.setdefault("lsn", -1)
            for name, _ in latest.fields:
                if name not in rec or rec[name] is None:
                    rec[name] = latest.defaults.get(name)
            state[rec["doc_id"]] = rec

    rows = events.to_pylist()
    rows.sort(key=lambda r: r["lsn"])
    for row in rows:
        doc_id = row["doc_id"]
        if mode == "first_wins":
            # first-seen-immutable: later events (incl. deletes) are no-ops
            if row["op"] != "delete" and doc_id not in state:
                rec = {"lsn": row["lsn"]}
                for name, _ in latest.fields:
                    v = row.get(name)
                    rec[name] = latest.defaults.get(name) if v is None else v
                state[doc_id] = rec
            continue
        if row["op"] == "delete":
            state.pop(doc_id, None)
            tombstones[doc_id] = row["lsn"]
        elif mode == "patch":
            # column-level merge: patch overlays its NON-NULL columns onto
            # the live row; full rows (insert/update) replace it wholesale.
            # No default filling — "never set" stays null (defaults belong
            # to schema evolution, not to sparse updates).
            if row["op"] == "patch":
                rec = state.get(doc_id) or {n: None for n in field_names}
                rec = dict(rec)
                rec["doc_id"] = doc_id
                rec["lsn"] = row["lsn"]
                for name in field_names:
                    v = row.get(name)
                    if v is not None:
                        rec[name] = v
            else:
                rec = {name: row.get(name) for name in field_names}
                rec["lsn"] = row["lsn"]
            state[doc_id] = rec
            tombstones.pop(doc_id, None)
        elif mode == "append" and row["op"] == "update" and doc_id in state:
            # sequence-building CDC: update APPENDS onto the live row —
            # list columns concatenate, integer columns add, others
            # last-wins; insert (and an update with no live row) RESETS
            rec = dict(state[doc_id])
            rec["lsn"] = row["lsn"]
            for name, typ in latest.fields:
                if name == "doc_id":
                    continue
                v = row.get(name)
                if v is None:
                    v = latest.defaults.get(name)
                cur = rec.get(name)
                if pa.types.is_list(typ) or pa.types.is_large_list(typ):
                    rec[name] = list(cur or []) + list(v or [])
                elif pa.types.is_integer(typ):
                    rec[name] = int(cur or 0) + int(v or 0)
                else:
                    rec[name] = v
            state[doc_id] = rec
            tombstones.pop(doc_id, None)
        else:
            rec = {"lsn": row["lsn"]}
            for name, _ in latest.fields:
                v = row.get(name)
                if v is None:
                    v = latest.defaults.get(name)
                rec[name] = v
            state[doc_id] = rec
            tombstones.pop(doc_id, None)

    out_rows = [state[k] for k in sorted(state)]
    schema = pa.schema([*latest.to_arrow(), pa.field("lsn", pa.int64())])
    if out_rows:
        table = pa.Table.from_pylist(
            [{**{n: r[n] for n in field_names}, "lsn": r["lsn"]} for r in out_rows],
            schema=schema,
        )
    else:
        table = schema.empty_table()
    return table, tombstones
