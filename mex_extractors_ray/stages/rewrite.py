"""Reference-rewrite by entity-type field matrix.

The reference's publisher repairs dangling person references before export:
a per-entity-type map of reference fields (``mex/extractors/publisher/
fields.py:9-21``) is walked and every reference not in the allowed set is
replaced with a fallback (the person's unit, else the fallback contact —
``mex/extractors/publisher/transform.py:54-115``).

Distributed form: the allowed set and the per-key replacement map are
broadcast into a ``map_batches`` actor; each (entity_type, field) pair is
one vectorized mask-and-replace (``pc.is_in`` + ``pc.if_else``) — scalar
and list<scalar> reference columns both supported (lists rewrite
element-wise, preserving offsets).

Config::

    RewriteSpec(
        fields_by_type={"Activity": ["contact", "involvedPerson"], ...},
        type_col="entity_type",
        allowed={...},                 # identifiers that stay untouched
        replacement={bad_id: good_id}, # per-id rewrite (unit lookup), else
        fallback="fallback-contact",   # the terminal fallback (None = null)
    )
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from .. import runtime as _rt


class ReferenceRewriter:
    """map_batches actor: compile the allowed set + replacement lookup once
    per actor, rewrite per batch with Arrow kernels only."""

    def __init__(self, fields_by_type: dict[str, list[str]], type_col: str,
                 allowed, replacement: dict | None = None, fallback=None):
        self.fields_by_type = {k: list(v) for k, v in fields_by_type.items()}
        self.type_col = type_col
        self.allowed = pa.array(list(allowed))
        rep = replacement or {}
        self.rep_keys = pa.array(list(rep.keys()))
        self.rep_vals = pa.array(list(rep.values()))
        self.fallback = fallback

    def _rewrite_values(self, vals: pa.Array, active: pa.Array) -> pa.Array:
        """Element-wise: keep allowed; else replacement-map hit; else
        fallback. ``active`` masks rows whose entity type uses this field."""
        ok = pc.fill_null(pc.is_in(vals, value_set=self.allowed), False)
        keep = pc.or_(ok, pc.invert(active))
        if len(self.rep_keys):
            idx = pc.index_in(vals, value_set=self.rep_keys)
            replaced = pc.take(self.rep_vals, idx)
        else:
            replaced = pa.nulls(len(vals), vals.type)
        fb = pa.scalar(self.fallback, vals.type)
        return pc.if_else(keep, vals, pc.coalesce(replaced, fb))

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch[self.type_col]
        for etype, fields in self.fields_by_type.items():
            row_active = pc.equal(types, etype)
            if not pc.any(row_active).as_py():
                continue
            for f in fields:
                if f not in batch.column_names:
                    continue
                col = batch[f]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                i = batch.column_names.index(f)
                if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                    # element-wise rewrite preserving the PHYSICAL offsets
                    # (null lists keep their null mask via `mask=`); the
                    # rebuilt array keeps the INPUT's list flavor — silently
                    # narrowing large_list (int64 offsets) to list (int32)
                    # would overflow past 2^31 child elements and make
                    # batches disagree on schema
                    large = pa.types.is_large_list(col.type)
                    offsets = np.asarray(col.offsets, dtype=np.int64)
                    values = col.values  # physical child (aligned to offsets)
                    sizes = np.diff(offsets)
                    active_rows = np.asarray(
                        pc.fill_null(row_active, False).combine_chunks()
                        if isinstance(row_active, pa.ChunkedArray)
                        else pc.fill_null(row_active, False),
                        dtype=bool,
                    )
                    active_flat = pa.array(np.repeat(active_rows, sizes))
                    new_flat = self._rewrite_values(values, active_flat)
                    mask = (
                        pc.is_null(col).combine_chunks()
                        if isinstance(col, pa.ChunkedArray)
                        else pc.is_null(col)
                    )
                    cls, otype = (
                        (pa.LargeListArray, pa.int64()) if large else (pa.ListArray, pa.int32())
                    )
                    new_col = cls.from_arrays(
                        pa.array(offsets, otype), new_flat,
                        mask=mask if col.null_count else None,
                    )
                    batch = batch.set_column(i, f, new_col)
                else:
                    active = (
                        row_active.combine_chunks()
                        if isinstance(row_active, pa.ChunkedArray)
                        else row_active
                    )
                    batch = batch.set_column(
                        i, f, self._rewrite_values(col, pc.fill_null(active, False))
                    )
        return batch


def rewrite_references(ds, fields_by_type: dict[str, list[str]], type_col: str,
                       allowed, replacement: dict | None = None, fallback=None,
                       concurrency=None):
    """Dataset helper — stateless tasks (the allowed/replacement sets are
    small Python objects; rebuilding them per batch is cheaper than an
    actor pool's startup + elasticity cap)."""
    return ds.map_batches(
        _rt.stateless(ReferenceRewriter, fields_by_type, type_col, allowed,
                      replacement, fallback),
        batch_format="pyarrow",
    )
