"""Wide-to-long reshaping (UNPIVOT / melt) — the inverse of
``aggregates.pivot_counts``.

The reference reshapes per-record dicts freely in Python — every
``transform_*`` builds a different record shape (e.g.
``mex/extractors/synopse/transform.py:150-220`` flattens study rows
into several entity shapes, ``mex/extractors/sumo/transform.py``
re-keys nested payloads), and ``mex/extractors/ff_projects/extract.py``
explodes multi-value cells to rows; a columnar engine needs those
reshapes as explicit vectorized operators. Melt and split-explode are
embarrassingly parallel — one streaming ``map_batches``, no shuffle:
each output row is a pure function of one input row. ``union_by_name``
is the reference's implicit "models with optional fields collate into
one sink" discipline made explicit (missing columns → typed nulls,
conflicting types refused).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_col: str = "variable", val_col: str = "value"):
    """UNPIVOT: one output row per (input row, value column). ``value_cols``
    must share an Arrow type (the long column has one type — cast first if
    they don't). Output: ``id_cols`` + ``var_col`` (the source column's
    name) + ``val_col``. Column order within a row is preserved
    (``value_cols`` order), so a deterministic sort key exists."""
    id_cols, value_cols = list(id_cols), list(value_cols)
    if not value_cols:
        raise ValueError("melt: value_cols must be non-empty")

    def wide_to_long(t: pa.Table) -> pa.Table:
        vtypes = {str(t[c].type) for c in value_cols}
        if len(vtypes) > 1:
            raise TypeError(f"melt: value_cols mix types {sorted(vtypes)}; "
                            "cast to a common type first")
        n = t.num_rows
        k = len(value_cols)
        # row i repeats k times; variable cycles in value_cols order
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        cols = {c: t[c].take(idx) for c in id_cols}
        cols[var_col] = pa.array(
            np.tile(np.array(value_cols, dtype=object), n), pa.string())
        def one_chunk(col: pa.ChunkedArray | pa.Array) -> pa.Array:
            if isinstance(col, pa.ChunkedArray):
                c = col.combine_chunks()
                if isinstance(c, pa.ChunkedArray):
                    return c.chunk(0) if c.num_chunks else pa.array([], c.type)
                return c
            return col

        # interleave: output position i*k + j takes vals[j][i]
        stacked = pa.concat_arrays([one_chunk(t[c]) for c in value_cols])
        take = pa.array((np.tile(np.arange(k, dtype=np.int64) * n, n)
                         + np.repeat(np.arange(n, dtype=np.int64), k)))
        cols[val_col] = stacked.take(take)
        return pa.table(cols)

    return ds.map_batches(wide_to_long, batch_format="pyarrow")


def split_explode(ds, col: str, pattern: str, keep_cols: list[str],
                  out_part: str = "part", out_idx: str = "idx"):
    """Split a string column by ``pattern`` and explode to one row per
    part WITH ORDINALITY (0-based ``out_idx``) — LATERAL
    ``unnest(str_split(...)) WITH ORDINALITY``. Fully vectorized: one
    ``pc.split_pattern`` kernel, then offsets arithmetic (``np.repeat``
    of the kept columns, ``arange − repeated list starts`` for the
    position) — no per-row Python. Null input rows produce no output
    rows (SQL unnest semantics). Embarrassingly parallel: one streaming
    ``map_batches``, no shuffle."""
    keep_cols = list(keep_cols)

    def explode(t: pa.Table) -> pa.Table:
        if t[col].null_count:
            t = t.filter(pc.is_valid(t[col]))
        lists = pc.split_pattern(t[col], pattern)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offsets = np.asarray(lists.offsets, dtype=np.int64)
        counts = np.diff(offsets)
        ridx = pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64),
                                  counts))
        total = int(counts.sum())
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(counts) - counts, counts))
        cols = {c: t[c].take(ridx) for c in keep_cols}
        cols[out_idx] = pa.array(pos)
        cols[out_part] = lists.flatten()
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow")


def union_by_name(datasets: list):
    """Schema-evolution union (``UNION ALL BY NAME``): align every input
    to the UNION of all column names — missing columns become typed nulls
    — then a plain streaming union. Column order: first appearance across
    inputs. A name present in several inputs must carry one type (cast
    upstream otherwise; silent coercion hides schema drift). The alignment
    is per-batch metadata work (null-column append), so the union stays
    zero-copy streaming."""
    if not datasets:
        raise ValueError("union_by_name: no inputs")

    def _arrow_type(t):
        # Dataset.schema() reports python classes for pandas-backed
        # blocks; normalize so null-padding and the conflict check work
        if isinstance(t, pa.DataType):
            return t
        try:
            dt = np.dtype(t)
        except TypeError:
            raise TypeError(
                f"union_by_name: cannot map schema type {t!r} to an Arrow "
                f"type; cast the column upstream") from None
        if dt == np.dtype(object):
            # pandas-backed blocks report plain str columns as dtype('O')
            # — the one unmappable dtype with an established convention
            return pa.string()
        try:
            return pa.from_numpy_dtype(dt)
        except (TypeError, pa.ArrowNotImplementedError):
            # refuse-on-conflict discipline: any OTHER unmappable dtype
            # must not silently alias to string (wrong null-pad type, and
            # two distinct unmappable types would pass the conflict check)
            raise TypeError(
                f"union_by_name: cannot map schema type {t!r} to an Arrow "
                f"type; cast the column upstream") from None

    unified: dict[str, pa.DataType] = {}
    for ds in datasets:
        sch = ds.schema()
        for name, typ in zip(sch.names, sch.types):
            typ = _arrow_type(typ)
            if name in unified and unified[name] != typ:
                raise TypeError(
                    f"union_by_name: column {name!r} has conflicting types "
                    f"{unified[name]} vs {typ}; cast before unioning")
            unified.setdefault(name, typ)
    names = list(unified)

    def align(t: pa.Table) -> pa.Table:
        cols = {}
        for name in names:
            if name in t.column_names:
                cols[name] = t[name]
            else:
                cols[name] = pa.nulls(t.num_rows, unified[name])
        return pa.table(cols)

    aligned = [ds.map_batches(align, batch_format="pyarrow")
               for ds in datasets]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out
