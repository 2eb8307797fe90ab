"""Distributed data profiling: per-column row count, null count, exact
distinct count, min and max — one summary row per column.

The reference validates fields record-by-record with pydantic models
(`mex/extractors/models` + per-extractor transform asserts); at corpus
scale a profile must come from partials, not a row loop. Two streams,
each the cheapest shape for its statistic:

- **scalar partials** (count / nulls / min / max): one tiny row per
  batch with native-typed per-column min/max (string reprs would order
  "10" < "9"); folded on the driver — O(batches) rows.
- **exact distinct**: per-batch distinct (col, value) pairs (map-side
  combiner — the shuffle ships each batch's vocabulary once) → ONE
  coarse hash shuffle on the (col, value) key → per-block unique +
  run-boundary count per col → O(partitions · cols) partial rows summed
  on the driver. No ``COUNT(DISTINCT)`` materialization of the corpus.

``profile_sql`` generates the DuckDB mirror from the same column list
(the ``vocab_sql_case`` generated-oracle discipline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def profile_columns(ds, cols: list[str], num_partitions: int = 64) -> pa.Table:
    """Profile ``cols`` of ``ds``; returns one row per column, sorted by
    column name: (col, n_rows, n_null, n_distinct, min_v, max_v) with
    min/max cast to string AFTER native-type folding (int order, not
    lexicographic). Distinct excludes nulls (SQL ``COUNT(DISTINCT)``
    semantics); an all-null column has null min/max."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    cols = list(cols)
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    missing = [c for c in cols if c not in types]
    if missing:
        raise ValueError(f"profile_columns: columns {missing} not in dataset")

    def scalar_partials(t: pa.Table) -> pa.Table:
        out: dict[str, pa.Array] = {"n_rows": pa.array([t.num_rows], pa.int64())}
        for c in cols:
            col = t[c]
            typ = t.schema.field(c).type
            out[f"{c}__nn"] = pa.array([col.null_count], pa.int64())
            if t.num_rows > col.null_count:
                mm = pc.min_max(col)
                out[f"{c}__min"] = pa.array([mm["min"].as_py()], typ)
                out[f"{c}__max"] = pa.array([mm["max"].as_py()], typ)
            else:
                out[f"{c}__min"] = pa.nulls(1, typ)
                out[f"{c}__max"] = pa.nulls(1, typ)
        return pa.table(out)

    parts = ds.map_batches(scalar_partials, batch_format="pyarrow").take_all()
    n_rows = sum(r["n_rows"] for r in parts)
    folded: dict[str, dict] = {}
    for c in cols:
        nn = sum(r[f"{c}__nn"] for r in parts)
        mins = [r[f"{c}__min"] for r in parts if r[f"{c}__min"] is not None]
        maxs = [r[f"{c}__max"] for r in parts if r[f"{c}__max"] is not None]
        folded[c] = {
            "n_null": nn,
            "min_v": str(min(mins)) if mins else None,
            "max_v": str(max(maxs)) if maxs else None,
        }

    # exact distinct: (col, value-as-string) pairs, deduped per batch,
    # co-located by one coarse hash shuffle, counted at run boundaries
    def pairs(t: pa.Table) -> pa.Table:
        chunks = []
        for c in cols:
            v = pc.cast(t[c], pa.string())
            v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            valid = pc.is_valid(v)
            v = v.filter(valid)
            chunks.append(pa.table({
                "col": pa.array([c] * len(v), pa.string()),
                "val": v,
            }))
        p = pa.concat_tables(chunks)
        p = p.group_by(["col", "val"]).aggregate([])  # map-side combiner
        key = pc.binary_join_element_wise(p["col"], p["val"], "\x00")
        return p.append_column("ckey", key)

    def block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"col": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = g.sort_by([("ckey", "ascending")])
        first = _run_starts(t["ckey"])          # one per distinct (col, value)
        u = t.filter(pa.array(first)).sort_by([("col", "ascending")])
        col_first = _run_starts(u["col"])
        idx = np.flatnonzero(col_first)
        counts = np.diff(np.append(idx, u.num_rows)).astype(np.int64)
        return pa.table({
            "col": u["col"].combine_chunks().take(pa.array(idx)),
            "n": pa.array(counts),
        })

    tagged = ds.map_batches(pairs, batch_format="pyarrow")
    dparts = _keyed_blocks(tagged, "ckey", block, num_partitions).take_all()
    n_distinct = {c: 0 for c in cols}
    for r in dparts:
        n_distinct[r["col"]] += int(r["n"])

    order = sorted(cols)
    return pa.table({
        "col": pa.array(order, pa.string()),
        "n_rows": pa.array([n_rows] * len(order), pa.int64()),
        "n_null": pa.array([folded[c]["n_null"] for c in order], pa.int64()),
        "n_distinct": pa.array([n_distinct[c] for c in order], pa.int64()),
        "min_v": pa.array([folded[c]["min_v"] for c in order], pa.string()),
        "max_v": pa.array([folded[c]["max_v"] for c in order], pa.string()),
    })


def profile_sql(table_sql: str, cols: list[str]) -> str:
    """DuckDB mirror of :func:`profile_columns` over the same column list —
    one UNION ALL leg per column, generated from the identical spec."""
    legs = []
    for c in sorted(cols):
        legs.append(f"""
SELECT '{c}' AS col,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_v,
       CAST(MAX({c}) AS VARCHAR) AS max_v
FROM {table_sql}""")
    return "\nUNION ALL\n".join(legs)


def width_bucket_counts(ds, group_col: str, value_col: str,
                        lo: float, hi: float, n_buckets: int,
                        num_partitions: int = 16):
    """Equi-width histogram per group: ``bucket = floor((v − lo) /
    step)`` clamped to ``[0, n_buckets−1]`` with ``step = (hi − lo) /
    n_buckets`` — one float expression, written identically in the SQL
    mirror so the bucket boundary can't drift between engines. Rows with
    null values are dropped (SQL GROUP BY semantics on the CASTed
    bucket).

    Scale shape: per-batch (group, bucket) counts (combiner — the
    exchange ships ≤ groups·buckets rows per batch) → ``keyed_sums``.
    Output: ``(group_col, bucket:int64, n:int64)``."""
    from mex_extractors_ray.stages.aggregates import keyed_sums

    step = (hi - lo) / n_buckets

    def partial(t: pa.Table) -> pa.Table:
        if t[value_col].null_count:
            t = t.filter(pc.is_valid(t[value_col]))
        b = pc.floor(pc.divide(pc.subtract(
            pc.cast(t[value_col], pa.float64()), lo), step))
        b = pc.min_element_wise(
            pc.max_element_wise(b, 0.0), float(n_buckets - 1))
        g = (t.select([group_col])
             .append_column("bucket", pc.cast(b, pa.int64()))
             .group_by([group_col, "bucket"]).aggregate([([], "count_all")]))
        return g.rename_columns([group_col, "bucket", "n"]).set_column(
            2, "n", pc.cast(g.column(2), pa.int64()))

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return keyed_sums(parts, [group_col, "bucket"], ["n"],
                      num_partitions=num_partitions)
