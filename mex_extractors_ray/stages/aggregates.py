"""Aggregation operators.

Reference parity (SURVEY.md §2.6): grouped collections
(``mex/extractors/synopse/main.py:88-110`` sort+``itertools.groupby``),
collect-distinct-sorted ``valueSet`` (``synopse/transform.py:150-206``),
per-asset counts, historical drift comparison
(``mex/extractors/pipeline/checks/main.py:120-218``).

Scale discipline: pre-aggregate inside ``map_batches`` (a partial combiner
emitting one row per key per batch) before the one small ``groupby`` — the
shuffle then moves per-key partials, not raw rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def grouped_distinct_count(ds, key: str, value: str,
                           out_col: str = "n_distinct",
                           num_partitions: int = 64):
    """Exact ``COUNT(DISTINCT value) GROUP BY key`` at scale: per-batch
    distinct (key, value) pairs (the map-side combiner — the shuffle ships
    each batch's pair vocabulary once), ONE coarse hash shuffle on the
    PAIR (all copies of a pair land in one block, so the block-level
    dedup is global), run-boundary per-key partial counts per block, then
    a tiny ``keyed_sums`` over O(partitions · keys) partial rows. Null
    values are excluded (SQL semantics); null keys form their own group.
    No per-key value-set materialization (contrast
    ``collect_distinct_sorted``, which returns the sets themselves)."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    def pairs(t: pa.Table) -> pa.Table:
        p = pa.table({key: t[key], value: t[value]})
        p = p.filter(pc.is_valid(p[value]))
        p = p.group_by([key, value]).aggregate([])
        from mex_extractors_ray.hashing import composite_gkey

        return p.append_column("_pair", composite_gkey(p, [key, value]))

    def block(g: pa.Table) -> pa.Table:
        kt = g[key].type
        if g.num_rows == 0:
            return pa.table({key: pa.array([], kt),
                             out_col: pa.array([], pa.int64())})
        t = g.sort_by([("_pair", "ascending")])
        u = t.filter(pa.array(_run_starts(t["_pair"])))  # global pair dedup
        u = u.sort_by([(key, "ascending")])
        idx = np.flatnonzero(_run_starts(u[key]))
        counts = np.diff(np.append(idx, u.num_rows)).astype(np.int64)
        return pa.table({
            key: u[key].combine_chunks().take(pa.array(idx)),
            out_col: pa.array(counts),
        })

    partials = _keyed_blocks(ds.map_batches(pairs, batch_format="pyarrow"),
                             "_pair", block, num_partitions)
    return keyed_sums(partials, [key], [out_col],
                      num_partitions=min(num_partitions, 16))


def partial_sum_count(keys: list[str], value_cols: list[str]):
    """Combiner for mean/sum aggregates: per-batch groupby emitting partial
    sums + counts; finalize with groupby(keys).aggregate(Sum(...)) over the
    (much smaller) partial rows."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, as_index=False, sort=False)[value_cols].agg(["sum", "count"])
        g.columns = keys + [f"{c}_{s}" for c in value_cols for s in ("sum", "count")]
        return g

    return _partial


def collect_distinct_sorted(ds, key: str, value: str, out: str = "value_set",
                            sep: str = ",", num_partitions: int = 64):
    """Per key: the sorted distinct values joined by ``sep`` — the
    reference's deterministic ``valueSet = sorted({level.textbox51})``
    (``synopse/transform.py:200-202``).

    Scale shape: per-batch (key, value) distinct (combiner — the shuffle
    carries deduplicated pairs only) → ONE coarse hash shuffle on the key →
    per-block vectorized finalize: one Arrow sort, one run-boundary scan,
    and one ``pc.binary_join`` over a reconstructed list array. Ray
    dispatches ``num_partitions`` block calls, never one per key (the
    per-key ``map_groups`` dispatch this replaced cost one Python call +
    one DataFrame per key)."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    def batch_distinct(b: pa.Table) -> pa.Table:
        return b.select([key, value]).group_by([key, value]).aggregate([])

    def finalize(g: pa.Table) -> pa.Table:
        t = g.filter(pc.is_valid(g[value])) if g[value].null_count else g
        t = t.sort_by([(key, "ascending"), (value, "ascending")])
        n = t.num_rows
        kt = g[key].type
        if n == 0:
            return pa.table({key: pa.array([], kt), out: pa.array([], pa.string())})
        keys_arr = t[key].combine_chunks()
        vals = pc.cast(t[value].combine_chunks(), pa.string())
        # distinct (key, value) pairs: new key run OR new value run
        pair_start = _run_starts(keys_arr) | _run_starts(t[value])
        keep = np.flatnonzero(pair_start)
        keys_arr = keys_arr.take(pa.array(keep))
        vals = vals.take(pa.array(keep))
        # per-key value lists as offsets into the distinct-sorted values:
        # idx[0] is always 0 (_run_starts marks row 0), so [*idx, n] is a
        # valid monotone offsets vector with one list per key
        idx = np.flatnonzero(_run_starts(keys_arr))
        offsets = np.append(idx, len(keys_arr)).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), vals)
        joined = pc.binary_join(lists, sep)
        return pa.table({key: keys_arr.take(pa.array(idx)), out: joined})

    combined = ds.map_batches(batch_distinct, batch_format="pyarrow")
    return _keyed_blocks(combined, key, finalize, num_partitions)


def collect_concat_sorted(ds, key: str, value: str, out: str = "value_list",
                          sep: str = ",", num_partitions: int = 64):
    """Per key: ALL values (duplicates kept) sorted ascending, joined by
    ``sep`` — SQL ``string_agg(value, sep ORDER BY value)``. Ordering by
    the value itself makes the output string deterministic even under
    ties (equal values are interchangeable inside the concat).

    Unlike :func:`collect_distinct_sorted` there is no distinct combiner
    — bag semantics means the exchange ships every (key, value) pair; the
    per-key result string is itself Ω(occurrences), so the shuffle is
    proportional to the OUTPUT, not avoidable. Nulls are excluded (SQL
    ``string_agg`` semantics)."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    def finalize(g: pa.Table) -> pa.Table:
        t = g.filter(pc.is_valid(g[value])) if g[value].null_count else g
        n = t.num_rows
        kt = g[key].type
        if n == 0:
            return pa.table({key: pa.array([], kt),
                             out: pa.array([], pa.string())})
        t = t.sort_by([(key, "ascending"), (value, "ascending")])
        keys_arr = t[key].combine_chunks()
        vals = pc.cast(t[value].combine_chunks(), pa.string())
        idx = np.flatnonzero(_run_starts(keys_arr))
        offsets = np.append(idx, n).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                              vals)
        return pa.table({key: keys_arr.take(pa.array(idx)),
                         out: pc.binary_join(lists, sep)})

    proj = ds.map_batches(lambda b: b.select([key, value]),
                          batch_format="pyarrow")
    return _keyed_blocks(proj, key, finalize, num_partitions)


def keyed_percent_rank(ds, key: str, value_col: str,
                       out_col: str = "pct_rank", num_partitions: int = 64):
    """``percent_rank()`` window function per key over ``value_col``
    ascending: ``(rank − 1) / (n − 1)``, 0 for single-row keys — SQL
    ``PERCENT_RANK() OVER (PARTITION BY key ORDER BY value_col)``. Rank
    is tie-aware (equal values share a rank), so the output is
    deterministic without a tiebreaker; the division is one float op on
    exact integers, identical in any engine. Same one-shuffle
    run-boundary shape as :func:`keyed_rank_ntile`."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    def block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.float64()))
        t = g.sort_by([(key, "ascending"), (value_col, "ascending")])
        new_key = _run_starts(t[key])
        key_starts = np.flatnonzero(new_key)
        key_counts = np.diff(np.append(key_starts, n))
        ordinal = np.arange(n, dtype=np.int64) - np.repeat(key_starts,
                                                           key_counts)
        new_val = new_key | _run_starts(t[value_col])
        val_starts = np.flatnonzero(new_val)
        val_counts = np.diff(np.append(val_starts, n))
        rnk = np.repeat(ordinal[val_starts], val_counts)  # 0-based
        denom = np.repeat(key_counts, key_counts) - 1
        pr = np.where(denom > 0, rnk / np.maximum(denom, 1), 0.0)
        return t.append_column(out_col, pa.array(pr))

    return _keyed_blocks(ds, key, block, num_partitions)


def keyed_cume_dist(ds, key: str, value_col: str,
                    out_col: str = "cume_dist", num_partitions: int = 64):
    """``cume_dist()`` window function per key over ``value_col``
    ascending: (number of rows with value ≤ this row's value) / n — SQL
    ``CUME_DIST() OVER (PARTITION BY key ORDER BY value_col)``. The
    numerator is the END of this value's tie run (exact int), the
    division one float op — deterministic across engines. Same
    one-shuffle run-boundary shape as :func:`keyed_percent_rank`."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    def block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.float64()))
        t = g.sort_by([(key, "ascending"), (value_col, "ascending")])
        new_key = _run_starts(t[key])
        key_starts = np.flatnonzero(new_key)
        key_counts = np.diff(np.append(key_starts, n))
        run_start = np.repeat(key_starts, key_counts)
        new_val = new_key | _run_starts(t[value_col])
        val_starts = np.flatnonzero(new_val)
        val_counts = np.diff(np.append(val_starts, n))
        # last 0-based ordinal of this value's tie run, +1 = ≤-count
        val_end = np.repeat(val_starts + val_counts, val_counts)
        le_count = val_end - run_start
        denom = np.repeat(key_counts, key_counts)
        return t.append_column(out_col, pa.array(le_count / denom))

    return _keyed_blocks(ds, key, block, num_partitions)


def grouped_count(ds, keys: list[str] | str, alias: str = "n"):
    """Count per key with per-batch partials (never ships raw rows)."""
    from ray.data.aggregate import Sum

    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(b: pa.Table) -> pa.Table:
        return b.select(keys).group_by(keys).aggregate([([], "count_all")]).rename_columns(
            keys + ["_partial_n"]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys[0] if len(keys) == 1 else keys)
        .aggregate(Sum("_partial_n", alias_name=alias))
    )


def rollup_sum_count(ds, keys: list[str], value_col: str,
                     sum_alias: str = "sum", n_alias: str = "n",
                     num_partitions: int = 64):
    """GROUP BY ROLLUP: one row per PREFIX grouping set of ``keys`` —
    ``(k1, …, kd)``, ``(k1, …, k(d-1), NULL)``, … ``(NULL, …, NULL)`` —
    NULLs marking rolled-up columns exactly as SQL does. See
    ``grouping_sets_sum_count`` for the single-exchange design."""
    keys = list(keys)
    if not keys:
        raise ValueError("rollup_sum_count: need at least one key")
    sets = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    return grouping_sets_sum_count(ds, keys, sets, value_col,
                                   sum_alias, n_alias, num_partitions)


def cube_sum_count(ds, keys: list[str], value_col: str,
                   sum_alias: str = "sum", n_alias: str = "n",
                   num_partitions: int = 64):
    """GROUP BY CUBE: one row per SUBSET of ``keys`` (2^d grouping sets).
    Same single-exchange machinery as ``rollup_sum_count``."""
    import itertools

    keys = list(keys)
    if not keys:
        raise ValueError("cube_sum_count: need at least one key")
    sets = []
    for r in range(len(keys), -1, -1):
        sets.extend(tuple(c) for c in itertools.combinations(keys, r))
    return grouping_sets_sum_count(ds, keys, sets, value_col,
                                   sum_alias, n_alias, num_partitions)


def grouping_sets_sum_count(ds, keys: list[str], sets: list[tuple[str, ...]],
                            value_col: str, sum_alias: str = "sum",
                            n_alias: str = "n", num_partitions: int = 64):
    """GROUPING SETS re-expressed Ray-Data-first: one output row per group
    of each requested set, the not-grouped key columns NULL (SQL
    semantics), each row carrying the int64 sum of ``value_col`` and the
    row count.

    Scale shape: ALL grouping sets are expanded in the MAP-SIDE combiner —
    per batch, one Arrow hash-agg per set over the (already tiny) finest
    partial, absent keys filled with a typed sentinel and disambiguated by
    a grouping-id column — so the whole query costs ONE exchange over
    partial rows (≤ Σ set cardinalities per batch), merged by a coarse
    shuffle + run-boundary reduceat kernel. Integer sums are re-aggregable
    and order-independent, so the partials' grouping is irrelevant to the
    result. (The chained per-level ``groupby().aggregate`` alternative
    measured 6.7 s at sf0.1 on pure exchange fixed cost; see BASELINE.md
    round 4 on why big keyed reductions avoid Dataset.aggregate.)"""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    keys = list(keys)
    sets = [tuple(s) for s in sets]
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s!r} not a subset of keys {keys!r}")
    d = len(keys)
    # membership[gid][j]: is keys[j] grouped in set gid?
    membership = np.array(
        [[c in s for c in keys] for s in sets], dtype=bool
    ).reshape(len(sets), d)

    in_schema = ds.schema()
    _require_integer_col(
        dict(zip(in_schema.names, in_schema.types)).get(value_col),
        value_col, "grouping_sets_sum_count")
    _sch_types = dict(zip(in_schema.names, in_schema.types))
    key_types, sentinels = {}, {}
    for c in keys:
        t = _sch_types[c]
        t = t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(np.dtype(t))
        key_types[c] = t
        # sentinel only fills SHUFFLE-KEY slots for rolled-up columns (the
        # _gid column disambiguates levels); restored to null on output
        sentinels[c] = "" if (pa.types.is_string(t) or pa.types.is_large_string(t)) else 0

    def partial(b: pa.Table) -> pa.Table:
        finest = (
            b.select(keys + [value_col])
            .group_by(keys)
            .aggregate([(value_col, "sum"), ([], "count_all")])
            .rename_columns(keys + ["_ps", "_pn"])
        )
        tables = []
        for gid, sub_t in enumerate(sets):
            sub = list(sub_t)
            if sub == keys:
                lvl = finest
            elif sub:
                lvl = (
                    finest.group_by(sub)
                    .aggregate([("_ps", "sum"), ("_pn", "sum")])
                    .rename_columns(sub + ["_ps", "_pn"])
                )
            else:
                lvl = pa.table({
                    "_ps": pa.array([pc.sum(finest["_ps"]).as_py() or 0], pa.int64()),
                    "_pn": pa.array([pc.sum(finest["_pn"]).as_py() or 0], pa.int64()),
                })
            n = lvl.num_rows
            cols = {"_gid": pa.array(np.full(n, gid, dtype=np.int64))}
            for c in keys:
                cols[c] = (lvl[c].cast(key_types[c]) if c in (lvl.column_names)
                           else pa.array([sentinels[c]] * n, key_types[c]))
            cols["_ps"] = lvl["_ps"].cast(pa.int64()) if n else lvl["_ps"]
            cols["_pn"] = lvl["_pn"].cast(pa.int64())
            tables.append(pa.table(cols))
        return pa.concat_tables(tables)

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            cols = {c: pa.array([], key_types[c]) for c in keys}
            cols[sum_alias] = pa.array([], pa.int64())
            cols[n_alias] = pa.array([], pa.int64())
            return pa.table(cols)
        t = g.sort_by([("_gkey", "ascending")])
        idx = np.flatnonzero(_run_starts(t["_gkey"]))
        ps = np.add.reduceat(np.asarray(t["_ps"].combine_chunks(), np.int64), idx)
        pn = np.add.reduceat(np.asarray(t["_pn"].combine_chunks(), np.int64), idx)
        heads = pa.array(idx)
        gid = np.asarray(t["_gid"].combine_chunks(), np.int64)[idx]
        cols = {}
        for j, c in enumerate(keys):
            col = t[c].take(heads)
            # restore NULL for key slots absent from the row's grouping set
            mask = pa.array(~membership[gid, j])
            cols[c] = pc.if_else(mask, pa.nulls(len(idx), key_types[c]), col)
        cols[sum_alias] = pa.array(ps)
        cols[n_alias] = pa.array(pn)
        return pa.table(cols)

    def add_gkey(t: pa.Table) -> pa.Table:
        from mex_extractors_ray.hashing import composite_gkey

        # one composite string shuffle key over (gid, keys...) — a single
        # coarse exchange routes every grouping set at once; the
        # length-prefixed encoding keeps null-key groups distinct (SQL
        # ROLLUP semantics) AND is injective for adversarial strings
        return t.append_column("_gkey", composite_gkey(t, ["_gid"] + keys))

    partials = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        add_gkey, batch_format="pyarrow")
    return _keyed_blocks(partials, "_gkey", merge, num_partitions)


def _require_integer_col(t, name: str, op: str):
    """The reduceat sum kernels are int64-exact BY DESIGN (order-independent,
    oracle-bit-identical); a float column would be silently truncated —
    refuse instead (cents-scale floats upstream, the engine-wide discipline)."""
    if t is None:
        return  # schema unavailable for this column — trust the caller
    if not isinstance(t, pa.DataType):
        try:
            t = pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, ValueError):
            return
    if not pa.types.is_integer(t):
        raise TypeError(
            f"{op}: value column {name!r} is {t} — integer required "
            "(scale floats to int units, e.g. cents, before aggregating)"
        )


def keyed_sums(ds, keys: list[str], value_cols: list[str],
               num_partitions: int = 64):
    """Grouped int64 sums over (possibly composite) keys via the coarse
    shuffle + run-boundary ``np.add.reduceat`` kernel — the measured
    replacement for ``Dataset.groupby().aggregate(Sum)`` whenever the
    distinct-key count is large (BASELINE.md round 4: Ray's Aggregate
    exchange took 59 s on 10M rows / 1M keys; this path 3.75 s).

    Callers still owe the combiner discipline: pre-aggregate per batch
    BEFORE calling this so the exchange ships partials, not raw rows.
    Output: ``keys`` + ``value_cols`` (summed), one row per distinct key;
    input-null key values form their own group (SQL semantics)."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    keys, value_cols = list(keys), list(value_cols)
    in_schema = ds.schema()
    _types = dict(zip(in_schema.names, in_schema.types))
    key_types = {}
    for c in keys:
        t = _types[c]
        key_types[c] = t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(np.dtype(t))
    for v in value_cols:
        _require_integer_col(_types.get(v), v, "keyed_sums")

    def add_gkey(t: pa.Table) -> pa.Table:
        from mex_extractors_ray.hashing import composite_gkey

        # injective (length-prefixed) so separator bytes inside string
        # keys can't merge two distinct groups
        return t.append_column("_gkey", composite_gkey(t, keys))

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            cols = {c: pa.array([], key_types[c]) for c in keys}
            for v in value_cols:
                cols[v] = pa.array([], pa.int64())
            return pa.table(cols)
        t = g.sort_by([("_gkey", "ascending")])
        idx = np.flatnonzero(_run_starts(t["_gkey"]))
        heads = pa.array(idx)
        cols = {c: t[c].take(heads) for c in keys}
        for v in value_cols:
            cols[v] = pa.array(np.add.reduceat(
                np.asarray(t[v].combine_chunks(), np.int64), idx))
        return pa.table(cols)

    return _keyed_blocks(ds.map_batches(add_gkey, batch_format="pyarrow"),
                         "_gkey", merge, num_partitions)


def keyed_rank_ntile(ds, key: str, value_col: str, tie_col: str,
                     descending: bool = True, tiles: int = 4,
                     rank_alias: str = "rnk", tile_alias: str = "tile",
                     num_partitions: int = 64):
    """rank() and NTILE(n) window functions per key, re-expressed
    Ray-Data-first: ONE coarse hash shuffle on the key, then per block one
    Arrow sort + run-boundary masks — no per-key dispatch.

    ``rank`` is tie-aware over ``value_col`` alone (equal values share a
    rank, the next rank skips — SQL rank() semantics); ``tile`` follows
    SQL NTILE's exact fill rule (first ``cnt % n`` tiles get one extra
    row) under the total order ``(value_col, tie_col)``, so both outputs
    are deterministic. Output = input columns + the two int64 columns."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    order = "descending" if descending else "ascending"

    def block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.append_column(rank_alias, pa.array([], pa.int64())) \
                    .append_column(tile_alias, pa.array([], pa.int64()))
        t = g.sort_by([(key, "ascending"), (value_col, order), (tie_col, "ascending")])
        new_key = _run_starts(t[key])
        key_starts = np.flatnonzero(new_key)
        key_counts = np.diff(np.append(key_starts, n))
        # 0-based ordinal within the key
        ordinal = np.arange(n, dtype=np.int64) - np.repeat(key_starts, key_counts)
        # tie-aware rank: ordinal of the first row of this (key, value) run
        new_val = new_key | _run_starts(t[value_col])
        val_starts = np.flatnonzero(new_val)
        val_counts = np.diff(np.append(val_starts, n))
        rnk = np.repeat(ordinal[val_starts], val_counts) + 1
        # NTILE fill rule over the per-key ordinal
        cnt = np.repeat(key_counts, key_counts)
        size, rem = cnt // tiles, cnt % tiles
        big_span = rem * (size + 1)
        in_big = ordinal < big_span
        with np.errstate(divide="ignore", invalid="ignore"):
            tile = np.where(
                in_big,
                ordinal // np.maximum(size + 1, 1),
                rem + np.where(size > 0, (ordinal - big_span) // np.maximum(size, 1), 0),
            ) + 1
        return t.append_column(rank_alias, pa.array(rnk.astype(np.int64))) \
                .append_column(tile_alias, pa.array(tile.astype(np.int64)))

    return _keyed_blocks(ds, key, block, num_partitions)


def pivot_counts(ds, row_key: str, col_key: str, col_values: list[str],
                 alias_fmt: str = "n_{}", num_partitions: int = 64):
    """Pivot (long → wide reshape): one row per ``row_key``, one int64
    count column per value of ``col_key`` (the bounded, caller-declared
    ``col_values`` — a pivot's output schema must be static; values outside
    the list are dropped, the SQL conditional-aggregation convention).

    Scale shape: per-batch ``group_by(row, col)`` count partials (the
    shuffle ships one row per (row, col) pair per batch, never raw rows),
    ONE coarse hash shuffle on ``row_key``, then a vectorized scatter per
    block (one ``np.add.at`` per declared column). No per-key dispatch; at
    100 TB the width is bounded by ``col_values``, the row count by the
    ``row_key`` cardinality — both aggregate-scale, not input-scale."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    def partial(b: pa.Table) -> pa.Table:
        return (
            b.select([row_key, col_key])
            .group_by([row_key, col_key])
            .aggregate([([], "count_all")])
            .rename_columns([row_key, col_key, "_pn"])
        )

    def block(g: pa.Table) -> pa.Table:
        kt = g[row_key].type
        if g.num_rows == 0:
            cols = {row_key: pa.array([], kt)}
            for v in col_values:
                cols[alias_fmt.format(v)] = pa.array([], pa.int64())
            return pa.table(cols)
        t = g.sort_by([(row_key, "ascending")])
        starts = _run_starts(t[row_key])
        gidx = np.cumsum(starts) - 1  # group ordinal per row
        start_idx = np.flatnonzero(starts)
        n_groups = len(start_idx)
        cvals = t[col_key].combine_chunks()
        pn = np.asarray(t["_pn"].combine_chunks(), dtype=np.int64)
        cols = {row_key: t[row_key].take(pa.array(start_idx))}
        for v in col_values:
            acc = np.zeros(n_groups, dtype=np.int64)
            mask = pc.equal(cvals, v).fill_null(False).to_numpy(zero_copy_only=False)
            np.add.at(acc, gidx[mask], pn[mask])
            cols[alias_fmt.format(v)] = pa.array(acc)
        return pa.table(cols)

    return _keyed_blocks(
        ds.map_batches(partial, batch_format="pyarrow"), row_key, block, num_partitions
    )


def keyed_topk(ds, key: str, order_by: list[tuple[str, str]], k: int,
               rank_col: str = "rank", num_partitions: int = 64):
    """Top-k rows per key under an explicit deterministic ordering — the
    distributed ``row_number() OVER (PARTITION BY key ORDER BY …) <= k``.

    The reference's per-group "keep the first/best" selections are all
    k=1 specializations (first-seen dedup, ``exact_dedup``); k>1 is the
    training-data form (per-source quality quota, best-k variants per
    cluster). Scale shape: ONE coarse hash shuffle on the key
    (``dedup._keyed_blocks``), then per block a single Arrow sort + run
    ordinal (arange minus the repeated run start) + one filter — no
    per-key dispatch, and the shuffle ships raw rows only once.

    ``order_by`` must make the ordering total (include a tie-break
    column), or the kept set is nondeterministic across runs."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    def block(g: pa.Table) -> pa.Table:
        t = g.sort_by([(key, "ascending")] + list(order_by))
        n = t.num_rows
        starts = np.flatnonzero(_run_starts(t[key]))
        counts = np.diff(np.append(starts, n))
        ordinal = np.arange(n, dtype=np.int64) - np.repeat(starts, counts) + 1
        t = t.append_column(rank_col, pa.array(ordinal))
        return t.filter(pa.array(ordinal <= k))

    return _keyed_blocks(ds, key, block, num_partitions)


def word_topk(ds, text_col: str, k: int = 50, num_partitions: int = 64,
              pattern: str = " "):
    """Global top-k frequent words (heavy hitters) over a text corpus.

    The canonical massive-shuffle aggregate, built scale-safe:

    1. map-side combine: per batch, ``pc.value_counts`` over the flattened
       split — the shuffle ships one (word, partial_count) row per DISTINCT
       word per batch, never the exploded corpus;
    2. one coarse hash shuffle on the word (``dedup._keyed_blocks``), each
       block summing its words with a single Arrow group_by;
    3. global top-k: per-block ``sort + head(k)`` prune (each block keeps
       only its own top-k candidates — the true global top-k is a subset),
       then one tiny ``sort(count desc, word asc).limit(k)``.

    Deterministic tie-break: (count DESC, word ASC). Reference analog: the
    per-asset count checks (``mex/extractors/pipeline/checks/main.py``)
    promoted to corpus scale."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks

    def partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.fill_null(t[text_col], ""), pattern)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        vc = pc.value_counts(flat)
        return pa.table({
            "word": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    def block(g: pa.Table) -> pa.Table:
        summed = g.group_by("word").aggregate([("n", "sum")]).rename_columns(
            ["word", "n"])
        # per-block prune: only a block's own top-k can reach the global top-k
        # (all rows of a word live in one block after the shuffle)
        t = summed.sort_by([("n", "descending"), ("word", "ascending")])
        return t.slice(0, k)

    pruned = _keyed_blocks(ds.map_batches(partial, batch_format="pyarrow"),
                           "word", block, num_partitions)
    return pruned.sort(["n", "word"], descending=[True, False]).limit(k)


def bounded_quantiles(ds, col: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                      num_partitions: int = 32) -> pa.Table:
    """EXACT quantiles of a bounded-cardinality integer column (lengths,
    token counts, scores): per-batch ``value_counts`` partials (the shuffle
    ships one row per distinct value per batch), one small groupby-sum,
    then a driver-side cumsum over the |V|-row histogram — driver state is
    O(|V|), never O(rows). Nearest-rank definition: quantile q = the
    smallest value whose cumulative count ≥ ceil(q·n); integer logic, so
    the SQL oracle matches bit-for-bit. Nulls are excluded. For unbounded
    or float columns use a sketch instead — this operator's contract is
    the bounded value space (same as the token-histogram combiner)."""
    from ray.data.aggregate import Sum

    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"bounded_quantiles: q={q} outside (0, 1]")

    def partial(t: pa.Table) -> pa.Table:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        vc = pc.value_counts(c.drop_null())
        return pa.table({
            "v": vc.field("values").cast(pa.int64()),
            "n": vc.field("counts").cast(pa.int64()),
        })

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("n", alias_name="n")))
    rows = hist.sort("v").take_all()  # |V| rows — the documented bound
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    counts = np.array([r["n"] for r in rows], dtype=np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if total == 0:
            continue
        rank = int(np.ceil(q * total))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(int(round(q * 100)))
        out_v.append(int(vals[idx]))
    return pa.table({"q_c100": pa.array(out_q, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})


def grouped_bounded_quantiles(ds, group_col: str, value_col: str,
                              qs: tuple[float, ...] = (0.25, 0.5, 0.75)) -> pa.Table:
    """EXACT per-group quantiles of a bounded-cardinality integer column:
    per-batch (group, value) ``value_counts`` partials → one small
    groupby-sum → a driver-side per-group cumsum over the |G|·|V|-row
    histogram (the documented driver bound — bounded group AND value
    spaces; for unbounded values use ``shuffle.hash_sample_quantiles``).
    Same nearest-rank integer definition as :func:`bounded_quantiles`, so
    the SQL oracle matches bit-for-bit. Output: (group, q_c100, value)."""
    from ray.data.aggregate import Sum

    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"grouped_bounded_quantiles: q={q} outside (0, 1]")

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        g = t.group_by([group_col, value_col]).aggregate([([], "count_all")])
        return pa.table({
            "g": g[group_col],
            "v": g[value_col].cast(pa.int64()),
            "n": g["count_all"].cast(pa.int64()),
        })

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["g", "v"]).aggregate(Sum("n", alias_name="n")))
    rows = pa.Table.from_pylist(
        hist.take_all(),
        schema=pa.schema([("g", pa.string()), ("v", pa.int64()), ("n", pa.int64())]),
    ).sort_by([("g", "ascending"), ("v", "ascending")])
    gcol = rows["g"].combine_chunks()
    starts_mask = _run_starts_arr(gcol)
    n = np.asarray(rows["n"], dtype=np.int64)
    v = np.asarray(rows["v"], dtype=np.int64)
    starts = np.flatnonzero(starts_mask)
    ends = np.append(starts[1:], len(n))
    out_g, out_q, out_v = [], [], []
    for s, e in zip(starts, ends):
        cum = np.cumsum(n[s:e])
        total = int(cum[-1])
        for q in qs:
            rank = int(np.ceil(q * total))
            idx = int(np.searchsorted(cum, rank, side="left"))
            out_g.append(gcol[s].as_py())
            out_q.append(int(round(q * 100)))
            out_v.append(int(v[s + idx]))
    return pa.table({"grp": pa.array(out_g, pa.string()),
                     "q_c100": pa.array(out_q, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})


def _run_starts_arr(col) -> np.ndarray:
    from mex_extractors_ray.stages.dedup import _run_starts

    return _run_starts(col)


def funnel_counts(ds, user_col: str, type_col: str, ts_col: str,
                  steps: list[str], num_partitions: int = 64) -> pa.Table:
    """Ordered funnel over an event stream: for each prefix of ``steps``,
    the number of users whose step-k event strictly FOLLOWS their step-(k-1)
    completion time (t_k = MIN(ts | type=step_k AND ts > t_{k-1})).

    Scale shape: one coarse hash shuffle on the user key (all of a user's
    events land in one block), then per block a SORT + k vectorized
    segmented-min passes over run boundaries — no per-user dispatch, no
    driver-side users. Partials are (step, count) rows; the finalize is a
    k-row sum."""
    from ray.data.aggregate import Sum
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    def block(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[type_col], value_set=pa.array(steps)))
        out_schema = pa.schema([("step", pa.string()), ("n", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.sort_by([(user_col, "ascending"), (ts_col, "ascending")])
        starts = np.flatnonzero(_run_starts(t[user_col]))
        run_idx = np.cumsum(_run_starts(t[user_col])) - 1  # row → run
        ts = np.asarray(
            t[ts_col].combine_chunks().cast(pa.int64()), dtype=np.int64)
        types = t[type_col].combine_chunks().to_numpy(zero_copy_only=False)
        n_runs = len(starts)
        t_prev = np.full(n_runs, np.iinfo(np.int64).min, dtype=np.int64)
        counts = []
        for step in steps:
            cand = (types == step) & (ts > t_prev[run_idx])
            keyed = np.where(cand, ts, np.iinfo(np.int64).max)
            t_step = np.minimum.reduceat(keyed, starts)
            done = t_step != np.iinfo(np.int64).max
            counts.append(int(done.sum()))
            # users who missed this step can never complete later ones
            t_step[~done] = np.iinfo(np.int64).max - 1
            t_prev = t_step
        return pa.table({"step": pa.array(list(steps)),
                         "n": pa.array(counts, pa.int64())})

    partials = _keyed_blocks(ds, user_col, block, num_partitions=num_partitions)
    out = partials.groupby("step").aggregate(Sum("n", alias_name="n"))
    rows = {r["step"]: r["n"] for r in out.take_all()}
    return pa.table({
        "step": pa.array([f"{i + 1}-{s}" for i, s in enumerate(steps)]),
        "n_users": pa.array([rows.get(s, 0) for s in steps], pa.int64()),
    })


def percentile_gate(ds, col: str, q: float = 0.25, mode: str = "above",
                    num_partitions: int = 32):
    """Percentile quality gate (the C4/Gopher-style "drop the bottom X% by
    feature" filter): pass 1 computes the EXACT nearest-rank quantile of
    ``col`` via :func:`bounded_quantiles` (per-batch value-count partials,
    one |V|-row groupby — never a corpus sort), pass 2 broadcasts the
    scalar threshold into a vectorized filter. Returns ``(filtered_ds,
    threshold)``. ``mode="above"`` keeps rows ≥ threshold, ``"below"``
    keeps rows < it. Nulls never pass the gate. Two passes over the input
    by design — a streaming pipeline cannot know a global percentile
    before seeing every row; at 100 TB pass 1 ships one row per distinct
    value per batch, so the re-read is the whole cost."""
    if mode not in ("above", "below"):
        raise ValueError(f"percentile_gate: mode={mode!r}")
    thr_tbl = bounded_quantiles(ds, col, qs=(q,), num_partitions=num_partitions)
    if thr_tbl.num_rows == 0:  # empty input: nothing to gate
        return ds, None
    thr = int(thr_tbl["value"][0].as_py())

    def gate(t: pa.Table) -> pa.Table:
        cmp = pc.greater_equal(t[col], thr) if mode == "above" else pc.less(t[col], thr)
        return t.filter(pc.fill_null(cmp, False))

    return ds.map_batches(gate, batch_format="pyarrow"), thr


def zscore_outliers(ds, group_col: str, value_col: str, z: int = 2,
                    num_partitions: int = 8):
    """Per-group z-score outlier gate in EXACT integer arithmetic: keep
    rows where ``|x − μ_g| > z·σ_g`` (population σ), with the float-free
    equivalent test ``|n·x − S| > isqrt(z²·(n·Q − S²))`` over the group's
    exact int64 sufficient statistics (n, S=Σx, Q=Σx²) — so a BIGINT/
    HUGEINT SQL oracle matches bit-for-bit and no boundary row can flip on
    float rounding (the ``*_c100`` catalog discipline applied to second
    moments).

    Scale shape: pass 1 ships one (group, n, S, Q) partial per batch into
    a tiny groupby (group cardinality–bounded — sources, languages);
    the driver folds them with unbounded Python ints (n·Q − S² overflows
    int64 long before the data stops fitting a cluster) and broadcasts
    {group: (n, S, K)} where K = isqrt(z²(nQ−S²)); pass 2 is one
    vectorized ``index_in`` probe + int64 compare per batch. Per-row
    arithmetic stays in int64 — safe while n·max(x) < 2⁶³ (~10¹³ rows per
    group at x≈10⁵), documented here rather than silently truncated.

    Reference analog: the historical drift checks
    (``mex/extractors/pipeline/checks/main.py:120-218``) promoted from
    per-asset counts to per-row statistical gating."""
    import math

    from ray.data.aggregate import Sum

    if z < 0:
        raise ValueError("zscore_outliers: z must be non-negative")

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col]
        if not pa.types.is_integer(v.type):
            raise TypeError(
                f"zscore_outliers: {value_col} is {v.type}; integer columns "
                "only (scale floats to a fixed point first)")
        if v.null_count:
            raise ValueError(f"zscore_outliers: null {value_col} values — filter first")
        v64 = pc.cast(v, pa.int64())
        t = pa.table({
            group_col: b[group_col],
            "_n": pa.array(np.ones(b.num_rows, np.int64)),
            "_s": v64,
            "_q": pc.multiply_checked(v64, v64),
        })
        return (t.group_by(group_col)
                 .aggregate([("_n", "sum"), ("_s", "sum"), ("_q", "sum")])
                 .rename_columns([group_col, "_n", "_s", "_q"]))

    stats = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(group_col)
               .aggregate(Sum("_n", alias_name="n"), Sum("_s", alias_name="s"),
                          Sum("_q", alias_name="q"))
               .take_all())  # one row per group — bounded by nature

    groups, n_arr, s_arr, k_arr = [], [], [], []
    for row in stats:
        n, s, q = int(row["n"]), int(row["s"]), int(row["q"])
        groups.append(row[group_col])
        n_arr.append(n)
        s_arr.append(s)
        # exact: d² > z²·var_num  ⇔  |d| > isqrt(z²·var_num)  (int math)
        k_arr.append(math.isqrt(z * z * (n * q - s * s)))
    group_keys = pa.array(groups)
    n_np = np.array(n_arr, np.int64)
    s_np = np.array(s_arr, np.int64)
    k_np = np.array(k_arr, np.int64)

    def gate(b: pa.Table) -> pa.Table:
        idx_a = pc.index_in(b[group_col], value_set=group_keys).combine_chunks()
        if idx_a.null_count:
            raise ValueError("zscore_outliers: group value unseen in pass 1")
        idx = np.asarray(idx_a.cast(pa.int64()))
        x = np.asarray(pc.cast(b[value_col], pa.int64()).combine_chunks())
        d = np.abs(n_np[idx] * x - s_np[idx])
        return b.filter(pa.array(d > k_np[idx]))

    return ds.map_batches(gate, batch_format="pyarrow")


def keyed_quantile_disc(ds, key: str, value_col: str,
                        qs: tuple[float, ...] = (0.5,),
                        num_partitions: int = 64):
    """EXACT grouped discrete quantiles (``PERCENTILE_DISC(q) WITHIN GROUP``)
    over an UNBOUNDED-cardinality value column — the gap left between
    :func:`grouped_bounded_quantiles` (exact, but bounded value space) and
    :func:`mex_extractors_ray.stages.shuffle.hash_sample_quantiles`
    (unbounded, but sampled): here every group's quantile is the actual
    element at rank ``ceil(q·n)``, whatever the value space.

    Scale shape: ONE coarse hash shuffle on the GROUP key (all rows of a
    group land in one block — the ``_keyed_blocks`` contract), then per
    block one Arrow sort + run-boundary rank picks; per-group state never
    exists outside its block, so memory is bounded by the largest group,
    not the corpus. Nulls are excluded (SQL semantics). Output:
    ``(key, q_c100:int64, value_col)`` with the value's original type."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    qs = tuple(qs)
    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"keyed_quantile_disc: q={q} outside (0, 1]")

    def block(g: pa.Table) -> pa.Table:
        g = g.filter(pc.is_valid(g[value_col]))
        n = g.num_rows
        empty = pa.table({key: pa.array([], g[key].type),
                          "q_c100": pa.array([], pa.int64()),
                          value_col: pa.array([], g[value_col].type)})
        if n == 0:
            return empty
        t = g.sort_by([(key, "ascending"), (value_col, "ascending")])
        starts = np.flatnonzero(_run_starts(t[key]))
        counts = np.diff(np.append(starts, n))
        outs = []
        for q in qs:
            pick = starts + np.ceil(q * counts).astype(np.int64) - 1
            taken = pa.array(pick)
            outs.append(pa.table({
                key: t[key].take(taken),
                "q_c100": pa.array(np.full(len(pick),
                                           int(round(q * 100)), np.int64)),
                value_col: t[value_col].take(taken),
            }))
        return pa.concat_tables(outs)

    return _keyed_blocks(ds, key, block, num_partitions)


def keyed_quantile_cont(ds, key: str, value_col: str,
                        qs: tuple[float, ...] = (0.5,),
                        num_partitions: int = 64):
    """EXACT grouped INTERPOLATED quantiles (``PERCENTILE_CONT(q) WITHIN
    GROUP``) — :func:`keyed_quantile_disc`'s continuous sibling. Rank
    position is ``q·(n−1)`` (0-indexed); the value is the linear
    interpolation ``lo·(1−frac) + hi·frac`` between the bracketing sorted
    elements — the exact float expression DuckDB evaluates (measured; the
    algebraically-equal ``lo + frac·(hi−lo)`` differs in the last ulp),
    so the result hash-matches the SQL oracle bit-for-bit on float64.

    Same scale shape as the discrete variant: ONE coarse hash shuffle on
    the group key, per-block sort + run-boundary rank arithmetic; memory
    bounded by the largest group. Nulls excluded (SQL semantics). Output:
    ``(key, q_c100:int64, value_col:float64)``."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    qs = tuple(qs)
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"keyed_quantile_cont: q={q} outside [0, 1]")

    def block(g: pa.Table) -> pa.Table:
        g = g.filter(pc.is_valid(g[value_col]))
        n = g.num_rows
        empty = pa.table({key: pa.array([], g[key].type),
                          "q_c100": pa.array([], pa.int64()),
                          value_col: pa.array([], pa.float64())})
        if n == 0:
            return empty
        t = g.sort_by([(key, "ascending"), (value_col, "ascending")])
        starts = np.flatnonzero(_run_starts(t[key]))
        counts = np.diff(np.append(starts, n))
        vals = np.asarray(pc.cast(t[value_col].combine_chunks(),
                                  pa.float64()), dtype=np.float64)
        outs = []
        for q in qs:
            pos = q * (counts - 1)
            lo = np.floor(pos).astype(np.int64)
            frac = pos - lo
            v_lo = vals[starts + lo]
            v_hi = vals[starts + np.minimum(lo + 1, counts - 1)]
            v = v_lo * (1.0 - frac) + v_hi * frac
            outs.append(pa.table({
                key: t[key].take(pa.array(starts)),
                "q_c100": pa.array(np.full(len(starts),
                                           int(round(q * 100)), np.int64)),
                value_col: pa.array(v),
            }))
        return pa.concat_tables(outs)

    return _keyed_blocks(ds, key, block, num_partitions)


def keyed_ohlc(ds, keys: list[str], order_cols: list[str], value_col: str,
               num_partitions: int = 64):
    """Grouped FIRST/LAST by explicit order plus MIN/MAX — the OHLC
    (open/high/low/close) aggregate every per-entity daily rollup wants,
    and the general form of "arg_min/arg_max with a deterministic
    composite order" (SQL needs a ROW_NUMBER window + conditional MAX to
    say the same thing). ``order_cols`` must totally order rows within a
    key or first/last are nondeterministic. Integer values only.

    ONE coarse shuffle on the injective composite key, per block one
    Arrow sort + run-boundary picks and ``reduceat`` extremes — no
    per-key dispatch. Output: ``keys`` + (open/high/low/close)_c."""
    from mex_extractors_ray.hashing import composite_gkey
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    keys, order_cols = list(keys), list(order_cols)

    def add_gkey(t: pa.Table) -> pa.Table:
        return t.append_column("_gkey", composite_gkey(t, keys))

    def block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        kt = {c: g[c].type for c in keys}
        empty = pa.table(
            {**{c: pa.array([], kt[c]) for c in keys},
             **{o: pa.array([], pa.int64())
                for o in ("open_c", "high_c", "low_c", "close_c")}})
        if n == 0:
            return empty
        col = g[value_col].combine_chunks()
        if not pa.types.is_integer(col.type):
            raise TypeError(f"keyed_ohlc: {value_col} is {col.type}; "
                            "integer columns only")
        if col.null_count:
            raise ValueError(f"keyed_ohlc: null {value_col} values")
        t = g.sort_by([("_gkey", "ascending")]
                      + [(c, "ascending") for c in order_cols])
        vals = np.asarray(t[value_col].combine_chunks().cast(pa.int64()))
        starts = np.flatnonzero(_run_starts(t["_gkey"]))
        counts = np.diff(np.append(starts, n))
        heads = pa.array(starts)
        return pa.table(
            {**{c: t[c].take(heads) for c in keys},
             "open_c": pa.array(vals[starts]),
             "high_c": pa.array(np.maximum.reduceat(vals, starts)),
             "low_c": pa.array(np.minimum.reduceat(vals, starts)),
             "close_c": pa.array(vals[starts + counts - 1])})

    tagged = ds.map_batches(add_gkey, batch_format="pyarrow")
    return _keyed_blocks(tagged, "_gkey", block, num_partitions)
