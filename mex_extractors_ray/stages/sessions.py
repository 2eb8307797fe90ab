"""Gap-based sessionization — assign events to sessions per key where a
new session starts after an inactivity gap.

The reference has no sessionizer (its closest concept is the
run-timestamp sensor partitioning, ``mex/extractors/pipeline`` sensors);
this is a training-data / clickstream extension in the same family as the
window aggregates (``stages/windows.py``).

Scale shape: ONE coarse hash shuffle on the session key
(``dedup._keyed_blocks`` — all rows of a key land in one block), then a
single vectorized pass per block: one Arrow sort, one run-boundary mask,
numpy cumsum/reduceat for the per-session rollup. No per-key dispatch, no
Python row loop; the shuffle is the only exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts


def _epoch_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """int64 epoch microseconds from a timestamp column. Raises on
    non-timestamp input — integer columns are ambiguous (seconds? µs?),
    the lesson of ``windows._epoch_seconds`` (ADVICE r2)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_timestamp(col.type):
        raise TypeError(
            f"sessionize expects a timestamp column, got {col.type}; "
            "cast explicitly if your epoch unit is unambiguous"
        )
    if col.null_count:
        raise ValueError("sessionize: null timestamps are ambiguous — filter or fill first")
    return np.asarray(col.cast(pa.timestamp("us")).cast(pa.int64()))


def sessionize(ds, key: str, ts_col: str, gap_s: float,
               order_cols: tuple[str, ...] = (), num_partitions: int = 64):
    """One row per (key, session): ``session_id`` (1-based per key, in time
    order), ``n_events``, ``start_us``, ``end_us``.

    A new session starts at a key's first event and whenever the gap from
    the previous event exceeds ``gap_s`` seconds. ``order_cols`` breaks
    timestamp ties deterministically (e.g. an event id)."""
    gap_us = int(round(gap_s * 1_000_000))

    def block(g: pa.Table) -> pa.Table:
        kt = g[key].type
        empty = pa.table({
            key: pa.array([], kt),
            "session_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "start_us": pa.array([], pa.int64()),
            "end_us": pa.array([], pa.int64()),
        })
        n = g.num_rows
        if n == 0:
            return empty
        sort_keys = [(key, "ascending"), (ts_col, "ascending")] + [
            (c, "ascending") for c in order_cols
        ]
        t = g.sort_by(sort_keys)
        us = _epoch_us(t[ts_col])
        new_key = _run_starts(t[key])
        gap_break = np.empty(n, dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (us[1:] - us[:-1]) > gap_us
        new_sess = new_key | gap_break

        # per-key session ordinal: global cumsum minus the value at the
        # key run's first row (+1) — no per-key loop
        cum = np.cumsum(new_sess)
        key_starts = np.flatnonzero(new_key)
        key_counts = np.diff(np.append(key_starts, n))
        sess_id = cum - np.repeat(cum[key_starts], key_counts) + 1

        # per-session rollup over contiguous runs (block is sorted)
        s_starts = np.flatnonzero(new_sess)
        s_counts = np.diff(np.append(s_starts, n))
        s_last = np.append(s_starts[1:], n) - 1
        return pa.table({
            key: t[key].take(pa.array(s_starts)),
            "session_id": pa.array(sess_id[s_starts].astype(np.int64)),
            "n_events": pa.array(s_counts.astype(np.int64)),
            "start_us": pa.array(us[s_starts].astype(np.int64)),
            "end_us": pa.array(us[s_last].astype(np.int64)),
        })

    return _keyed_blocks(ds, key, block, num_partitions)


def keyed_lead(ds, key: str, order_col: str, out_col: str = "lead",
               fill: int = -1, num_partitions: int = 64):
    """``lead()`` window function: per row, the SAME key's NEXT
    ``order_col`` value in ascending order; ``fill`` (default ``-1``) for a
    key's last row — a sentinel instead of null so downstream int64 schemas
    stay non-nullable (the catalog hash discipline).

    SQL equivalent: ``COALESCE(lead(order_col) OVER (PARTITION BY key
    ORDER BY order_col), fill)``. This is the SCD-Type-2 building block:
    over a change log it turns per-key version rows into validity
    intervals (valid_from = order_col, valid_to = lead) — the interval
    form of the last-wins collapse the reference's versioned merge does
    (`mex/extractors/sumo/transform.py` keeps only the latest row; SCD2
    keeps them all with bounds). Scale shape == ``sessionize``: ONE coarse
    key-hash shuffle, then per block one Arrow sort + one numpy shift
    masked at key-run ends. ``order_col`` must be integer-typed and
    non-null (LSNs / sequence numbers)."""

    def block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        t = g.sort_by([(key, "ascending"), (order_col, "ascending")])
        col = t[order_col].combine_chunks()
        if col.null_count:
            raise ValueError(f"keyed_lead: null {order_col} values are ambiguous")
        vals = np.asarray(col.cast(pa.int64()))
        new_key = _run_starts(t[key])
        lead = np.empty(n, dtype=np.int64)
        lead[:-1] = vals[1:]
        lead[-1] = fill
        # a key's LAST row = the row before the next key's first run start
        last = np.empty(n, dtype=bool)
        last[:-1] = new_key[1:]
        last[-1] = True
        lead[last] = fill
        return t.append_column(out_col, pa.array(lead))

    return _keyed_blocks(ds, key, block, num_partitions)


def keyed_cumsum(ds, key: str, order_col: str, value_col: str,
                 out_col: str = "running_sum", num_partitions: int = 64):
    """Running total window function: per row, the cumulative sum of
    ``value_col`` over the SAME key's rows up to and including it in
    ``order_col`` order — SQL ``SUM(v) OVER (PARTITION BY key ORDER BY
    order_col)``. Integer value columns only (the reduceat-kernel
    discipline: silent float truncation is refused, scale to cents
    first). Scale shape == ``keyed_lead``: ONE coarse key-hash shuffle,
    per block one Arrow sort + one global cumsum rebased at key-run
    starts — no per-key dispatch."""

    def block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        t = g.sort_by([(key, "ascending"), (order_col, "ascending")])
        col = t[value_col].combine_chunks()
        if not pa.types.is_integer(col.type):
            raise TypeError(
                f"keyed_cumsum: {value_col} is {col.type}; integer columns "
                "only (scale floats to cents first)")
        if col.null_count:
            raise ValueError(f"keyed_cumsum: null {value_col} values — fill first")
        vals = np.asarray(col.cast(pa.int64()))
        cs = np.cumsum(vals)
        new_key = _run_starts(t[key])
        starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(starts, n))
        base = np.repeat(cs[starts] - vals[starts], counts)
        return t.append_column(out_col, pa.array((cs - base).astype(np.int64)))

    return _keyed_blocks(ds, key, block, num_partitions)


def keyed_moving_sum(ds, key: str, order_cols: tuple[str, ...],
                     value_col: str, k: int,
                     out_col: str = "moving_sum", num_partitions: int = 64):
    """ROWS-frame moving window: per row, the sum of ``value_col`` over
    the SAME key's last ``k`` rows (this one and ``k−1`` preceding) in
    ``order_cols`` order — SQL ``SUM(v) OVER (PARTITION BY key ORDER BY
    order_cols ROWS BETWEEN k−1 PRECEDING AND CURRENT ROW)``.
    ``order_cols`` must be a TOTAL order within the key (add a tiebreaker
    id) or the frame membership is nondeterministic. Integer values only
    (the reduceat-kernel discipline; scale floats to cents first).

    Scale shape == ``keyed_cumsum``: ONE coarse key-hash shuffle, per
    block one Arrow sort + one global cumsum; the frame sum is
    ``cs[i] − cs[i−k]`` clamped at the key-run start — no per-key
    dispatch, no per-row loop."""
    if k < 1:
        raise ValueError(f"keyed_moving_sum: k={k} must be >= 1")
    order_cols = tuple(order_cols)

    def block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        t = g.sort_by([(key, "ascending")]
                      + [(c, "ascending") for c in order_cols])
        col = t[value_col].combine_chunks()
        if not pa.types.is_integer(col.type):
            raise TypeError(
                f"keyed_moving_sum: {value_col} is {col.type}; integer "
                "columns only (scale floats to cents first)")
        if col.null_count:
            raise ValueError(
                f"keyed_moving_sum: null {value_col} values — fill first")
        vals = np.asarray(col.cast(pa.int64()))
        cs = np.cumsum(vals)
        new_key = _run_starts(t[key])
        starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(starts, n))
        run_start = np.repeat(starts, counts)
        i = np.arange(n, dtype=np.int64)
        # frame floor: max(i − k, run_start − 1); cs[-1-equivalent] = 0
        j = np.maximum(i - k, run_start - 1)
        prev = np.where(j >= 0, cs[np.maximum(j, 0)], 0)
        return t.append_column(out_col,
                               pa.array((cs - prev).astype(np.int64)))

    return _keyed_blocks(ds, key, block, num_partitions)


def keyed_moving_extreme(ds, key: str, order_cols: tuple[str, ...],
                         value_col: str, k: int, mode: str = "max",
                         out_col: str | None = None,
                         num_partitions: int = 64):
    """ROWS-frame moving MAX/MIN: per row, the extreme of ``value_col``
    over the SAME key's last ``k`` rows in ``order_cols`` order — SQL
    ``MAX|MIN(v) OVER (PARTITION BY key ORDER BY order_cols ROWS BETWEEN
    k−1 PRECEDING AND CURRENT ROW)``. Integer values only.

    Vectorization: one sorted pass builds a k-wide sliding window over
    the whole block (``sliding_window_view``); positions reaching across
    a key-run boundary are first masked to ∓INT64 extremes, so the
    cross-run cells can never win — no per-key dispatch, no Python loop.
    Memory is the block × k view (a stride trick — no copy)."""
    if k < 1:
        raise ValueError(f"keyed_moving_extreme: k={k} must be >= 1")
    if mode not in ("max", "min"):
        raise ValueError(f"keyed_moving_extreme: mode={mode!r}")
    out_col = out_col or f"moving_{mode}"
    order_cols = tuple(order_cols)

    def block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        t = g.sort_by([(key, "ascending")]
                      + [(c, "ascending") for c in order_cols])
        col = t[value_col].combine_chunks()
        if not pa.types.is_integer(col.type):
            raise TypeError(
                f"keyed_moving_extreme: {value_col} is {col.type}; "
                "integer columns only")
        if col.null_count:
            raise ValueError(
                f"keyed_moving_extreme: null {value_col} values — fill first")
        vals = np.asarray(col.cast(pa.int64()))
        sentinel = np.iinfo(np.int64).min if mode == "max" \
            else np.iinfo(np.int64).max
        new_key = _run_starts(t[key])
        starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(starts, n))
        run_start = np.repeat(starts, counts)
        # pad k-1 sentinels in front, then mask any window cell that
        # belongs to an earlier key run
        padded = np.concatenate(
            (np.full(k - 1, sentinel, np.int64), vals))
        win = np.lib.stride_tricks.sliding_window_view(padded, k)
        # cell j of row i holds original index i-k+1+j; mask < run_start
        orig = (np.arange(n, dtype=np.int64)[:, None]
                + np.arange(k, dtype=np.int64)[None, :] - (k - 1))
        masked = np.where(orig >= run_start[:, None], win, sentinel)
        ext = masked.max(axis=1) if mode == "max" else masked.min(axis=1)
        return t.append_column(out_col, pa.array(ext))

    return _keyed_blocks(ds, key, block, num_partitions)


def keyed_transitions(ds, key: str, ts_col: str, type_col: str,
                      order_cols: tuple[str, ...] = (),
                      from_col: str = "from_type", to_col: str = "to_type",
                      num_partitions: int = 64):
    """Markov transition counts over per-key ordered event streams: for
    every consecutive pair of a key's events (time order, ties broken by
    ``order_cols``), count the global ``(type, next type)`` bigram — the
    building block of behavioral Markov models / next-event prediction.

    SQL equivalent: ``LEAD(type) OVER (PARTITION BY key ORDER BY ts, …)``
    then ``GROUP BY (type, next)``. Scale shape: ONE coarse key-hash
    shuffle (all of a key's rows in one block), per block one Arrow sort +
    one shifted-equality mask + a local Arrow group_by — the exchange to
    the final sum ships (|types|² × blocks) partial rows, never raw
    events. Reference analog: the per-asset count checks promoted to a
    sequence statistic."""
    from mex_extractors_ray.stages.aggregates import keyed_sums

    sort_keys = [(key, "ascending"), (ts_col, "ascending")] + [
        (c, "ascending") for c in order_cols
    ]

    def block(g: pa.Table) -> pa.Table:
        empty = pa.table({
            from_col: pa.array([], pa.string()),
            to_col: pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
        n = g.num_rows
        if n < 2:
            return empty
        t = g.sort_by(sort_keys)
        new_key = _run_starts(t[key])
        same = ~new_key[1:]  # row i+1 continues row i's key
        if not same.any():
            return empty
        ty = t[type_col].combine_chunks()
        mask = pa.array(same)
        pairs = pa.table({
            from_col: ty.slice(0, n - 1).filter(mask),
            to_col: ty.slice(1, n - 1).filter(mask),
        })
        counted = pairs.group_by([from_col, to_col]).aggregate([([], "count_all")])
        return counted.rename_columns([from_col, to_col, "n"])

    partials = _keyed_blocks(ds, key, block, num_partitions)
    # transition matrix is |types|²-bounded — the final sum is tiny
    return keyed_sums(partials, [from_col, to_col], ["n"],
                      num_partitions=min(num_partitions, 8))


def cohort_retention(ds, key: str, ts_col: str, num_partitions: int = 64):
    """Cohort retention: users grouped by their first-activity day, counted
    per (cohort day, day offset) — the classic product-analytics retention
    triangle, exact.

    Scale shape: (1) map-side distinct (key, day) pairs per batch (the
    combiner discipline — the exchange ships at most one row per user-day,
    never raw events); (2) ONE coarse key-hash shuffle so each user's full
    day set is in one block, where a sort + run-boundary kernel dedups
    pairs and rebases each day against the user's min (cohort) day; (3) a
    tiny grouped count — after step 2 each user contributes exactly one
    row per (cohort, offset), so a plain count IS the distinct-user count.
    Output: ``cohort_day`` ("%Y-%m-%d"), ``offset_days``, ``n_users``."""
    import pyarrow.compute as pc

    from mex_extractors_ray.stages.aggregates import grouped_count

    us_per_day = 86_400_000_000

    def day_pairs(b: pa.Table) -> pa.Table:
        day = pa.array(_epoch_us(b[ts_col]) // us_per_day)
        t = pa.table({key: b[key], "_day": day})
        return t.group_by([key, "_day"]).aggregate([])

    def block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"_cohort": pa.array([], pa.int64()),
                             "offset_days": pa.array([], pa.int64())})
        t = g.sort_by([(key, "ascending"), ("_day", "ascending")])
        karr = np.asarray(t[key].combine_chunks().cast(pa.int64()))
        darr = np.asarray(t["_day"].combine_chunks())
        keep = np.empty(len(karr), dtype=bool)  # dedup pairs across batches
        keep[0] = True
        keep[1:] = (karr[1:] != karr[:-1]) | (darr[1:] != darr[:-1])
        karr, darr = karr[keep], darr[keep]
        starts = np.empty(len(karr), dtype=bool)
        starts[0] = True
        starts[1:] = karr[1:] != karr[:-1]
        idx = np.flatnonzero(starts)
        counts = np.diff(np.append(idx, len(karr)))
        cohort = np.repeat(darr[idx], counts)  # block sorted ⇒ min = first
        return pa.table({"_cohort": pa.array(cohort),
                         "offset_days": pa.array(darr - cohort)})

    pairs = ds.map_batches(day_pairs, batch_format="pyarrow")
    rebased = _keyed_blocks(pairs, key, block, num_partitions)
    counted = grouped_count(rebased, ["_cohort", "offset_days"], alias="n_users")

    def finalize(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.multiply(b["_cohort"], us_per_day), pa.timestamp("us"))
        return pa.table({
            "cohort_day": pc.strftime(ts, format="%Y-%m-%d"),
            "offset_days": b["offset_days"],
            "n_users": b["n_users"],
        })

    return counted.map_batches(finalize, batch_format="pyarrow")


def keyed_lag_gaps(ds, key: str, ts_col: str, order_cols: tuple[str, ...] = (),
                   out_col: str = "prev_gap_us", num_partitions: int = 64):
    """``lag()``-family window function re-expressed Ray-Data-first: per
    row, the gap (microseconds) to the SAME key's previous event in time
    order, ``-1`` for a key's first event.

    SQL equivalent: ``ts - lag(ts) OVER (PARTITION BY key ORDER BY ts,
    order_cols)``. Scale shape is identical to ``sessionize``: ONE coarse
    hash shuffle on the key, then per block one Arrow sort + one numpy
    diff masked at key run starts — no per-key dispatch, no row loop.
    Output = every input column (block-sorted) plus ``out_col``."""

    def block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        sort_keys = [(key, "ascending"), (ts_col, "ascending")] + [
            (c, "ascending") for c in order_cols
        ]
        t = g.sort_by(sort_keys)
        us = _epoch_us(t[ts_col])
        new_key = _run_starts(t[key])
        gaps = np.empty(n, dtype=np.int64)
        gaps[0] = -1
        gaps[1:] = us[1:] - us[:-1]
        gaps[new_key] = -1
        return t.append_column(out_col, pa.array(gaps))

    return _keyed_blocks(ds, key, block, num_partitions)
