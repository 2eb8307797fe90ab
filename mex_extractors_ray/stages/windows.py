"""Windowed aggregates — custom operators Ray Data lacks.

The reference is batch-only ("no windows, no watermarks", SURVEY.md §2.10);
these are the streaming-analytics extension over the event stream:

- :func:`tumbling_window` — non-overlapping fixed windows: the window id is
  a pure function of the timestamp (``floor(epoch / width)``), so the whole
  operator is one vectorized bucket column + the standard partial-combine
  grouped aggregate (map-side partials, tiny shuffle — SURVEY.md §2.6
  discipline).
- :func:`hopping_window` — overlapping windows (width, hop): each row
  EXPLODES to its ``width/hop`` windows (vectorized numpy repeat — no
  per-row Python), then the same partial-combine aggregate. At 100 TB the
  explosion factor is width/hop, so keep it small or pre-aggregate to
  hop-sized tumbling buckets first and combine buckets per window (the
  classic two-level pane optimization; implemented here as
  ``panes=True``).

Windows are emitted as ``window_start`` epoch SECONDS (int64) — exact
integer arithmetic on both the engine and the DuckDB-oracle side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _epoch_seconds(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp column → epoch seconds. Contract: timestamps of any unit,
    or INTEGER columns already in epoch SECONDS (passed through as-is —
    guessing micro/milli for a bare int would silently zero every window);
    anything else raises."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us", tz=col.type.tz))  # unit-normalize (ns inputs)
        return (np.asarray(col.cast(pa.int64())) // 1_000_000).astype(np.int64)
    if pa.types.is_integer(col.type):
        return np.asarray(col.cast(pa.int64())).astype(np.int64)
    raise TypeError(
        f"window timestamp column must be timestamp or epoch-seconds integer, got {col.type}"
    )


def _scaled_int(col, scale: int = 100) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = np.asarray(col, dtype=np.float64)
    return np.floor(v * scale + 0.5).astype(np.int64)


def tumbling_window(ds, ts_col: str, value_col: str, width_s: int,
                    out_value: str = "value_c100"):
    """Grouped (sum, count) per non-overlapping window of ``width_s``
    seconds. Values are scaled-int (×100, half-up) so distributed summation
    order can never flip a comparison."""

    def partial(b: pa.Table) -> pa.Table:
        ws = (_epoch_seconds(b[ts_col]) // width_s) * width_s
        t = pa.table({"window_start": pa.array(ws),
                      out_value: pa.array(_scaled_int(b[value_col]))})
        return (
            t.group_by("window_start")
            .aggregate([(out_value, "sum"), ([], "count_all")])
            .rename_columns(["window_start", out_value, "n"])
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum(out_value, alias_name=out_value), Sum("n", alias_name="n"))
    )


def hopping_window(ds, ts_col: str, value_col: str, width_s: int, hop_s: int,
                   out_value: str = "value_c100", panes: bool = False):
    """Grouped (sum, count) per overlapping window: width ``width_s``,
    advancing every ``hop_s`` (width must be a multiple of hop). A row at
    time t belongs to windows starting at hop*k for
    k ∈ [floor(t/hop) - width/hop + 1, floor(t/hop)].

    ``panes=True`` first collapses rows to hop-sized panes (tumbling
    pre-aggregate), then explodes PANES instead of rows — the explosion
    cost drops from rows×(width/hop) to panes×(width/hop), the right shape
    when rows ≫ panes (the 100 TB regime)."""
    if width_s % hop_s:
        raise ValueError("width_s must be a multiple of hop_s")
    k = width_s // hop_s

    def explode(b: pa.Table) -> pa.Table:
        sec = _epoch_seconds(b[ts_col])
        val = _scaled_int(b[value_col])
        cnt = np.ones(len(sec), dtype=np.int64)
        if panes:
            # collapse to panes first (exact: pane membership is a pure
            # function of the timestamp)
            pane = (sec // hop_s) * hop_s
            t = pa.table({"p": pa.array(pane), "v": pa.array(val)})
            agg = (
                t.group_by("p").aggregate([("v", "sum"), ([], "count_all")])
                .rename_columns(["p", "v", "n"])
            )
            sec = np.asarray(agg["p"], dtype=np.int64)
            val = np.asarray(agg["v"], dtype=np.int64)
            cnt = np.asarray(agg["n"], dtype=np.int64)
        base = (sec // hop_s) * hop_s
        # windows containing this second/pane: base, base-hop, ..., k-1 back
        offsets = (np.arange(k, dtype=np.int64) * hop_s)[None, :]
        ws = (base[:, None] - offsets).reshape(-1)
        keep = ws >= 0  # no negative-epoch windows
        t = pa.table(
            {
                "window_start": pa.array(ws[keep]),
                out_value: pa.array(np.repeat(val, k)[keep]),
                "n": pa.array(np.repeat(cnt, k)[keep]),
            }
        )
        return (
            t.group_by("window_start")
            .aggregate([(out_value, "sum"), ("n", "sum")])
            .rename_columns(["window_start", out_value, "n"])
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum(out_value, alias_name=out_value), Sum("n", alias_name="n"))
    )


def sliding_distinct_count(ds, key_col: str, ts_col: str,
                           window_days: int = 7,
                           out_day: str = "day", out_n: str = "n",
                           num_partitions: int = 32):
    """Sliding-window DISTINCT count (e.g. 7-day active users): for every
    window-END day, how many distinct keys were active in the
    ``window_days`` days ending there. Distinct is not decomposable, so
    the windowed form can't come from partial sums — instead each
    distinct (key, activity-day) pair EXPLODES to the ``window_days``
    window-end days it covers, and one coarse shuffle on the end day
    counts distinct keys per block (all of a day's pairs co-locate).

    Cost: pairs × window_days rows through ONE exchange — ∝ active
    (key, day) pairs, never raw events (per-batch distinct combiner
    first), and bounded by the window length, never the corpus. Output:
    ``(out_day: 'YYYY-MM-DD', out_n: int64)`` for every window-end day
    covered by any activity."""
    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    US_PER_DAY = 86_400_000_000
    w = int(window_days)
    if w < 1:
        raise ValueError(f"sliding_distinct_count: window_days={w} < 1")

    def explode(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks().cast(pa.timestamp("us"))
        day = np.asarray(ts.cast(pa.int64())) // US_PER_DAY
        p = (pa.table({key_col: t[key_col]})
             .append_column("_day", pa.array(day))
             .group_by([key_col, "_day"]).aggregate([]))  # batch distinct
        n = p.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), w))
        ends = (np.repeat(np.asarray(p["_day"].combine_chunks()), w)
                + np.tile(np.arange(w, dtype=np.int64), n))
        return pa.table({key_col: p[key_col].take(idx),
                         "_end": pa.array(ends)})

    def count_block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({out_day: pa.array([], pa.string()),
                             out_n: pa.array([], pa.int64())})
        t = g.sort_by([("_end", "ascending"), (key_col, "ascending")])
        new_end = _run_starts(t["_end"])
        # distinct (end, key) pair boundaries within the sorted block
        pair = new_end | _run_starts(t[key_col])
        eidx = np.flatnonzero(new_end)
        # distinct pairs per end-day run: reduceat over the pair mask
        n_distinct = np.add.reduceat(pair.astype(np.int64), eidx)
        ends = np.asarray(t["_end"].combine_chunks())[eidx]
        day_str = pc.strftime(
            pa.array(ends * US_PER_DAY).cast(pa.timestamp("us")),
            format="%Y-%m-%d")
        return pa.table({out_day: day_str,
                         out_n: pa.array(n_distinct.astype(np.int64))})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return _keyed_blocks(exploded, "_end", count_block, num_partitions)
