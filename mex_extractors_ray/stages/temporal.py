"""Temporal parsing — the reference's ``TemporalEntity`` family.

The reference wraps partial dates (bare years, year-months, full dates) in
``TemporalEntity`` with per-cell parsing (``mex/extractors/ff_projects/
extract.py:52-64``: Excel cells that are datetimes OR year strings;
``mex/extractors/international_projects/extract.py:204-220``;
range-validated year strings ``synopse/models/project.py:26``).

Vectorized form: one pass classifies each string by shape (regex masks),
parses each shape with ``pc.strptime``, and records the precision so
downstream can distinguish "2020" from "2020-01-01".
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

PRECISIONS = ("year", "month", "day", "none")


def parse_temporal(
    batch: pa.Table, col: str, out_ts: str = "ts_parsed", out_precision: str = "ts_precision"
) -> pa.Table:
    """Parse a string column of {YYYY, YYYY-MM, YYYY-MM-DD} into a
    timestamp[us] column plus a precision label; unparseable → null/'none'.
    Fully vectorized (three regex masks + three strptime calls)."""
    s = pc.utf8_trim_whitespace(batch[col].cast(pa.string()))
    is_year = pc.fill_null(pc.match_substring_regex(s, r"^\d{4}$"), False)
    is_month = pc.fill_null(pc.match_substring_regex(s, r"^\d{4}-\d{2}$"), False)
    is_day = pc.fill_null(pc.match_substring_regex(s, r"^\d{4}-\d{2}-\d{2}$"), False)

    def try_parse(mask, fmt):
        masked = pc.if_else(mask, s, pa.nulls(len(s), pa.string()))
        return pc.strptime(masked, format=fmt, unit="us", error_is_null=True)

    ts = try_parse(is_day, "%Y-%m-%d")
    ts = pc.if_else(pc.is_valid(ts), ts, try_parse(is_month, "%Y-%m"))
    ts = pc.if_else(pc.is_valid(ts), ts, try_parse(is_year, "%Y"))

    precision = pa.nulls(len(s), pa.string())
    precision = pc.if_else(is_year, pa.scalar("year", pa.string()), precision)
    precision = pc.if_else(is_month, pa.scalar("month", pa.string()), precision)
    precision = pc.if_else(is_day, pa.scalar("day", pa.string()), precision)
    precision = pc.fill_null(precision, "none")
    # a shape that matched but failed strptime (e.g. month 13) is 'none'
    precision = pc.if_else(pc.is_valid(ts), precision, pa.scalar("none", pa.string()))
    return batch.append_column(out_ts, ts).append_column(out_precision, precision)


def year_threshold_mask(batch: pa.Table, col: str, rule: str) -> pa.ChunkedArray:
    """Parse the reference's string-encoded year rules (``" < 1890"`` from
    ``assets/mappings/__all__/activity_filter.yaml``, applied at
    ``mex/extractors/filters.py:52-64``) into a vectorized mask (True =
    rule fires)."""
    op, _, value = rule.strip().partition(" ")
    year = pc.year(batch[col]) if pa.types.is_timestamp(batch[col].type) else batch[col].cast(pa.int32())
    cmp = {"<": pc.less, "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}[op]
    return pc.fill_null(cmp(year, int(value)), False)


def fill_daily_gaps(ds, key: str, ts_col: str, value_col: str,
                    out_day: str = "day", out_val: str = "v",
                    num_partitions: int = 64):
    """Date-spine gap filling: per key, one row for EVERY calendar day
    between that key's first and last event day, with the day's summed
    integer ``value_col`` (0 on days with no rows) — the resampling step
    every per-entity time series needs before windowed models, which a
    plain GROUP BY can't produce (absent days simply don't exist).

    Scale shape: ONE coarse key-hash shuffle (``_keyed_blocks``); per
    block everything is vectorized numpy — day ints via integer division
    of epoch-µs, per-(key, day) sums via run-boundary ``reduceat``, the
    spine via one ``np.arange``-backed scatter (output size is the sum of
    per-key day spans, never materialized per key in Python). The spine
    is PER KEY (min..max of that key), so no global pass and no
    cross-key coordination. Integer values only (cents discipline).
    Output: ``(key, out_day: 'YYYY-MM-DD' string, out_val: int64)``."""
    import numpy as np

    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    US_PER_DAY = 86_400_000_000

    def block(g: pa.Table) -> pa.Table:
        kt = g[key].type
        empty = pa.table({key: pa.array([], kt),
                          out_day: pa.array([], pa.string()),
                          out_val: pa.array([], pa.int64())})
        n = g.num_rows
        if n == 0:
            return empty
        col = g[value_col].combine_chunks()
        if not pa.types.is_integer(col.type):
            raise TypeError(
                f"fill_daily_gaps: {value_col} is {col.type}; integer "
                "columns only (scale floats to cents first)")
        if col.null_count:
            # np.asarray would turn nulls into NaN and the int64 scatter
            # would silently write INT64_MIN — fail loudly instead
            raise ValueError(
                f"fill_daily_gaps: null {value_col} values — fill first")
        ts = g[ts_col].combine_chunks().cast(pa.timestamp("us"))
        day = pa.array(np.asarray(ts.cast(pa.int64())) // US_PER_DAY)
        t = (g.select([key, value_col]).append_column("_day", day)
             .sort_by([(key, "ascending"), ("_day", "ascending")]))
        days = np.asarray(t["_day"].combine_chunks())
        vals = np.asarray(t[value_col].combine_chunks().cast(pa.int64()))
        new_key = _run_starts(t[key])
        # (key, day) pair runs
        pair = new_key.copy()
        pair[1:] |= days[1:] != days[:-1]
        pidx = np.flatnonzero(pair)
        psum = np.add.reduceat(vals, pidx)
        pday = days[pidx]
        # key runs over the PAIR-level arrays
        kidx = np.flatnonzero(new_key[pidx])
        kcnt = np.diff(np.append(kidx, len(pidx)))
        lo = pday[kidx]                      # per-key first day
        hi = pday[kidx + kcnt - 1]           # per-key last day
        span = (hi - lo + 1).astype(np.int64)
        off = np.concatenate(([0], np.cumsum(span)))  # per-key output base
        total = int(off[-1])
        # spine days: for key r, off[r] + (0..span[r]-1) maps to lo[r]+i
        out_days = (np.repeat(lo - off[:-1], span)
                    + np.arange(total, dtype=np.int64))
        out_vals = np.zeros(total, dtype=np.int64)
        # scatter each (key, day) sum at its spine position
        pair_key = np.repeat(np.arange(len(kidx), dtype=np.int64), kcnt)
        pos = off[pair_key] + (pday - lo[pair_key])
        out_vals[pos] = psum
        out_keys = t[key].take(pa.array(pidx[kidx])) \
            .take(pa.array(np.repeat(np.arange(len(kidx)), span)))
        day_str = pc.strftime(
            pa.array(out_days * US_PER_DAY).cast(pa.timestamp("us")),
            format="%Y-%m-%d")
        return pa.table({key: out_keys, out_day: day_str,
                         out_val: pa.array(out_vals)})

    return _keyed_blocks(ds, key, block, num_partitions)
