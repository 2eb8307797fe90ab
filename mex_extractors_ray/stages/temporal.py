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
