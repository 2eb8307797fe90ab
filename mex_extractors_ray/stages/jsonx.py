"""Semi-structured (JSON string column) field extraction.

The reference's transforms read dict fields freely off parsed API
payloads — ``mex/extractors/blueant/models/source.py`` and
``mex/extractors/confluence_vvt/extract.py:40-80`` walk
``record["..."]`` paths from REST JSON; a columnar engine needs the
extraction as an explicit operator over a ``string`` JSON column. Two
paths:

- :func:`json_scalar_field` — VECTORIZED ``pyarrow.compute.extract_regex``
  for FLAT objects with scalar values (the overwhelmingly common
  event-props shape). Zero Python per row; the whole batch is one kernel.
- :func:`json_fields` — the general path: a real ``json.loads`` per row
  (arbitrary nesting/escaping is inherently row-wise), but batched output
  construction so only the parse itself is Python.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc

# flat scalar value shapes the fast path understands
_NUM_RE = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"


def json_scalar_field(ds, col: str, key: str, out_col: str,
                      out_type: str = "int64"):
    """Extract a top-level scalar field from a flat JSON object column,
    fully vectorized. ``out_type``: ``int64`` / ``float64`` (numeric
    literal) or ``string`` (double-quoted literal WITHOUT escapes — the
    fast path refuses nothing, it just yields null where the pattern
    doesn't match, same as SQL ``json_extract`` on a miss). Use
    :func:`json_fields` when values can be nested or escaped."""
    kq = re.escape(key)
    if out_type == "int64":
        # integer literals only: anchor on the JSON delimiter so "5.5"
        # yields null (a non-integer literal is a miss, not a crash);
        # RE2 has no lookahead, but a JSON scalar always ends at , or }
        pat = f'"{kq}"\\s*:\\s*(?P<v>-?\\d+)\\s*[,}}]'
        typ = pa.int64()
    elif out_type == "float64":
        # same delimiter anchor as the int64 branch: "1.2.3" / "5x" are
        # malformed literals and must be misses, not numeric prefixes
        pat = f'"{kq}"\\s*:\\s*(?P<v>{_NUM_RE})\\s*[,}}]'
        typ = pa.float64()
    elif out_type == "string":
        pat = f'"{kq}"\\s*:\\s*"(?P<v>[^"\\\\]*)"\\s*[,}}]'
        typ = pa.string()
    else:
        raise ValueError(f"json_scalar_field: unsupported out_type {out_type}")

    def extract(t: pa.Table) -> pa.Table:
        hit = pc.extract_regex(t[col], pat)
        v = pc.struct_field(hit, "v")
        return t.append_column(out_col, pc.cast(v, typ))

    return ds.map_batches(extract, batch_format="pyarrow")


def json_fields(ds, col: str, fields: dict[str, str]):
    """General JSON extraction: ``fields`` maps output column name →
    dotted path (``"a.b.c"``). One ``json.loads`` per row (inherent for
    arbitrary JSON); missing paths / null input → null. Values come out
    as strings unless they are int/float/bool (kept natively when the
    whole column agrees — otherwise cast to string)."""
    paths = {out: p.split(".") for out, p in fields.items()}

    def extract(t: pa.Table) -> pa.Table:
        raw = t[col].to_pylist()
        outs: dict[str, list] = {o: [] for o in paths}
        for s in raw:
            doc = None
            if s is not None:
                try:
                    doc = json.loads(s)
                except (ValueError, TypeError):
                    doc = None
            for out, path in paths.items():
                cur = doc
                for seg in path:
                    cur = cur.get(seg) if isinstance(cur, dict) else None
                outs[out].append(cur)
        res = t
        for out, vals in outs.items():
            try:
                arr = pa.array(vals)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                # mixed scalar types across rows: degrade to string
                arr = pa.array([None if v is None else str(v)
                                for v in vals], pa.string())
            res = res.append_column(out, arr)
        return res

    return ds.map_batches(extract, batch_format="pyarrow")
