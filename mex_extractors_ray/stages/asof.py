"""As-of join — a custom operator Ray Data lacks.

No analog exists in the reference (its joins are exact-key dict probes,
SURVEY.md §2.5 "no range/as-of joins exist"); this is the training-data /
event-stream extension: for every left row, match the single right row with
the greatest ``on`` value ≤ the left's (``direction="backward"``; "forward"
and "nearest" symmetric), optionally within the same ``by`` key — the
standard enrich-events-with-latest-dimension-state operator.

Ray-Data-first design (documented partitioning assumption): both sides are
co-partitioned on ``hash(by) % num_buckets`` (one explicit shuffle per
side, same discipline as ``joins.bucketed_join``), so every ``by`` key's
rows land in one block and the in-block match is exact. Inside the block
the match itself is one C-speed ``pandas.merge_asof`` (sorted merge, no
per-row Python). Skewed ``by`` keys are handled by raising ``num_buckets``
(a single key's rows must fit one block — the same constraint as any keyed
merge; at 100 TB, range-partition on (by, on) instead and merge
boundary-adjacent blocks).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.hashing import assign_partitions


def asof_join(left, right, on: str, by: str, direction: str = "backward",
              num_buckets: int = 32, right_suffix: str = "_r"):
    """Left as-of join: every left row + the matched right row's columns
    (null where no match). ``on`` must be orderable (timestamp/int)."""
    l_schema, r_schema = left.schema(), right.schema()
    left_cols = list(l_schema.names)
    right_cols = list(r_schema.names)
    shared = {c for c in right_cols if c in left_cols and c not in (on, by)}

    def _arrow_type(t):
        if isinstance(t, pa.DataType):
            return t
        import numpy as _np

        try:
            return pa.from_numpy_dtype(_np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    l_types = dict(zip(l_schema.names, (_arrow_type(t) for t in l_schema.types)))
    r_types = dict(zip(r_schema.names, (_arrow_type(t) for t in r_schema.types)))
    all_cols = left_cols + [c for c in right_cols if c not in l_types]
    all_types = {**r_types, **l_types}

    def prepare(side: str):
        def _p(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                c: (t[c] if c in t.column_names else pa.nulls(n, all_types[c]))
                for c in all_cols
            }
            out = pa.table(cols)
            from mex_extractors_ray.hashing import shard_tags

            out = out.append_column(
                "_bucket", shard_tags(assign_partitions(t[by], num_buckets), num_buckets)
            )
            return out.append_column("_side", pa.array([side] * n))

        return _p

    both = left.map_batches(prepare("l"), batch_format="pyarrow").union(
        right.map_batches(prepare("r"), batch_format="pyarrow")
    )

    def match(g: pa.Table) -> pa.Table:
        # Arrow in → ArrowDtype pandas merge_asof → Arrow out: lossless
        # round-trip, identical explicit schema on every block (incl. empty
        # buckets) — no per-batch schema-hash warnings, no type widening
        side = g["_side"]
        l = (
            g.filter(pc.equal(side, "l")).select(left_cols)
            .to_pandas(types_mapper=pd.ArrowDtype)
            .sort_values(on, kind="mergesort")
        )
        r = (
            g.filter(pc.equal(side, "r")).select(right_cols)
            .to_pandas(types_mapper=pd.ArrowDtype)
            .sort_values(on, kind="mergesort")
        )
        if shared:
            r = r.rename(columns={c: f"{c}{right_suffix}" for c in shared})
        out = pd.merge_asof(
            l, r, on=on, by=by, direction=direction, suffixes=("", right_suffix)
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    try:
        grouped = both.groupby("_bucket", num_partitions=num_buckets)
    except TypeError:
        grouped = both.groupby("_bucket")
    return grouped.map_groups(match, batch_format="pyarrow")
