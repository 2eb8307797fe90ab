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

import pandas as pd
import pyarrow as pa


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
                            sep: str = ","):
    """Per key: the sorted distinct values joined by ``sep`` — the
    reference's deterministic ``valueSet = sorted({level.textbox51})``
    (``synopse/transform.py:200-202``). Two-level: per-batch distinct
    (combiner) → per-group distinct-sort (finalize), so the shuffle carries
    deduplicated rows only."""

    def batch_distinct(b: pa.Table) -> pa.Table:
        return b.select([key, value]).group_by([key, value]).aggregate([])

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        vals = sorted(set(v for v in g[value] if v is not None))
        return pd.DataFrame({key: [g[key].iloc[0]], out: [sep.join(map(str, vals))]})

    return (
        ds.map_batches(batch_distinct, batch_format="pyarrow")
        .groupby(key)
        .map_groups(finalize, batch_format="pandas")
    )


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
