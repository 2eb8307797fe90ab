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
