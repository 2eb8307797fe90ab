"""Range (interval) join — equi-key + time-window join, a custom operator
Ray Data lacks.

No analog exists in the reference (its joins are exact-key dict probes,
SURVEY.md §2.5 "no range/as-of joins exist"); this is the event-stream /
attribution extension in the same family as ``stages/asof.py``: for every
left row, match right rows with the SAME key whose timestamp falls in
``(left_ts + lo, left_ts + hi]`` — e.g. "purchases by the same user within
one hour after a click" (conversion attribution), "readings during a
maintenance window", "sensor values near an alarm".

Ray-Data-first design (documented partitioning assumption): both sides are
tagged and co-partitioned on ``hash(key) % num_partitions`` (ONE exchange
total — same discipline as ``asof.asof_join`` / ``dedup._keyed_blocks``),
so every key's rows from both sides land in one block. Inside the block the
match is a single lexicographic rank computation — no per-key loop, no
per-row Python:

    count of right rows ≤ (k, v) lexicographically, evaluated at the two
    window boundaries per left row, cancels every right row outside the
    key and outside the window; the difference IS the per-row match count.

One ``np.lexsort`` + one ``np.cumsum`` per block, O((L+R) log(L+R)).
Skewed keys are handled by raising ``num_partitions`` (a single key's rows
must fit one block — the same constraint as any keyed merge; at 100 TB,
range-partition on (key, ts) instead and overlap-ship the boundary window,
which is bounded by ``hi - lo``).

``range_join_count`` keeps the output bounded (one row per left row) — the
safe default at scale. ``range_join`` emits the matched PAIRS; its output
is ∝ the true join cardinality, which a hostile window can blow up —
callers own that choice (the same caveat as any unbounded join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.hashing import assign_partitions, shard_tags
from mex_extractors_ray.stages.sessions import _epoch_us


def _prepare_union(left, right, key: str, num_partitions: int):
    """Tag sides, align schemas (missing columns → typed nulls), route on
    hash(key): the asof.py union discipline, shared by both join variants."""
    l_schema, r_schema = left.schema(), right.schema()
    left_cols, right_cols = list(l_schema.names), list(r_schema.names)

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
            out = out.append_column(
                "_bucket", shard_tags(assign_partitions(t[key], num_partitions), num_partitions)
            )
            return out.append_column("_side", pa.array([side] * n))

        return _p

    both = left.map_batches(prepare("l"), batch_format="pyarrow").union(
        right.map_batches(prepare("r"), batch_format="pyarrow")
    )
    return both, left_cols, right_cols


def _salted_sides(left, right, key: str, left_ts: str, right_ts: str,
                  salt: int):
    """Hot-key remedy for the COUNT/SUM variants (they decompose over
    right-side subsets): right rows are split across ``salt`` sub-buckets
    (deterministic fmix64 of the timestamp), each left row is replicated
    into every sub-bucket, and the per-copy partial results are summed
    back by the caller. A single key's rows then only need to fit
    ``1/salt`` of a block; the price is left-side replication ×salt and
    one extra (aggregate-scale) exchange. The salt is fmix64 of the
    timestamp (deterministic ⇒ reproducible/oracle-checkable), so a hot
    key whose rows share ONE hot timestamp stays hot — for that
    pathology, pre-aggregate the right side by (key, ts) first (counts
    and sums are re-aggregable)."""
    from mex_extractors_ray.stages.sessions import _epoch_us
    from mex_extractors_ray.stages.shuffle import fmix64

    from mex_extractors_ray.hashing import composite_gkey

    def _skey_of(t: pa.Table, s: np.ndarray) -> pa.Array:
        # injective (length-prefixed) so a key containing the separator
        # can't alias another (key, salt) routing bucket
        tmp = pa.table({key: t[key], "_salt": pa.array(s)})
        return composite_gkey(tmp, [key, "_salt"])

    def r_salt(t: pa.Table) -> pa.Table:
        us = _epoch_us(t[right_ts])
        s = (fmix64(us.astype(np.uint64)) % np.uint64(salt)).astype(np.int64)
        return t.append_column("_skey", _skey_of(t, s))

    def l_fan(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), salt))
        out = t.take(idx)
        s = np.tile(np.arange(salt, dtype=np.int64), n)
        return out.append_column("_skey", _skey_of(out, s))

    return (left.map_batches(l_fan, batch_format="pyarrow"),
            right.map_batches(r_salt, batch_format="pyarrow"))


def _key_codes(l_col, r_col):
    """Joint dictionary-encode both sides' key columns → comparable int32
    codes (any key type, no assumption of integer keys)."""
    l_arr = l_col.combine_chunks() if isinstance(l_col, pa.ChunkedArray) else l_col
    r_arr = r_col.combine_chunks() if isinstance(r_col, pa.ChunkedArray) else r_col
    joint = pa.chunked_array([l_arr, r_arr]).combine_chunks().dictionary_encode()
    codes = np.asarray(joint.indices, dtype=np.int64)
    return codes[: len(l_arr)], codes[len(l_arr):]


def _window_ranks(lu, lt, ru, rt, lo_us: int, hi_us: int):
    """Per left row: (lo_rank, hi_rank) = count of right rows ≤ the two
    lexicographic boundaries (key, ts+lo) / (key, ts+hi). Right rows sort
    BEFORE equal boundaries (tie column), so the lower bound is exclusive
    and the upper bound inclusive: window = (ts+lo, ts+hi]."""
    n_l, n_r = len(lu), len(ru)
    qu = np.concatenate([lu, lu])
    qt = np.concatenate([lt + lo_us, lt + hi_us])
    all_u = np.concatenate([ru, qu])
    all_t = np.concatenate([rt, qt])
    is_q = np.zeros(n_r + 2 * n_l, dtype=np.int8)
    is_q[n_r:] = 1
    order = np.lexsort((is_q, all_t, all_u))
    cum = np.cumsum(is_q[order] == 0)
    ranks = np.empty(len(order), dtype=np.int64)
    ranks[order] = cum
    q_ranks = ranks[n_r:]
    return q_ranks[:n_l], q_ranks[n_l:]


def range_join_count(left, right, key: str, left_ts: str, right_ts: str,
                     lo_s: float, hi_s: float, out_col: str = "n_matches",
                     num_partitions: int = 64, salt: int = 1,
                     id_cols: list[str] | None = None):
    """One row per left row: the left columns plus ``out_col`` = number of
    right rows with the same ``key`` and ``right_ts`` in
    ``(left_ts + lo_s, left_ts + hi_s]`` (seconds; ``lo_s`` exclusive,
    ``hi_s`` inclusive — the standard attribution-window convention).

    ``salt > 1`` is the hot-key path (``_salted_sides``): right rows split
    across salt sub-buckets, left rows replicated, partial counts summed
    on ``id_cols`` (required; they must identify a left row — output is
    then ``id_cols + out_col`` only)."""
    if hi_s < lo_s:
        raise ValueError(f"range_join_count: hi_s={hi_s} < lo_s={lo_s}")
    if salt > 1:
        if not id_cols:
            raise ValueError("range_join_count: salt>1 requires id_cols")
        from mex_extractors_ray.stages.aggregates import keyed_sums

        l_s, r_s = _salted_sides(left, right, key, left_ts, right_ts, salt)
        partial = range_join_count(l_s, r_s, "_skey", left_ts, right_ts,
                                   lo_s, hi_s, out_col, num_partitions)
        return keyed_sums(
            partial.map_batches(
                lambda t, _c=tuple(id_cols): t.select(list(_c) + [out_col]),
                batch_format="pyarrow"),
            list(id_cols), [out_col], num_partitions)
    lo_us, hi_us = int(round(lo_s * 1e6)), int(round(hi_s * 1e6))
    both, left_cols, _ = _prepare_union(left, right, key, num_partitions)

    def block(g: pa.Table) -> pa.Table:
        side = g["_side"]
        l = g.filter(pc.equal(side, "l")).select(left_cols)
        r = g.filter(pc.equal(side, "r"))
        counts = np.zeros(l.num_rows, dtype=np.int64)
        if l.num_rows and r.num_rows:
            lu, ru = _key_codes(l[key], r[key])
            lt = _epoch_us(l[left_ts])
            rt = _epoch_us(r[right_ts])
            lo_rank, hi_rank = _window_ranks(lu, lt, ru, rt, lo_us, hi_us)
            counts = hi_rank - lo_rank
        return l.append_column(out_col, pa.array(counts))

    def run(g: pa.Table) -> pa.Table:
        return block(g.drop_columns(["_bucket"]))

    try:
        grouped = both.groupby("_bucket", num_partitions=num_partitions)
    except TypeError:
        grouped = both.groupby("_bucket")
    return grouped.map_groups(run, batch_format="pyarrow")


def range_join_sum(left, right, key: str, left_ts: str, right_ts: str,
                   lo_s: float, hi_s: float, value_col: str,
                   sum_col: str = "win_sum", count_col: str = "win_n",
                   num_partitions: int = 64, salt: int = 1,
                   id_cols: list[str] | None = None):
    """Per left row: sum + count of the right side's int64 ``value_col``
    over the same-key window ``(left_ts + lo_s, left_ts + hi_s]`` — the
    distributed form of SQL's ``SUM(v) OVER (PARTITION BY key ORDER BY ts
    RANGE BETWEEN … PRECEDING AND CURRENT ROW)`` when left == right and
    ``lo_s < 0 ≤ hi_s`` (a RANGE frame takes ALL ties of the current
    timestamp, exactly this window's inclusive-hi behavior).

    Same single-exchange shape as ``range_join_count``; the per-block sum
    is an O(R) prefix-sum over the (key, ts)-sorted right side indexed at
    the two boundary ranks — integer math, so distributed and SQL runs
    agree bit-for-bit. ``salt > 1`` is the hot-key path (see
    ``range_join_count``): output restricted to ``id_cols + [sum_col,
    count_col]``."""
    if hi_s < lo_s:
        raise ValueError(f"range_join_sum: hi_s={hi_s} < lo_s={lo_s}")
    if salt > 1:
        if not id_cols:
            raise ValueError("range_join_sum: salt>1 requires id_cols")
        from mex_extractors_ray.stages.aggregates import keyed_sums

        l_s, r_s = _salted_sides(left, right, key, left_ts, right_ts, salt)
        partial = range_join_sum(l_s, r_s, "_skey", left_ts, right_ts,
                                 lo_s, hi_s, value_col, sum_col, count_col,
                                 num_partitions)
        return keyed_sums(
            partial.map_batches(
                lambda t, _c=tuple(id_cols): t.select(list(_c) + [sum_col, count_col]),
                batch_format="pyarrow"),
            list(id_cols), [sum_col, count_col], num_partitions)
    from mex_extractors_ray.stages.aggregates import _require_integer_col

    r_schema = right.schema()
    _require_integer_col(
        dict(zip(r_schema.names, r_schema.types)).get(value_col),
        value_col, "range_join_sum")
    lo_us, hi_us = int(round(lo_s * 1e6)), int(round(hi_s * 1e6))
    both, left_cols, _ = _prepare_union(left, right, key, num_partitions)

    def block(g: pa.Table) -> pa.Table:
        side = g["_side"]
        l = g.filter(pc.equal(side, "l")).select(left_cols)
        r = g.filter(pc.equal(side, "r"))
        sums = np.zeros(l.num_rows, dtype=np.int64)
        counts = np.zeros(l.num_rows, dtype=np.int64)
        if l.num_rows and r.num_rows:
            lu, ru = _key_codes(l[key], r[key])
            lt = _epoch_us(l[left_ts])
            rt = _epoch_us(r[right_ts])
            r_order = np.lexsort((rt, ru))
            rv = np.asarray(r[value_col].combine_chunks(), dtype=np.int64)[r_order]
            pref = np.concatenate([[0], np.cumsum(rv)])
            lo_rank, hi_rank = _window_ranks(lu, lt, ru[r_order], rt[r_order],
                                             lo_us, hi_us)
            sums = pref[hi_rank] - pref[lo_rank]
            counts = hi_rank - lo_rank
        return l.append_column(sum_col, pa.array(sums)) \
                .append_column(count_col, pa.array(counts))

    def run(g: pa.Table) -> pa.Table:
        return block(g.drop_columns(["_bucket"]))

    try:
        grouped = both.groupby("_bucket", num_partitions=num_partitions)
    except TypeError:
        grouped = both.groupby("_bucket")
    return grouped.map_groups(run, batch_format="pyarrow")


def range_join(left, right, key: str, left_ts: str, right_ts: str,
               lo_s: float, hi_s: float, right_suffix: str = "_r",
               num_partitions: int = 64):
    """Inner range join: one output row per (left, right) MATCH — left
    columns plus the matched right row's columns (shared names suffixed).
    Output cardinality is the true join size; prefer ``range_join_count``
    when only the count is needed."""
    if hi_s < lo_s:
        raise ValueError(f"range_join: hi_s={hi_s} < lo_s={lo_s}")
    lo_us, hi_us = int(round(lo_s * 1e6)), int(round(hi_s * 1e6))
    both, left_cols, right_cols = _prepare_union(left, right, key, num_partitions)
    shared = {c for c in right_cols if c in left_cols and c != key}
    r_out = [c for c in right_cols if c != key]

    def block(g: pa.Table) -> pa.Table:
        side = g["_side"]
        l = g.filter(pc.equal(side, "l")).select(left_cols)
        r = g.filter(pc.equal(side, "r")).select(right_cols)
        out_names = left_cols + [
            (f"{c}{right_suffix}" if c in shared else c) for c in r_out
        ]
        if not (l.num_rows and r.num_rows):
            empty = {n: pa.chunked_array([[]], type=t) for n, t in zip(
                out_names,
                [l.schema.field(c).type for c in left_cols]
                + [r.schema.field(c).type for c in r_out],
            )}
            return pa.table(empty)
        lu, ru = _key_codes(l[key], r[key])
        lt = _epoch_us(l[left_ts])
        rt = _epoch_us(r[right_ts])
        # ranks are positions into the right side sorted by (key, ts):
        # sort r once, then each left row's matches are a contiguous slice
        r_order = np.lexsort((rt, ru))
        r_sorted = r.take(pa.array(r_order))
        lo_rank, hi_rank = _window_ranks(lu, lt, ru[r_order], rt[r_order], lo_us, hi_us)
        lens = hi_rank - lo_rank
        total = int(lens.sum())
        if total == 0:
            return pa.table({
                n: pa.chunked_array([[]], type=t) for n, t in zip(
                    out_names,
                    [l.schema.field(c).type for c in left_cols]
                    + [r.schema.field(c).type for c in r_out],
                )
            })
        cum = np.cumsum(lens)
        first = np.repeat(cum - lens, lens)
        r_idx = np.repeat(lo_rank, lens) + (np.arange(total) - first)
        l_idx = np.repeat(np.arange(len(lu)), lens)
        l_rows = l.take(pa.array(l_idx))
        r_rows = r_sorted.take(pa.array(r_idx))
        cols = {c: l_rows[c] for c in left_cols}
        for c in r_out:
            cols[f"{c}{right_suffix}" if c in shared else c] = r_rows[c]
        return pa.table(cols)

    def run(g: pa.Table) -> pa.Table:
        return block(g.drop_columns(["_bucket"]))

    try:
        grouped = both.groupby("_bucket", num_partitions=num_partitions)
    except TypeError:
        grouped = both.groupby("_bucket")
    return grouped.map_groups(run, batch_format="pyarrow")
