"""Join / lookup operators.

All of the reference's joins are hash joins with a small build side held as
a Python dict (SURVEY.md §2.5 — e.g. the composite-key study⋈overview join,
``mex/extractors/synopse/transform.py:91-119``; the semi-join + regex
predicate, ``mex/extractors/ifsg/filter.py:10-30``; the anti-join of
obsolete assets, ``mex/extractors/system/main.py:118-128``). The Ray-Data
re-expression:

- **broadcast hash join**: materialize the (small) build side ONCE on the
  driver, ``ray.put`` it, and probe per batch inside a map_batches actor —
  the small side is shipped to each actor once, never per batch, and there
  is no shuffle.
- **semi/anti join**: broadcast the key set and mask with ``pc.is_in``.
- **large-large join**: co-partition both sides on a shared bucket column
  (``hash(key) % B``) and join per bucket inside ``map_groups`` — one
  explicit shuffle per side, skew handled by raising B.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.hashing import assign_partitions

from .. import runtime as _rt


class BroadcastJoin:
    """map_batches actor: probe-side stream ⋈ broadcast build side.

    ``build_ref`` is a ``ray.ObjectRef`` to a pandas DataFrame (or the
    DataFrame itself for tests). De-referenced ONCE per actor in __init__ —
    the reference's build-a-dict-then-probe shape, distributed.
    """

    def __init__(self, build_ref, on: str | list[str], how: str = "inner",
                 suffix: str = "_r"):
        import ray

        build = ray.get(build_ref) if hasattr(build_ref, "hex") else build_ref
        self.build = build
        self.on = [on] if isinstance(on, str) else list(on)
        self.how = how
        self.suffix = suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.build, on=self.on, how=self.how, suffixes=("", self.suffix))


def broadcast_join(ds, build_df: pd.DataFrame, on, how: str = "inner"):
    """Probe `ds` against a small dimension table, broadcast once."""
    import ray

    ref = ray.put(build_df)
    return ds.map_batches(
        BroadcastJoin,
        fn_constructor_args=(ref, on, how),
        batch_format="pandas",
        concurrency=_rt.auto_pool(),
    )


class BroadcastLookup:
    """Arrow-native broadcast hash lookup: one ``pc.index_in`` against the
    broadcast key array + one ``pc.take`` of the value array per batch —
    zero pandas conversion on the probe stream (use this instead of
    :class:`BroadcastJoin` when the build side maps key → ONE value column;
    it is the dictionary-index probe of VERDICT r1 fix #5)."""

    def __init__(self, pair_ref, key_col: str, out_col: str, how: str = "inner"):
        import ray

        pair = ray.get(pair_ref) if hasattr(pair_ref, "hex") else pair_ref
        self.keys = pa.array(pair["keys"]) if not isinstance(pair["keys"], (pa.Array, pa.ChunkedArray)) else pair["keys"]
        self.values = pa.array(pair["values"]) if not isinstance(pair["values"], (pa.Array, pa.ChunkedArray)) else pair["values"]
        self.key_col, self.out_col, self.how = key_col, out_col, how

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch[self.key_col], value_set=self.keys)
        out = batch.append_column(self.out_col, pc.take(self.values, idx))
        if self.how == "inner":
            out = out.filter(pc.is_valid(idx))
        return out


def broadcast_lookup(ds, keys, values, key_col: str, out_col: str,
                     how: str = "inner"):
    """Probe `ds[key_col]` against a broadcast (keys → values) pair; emits
    `out_col`. ``how='inner'`` drops non-matching rows (semi join + lookup
    fused in one Arrow pass); ``'left'`` keeps them with null.

    Runs as STATELESS tasks: the pair is ``ray.put`` once as Arrow arrays
    (zero-copy out of the object store per task — shipped once per node,
    not per batch), so the stage scales elastically with no actor-pool
    startup cost."""
    import ray

    pair_ref = ray.put(
        {
            "keys": keys if isinstance(keys, (pa.Array, pa.ChunkedArray)) else pa.array(keys),
            "values": values if isinstance(values, (pa.Array, pa.ChunkedArray)) else pa.array(values),
        }
    )

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        pair = _ray.get(pair_ref)
        idx = pc.index_in(batch[key_col], value_set=pair["keys"])
        out = batch.append_column(out_col, pc.take(pair["values"], idx))
        if how == "inner":
            out = out.filter(pc.is_valid(idx))
        return out

    return ds.map_batches(probe, batch_format="pyarrow")


def semi_join_mask(batch: pa.Table, column: str, keys: Iterable) -> pa.Table:
    return batch.filter(pc.is_in(batch[column], value_set=pa.array(list(keys))))


def anti_join_mask(batch: pa.Table, column: str, keys: Iterable) -> pa.Table:
    return batch.filter(pc.invert(pc.is_in(batch[column], value_set=pa.array(list(keys)))))


def semi_join(ds, column: str, keys: Iterable):
    """Keep rows whose key is in the broadcast set (ifsg filter shape)."""
    keys = list(keys)
    return ds.map_batches(lambda t: semi_join_mask(t, column, keys), batch_format="pyarrow")


def anti_join(ds, column: str, keys: Iterable):
    """Drop rows whose key is in the broadcast set (obsolete-assets shape)."""
    keys = list(keys)
    return ds.map_batches(lambda t: anti_join_mask(t, column, keys), batch_format="pyarrow")


def list_overlap_mask(batch: pa.Table, list_col: str, keys: Iterable) -> pa.Array:
    """True where the row's list column shares ANY element with the
    broadcast key set — vectorized: one flatten + one ``pc.is_in`` + one
    segmented any (bincount over row offsets). The reference's
    ``funderOrCommissioner ∩ org-ids`` filter
    (``mex/extractors/datenkompass/filter.py:24-54``) and the
    ``memberOf ∩ units`` person-unit lookup
    (``mex/extractors/publisher/transform.py:24-51``). Null lists → False."""
    import numpy as np

    col = batch[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if pa.types.is_null(col.type):  # block of all-None rows infers null type
        return pa.array(np.zeros(n, dtype=bool))
    flat = pc.list_flatten(col)
    if len(flat) == 0 or pa.types.is_null(flat.type):
        # block of empty/null lists only (list<null> inference)
        return pa.array(np.zeros(n, dtype=bool))
    hit = pc.fill_null(pc.is_in(flat, value_set=pa.array(list(keys))), False)
    hits = np.asarray(hit, dtype=bool)
    sizes = pc.fill_null(pc.list_value_length(col), 0).to_numpy(zero_copy_only=False)
    rows = np.repeat(np.arange(n), sizes)
    return pa.array(np.bincount(rows[hits], minlength=n) > 0)


def list_overlap_semi_join(ds, list_col: str, keys: Iterable):
    """Keep rows whose list column intersects the broadcast key set."""
    keys = list(keys)
    return ds.map_batches(
        lambda t: t.filter(list_overlap_mask(t, list_col, keys)), batch_format="pyarrow"
    )


def list_overlap_anti_join(ds, list_col: str, keys: Iterable):
    """Drop rows whose list column intersects the broadcast key set (the
    datenkompass exclusion shape)."""
    keys = list(keys)
    return ds.map_batches(
        lambda t: t.filter(pc.invert(list_overlap_mask(t, list_col, keys))),
        batch_format="pyarrow",
    )


def bucketed_join(left, right, on: str, num_buckets: int = 32, how: str = "inner"):
    """Large-large hash join: co-partition both sides on hash(key) % B, then
    pandas-merge per bucket. Two shuffles total; raise ``num_buckets`` for
    skewed keys. Key column may be string (byte hash) or integer (splitmix64
    value hash — no cast, no byte inflation on the shuffle)."""
    l_schema, r_schema = left.schema(), right.schema()
    left_cols = list(l_schema.names)
    right_cols = list(r_schema.names)

    def _arrow_type(t):
        # Dataset.schema() reports python classes for pandas-backed blocks;
        # normalize to Arrow types so null-padding always works
        if isinstance(t, pa.DataType):
            return t
        import numpy as _np

        try:
            return pa.from_numpy_dtype(_np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    # union requires one schema: null-pad each side with the other's
    # exclusive columns (correct types), in one canonical column order
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
                "_bucket", shard_tags(assign_partitions(t[on], num_buckets), num_buckets)
            )
            return out.append_column("_side", pa.array([side] * n))

        return _p

    both = left.map_batches(prepare("l"), batch_format="pyarrow").union(
        right.map_batches(prepare("r"), batch_format="pyarrow")
    )

    def join_bucket(g: pa.Table) -> pa.Table:
        # Arrow in → ArrowDtype pandas merge → Arrow out: the round-trip is
        # lossless (no int64+NaN → float64 widening, outer-join nulls stay
        # typed), every block — including empty buckets — carries the same
        # explicit schema, so Ray's schema dedup works and the per-batch
        # "Failed to hash the schemas" log spam is gone
        side = g["_side"]
        l = g.filter(pc.equal(side, "l")).select(left_cols).to_pandas(
            types_mapper=pd.ArrowDtype
        )
        r = g.filter(pc.equal(side, "r")).select(right_cols).to_pandas(
            types_mapper=pd.ArrowDtype
        )
        merged = l.merge(r, on=on, how=how, suffixes=("", "_r"))
        return pa.Table.from_pandas(merged, preserve_index=False).replace_schema_metadata(None)

    try:
        grouped = both.groupby("_bucket", num_partitions=num_buckets)
    except TypeError:
        grouped = both.groupby("_bucket")
    return grouped.map_groups(join_bucket, batch_format="pyarrow")


class GetOrCreateDimension:
    """Keyed get-or-create (upsert-into-dimension) — the reference's
    probe-dict-then-``load([org])`` pattern
    (``mex/extractors/grippeweb/transform.py:191-223`` and 4 clones).

    Deterministic distributed form: the id IS a pure function of the natural
    key (stable hash), so every partition can mint ids independently without
    coordination — the distributed analog of the reference's deterministic
    ``stableTargetId``. A later ``groupby(key).map_groups(head(1))`` yields
    the dimension table itself.
    """

    def __init__(self, key_col: str, id_col: str = "dim_id", prefix: str = "dim"):
        self.key_col, self.id_col, self.prefix = key_col, id_col, prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from mex_extractors_ray.hashing import hash_string_array

        h = hash_string_array(batch[self.key_col])
        # vectorized "{prefix}-{hash:016x}": view the hash's big-endian bytes,
        # gather nibbles through a hex LUT (no per-row Python f-string loop),
        # then one Arrow element-wise binary join
        be = h.astype(">u8").view(np.uint8).reshape(-1, 8)
        nibbles = np.empty((len(h), 16), dtype=np.uint8)
        nibbles[:, 0::2] = be >> 4
        nibbles[:, 1::2] = be & 0x0F
        lut = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
        hex_bytes = lut[nibbles].tobytes()
        hexes = pa.Array.from_buffers(
            pa.string(),
            len(h),
            [None, pa.py_buffer(np.arange(0, (len(h) + 1) * 16, 16, dtype=np.int32).tobytes()),
             pa.py_buffer(hex_bytes)],
        )
        ids = pc.binary_join_element_wise(
            pa.array([self.prefix] * len(h), pa.string()), hexes, "-"
        )
        return batch.append_column(self.id_col, ids)


def composite_key(batch: pa.Table, cols: list[str], out: str = "_key", sep: str = "-") -> pa.Table:
    """The reference's composite join keys (``f"{studien_id}-{titel_datenset}-
    {dstyp_id}"``, ``mex/extractors/synopse/transform.py:91-119``), built
    vectorized: casts each part to string and joins with ``sep``; null parts
    become empty strings (the f-string analog)."""
    import pyarrow.compute as _pc

    parts = [_pc.fill_null(_pc.cast(batch[c], pa.string()), "") for c in cols]
    return batch.append_column(out, _pc.binary_join_element_wise(*parts, sep))


def interval_join_broadcast(ds, intervals: pa.Table, value_col: str,
                            lo_col: str = "lo", hi_col: str = "hi",
                            closed: str = "left"):
    """Range join of a big dataset against a SMALL interval table
    (``value in [lo, hi)`` by default): one output row per (row, interval)
    match, intervals may OVERLAP (a row can match several).

    Scale shape: the interval table is broadcast (``ray.put`` once, read by
    every task — never re-shipped per batch) and matching is vectorized:
    the batch's values are sorted once, then per interval two binary
    searches bound its matching slice (O(B log B + I log B + matches) per
    batch, I = interval count). No shuffle at any scale. For a LARGE
    interval side, pre-bucket both sides on a range grid instead — this
    operator documents the small-side assumption and asserts nothing else.

    The reference's closest analog is the year-rule filter
    (``mex/extractors/seq_repo/filter.py``), a 1-interval special case.
    ``closed``: "left" = [lo, hi), "both" = [lo, hi]."""
    import numpy as np
    import ray

    if closed not in ("left", "both"):
        raise ValueError(f"interval_join_broadcast: bad closed={closed!r}")
    if intervals.num_rows == 0:
        raise ValueError("interval_join_broadcast: empty interval table")
    ref = ray.put(intervals.combine_chunks())

    class Match:
        def __init__(self):
            t = ray.get(ref)
            self.lo = np.asarray(t[lo_col], dtype=np.float64)
            self.hi = np.asarray(t[hi_col], dtype=np.float64)
            self.meta = t
            self.side = "right" if closed == "both" else "left"

        def __call__(self, b: pa.Table) -> pa.Table:
            v = b[value_col]
            vals = np.asarray(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v,
                              dtype=np.float64)
            order = np.argsort(vals, kind="stable")
            sv = vals[order]
            starts = np.searchsorted(sv, self.lo, side="left")
            ends = np.searchsorted(sv, self.hi, side=self.side)
            counts = np.maximum(ends - starts, 0)
            if counts.sum() == 0:
                row_idx = np.empty(0, np.int64)
                iv_idx = np.empty(0, np.int64)
            else:
                iv_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
                # flat positions into sv per interval: starts[i] .. ends[i]
                offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
                flat = np.arange(counts.sum(), dtype=np.int64) - np.repeat(offs, counts) \
                    + np.repeat(starts, counts)
                row_idx = order[flat]
            out = b.take(pa.array(row_idx))
            for name in self.meta.column_names:
                if name in (lo_col, hi_col) or name in out.column_names:
                    continue
                out = out.append_column(
                    name, self.meta[name].combine_chunks().take(pa.array(iv_idx)))
            return out

    return ds.map_batches(Match, batch_format="pyarrow",
                          concurrency=_rt.auto_pool())


def _distinct_setop(left, right, cols: list[str], keep: str,
                    num_partitions: int = 64, bag: bool = False):
    """Row-level set op over ``cols``: one coarse composite-key shuffle,
    then a run-boundary test per distinct row. ``bag=False`` is SQL
    INTERSECT / EXCEPT (duplicates collapse); ``bag=True`` is INTERSECT
    ALL / EXCEPT ALL (per distinct row emit min(#left, #right) resp.
    max(#left − #right, 0) copies). NULLs compare equal, forming their
    own group. Both inputs must agree on the ``cols`` types."""
    import numpy as np

    from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

    cols = list(cols)

    def project(side: int):
        def _p(t: pa.Table) -> pa.Table:
            from mex_extractors_ray.hashing import composite_gkey

            # injective encoding: length-prefixed parts, so separator
            # bytes inside values can't fabricate set-op membership
            out = t.select(cols).append_column(
                "_gkey", composite_gkey(t, cols))
            return out.append_column(
                "_side", pa.array(np.full(t.num_rows, side, np.int8)))
        return _p

    both = left.map_batches(project(0), batch_format="pyarrow").union(
        right.map_batches(project(1), batch_format="pyarrow"))

    def block(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.drop_columns(["_gkey", "_side"])
        t = g.sort_by([("_gkey", "ascending"), ("_side", "ascending")])
        starts = np.flatnonzero(_run_starts(t["_gkey"]))
        counts = np.diff(np.append(starts, n))
        side = np.asarray(t["_side"].combine_chunks(), dtype=np.int8)
        # sorted by _side within the run: first row says "has left",
        # last row says "has right"
        has_l = side[starts] == 0
        has_r = side[starts + counts - 1] == 1
        if not bag:
            if keep == "intersect":
                m = has_l & has_r
            else:  # except: left rows with no right match
                m = has_l & ~has_r
            reps = None
        else:
            # per-run left multiplicity via a prefix sum over side==0
            cum0 = np.concatenate(([0], np.cumsum(side == 0)))
            nl = cum0[starts + counts] - cum0[starts]
            nr = counts - nl
            reps = (np.minimum(nl, nr) if keep == "intersect"
                    else np.maximum(nl - nr, 0))
            m = reps > 0
            reps = reps[m]
        idx = starts[m]
        if reps is not None:
            # a kept run has nl >= 1, so its first row (side-sorted) is a
            # left row — the representative the copies duplicate
            idx = np.repeat(idx, reps)
        return t.take(pa.array(idx)).drop_columns(["_gkey", "_side"])

    res = _keyed_blocks(both, "_gkey", block, num_partitions)
    # map_groups drops all-empty output blocks, so an empty set-op result
    # would lose its schema downstream. Prepend one zero-row TYPED block
    # (the left input's cols types) so every caller sees stable columns.
    try:
        base = left.schema().base_schema
        empty = pa.table({c: pa.nulls(0, base.field(c).type) for c in cols})
    except AttributeError:
        return res  # non-Arrow schema: caller must pad (pandas-backed)
    import ray

    return ray.data.from_arrow(empty).union(res)


def intersect_distinct(left, right, cols: list[str],
                       num_partitions: int = 64):
    """SQL ``INTERSECT`` (distinct rows present in BOTH inputs) over the
    given columns."""
    return _distinct_setop(left, right, cols, "intersect", num_partitions)


def except_distinct(left, right, cols: list[str], num_partitions: int = 64):
    """SQL ``EXCEPT`` (distinct left rows absent from the right) over the
    given columns — the row-level generalization of the keyed anti join
    (``customers_without_orders``)."""
    return _distinct_setop(left, right, cols, "except", num_partitions)


def intersect_all(left, right, cols: list[str], num_partitions: int = 64):
    """SQL ``INTERSECT ALL`` (bag semantics): each distinct row appears
    min(#left, #right) times."""
    return _distinct_setop(left, right, cols, "intersect", num_partitions,
                           bag=True)


def except_all(left, right, cols: list[str], num_partitions: int = 64):
    """SQL ``EXCEPT ALL`` (bag semantics): each distinct left row survives
    max(#left − #right, 0) times."""
    return _distinct_setop(left, right, cols, "except", num_partitions,
                           bag=True)
