"""Connected components over an edge list — duplicate-cluster labeling.

Training-data motivation (no analog in the reference, which never handles
graph-shaped data): near-dup detection (MinHash / SimHash / n-gram,
``stages/dedup.py``) emits PAIRS, but dedup policy operates on CLUSTERS —
"keep one canonical document per group of mutual near-duplicates".  Pairs
(a,b),(b,c) must collapse to one cluster {a,b,c} even though (a,c) was
never emitted.  That is connected components.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
shared-nothing CC algorithm.  Each round is one coarse hash shuffle of the
EDGE list (never the corpus) plus a vectorized per-block kernel; the edge
set converges to a star forest in O(log² n) rounds (2–5 in practice).
Per-node state never exists: the "labels" live inside the edge set itself,
so the operator scales with edges, not nodes, and needs no driver-side
structures beyond a per-round (count, checksum) pair for the convergence
test.

Scale notes (100 TB):
- every round is ``_keyed_blocks`` (hash-partition the edges, ONE
  vectorized kernel per block — no per-key dispatch);
- each round ends in ``materialize()``: iterative algorithms must cut
  lineage or round k re-executes rounds 1..k-1.  The materialized set is
  the EDGE list, which near-dup thresholds keep a small fraction of the
  corpus (and it shrinks monotonically toward one edge per non-root node);
- the min-label convention makes the final label the smallest node id in
  the component, which doubles as the canonical-keeper id for dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mex_extractors_ray.hashing import hash_int_array
from mex_extractors_ray.stages.dedup import _keyed_blocks, _run_starts

_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _canon(t: pa.Table, a: str, b: str) -> pa.Table:
    """(a,b) → canonical undirected edge table (u,v), self-loops dropped."""
    import pyarrow.compute as pc

    u = pc.cast(t[a], pa.int64())
    v = pc.cast(t[b], pa.int64())
    t = pa.table({"u": u, "v": v})
    return t.filter(pc.not_equal(t["u"], t["v"]))


def _group_offsets(src: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(starts, row→group index) over a SORTED key column."""
    starts_mask = _run_starts(src)
    starts = np.flatnonzero(starts_mask)
    gidx = np.cumsum(starts_mask) - 1
    return starts, gidx


def _entry_dedup(t: pa.Table) -> pa.Table:
    """Exact (u,v) distinct inside one u-keyed hash block. The shuffle
    co-locates every copy of a pair (same u ⇒ same block), so an in-block
    run-boundary mask removes ALL duplicates — this is what lets the star
    kernels absorb the pair dedup that used to be its own shuffle
    (2 exchanges per round instead of 4). ``t`` must be (u,v)-sorted."""
    mask = np.logical_or(_run_starts(t["u"]), _run_starts(t["v"]))
    return t.filter(pa.array(mask))


def _large_star_block(g: pa.Table) -> pa.Table:
    """Large-star over one hash block of SYMMETRIZED edges keyed by src:
    every strictly-larger neighbor of src links to min(Γ(src) ∪ {src}).
    Upstream duplicates are removed at block entry (see _entry_dedup)."""
    t = _entry_dedup(g.sort_by([("u", "ascending"), ("v", "ascending")]))
    src = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
    dst = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
    if len(src) == 0:
        return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    starts, gidx = _group_offsets(t["u"])
    gmin = np.minimum(np.minimum.reduceat(dst, starts), src[starts])
    m = gmin[gidx]
    keep = dst > src
    return pa.table({"u": dst[keep], "v": m[keep]}, schema=_SCHEMA)


def _small_star_block(g: pa.Table) -> pa.Table:
    """Small-star over one hash block of max→min-directed edges keyed by
    src (= the larger endpoint): src and all its ≤-neighbors link to the
    group minimum. Upstream duplicates are removed at block entry."""
    t = _entry_dedup(g.sort_by([("u", "ascending"), ("v", "ascending")]))
    src = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
    dst = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
    if len(src) == 0:
        return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    starts, gidx = _group_offsets(t["u"])
    gmin = np.minimum.reduceat(dst, starts)  # all dst < src in this phase
    m = gmin[gidx]
    out_u = np.concatenate([dst, src[starts]])
    out_v = np.concatenate([m, gmin])
    keep = out_u != out_v
    return pa.table({"u": out_u[keep], "v": out_v[keep]}, schema=_SCHEMA)


def _min_label_block(g: pa.Table) -> pa.Table:
    """Smallest label per node over one hash block of (node, component)
    rows: sort + run-boundary mask (the shared finalize kernel of
    connected_components / component_labels / update_components)."""
    t = g.sort_by([("node", "ascending"), ("component", "ascending")])
    return t.filter(pa.array(_run_starts(t["node"])))


def _self_label(col: str):
    """map_batches fn: every row labels itself (singleton restoration)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        n = pc.cast(t[col], pa.int64())
        return pa.table({"node": n, "component": n})

    return fn


def _edge_fingerprint(ds) -> tuple[int, int]:
    """(row count, order-insensitive checksum) of an edge dataset — the
    per-round convergence probe. One tiny aggregate, O(P) on the driver."""

    def digest(t: pa.Table) -> pa.Table:
        h = hash_int_array(t["u"], seed=11) ^ hash_int_array(t["v"], seed=23)
        x = np.bitwise_xor.reduce(h, initial=np.uint64(0))
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "x": pa.array([int(x.astype(np.int64))], pa.int64()),
        })

    parts = ds.map_batches(digest, batch_format="pyarrow").to_pandas()
    return int(parts["n"].sum()), int(np.bitwise_xor.reduce(
        parts["x"].to_numpy().astype(np.int64).view(np.uint64), initial=np.uint64(0)))


def connected_components(edges, a: str = "a", b: str = "b",
                         num_partitions: int = 64, max_rounds: int = 50):
    """Label every node of the (a,b) edge list with its component id
    (= the component's minimum node id).  Returns a Dataset with int64
    columns ``node, component`` covering every endpoint; pair with a
    corpus-side union (see :func:`component_labels`) to add singletons.

    Alternates large-star and small-star rounds until the edge set is a
    fixed point (star forest).  Each round: symmetrize / re-direct in
    ``map_batches``, one coarse hash shuffle, vectorized reduceat kernels,
    pair dedup, ``materialize()`` to cut lineage."""
    import ray.data

    def sym(t: pa.Table) -> pa.Table:
        e = _canon(t, "u", "v")
        return pa.concat_tables([
            e, pa.table({"u": e["v"], "v": e["u"]}, schema=_SCHEMA)
        ])

    def direct_max_min(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        e = _canon(t, "u", "v")
        hi = pc.max_element_wise(e["u"], e["v"])
        lo = pc.min_element_wise(e["u"], e["v"])
        return pa.table({"u": hi, "v": lo}, schema=_SCHEMA)

    # materialize the canonized input: round 1 is the only consumer, but
    # without the cut every star round would re-execute the (possibly
    # expensive) upstream pair-mining lineage
    cur = edges.map_batches(lambda t: _canon(t, a, b),
                            batch_format="pyarrow").materialize()
    n_edges = cur.count()
    if n_edges == 0:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}))
    # size the exchange to the measured edge count: every round pays the
    # shuffle's per-partition fixed cost ~4x (2 exchanges x sort/agg legs),
    # so 64 partitions on a 100k-edge set is pure overhead. ~250k edges
    # (a few MB) per partition; the caller's num_partitions stays the cap
    # for genuinely large edge sets.
    num_partitions = max(8, min(num_partitions, (n_edges // 250_000) + 8))
    # coalesce the input: a pair-mining pipeline hands over hundreds of
    # tiny blocks (one per upstream task), and the sort exchange's cost
    # scales with INPUT BLOCK COUNT, not bytes — measured 28 s/round at
    # 448 blocks vs 0.5 s/round at 16 on the same 250k edges. One cheap
    # repartition amortizes over every round.
    if cur.num_blocks() > 2 * num_partitions:
        cur = cur.repartition(num_partitions).materialize()
    import os as _os
    import sys as _sys
    import time as _time

    _dbg = bool(_os.environ.get("MEX_CC_DEBUG"))
    prev_fp = None
    for _round in range(max_rounds):
        _t0 = _time.time()
        # pair dedup rides INSIDE each star block (_entry_dedup: the u-hash
        # shuffle co-locates all copies of a pair) — 2 exchanges per round.
        # Cross-block output duplicates survive a round boundary; the next
        # round's entry dedup (or _min_label_block at finalize) removes
        # them, and the fingerprint convergence test is over the multiset,
        # which is just as much a fixpoint witness.
        large_in = cur.map_batches(sym, batch_format="pyarrow")
        large_out = _keyed_blocks(large_in, "u", _large_star_block,
                                  num_partitions)
        small_in = large_out.map_batches(direct_max_min, batch_format="pyarrow")
        cur = _keyed_blocks(small_in, "u", _small_star_block,
                            num_partitions).materialize()
        fp = _edge_fingerprint(cur)
        if _dbg:
            print(f"cc round {_round}: edges={fp[0]} {_time.time() - _t0:.2f}s",
                  file=_sys.stderr)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")

    # star forest: edges are member→root; roots appear only on the right
    def assignments(t: pa.Table) -> pa.Table:
        members = pa.table({"node": t["u"], "component": t["v"]})
        roots = pa.table({"node": t["v"], "component": t["v"]})
        return pa.concat_tables([members, roots])

    labeled = cur.map_batches(assignments, batch_format="pyarrow")
    return _keyed_blocks(labeled, "node", _min_label_block, num_partitions)


def component_labels(edges, nodes, a: str = "a", b: str = "b",
                     node_col: str = "doc_id", num_partitions: int = 64):
    """CC labels for a full corpus: every row of ``nodes`` gets a
    ``component`` (its CC min-id when it touches an edge, itself when it is
    a singleton).  The dedup-keeper rule is then ``node == component``."""
    cc = connected_components(edges, a, b, num_partitions)
    singles = nodes.map_batches(_self_label(node_col), batch_format="pyarrow")
    # union + min-per-node: the CC label is ≤ the node id by construction,
    # so min() picks the edge-derived label when one exists
    return _keyed_blocks(cc.union(singles), "node", _min_label_block,
                         num_partitions)


def components_sql(edges_sql: str, nodes_sql: str) -> str:
    """DuckDB oracle: transitive closure by recursive CTE (exact, bounded
    fixtures only — the recursive walk is O(nodes × edges) and exists to
    CHECK the distributed algorithm, not to compete with it)."""
    return f"""
WITH RECURSIVE
e AS ({edges_sql}),
sym AS (SELECT CAST(a AS BIGINT) AS u, CAST(b AS BIGINT) AS v FROM e
        WHERE a <> b
        UNION SELECT CAST(b AS BIGINT), CAST(a AS BIGINT) FROM e WHERE a <> b),
nd AS ({nodes_sql}),
walk(node, comp) AS (
    SELECT CAST(node AS BIGINT), CAST(node AS BIGINT) FROM nd
    UNION
    SELECT s.v, w.comp FROM walk w JOIN sym s ON s.u = w.node
)
SELECT node, MIN(comp) AS component FROM walk GROUP BY node
"""


def update_components(labels, new_edges, a: str = "a", b: str = "b",
                      num_partitions: int = 64):
    """Incrementally fold NEW near-dup pairs into an existing component
    labeling (the CDC-shaped form of clustering: pair mining runs per
    ingest window, cluster state is maintained, never recomputed from
    every pair ever seen).

    The trick: a (node, component) labeling IS a star forest, i.e. an
    edge list that is already at the large/small-star fixpoint. Union it
    with the window's new pairs and re-run :func:`connected_components` —
    the stars compress all history, so the rerun converges in O(log² w)
    rounds of the WINDOW's merge depth, not the corpus's. Cost scales
    with |labels| + |new pairs| per window; labels can themselves be kept
    as a lake table and read back per window."""
    import pyarrow.compute as pc

    def as_edges(t: pa.Table) -> pa.Table:
        e = pa.table({"u": pc.cast(t["node"], pa.int64()),
                      "v": pc.cast(t["component"], pa.int64())})
        return e.filter(pc.not_equal(e["u"], e["v"]))

    def canon_new(t: pa.Table) -> pa.Table:
        return _canon(t, a, b)

    star_edges = labels.map_batches(as_edges, batch_format="pyarrow")
    fresh = new_edges.map_batches(canon_new, batch_format="pyarrow")
    merged = connected_components(star_edges.union(fresh), a="u", b="v",
                                  num_partitions=num_partitions)

    # singletons (label == self) carry no star edge; restore them, letting
    # an edge-derived label win where the window connected a former single
    singles = labels.map_batches(_self_label("node"), batch_format="pyarrow")
    return _keyed_blocks(merged.union(singles), "node", _min_label_block,
                         num_partitions)


def triangles(edges, a: str = "a", b: str = "b", num_partitions: int = 16):
    """Distributed triangle enumeration over an undirected edge list —
    one row per triangle, canonical ``a < b < c``.

    Degree-oriented wedge join (the standard shared-nothing algorithm,
    e.g. Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW'11): orient every edge from its lower-(degree, id)
    endpoint, emit the C(d_out, 2) wedges at each vertex, and keep the
    wedges whose closing pair exists in the edge set.  Each triangle is
    found exactly once — at its unique min-(degree, id) vertex.  Degree
    orientation bounds per-vertex wedge work by O(√m) out-degree, so hub
    nodes never explode (the skew story; id orientation alone would emit
    deg² wedges at every hub).

    Exchanges: edge dedup (1), degree sum (1), two degree-attach
    co-partition joins (2 × 2), wedge generation (1), wedge↔edge pair
    match (1) — all ``_keyed_blocks``-shaped, all over the EDGE list,
    never a corpus.  Every per-block kernel is one Arrow sort plus numpy
    run-boundary arithmetic (the fully-vectorized intra-run pair
    emission below), no per-key dispatch."""
    import pyarrow.compute as pc

    from mex_extractors_ray.stages.aggregates import keyed_sums
    from mex_extractors_ray.stages.joins import bucketed_join

    def canon(t: pa.Table) -> pa.Table:
        u = pc.cast(t[a], pa.int64())
        v = pc.cast(t[b], pa.int64())
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        t2 = pa.table({"u": lo, "v": hi}).filter(pc.not_equal(lo, hi))
        return t2.group_by(["u", "v"]).aggregate([])  # local distinct

    def dedup_block(g: pa.Table) -> pa.Table:
        return _entry_dedup(g.sort_by([("u", "ascending"), ("v", "ascending")]))

    e = _keyed_blocks(edges.map_batches(canon, batch_format="pyarrow"),
                      "u", dedup_block, num_partitions).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([t["u"].combine_chunks(),
                                  t["v"].combine_chunks()])
        vc = pc.value_counts(nodes)
        return pa.table({"node": vc.field("values"),
                         "deg": vc.field("counts").cast(pa.int64())})

    degs = keyed_sums(e.map_batches(deg_partial, batch_format="pyarrow"),
                      ["node"], ["deg"], num_partitions=num_partitions)

    du = degs.map_batches(
        lambda t: pa.table({"u": t["node"], "deg_u": t["deg"]}),
        batch_format="pyarrow")
    dv = degs.map_batches(
        lambda t: pa.table({"v": t["node"], "deg_v": t["deg"]}),
        batch_format="pyarrow")
    ed = bucketed_join(e, du, on="u", num_buckets=num_partitions)
    ed = bucketed_join(ed, dv, on="v", num_buckets=num_partitions)

    def orient(t: pa.Table) -> pa.Table:
        un = np.asarray(t["u"].combine_chunks().cast(pa.int64()))
        vn = np.asarray(t["v"].combine_chunks().cast(pa.int64()))
        dun = np.asarray(t["deg_u"].combine_chunks().cast(pa.int64()))
        dvn = np.asarray(t["deg_v"].combine_chunks().cast(pa.int64()))
        u_first = (dun < dvn) | ((dun == dvn) & (un < vn))
        return pa.table({"src": pa.array(np.where(u_first, un, vn)),
                         "dst": pa.array(np.where(u_first, vn, un))})

    oriented = ed.map_batches(orient, batch_format="pyarrow")

    def _pair_key(x, y) -> pa.Array:
        return pc.binary_join_element_wise(
            pc.cast(x, pa.string()), pc.cast(y, pa.string()), pa.scalar("-"))

    def wedges(g: pa.Table) -> pa.Table:
        empty = pa.table({"x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "apex": pa.array([], pa.int64()),
                          "_pk": pa.array([], pa.string())})
        n = g.num_rows
        if n < 2:
            return empty
        t = g.sort_by([("src", "ascending"), ("dst", "ascending")])
        srcn = np.asarray(t["src"].combine_chunks())
        dstn = np.asarray(t["dst"].combine_chunks())
        starts = np.flatnonzero(_run_starts(t["src"]))
        counts = np.diff(np.append(starts, n))
        ordinal = np.arange(n) - np.repeat(starts, counts)
        seg = np.repeat(counts, counts) - 1 - ordinal  # pairs led by each row
        total = int(seg.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(n), seg)
        cs = np.concatenate([[0], np.cumsum(seg)])
        pos = np.arange(total) - np.repeat(cs[:-1], seg)
        right = left + 1 + pos
        x, y = dstn[left], dstn[right]  # dst ascending within run ⇒ x < y
        xa, ya = pa.array(x), pa.array(y)
        return pa.table({"x": xa, "y": ya, "apex": pa.array(srcn[left]),
                         "_pk": _pair_key(xa, ya)})

    w = _keyed_blocks(oriented, "src", wedges, num_partitions)

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"x": t["u"], "y": t["v"],
                         "apex": pa.nulls(t.num_rows, pa.int64()),
                         "_pk": _pair_key(t["u"], t["v"])})

    both = w.union(e.map_batches(edge_rows, batch_format="pyarrow"))

    def close(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        is_e = pc.is_null(g["apex"])
        ek = g.filter(is_e)["_pk"].combine_chunks()
        wt = g.filter(pc.invert(is_e))
        if len(ek) == 0 or wt.num_rows == 0:
            return empty
        hit = wt.filter(pc.is_in(wt["_pk"], value_set=ek))
        if hit.num_rows == 0:
            return empty
        tri = np.sort(np.column_stack([
            np.asarray(hit["apex"].combine_chunks().cast(pa.int64())),
            np.asarray(hit["x"].combine_chunks()),
            np.asarray(hit["y"].combine_chunks()),
        ]), axis=1)
        return pa.table({"a": pa.array(tri[:, 0]), "b": pa.array(tri[:, 1]),
                         "c": pa.array(tri[:, 2])})

    return _keyed_blocks(both, "_pk", close, num_partitions)
