"""Integer fixed-point PageRank — iterative weighted message passing over
an edge list, the graph-analytics companion to ``stages/components.py``
(which settles membership; this settles IMPORTANCE — canonical-doc
selection, crawl prioritization, citation weighting over near-dup graphs).

The reference has no graph operators at all; this is a training-data /
web-corpus extension.

Exactness discipline: all arithmetic is int64 fixed-point —
``r_{t+1}(v) = base + Σ_{u→v} (r_t(u)·damping_pct) // (100·deg(u))`` with
``base = scale·(100−damping_pct)//100`` and floor division — so a
distributed run, a re-run, and the DuckDB oracle (``pagerank_sql``,
iterations unrolled) agree BIT-FOR-BIT: integer sums are order-independent,
unlike float PageRank where the reduction order perturbs low bits.
(The deliberate trade: per-edge floor drops ≤1 unit of mass per edge per
round — this computes a defined integer recurrence, not IEEE PageRank;
pick ``scale`` ≫ max degree so the truncation is negligible.)

Scale shape (the CC lessons applied): edges are symmetrized, degree-
annotated ONCE (two exchanges before the loop), coalesced to
edge-count-sized partitions; each round is exactly 2 exchanges — one
co-partition of (ranks ∪ edges) on the source node (in-block vectorized
``index_in`` probe → per-edge contribution, partial-summed by dst inside
the block), one coarse shuffle + run-boundary ``reduceat`` on the
destination — with a ``materialize()`` per round to cut lineage. Only
non-isolated nodes live in the loop. Driver state is O(1); ranks/edges
never leave the object store. Overflow bound: ``n_nodes·scale·
damping_pct`` must fit int64 — the default ``scale=10**9`` holds to
~10^8 nodes; shrink scale as the graph grows.

``static_edges=True`` (the Pregel refinement, default): edge buckets are
pinned ONCE as object-store refs — a per-bucket ``ray.put`` inside the
grouping task, so the driver never holds edges, only the (bucket → ref)
map — and each round's first exchange ships ONLY the rank rows (∝N); the
contribution task fetches its bucket's edges from the object store, which
Ray caches node-locally after the first round (edges cross the network at
most once per node, not once per round). Worth it exactly when per-round
edge bytes dominate, i.e. E ≫ N and several iterations; bit-identical to
the stock loop (integer arithmetic, pinned by test).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.stages.dedup import _keyed_blocks

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("deg", pa.int64())])


def pagerank_int(edges, nodes, a: str = "a", b: str = "b",
                 node_col: str = "node", iters: int = 5,
                 damping_pct: int = 85, scale: int = 10**9,
                 num_partitions: int = 64, static_edges: bool = True,
                 _chaos_hook=None):
    """PageRank over the UNDIRECTED (a, b) edge list (each pair walks both
    ways), every row of ``nodes`` ranked (isolated nodes settle at the
    teleport base). Returns int64 columns ``(node, rank)`` after exactly
    ``iters`` synchronous rounds from ``r_0 = scale``.

    ``static_edges=True`` runs the Pregel-style loop (pinned edge buckets,
    rank-only first exchange — see module docstring); ``False`` keeps the
    stock loop that re-co-partitions edges every round. Both compute the
    same integer recurrence bit-for-bit."""
    import ray.data

    if not (0 < damping_pct < 100):
        raise ValueError(f"pagerank_int: damping_pct must be in (0,100), got {damping_pct}")
    base = scale * (100 - damping_pct) // 100

    def sym(t: pa.Table) -> pa.Table:
        u = t[a].combine_chunks().cast(pa.int64())
        v = t[b].combine_chunks().cast(pa.int64())
        return pa.table({"src": pa.chunked_array([u, v]).combine_chunks(),
                         "dst": pa.chunked_array([v, u]).combine_chunks()})

    def count_deg(g: pa.Table) -> pa.Table:
        from mex_extractors_ray.stages.dedup import _run_starts

        t = g.sort_by([("src", "ascending"), ("dst", "ascending")])
        starts = _run_starts(t["src"])
        idx = np.flatnonzero(starts)
        deg = np.diff(np.append(idx, t.num_rows))
        return t.append_column("deg", pa.array(
            np.repeat(deg, deg).astype(np.int64)))

    # one-time prep: symmetrize + per-source degree (the src co-partition
    # doubles as the degree computation — deg is a run length); coalesce to
    # edge-count-sized partitions so per-round exchange cost tracks data,
    # not block count (the CC input-block-count lesson, BASELINE.md r4)
    edges_deg = _keyed_blocks(
        edges.map_batches(sym, batch_format="pyarrow"), "src", count_deg,
        num_partitions,
    ).materialize()
    n_edges = edges_deg.count()
    parts = max(2, min(num_partitions, (n_edges // 250_000) + 2))

    node_ids = nodes.map_batches(
        lambda t: pa.table({"node": t[node_col].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow",
    ).repartition(parts).materialize()

    def _const_rank(value: int):
        def _f(t: pa.Table) -> pa.Table:
            return t.append_column("rank", pa.array(
                np.full(t.num_rows, value, dtype=np.int64)))

        return _f

    if n_edges == 0 or iters == 0:
        # closed forms: with no edges every node holds exactly the teleport
        # base from round 1 on (r0 = scale); with no rounds everyone is r0
        fixpoint = base if (iters >= 1 and n_edges == 0) else scale
        return node_ids.map_batches(_const_rank(fixpoint), batch_format="pyarrow")
    edges_deg = edges_deg.repartition(parts).materialize()

    # only non-isolated nodes live in the loop: the graph is symmetrized,
    # so every node with any edge has in-degree ≥ 1 and receives a message
    # every round — no zero-message padding needed. Isolated nodes sit at
    # the closed-form base and rejoin at the end.
    def _distinct_nodes(g: pa.Table) -> pa.Table:
        col = g["node"] if "node" in g.column_names else g["src"]
        return pa.table({"node": col.combine_chunks().unique()})

    live = _keyed_blocks(
        edges_deg.map_batches(_distinct_nodes, batch_format="pyarrow"),
        "node", _distinct_nodes, parts,
    ).materialize()

    def _anti_block(g: pa.Table) -> pa.Table:
        side = g["_aside"]
        n = g.filter(pc.equal(side, "n"))
        l = g.filter(pc.equal(side, "l"))
        pos = pc.index_in(n["node"], l["node"].combine_chunks())
        return pa.table({"node": n["node"].filter(pc.is_null(pos))})

    def _tag_aside(label: str):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["node"],
                             "_aside": pa.array([label] * t.num_rows)})

        return _f

    isolated = _keyed_blocks(
        node_ids.map_batches(_tag_aside("n"), batch_format="pyarrow").union(
            live.map_batches(_tag_aside("l"), batch_format="pyarrow")),
        "node", _anti_block, parts,
    ).map_batches(_const_rank(base), batch_format="pyarrow").materialize()

    ranks = live.map_batches(_const_rank(scale), batch_format="pyarrow").materialize()

    rank_sch = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                          ("deg", pa.int64()), ("rank", pa.int64()),
                          ("_side", pa.string())])

    def tag_ranks(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "src": t["node"], "dst": pa.nulls(n, pa.int64()),
            "deg": pa.nulls(n, pa.int64()), "rank": t["rank"],
            "_side": pa.array(["r"] * n),
        }, schema=rank_sch)

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "src": t["src"], "dst": t["dst"], "deg": t["deg"],
            "rank": pa.nulls(n, pa.int64()),
            "_side": pa.array(["e"] * n),
        }, schema=rank_sch)

    def contribs(g: pa.Table) -> pa.Table:
        """Per-edge messages with a map-side combiner: partial-sum by dst
        INSIDE the block (one Arrow hash-agg) so the dst exchange ships at
        most one row per (block, dst), never one per edge."""
        side = g["_side"]
        r = g.filter(pc.equal(side, "r"))
        e = g.filter(pc.equal(side, "e"))
        if e.num_rows == 0 or r.num_rows == 0:
            return pa.table({"dst": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        pos = pc.index_in(e["src"], r["src"].combine_chunks())
        rv = np.asarray(r["rank"].combine_chunks(), dtype=np.int64)
        ridx = np.asarray(pos.combine_chunks(), dtype=np.int64)
        deg = np.asarray(e["deg"].combine_chunks(), dtype=np.int64)
        c = (rv[ridx] * damping_pct) // (100 * deg)
        return (
            pa.table({"dst": e["dst"], "c": pa.array(c)})
            .group_by("dst").aggregate([("c", "sum")])
            .rename_columns(["dst", "c"])
        )

    def reduce_ranks(g: pa.Table) -> pa.Table:
        """dst-side finalize: sort + run-boundary reduceat — the engine's
        fast keyed-sum kernel. (Ray's groupby().aggregate(Sum) exchange
        measured 59 s on the same 10M rows this path does in ~4 s —
        A/B in BASELINE.md round 4.)"""
        from mex_extractors_ray.stages.dedup import _run_starts

        if g.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        t = g.sort_by([("dst", "ascending")])
        idx = np.flatnonzero(_run_starts(t["dst"]))
        sums = np.add.reduceat(
            np.asarray(t["c"].combine_chunks(), dtype=np.int64), idx)
        return pa.table({
            "node": t["dst"].take(pa.array(idx)),
            "rank": pa.array(sums + base),
        })

    def stock_round(rk):
        tagged = rk.map_batches(tag_ranks, batch_format="pyarrow").union(
            edges_deg.map_batches(tag_edges, batch_format="pyarrow"))
        msg = _keyed_blocks(tagged, "src", contribs, parts)
        # second exchange: co-partition the per-block partials on dst
        # and reduce with the vectorized run-boundary kernel; output
        # blocks stay bounded at `parts` (the CC input-block-count
        # lesson)
        return _keyed_blocks(msg, "dst", reduce_ranks, parts).materialize()

    if static_edges:
        ranks = _static_edge_loop(
            edges_deg, ranks, parts, iters, damping_pct, reduce_ranks,
            stock_round=stock_round, _chaos_hook=_chaos_hook)
    else:
        for _ in range(iters):
            ranks = stock_round(ranks)
    return ranks.union(isolated)


def _is_object_loss(e: BaseException) -> bool:
    """True iff the exception (or anything in its cause chain) is a lost /
    freed / owner-died object error — the failure mode of a pinned ref
    whose storing worker or node went away. RayTaskError stringifies the
    remote exception, so a textual match backstops the isinstance walk."""
    import ray.exceptions as rex

    seen = set()
    cur: BaseException | None = e
    while cur is not None and id(cur) not in seen:
        seen.add(id(cur))
        if isinstance(cur, rex.ObjectLostError):
            return True
        cur = getattr(cur, "cause", None) or cur.__cause__ or cur.__context__
    return any(name in repr(e) for name in (
        "ObjectLostError", "ObjectFreedError", "OwnerDiedError",
        "ObjectFetchTimedOutError", "ObjectReconstructionFailedError"))


def _pin_buckets(edges_deg, tag_bucket, parts: int):
    """Group edges to (at most) one block per src-hash bucket, MATERIALIZE,
    and take the block refs through Ray Data's own channel (to_arrow_refs —
    ownership stays with the dataset; a hand-rolled ray.put inside the
    grouping task would hand out refs whose owner Ray can't resolve once
    pickled through an Arrow column). Each block's bucket identity is
    probed by a tiny remote task (worker-local, zero-copy fetch). Returns
    ``(binned, pinned)`` — keep ``binned`` referenced or the refs die."""
    import ray

    tagged = edges_deg.map_batches(tag_bucket("src"), batch_format="pyarrow")
    try:
        grouped = tagged.groupby("_eb", num_partitions=parts)
    except TypeError:
        grouped = tagged.groupby("_eb")
    binned = grouped.map_groups(
        lambda g: g, batch_format="pyarrow").materialize()
    refs = binned.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def _block_buckets(t: pa.Table) -> list:
        # empty blocks out of the sort exchange can carry a stripped schema
        if t.num_rows == 0 or "_eb" not in t.column_names:
            return []
        return pc.unique(t["_eb"]).to_pylist()

    pinned: dict = {}
    for ref, labels in zip(refs, ray.get([_block_buckets.remote(r) for r in refs])):
        for lbl in labels:
            pinned.setdefault(lbl, []).append(ref)
    return binned, pinned


def _static_edge_loop(edges_deg, ranks, parts: int, iters: int,
                      damping_pct: int, reduce_ranks,
                      stock_round=None, _chaos_hook=None):
    """Pregel-style rounds: pin each src-hash edge bucket in the object
    store ONCE (see :func:`_pin_buckets`); per round, shuffle ONLY the
    rank rows to their bucket and fetch the pinned edges inside the task.
    Ray's object store serves repeat fetches from the node-local cache, so
    edge bytes cross the network at most once per node for the whole run.

    Fault tolerance: the pinned refs have NO lineage — on a real cluster a
    lost worker/node takes its buckets with it and the round's tasks raise
    object-loss errors. The loop catches those, RE-MATERIALIZES the pins
    (they're a deterministic function of ``edges_deg``) and retries the
    round; if the retry ALSO hits object loss it degrades to
    ``stock_round`` (the re-co-partitioning loop, bit-identical
    arithmetic) for the remaining rounds instead of dying hours into a
    run. ``_chaos_hook(round_idx, pinned)`` is the chaos-test injection
    point (called after each completed round)."""
    import ray  # noqa: F401 — workers resolve the pinned refs

    from mex_extractors_ray.hashing import assign_partitions, shard_tags

    def tag_bucket(col: str):
        def _f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_eb", shard_tags(assign_partitions(t[col], parts), parts))

        return _f

    def make_contrib(pinned: dict):
        def contrib(g: pa.Table) -> pa.Table:
            import ray

            eb = g["_eb"][0].as_py()
            refs = pinned.get(eb, [])
            if not refs or g.num_rows == 0:
                return pa.table({"dst": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            tabs = [ray.get(r) for r in refs]
            e = pa.concat_tables(
                [t.filter(pc.equal(t["_eb"], eb)) for t in tabs]
            ).drop_columns(["_eb"])
            pos = pc.index_in(e["src"], g["node"].combine_chunks())
            rv = np.asarray(g["rank"].combine_chunks(), dtype=np.int64)
            ridx = np.asarray(pos.combine_chunks(), dtype=np.int64)
            deg = np.asarray(e["deg"].combine_chunks(), dtype=np.int64)
            c = (rv[ridx] * damping_pct) // (100 * deg)
            return (
                pa.table({"dst": e["dst"], "c": pa.array(c)})
                .group_by("dst").aggregate([("c", "sum")])
                .rename_columns(["dst", "c"])
            )

        return contrib

    binned, pinned = _pin_buckets(edges_deg, tag_bucket, parts)

    def run_round(rk, pinned):
        rt = rk.map_batches(tag_bucket("node"), batch_format="pyarrow")
        try:
            rg = rt.groupby("_eb", num_partitions=parts)
        except TypeError:
            rg = rt.groupby("_eb")
        msg = rg.map_groups(make_contrib(pinned), batch_format="pyarrow")
        return _keyed_blocks(msg, "dst", reduce_ranks, parts).materialize()

    r = 0
    while r < iters:
        try:
            new_ranks = run_round(ranks, pinned)
        except Exception as e:
            if not _is_object_loss(e):
                raise
            # a pinned bucket died with its worker: rebuild the pins from
            # the still-live edges_deg dataset and retry this round once
            binned, pinned = _pin_buckets(edges_deg, tag_bucket, parts)
            try:
                new_ranks = run_round(ranks, pinned)
            except Exception as e2:
                if not _is_object_loss(e2) or stock_round is None:
                    raise
                # repeated loss: finish on the stock loop (bit-identical)
                for _ in range(r, iters):
                    ranks = stock_round(ranks)
                return ranks
        ranks = new_ranks
        r += 1
        if _chaos_hook is not None:
            _chaos_hook(r, pinned)
    return ranks


def pagerank_sql(edges_sql: str, nodes_sql: str, a: str = "a", b: str = "b",
                 node_col: str = "node", iters: int = 5,
                 damping_pct: int = 85, scale: int = 10**9) -> str:
    """DuckDB mirror of ``pagerank_int`` — the ``iters`` synchronous rounds
    unrolled as chained CTEs (aggregation in a recursive term is not
    portable SQL), identical integer recurrence, bit-identical output."""
    base = scale * (100 - damping_pct) // 100
    parts = [f"""
WITH e0 AS ({edges_sql}),
sym AS (SELECT CAST({a} AS BIGINT) AS src, CAST({b} AS BIGINT) AS dst FROM e0
        UNION ALL
        SELECT CAST({b} AS BIGINT), CAST({a} AS BIGINT) FROM e0),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY src),
nd AS (SELECT CAST({node_col} AS BIGINT) AS node FROM ({nodes_sql})),
r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nd)"""]
    for i in range(iters):
        parts.append(f""",
r{i + 1} AS (
  SELECT n.node,
         CAST({base} + COALESCE(c.s, 0) AS BIGINT) AS rank
  FROM nd n LEFT JOIN (
    SELECT s.dst AS node,
           SUM((r.rank * {damping_pct}) // (100 * d.deg)) AS s
    FROM sym s JOIN deg d USING (src) JOIN r{i} r ON r.node = s.src
    GROUP BY s.dst) c USING (node))""")
    parts.append(f"\nSELECT node, rank FROM r{iters}")
    return "".join(parts)
