"""Integer PageRank + rank/NTILE window functions (round-4 graph/window
wave; the reference has no graph or window operators)."""

import numpy as np
import pandas as pd

from mex_extractors_ray.stages.aggregates import keyed_rank_ntile
from mex_extractors_ray.stages.pagerank import pagerank_int


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


def _brute_pagerank(edges, nodes, iters, damping_pct=85, scale=10**9):
    sym = edges + [(b, a) for a, b in edges]
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    base = scale * (100 - damping_pct) // 100
    r = {n: scale for n in nodes}
    for _ in range(iters):
        nxt = {n: base for n in nodes}
        for s, d in sym:
            nxt[d] += (r[s] * damping_pct) // (100 * deg[s])
        r = nxt
    return r


def test_pagerank_matches_reference_loop(ray_session):
    rng = np.random.default_rng(7)
    edges = sorted({(int(min(x, y)), int(max(x, y)))
                    for x, y in rng.integers(0, 40, size=(90, 2)) if x != y})
    nodes = list(range(50))  # 40..49 isolated
    got = (
        pagerank_int(_ds([{"a": a, "b": b} for a, b in edges]),
                     _ds([{"node": n} for n in nodes]),
                     iters=4, num_partitions=4)
        .to_pandas().set_index("node")["rank"].to_dict()
    )
    assert got == _brute_pagerank(edges, nodes, iters=4)


def test_pagerank_isolated_nodes_settle_at_base(ray_session):
    out = (
        pagerank_int(_ds([{"a": 0, "b": 1}]), _ds([{"node": n} for n in range(3)]),
                     iters=3, num_partitions=2)
        .to_pandas().set_index("node")["rank"].to_dict()
    )
    base = 10**9 * 15 // 100
    assert out[2] == base          # isolated: teleport mass only
    assert out[0] == out[1] > base  # symmetric pair, receives mass


def test_pagerank_mass_is_monotone_in_degree(ray_session):
    # star graph: hub receives from every leaf
    edges = [{"a": 0, "b": i} for i in range(1, 6)]
    out = (
        pagerank_int(_ds(edges), _ds([{"node": n} for n in range(6)]),
                     iters=5, num_partitions=2)
        .to_pandas().set_index("node")["rank"].to_dict()
    )
    assert out[0] > out[1] and len({out[i] for i in range(1, 6)}) == 1


def test_keyed_rank_ntile_ties_and_fill(ray_session):
    rows = [
        {"g": "a", "v": 30, "id": 1},
        {"g": "a", "v": 30, "id": 2},  # tie with id=1
        {"g": "a", "v": 20, "id": 3},
        {"g": "a", "v": 10, "id": 4},
        {"g": "a", "v": 5, "id": 5},
        {"g": "b", "v": 1, "id": 6},
        {"g": "b", "v": 2, "id": 7},
    ]
    out = (
        keyed_rank_ntile(_ds(rows), "g", "v", tie_col="id", descending=True,
                         tiles=4, num_partitions=4)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # rank(): ties share, next skips (1,1,3,4,5)
    assert out["rnk"].tolist() == [1, 1, 3, 4, 5, 2, 1]
    # NTILE(4) over 5 rows: sizes 2,1,1,1 — matches SQL's fill rule
    assert out["tile"].tolist() == [1, 1, 2, 3, 4, 2, 1]


def test_keyed_rank_ntile_matches_pandas(ray_session):
    rng = np.random.default_rng(11)
    rows = [{"g": f"g{int(rng.integers(0, 5))}", "v": int(rng.integers(0, 20)), "id": i}
            for i in range(200)]
    out = (
        keyed_rank_ntile(_ds(rows), "g", "v", tie_col="id", descending=True,
                         tiles=3, num_partitions=4)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    df = pd.DataFrame(rows)
    want_rank = df.groupby("g")["v"].rank(method="min", ascending=False).astype(int)
    assert out["rnk"].tolist() == want_rank.tolist()
    # NTILE via explicit fill rule
    df = df.sort_values(["g", "v", "id"], ascending=[True, False, True])
    tiles = {}
    for _, grp in df.groupby("g"):
        cnt, n = len(grp), 3
        size, rem = divmod(cnt, n)
        for o, rid in enumerate(grp["id"]):
            if o < rem * (size + 1):
                tiles[rid] = o // (size + 1) + 1
            else:
                tiles[rid] = rem + (o - rem * (size + 1)) // size + 1
    assert out["tile"].tolist() == [tiles[i] for i in out["id"]]


def test_static_edges_loop_bit_identical(ray_session):
    import numpy as np

    rng = np.random.default_rng(5)
    edges = [{"a": int(a), "b": int(b)}
             for a, b in rng.integers(0, 40, size=(300, 2)) if a != b]
    nodes = [{"node": n} for n in range(45)]

    def run(static):
        out = pagerank_int(_ds(edges), _ds(nodes), iters=4,
                           num_partitions=8, static_edges=static).to_pandas()
        return dict(zip(out["node"].astype(int), out["rank"].astype(int)))

    assert run(True) == run(False)
