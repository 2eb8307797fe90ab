"""Connected components (large-star/small-star) vs a union-find reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from mex_extractors_ray.stages.components import (component_labels,
                                                  connected_components)


def _uf_reference(edges: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    parent: dict[int, int] = {n: n for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min node id of the component
    roots: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        roots[r] = min(roots.get(r, r), n)
    return {n: roots[find(n)] for n in nodes}


def _run_cc(edges: list[tuple[int, int]], num_partitions: int = 8) -> dict[int, int]:
    t = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                  "b": pa.array([e[1] for e in edges], pa.int64())})
    out = connected_components(
        ray.data.from_arrow(t), num_partitions=num_partitions
    ).to_pandas()
    return dict(zip(out["node"], out["component"]))


def test_chain_and_triangle(ray_session):
    # chain 1-2-3-4 plus triangle 10-11-12 plus pair (20,21)
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)]
    got = _run_cc(edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges_logarithmically(ray_session):
    # a 64-node path is the worst case for naive label propagation
    edges = [(i, i + 1) for i in range(64)]
    got = _run_cc(edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(0, 80, 60), (1, 200, 150), (2, 50, 120)])
def test_random_graphs_match_union_find(ray_session, seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    edges = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    nodes = {int(x) for e in edges for x in e}
    assert _run_cc(edges) == _uf_reference(edges, nodes)


def test_self_loops_and_duplicate_edges(ray_session):
    got = _run_cc([(5, 5), (1, 2), (2, 1), (1, 2), (7, 7)])
    assert got == {1: 1, 2: 1}  # self-loops contribute no assignments


def test_component_labels_includes_singletons(ray_session):
    edges = pa.table({"a": pa.array([1, 2], pa.int64()),
                      "b": pa.array([2, 3], pa.int64())})
    nodes = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64())})
    out = component_labels(
        ray.data.from_arrow(edges), ray.data.from_arrow(nodes),
        num_partitions=4,
    ).to_pandas().sort_values("node").reset_index(drop=True)
    assert out["node"].tolist() == [1, 2, 3, 4, 5]
    assert out["component"].tolist() == [1, 1, 1, 4, 5]


def test_update_components_incremental(ray_session):
    from mex_extractors_ray.stages.components import update_components

    # initial state: {1,2,3} labeled 1; {10,11} labeled 10; singleton 20
    labels = ray.data.from_arrow(pa.table({
        "node": pa.array([1, 2, 3, 10, 11, 20], pa.int64()),
        "component": pa.array([1, 1, 1, 10, 10, 20], pa.int64()),
    }))
    # window: bridge the two clusters via (3,11), connect 20 to a new doc 21
    new = ray.data.from_arrow(pa.table({
        "a": pa.array([3, 20], pa.int64()),
        "b": pa.array([11, 21], pa.int64()),
    }))
    out = update_components(labels, new, num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 20: 20, 21: 20}


def test_update_components_equals_batch_recompute(ray_session):
    import numpy as np

    from mex_extractors_ray.stages.components import (component_labels,
                                                      update_components)

    rng = np.random.default_rng(7)
    all_edges = [(int(a), int(b)) for a, b in
                 zip(rng.integers(0, 60, 50), rng.integers(0, 60, 50)) if a != b]
    first, second = all_edges[:30], all_edges[30:]
    nodes = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(sorted({x for e in all_edges for x in e}), pa.int64())}))

    def edges_ds(es):
        return ray.data.from_arrow(pa.table({
            "a": pa.array([e[0] for e in es], pa.int64()),
            "b": pa.array([e[1] for e in es], pa.int64())}))

    base = component_labels(edges_ds(first), nodes, num_partitions=4)
    incr = update_components(base, edges_ds(second), num_partitions=4).to_pandas()
    full = component_labels(edges_ds(all_edges), nodes, num_partitions=4).to_pandas()
    assert (dict(zip(incr["node"], incr["component"]))
            == dict(zip(full["node"], full["component"])))
