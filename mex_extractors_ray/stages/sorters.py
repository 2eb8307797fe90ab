"""Ordering operators.

- :func:`topological_sort` — the reference's parents-before-children load
  ordering (``mex/extractors/sorters.py:12-49``, networkx-based, in-place
  sort by topo index with primary-key tie-break). Re-implemented as a plain
  Kahn's algorithm (no networkx in this container) with deterministic
  lexicographic tie-breaks. Used at publish time on entity graphs — these
  are small (dimension-sized), so it is a driver-side operator by design;
  the *data-plane* ordering constraint (apply-in-LSN-order within a
  partition) lives in cdc/apply.py.
- :func:`sort_within_partitions` — per-group ordering without a global
  shuffle: sorts inside each hash partition only (enough whenever the
  consumer is partition-local, e.g. per-partition file layout).
"""

from __future__ import annotations

from collections import defaultdict, deque
from typing import Sequence


def topological_sort(
    items: Sequence[dict],
    key: str,
    parent_key: str,
) -> list[dict]:
    """Order ``items`` so every parent precedes its children; ties (same
    depth) break by ``key`` for deterministic output. Unknown parents are
    treated as roots; cycles raise ValueError (the reference's DiGraph would
    loop forever otherwise)."""
    by_key = {it[key]: it for it in items}
    children = defaultdict(list)
    indegree = {it[key]: 0 for it in items}
    for it in items:
        parent = it.get(parent_key)
        if parent is not None and parent in by_key:
            children[parent].append(it[key])
            indegree[it[key]] += 1
    ready = sorted(k for k, d in indegree.items() if d == 0)
    queue = deque(ready)
    out: list[dict] = []
    while queue:
        # deterministic: pull the smallest ready key each round
        k = queue.popleft()
        out.append(by_key[k])
        newly = []
        for c in children[k]:
            indegree[c] -= 1
            if indegree[c] == 0:
                newly.append(c)
        for c in sorted(newly):
            queue.append(c)
    if len(out) != len(items):
        raise ValueError("cycle detected in parent/child graph")
    return out


def sort_within_partitions(ds, partition_col: str, sort_cols: list[str]):
    """Sort rows inside each partition group only (no global order, no
    global shuffle beyond the partition groupby). One Arrow sort per group —
    ``partition_col`` is expected to be a COARSE partition id (dozens to
    thousands of groups), not a row key; per-row-key grouping belongs to
    ``dedup._keyed_blocks``."""
    import pyarrow as pa

    def _sort(g: pa.Table) -> pa.Table:
        return g.sort_by([(c, "ascending") for c in sort_cols])

    return ds.groupby(partition_col).map_groups(_sort, batch_format="pyarrow")
