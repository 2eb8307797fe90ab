"""Cluster-size-aware defaults for actor-pool stages.

Every stateful stage in this engine runs as an autoscaling actor pool
(``map_batches(Cls, concurrency=(lo, hi))``). A hardcoded ``hi`` is a
scale bug in both directions: ``(1, 8)`` starves a 32-CPU node (and caps a
256-node cluster at 8 actors total), while a huge constant would be noise.
``auto_pool`` sizes ``hi`` from the live cluster instead.

The max is a *cap*, not a reservation — Ray's autoscaling pool only adds
actors while there are queued blocks AND free logical CPUs, so a generous
cap on a small cluster costs nothing.
"""

from __future__ import annotations

import os


def cluster_cpus(default: int = 8) -> int:
    """Logical CPUs in the connected Ray cluster (``default`` when Ray is
    not initialized yet — stages built lazily before ``ray.init`` resolve
    their pool size at build time, so callers on big clusters should build
    datasets after init, which the driver/tests/bench all do)."""
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        pass
    try:
        return max(1, int(os.environ.get("RAY_GRAFT_CPUS", default)))
    except (TypeError, ValueError):
        return default


def auto_pool(lo: int = 1, cap: int | None = None) -> tuple[int, int]:
    """``(lo, hi)`` actor-pool bounds with ``hi`` = cluster CPU count
    (never below 8 so single-digit test clusters keep some parallelism
    headroom; optionally capped for stages with external side effects)."""
    hi = max(8, cluster_cpus())
    if cap is not None:
        hi = min(hi, cap)
    return (lo, max(lo, hi))
