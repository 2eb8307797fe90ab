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

import contextlib
import logging
import os
import re


class _EmptyBlockSchemaNoise(logging.Filter):
    """Drop ONLY the cosmetic "RefBundle with a different schema … new
    schema: ." executor warning for ZERO-COLUMN bundles.

    Ray's sort-based exchange (which backs ``groupby().map_groups`` under
    the default strategy) emits empty partitions as blocks with an empty
    schema, and map UDFs are never invoked on zero-row blocks — verified
    against ray 2.49.2 (``grouped_data.py:map_groups`` → ``sort`` →
    ``_apply_udf_to_groups`` yields nothing for an empty block), so no
    user code can give those bundles a schema. A genuinely-empty sort
    partition is normal whenever keys ≪ partitions (e.g. a near-dup
    candidate-pair dedup at small scale). Real mismatches — two DIFFERENT
    non-empty schemas, the bug this warning exists for — still log."""

    _EMPTY = re.compile(
        r"new schema:\s*\.?\s*(This may lead|$)"  # … new schema: <empty>.
        r"|Previous schema:\s*,\s*new schema:"    # Previous schema: <empty>, …
    )

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        try:
            msg = record.getMessage()
        except Exception:
            return True
        if "produced a RefBundle with a different schema" not in msg:
            return True
        return not self._EMPTY.search(msg)


def silence_empty_block_schema_warnings() -> None:
    """Install :class:`_EmptyBlockSchemaNoise` once (idempotent)."""
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(isinstance(f, _EmptyBlockSchemaNoise) for f in logger.filters):
        logger.addFilter(_EmptyBlockSchemaNoise())


silence_empty_block_schema_warnings()


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


def stateless(cls, *args, **kwargs):
    """Run a cheap-init batch-stage class as STATELESS tasks on the shared
    worker pool instead of a fixed actor pool. A pool cap is a serial stage
    that breaks elasticity and pays actor startup; reserve actor pools for
    REAL per-actor state (LRU caches, compiled model matrices, rate
    limiters). Broadcast numpy refs passed as args stay zero-copy — each
    task's ray.get reads plasma directly. Measured on the minhash candidate
    stage at sf0.1: 4.1-5.7 s actor pool -> 2.2-2.6 s stateless."""

    def run(batch):
        return cls(*args, **kwargs)(batch)

    return run


def auto_pool(lo: int = 1, cap: int | None = None) -> tuple[int, int]:
    """``(lo, hi)`` actor-pool bounds with ``hi`` = cluster CPU count
    (never below 8 so single-digit test clusters keep some parallelism
    headroom; optionally capped for stages with external side effects)."""
    hi = max(8, cluster_cpus())
    if cap is not None:
        hi = min(hi, cap)
    return (lo, max(lo, hi))


def typed_to_pandas(ds):
    """``Dataset.to_pandas`` that survives an ALL-EMPTY dataset: Ray's
    conversion drops every column when no block has rows, even when the
    blocks are typed (verified against ray 2.49.2). Rebuild the empty
    frame from ``ds.schema()`` instead so callers always see stable,
    typed columns. Zero extra cost on the non-empty path."""
    df = ds.to_pandas()
    if len(df.columns) == 0 and len(df) == 0:
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        if base is not None and len(base.names) > 0:
            import pyarrow as pa

            empty = pa.table(
                {f.name: pa.nulls(0, f.type) for f in base})
            return empty.to_pandas()
    return df


def read_parquet_clean(path, columns=None, **kw):
    """``read_parquet`` with the schema's ``b'pandas'`` metadata stripped.

    Pandas-written parquet carries schema metadata containing a dict, which
    makes ``hash(pa.Schema)`` raise — every downstream schema-dedup in Ray
    (read-task SplitBlocks unify, shuffle aggregators, Write) then logs
    "Failed to hash the schemas" per block and falls off its fast path.
    Passing an explicit metadata-free ``schema=`` cleans blocks at the
    source; a post-read strip stage can't reach the read task's internal
    unify. With ``columns=`` the schema must match the projection."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    first = path if isinstance(path, str) else path[0]
    s = pq.read_schema(first).remove_metadata()
    if columns is not None:
        s = pa.schema([s.field(c) for c in columns])
    return ray.data.read_parquet(path, schema=s, columns=columns, **kw)


@contextlib.contextmanager
def hash_shuffle(agg_per_cpu: float | None = None, max_aggregators: int | None = None):
    """Run a pipeline's *construction and execution* under Ray's hash-shuffle
    strategy, restored afterwards.

    Why: this engine's wide ops only need key co-location, never global
    order (every per-group kernel re-sorts inside its block), so the
    sort-based default wastes a sample pass + ordered exchange. Hash
    shuffle skips both — and combined with the bijective shard labels
    (``hashing.shuffle_labels``) no aggregator bucket is empty, so the
    executor sees schema-stable blocks end to end.

    DataContext is captured when a Dataset is CREATED, so enter this
    context before ``read_parquet`` and keep it open through the terminal
    ``to_pandas``/``take_all``/``write_parquet``. The aggregator fleet is
    capped at ``agg_per_cpu`` actors per cluster CPU (default from
    ``MEX_AGG_PER_CPU``, 1/cpu — A/B-measured in BASELINE.md: Ray's
    default one-aggregator-per-partition fleet oversubscribes small
    clusters and serializes the pipeline).

    Deadlock guard: Ray sizes aggregator actors at 0.0625 CPU *per
    partition* regardless of cluster size, so a 64-partition shuffle
    reserves 4.0 logical CPUs — the WHOLE of a 4-CPU test cluster — while
    an upstream map task holds one of them, and the pipeline deadlocks
    (observed: ``Shuffle(...): Tasks: 0 [backpressured]; Resources: 4.0
    CPU`` forever). We bound the whole fleet's reservation to half the
    cluster by scaling the per-partition CPU override for the engine's
    worst-case partition count (256 ≥ minhash's bands×salt=128 and the
    200-partition default of native groupby aggregates); ops with fewer
    partitions reserve proportionally less — always the safe direction.
    Actual parallelism still comes from the aggregator-count cap above."""
    import ray
    import ray.data

    ctx = ray.data.DataContext.get_current()
    _ATTRS = (
        "max_hash_shuffle_aggregators",
        "hash_shuffle_operator_actor_num_cpus_per_partition_override",
        "hash_aggregate_operator_actor_num_cpus_per_partition_override",
    )
    saved = {a: (hasattr(ctx, a), getattr(ctx, a, None)) for a in _ATTRS}
    saved_strategy = ctx.shuffle_strategy
    try:
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        cpus = cluster_cpus()
        per_cpu = agg_per_cpu if agg_per_cpu is not None else float(
            os.environ.get("MEX_AGG_PER_CPU", "1")
        )
        agg = max(1, int(per_cpu * cpus))
        if max_aggregators is not None:
            agg = min(agg, max_aggregators)
        ctx.max_hash_shuffle_aggregators = agg
        # total reservation = override × num_partitions ≤ cpus/2 at the
        # engine's worst-case partition count
        worst_case_partitions = 256
        override = max(0.001, (cpus / 2) / worst_case_partitions)
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = override
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = override
        yield ctx
    finally:
        ctx.shuffle_strategy = saved_strategy
        # restore the literal prior state (including unset) — guarding on
        # `is not None` would leak this job's knobs into unrelated later
        # hash-shuffle jobs
        for a, (present, val) in saved.items():
            if present:
                setattr(ctx, a, val)
            else:
                try:
                    delattr(ctx, a)
                except AttributeError:
                    pass
