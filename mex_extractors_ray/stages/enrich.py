"""Stateful enrichment actors — the reference's lru_cache service family
(SURVEY.md §2.4).

The reference memoizes expensive lookups per process: LDAP person resolution
(cache(1024), ``mex/extractors/ldap/helpers.py:32-123``), wikidata org
resolution with load-on-miss (``mex/extractors/wikidata/helpers.py:42-77``),
primary-source resolution (``mex/extractors/primary_source/helpers.py:12-36``).

Distributed form: a ``map_batches`` actor pool where each actor holds its
own LRU; the resolve function runs only on cache misses, and misses can be
emitted to a side stream (the wikidata load-on-miss pattern). Batches are
deduplicated before resolution so one batch never resolves the same key
twice (the reference's ``seen``-set discipline).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
from .. import runtime as _rt


class LRUCache:
    def __init__(self, maxsize: int = 1024):
        self.maxsize = maxsize
        self._d: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key):
        if key in self._d:
            self._d.move_to_end(key)
            self.hits += 1
            return self._d[key]
        self.misses += 1
        return None

    def put(self, key, value):
        self._d[key] = value
        self._d.move_to_end(key)
        if len(self._d) > self.maxsize:
            self._d.popitem(last=False)


class CachedEnricher:
    """map_batches actor: enrich ``key_col`` via ``resolve(key) -> value``
    with a per-actor LRU (built ONCE in __init__ — the lru_cache slot).

    ``resolve`` must be deterministic (same key → same value) so that the
    same key resolved on two actors yields identical output — the analog of
    the reference's deterministic ``stableTargetId`` discipline.

    ``miss_sink`` completes the wikidata load-on-miss pattern
    (``mex/extractors/wikidata/helpers.py:42-77``: a cache miss LOADS the
    resolved org to the sink): newly-resolved (key, value) rows are emitted
    to the side sink in the same pass. The per-actor LRU makes re-delivery
    of a key to the SAME actor a no-op; cross-actor exactly-once requires an
    idempotent sink (see :class:`DirectoryMissSink` — one deterministic file
    per key — or the get-or-create dimension upsert).
    """

    def __init__(self, resolve: Callable, key_col: str, out_col: str, maxsize: int = 1024,
                 miss_sink: Callable | None = None):
        self.resolve = resolve
        self.key_col, self.out_col = key_col, out_col
        self.cache = LRUCache(maxsize)
        self.miss_sink = miss_sink

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        uniq = pc.unique(col)
        # the resolve() call per DISTINCT key is the external lookup itself
        # (LDAP/wikidata analog) — everything around it is vectorized
        values = []
        miss_keys, miss_values = [], []
        for key in uniq.to_pylist():
            v = self.cache.get(key)
            if v is None:
                v = self.resolve(key)
                self.cache.put(key, v)
                miss_keys.append(key)
                miss_values.append(v)
            values.append(v)
        if self.miss_sink is not None and miss_keys:
            self.miss_sink(
                pa.table({self.key_col: pa.array(miss_keys, uniq.type),
                          self.out_col: pa.array(miss_values)})
            )
        idx = pc.index_in(col, value_set=uniq)
        out = pc.take(pa.array(values), idx)
        # Arrow in/out keeps the block schema hashable (pandas batches made
        # Ray log "Failed to hash the schemas" per batch and disabled its
        # schema dedup)
        return batch.append_column(self.out_col, out)


class DirectoryMissSink:
    """Idempotent miss sink: one Parquet file per DISTINCT key, named by the
    key's stable hash — a re-delivered miss (task retry, another actor)
    overwrites the identical file, so the side stream is exactly-once on
    disk regardless of delivery count. Scale note: this is the file-per-key
    layout for side streams that are cache-miss-sized (LSH's candidate
    argument applies: misses ≪ corpus); corpus-sized side streams belong in
    the keyed lake upsert instead."""

    def __init__(self, out_dir):
        from pathlib import Path

        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)

    def __call__(self, misses: pa.Table) -> None:
        import os
        import uuid

        import pyarrow.parquet as pq

        from mex_extractors_ray.hashing import hash_string_array

        key_col = misses.column_names[0]
        hashes = hash_string_array(pc.cast(misses[key_col], pa.string()))
        for i, h in enumerate(hashes):
            tmp = self.out_dir / f".tmp-{uuid.uuid4().hex}"
            pq.write_table(misses.slice(i, 1), tmp, compression="snappy")
            os.replace(tmp, self.out_dir / f"miss-{int(h):016x}.parquet")


def enrich(ds, resolve: Callable, key_col: str, out_col: str,
           maxsize: int = 1024, concurrency=None, batch_size: int = 4096,
           miss_sink: Callable | None = None):
    concurrency = concurrency or _rt.auto_pool()
    return ds.map_batches(
        CachedEnricher,
        fn_constructor_args=(resolve, key_col, out_col, maxsize, miss_sink),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
