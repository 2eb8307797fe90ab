"""Property-based end-to-end CDC checks (hypothesis): for RANDOM small
change logs under RANDOM window splits, the distributed lake must equal the
single-process replayer byte-for-byte, and the change-feed-driven export
must reconstruct the same live state. This is the acceptance bar
(byte-identical final table state) explored adversarially rather than at
fixed seeds."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mex_extractors_ray.cdc.apply import ingest_change_log, read_lake_arrow
from mex_extractors_ray.cdc.replayer import replay_reference
from mex_extractors_ray.pipelines.incremental_export import (
    incremental_export,
    read_export_arrow,
)

_OPS = ["insert", "update", "delete"]


def _log_from(events: list[tuple[int, int]], lsns: list[int]) -> pa.Table:
    """events: (doc_index, op_index); lsns: distinct sorted ints."""
    n = len(events)
    ops = [_OPS[o] for _, o in events]
    is_del = np.array([o == 2 for _, o in events])
    n_tok = np.where(is_del, 0, 1 + (np.array(lsns) % 5)).astype(np.int64)
    toks = [None if d else list(range(int(k))) for d, k in zip(is_del, n_tok)]
    return pa.table({
        "doc_id": pa.array([f"doc-{d}" for d, _ in events]),
        "lsn": pa.array(lsns, pa.int64()),
        "op": pa.array(ops),
        "source": pa.array(["s"] * n),
        "lang": pa.array(["de"] * n),
        "n_tok": pa.array([None if d else int(k) for d, k in zip(is_del, n_tok)],
                          pa.int64()),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
        "schema_version": pa.array([3] * n, pa.int32()),
    })


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 2)), min_size=1, max_size=40),
    gaps=st.lists(st.integers(1, 3), min_size=40, max_size=40),
    n_windows=st.integers(1, 3),
    data=st.data(),
)
def test_lake_equals_replayer_and_export(ray_session, tmp_path_factory,
                                         events, gaps, n_windows, data):
    lsns = np.cumsum(gaps[: len(events)]).tolist()
    log = _log_from(events, lsns)
    # random contiguous window split (window boundaries at random lsn cuts)
    max_cuts = min(n_windows - 1, len(set(lsns)))
    cuts = sorted(data.draw(st.lists(
        st.sampled_from(lsns), min_size=0, max_size=max_cuts,
        unique=True))) if max_cuts else []
    bounds = [-1, *cuts, lsns[-1]]
    tmp = tmp_path_factory.mktemp("prop")
    lake, out = tmp / "lake", tmp / "export"
    import pyarrow.compute as pc

    for i in range(len(bounds) - 1):
        w = log.filter(pc.and_(pc.greater(log["lsn"], bounds[i]),
                               pc.less_equal(log["lsn"], bounds[i + 1])))
        if w.num_rows == 0:
            continue
        p = tmp / f"w{i}.parquet"
        pq.write_table(w, p)
        ingest_change_log([str(p)], lake, num_partitions=2)
        incremental_export(lake, out, num_shards=2)
    if not lake.exists():
        return
    got = read_lake_arrow(lake)
    expected, _ = replay_reference(log)
    assert got.equals(expected)  # byte-identical incl. token arrays
    exp = read_export_arrow(out)
    assert exp.sort_by([("doc_id", "ascending")]).select(got.column_names).equals(got)
    assert exp.num_rows == got.num_rows


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 2)), min_size=1, max_size=40),
    gaps=st.lists(st.integers(1, 3), min_size=40, max_size=40),
    n_windows=st.integers(1, 3),
    data=st.data(),
)
def test_lake_equals_replayer_under_random_splits(ray_session,
                                                  tmp_path_factory,
                                                  events, gaps, n_windows,
                                                  data):
    """Same acceptance bar, with RANDOM hot-partition splits interleaved
    between ingest windows: any sequence of splits must be invisible in
    the final state (routing, tombstones, watermarks all survive)."""
    import pyarrow.compute as pc

    from mex_extractors_ray.cdc.compact import split_partition

    lsns = np.cumsum(gaps[: len(events)]).tolist()
    log = _log_from(events, lsns)
    max_cuts = min(n_windows - 1, len(set(lsns)))
    cuts = sorted(data.draw(st.lists(
        st.sampled_from(lsns), min_size=0, max_size=max_cuts,
        unique=True))) if max_cuts else []
    bounds = [-1, *cuts, lsns[-1]]
    tmp = tmp_path_factory.mktemp("prop_split")
    lake = tmp / "lake"
    P = 2
    for i in range(len(bounds) - 1):
        w = log.filter(pc.and_(pc.greater(log["lsn"], bounds[i]),
                               pc.less_equal(log["lsn"], bounds[i + 1])))
        if w.num_rows == 0:
            continue
        p = tmp / f"w{i}.parquet"
        pq.write_table(w, p)
        ingest_change_log([str(p)], lake, num_partitions=P)
        # between windows: split a random base partition (possibly again)
        for pid0 in data.draw(st.lists(st.integers(0, P - 1),
                                       min_size=0, max_size=2)):
            split_partition(lake, pid0)
    if not lake.exists():
        return
    got = read_lake_arrow(lake)
    expected, _ = replay_reference(log)
    assert got.equals(expected)
