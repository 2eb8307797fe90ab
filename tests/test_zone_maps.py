"""Zone maps (``track_bounds``): conservative per-partition [lo, hi]
intervals in the manifests. Soundness = filtered reads stay exact while the
planner prunes partitions for RANGE predicates; deltas only widen, folds
tighten exactly; follow-on ingests inherit the tracked set."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.cdc import ingest_change_log
from mex_extractors_ray.cdc.apply import read_lake_arrow, read_live_bounds
from mex_extractors_ray.cdc.filtered import (
    plan_filtered_read,
    read_lake_filtered_arrow,
)
from mex_extractors_ray.cdc.manifest import read_manifest
from mex_extractors_ray.hashing import assign_partitions

P = 4


def _pid_of(doc_id: str) -> int:
    return int(assign_partitions(pa.array([doc_id], pa.string()), P)[0])


def _clustered_log(tmp_path, n=64):
    """n_tok correlates with the doc's hash partition (pid*1000 + i), so the
    per-partition zone maps are DISJOINT and range predicates can prune —
    the clustered-ingest regime zone maps exist for."""
    ids = [f"doc-{i}" for i in range(n)]
    ntk = [int(_pid_of(d)) * 1000 + i for i, d in enumerate(ids)]
    log = pa.table({
        "lsn": pa.array(range(1, n + 1), pa.int64()),
        "op": ["insert"] * n,
        "doc_id": ids,
        "tokens": pa.array([[7] * k for k in ntk], pa.list_(pa.int32())),
        "n_tok": pa.array(ntk, pa.int32()),
        "source": ["srcA"] * n,
        "schema_version": pa.array([2] * n, pa.int32()),
        "lang": ["de"] * n,
    })
    p = tmp_path / "log.parquet"
    pq.write_table(log, p)
    return [str(p)]


def _expected(lake, column, op, value):
    full = read_lake_arrow(lake)
    fn = {"==": pc.equal, "<": pc.less, "<=": pc.less_equal,
          ">": pc.greater, ">=": pc.greater_equal}[op]
    return full.filter(pc.fill_null(fn(full[column], value), False))


def test_range_pruning_exact_and_strict_subset(ray_session, tmp_path, tmp_lake):
    ingest_change_log(_clustered_log(tmp_path), tmp_lake, num_partitions=P,
                      track_bounds=("n_tok",))
    all_pids = plan_filtered_read(tmp_lake, "source", "==", "srcA")
    for op, v in [(">=", 3000), (">", 2999), ("<", 1000), ("<=", 999),
                  ("==", 2010)]:
        plan = plan_filtered_read(tmp_lake, "n_tok", op, v)
        assert len(plan) < len(all_pids), (op, v, plan)
        got = read_lake_filtered_arrow(tmp_lake, "n_tok", op, v)
        assert got.equals(_expected(tmp_lake, "n_tok", op, v)), (op, v)
    # out-of-range predicate prunes EVERY partition
    assert plan_filtered_read(tmp_lake, "n_tok", ">", 10**6) == []
    assert read_lake_filtered_arrow(tmp_lake, "n_tok", ">", 10**6).num_rows == 0


def test_delta_widen_only_then_fold_tightens(ray_session, tmp_path, tmp_lake):
    paths = _clustered_log(tmp_path)
    ingest_change_log(paths, tmp_lake, num_partitions=P, track_bounds=("n_tok",))
    lo0, hi0 = read_live_bounds(tmp_lake, "n_tok")
    # second window deletes every doc with the partition-max n_tok values;
    # conservative bounds must NOT shrink (sound superset), so the stale
    # range still scans — and returns the true (empty) result
    full = read_lake_arrow(tmp_lake)
    top = full.filter(pc.greater(full["n_tok"], hi0 - 500))
    dels = pa.table({
        "lsn": pa.array([1000 + i for i in range(top.num_rows)], pa.int64()),
        "op": ["delete"] * top.num_rows,
        "doc_id": top["doc_id"],
        "tokens": pa.array([[0]] * top.num_rows, pa.list_(pa.int32())),
        "n_tok": pa.array([0] * top.num_rows, pa.int32()),
        "source": ["srcA"] * top.num_rows,
        "schema_version": pa.array([2] * top.num_rows, pa.int32()),
        "lang": ["de"] * top.num_rows,
    })
    p2 = tmp_path / "dels.parquet"
    pq.write_table(dels, p2)
    ingest_change_log([str(p2)], tmp_lake, num_partitions=P)  # inherits
    # deletes carry no upserts: bounds unchanged (NOT shrunk)
    assert read_live_bounds(tmp_lake, "n_tok") == [lo0, hi0]
    got = read_lake_filtered_arrow(tmp_lake, "n_tok", ">", hi0 - 500)
    assert got.num_rows == 0
    # fold (compact) recomputes exactly: bounds tighten below the deleted top
    from mex_extractors_ray.cdc.compact import compact, verify_lake

    compact(tmp_lake)
    lo1, hi1 = read_live_bounds(tmp_lake, "n_tok")
    assert hi1 <= hi0 - 500 and lo1 >= lo0
    live = read_lake_arrow(tmp_lake)
    assert [lo1, hi1] == [pc.min(live["n_tok"]).as_py(), pc.max(live["n_tok"]).as_py()]
    # audit: zone maps cover live values in every partition
    assert all(r["ok"] for r in verify_lake(tmp_lake))
    # deleted range now pruned with zero partitions opened
    assert plan_filtered_read(tmp_lake, "n_tok", ">", hi0 - 500) == []


def test_fresh_enable_covers_existing_rows(ray_session, tmp_path, tmp_lake):
    paths = _clustered_log(tmp_path)
    ingest_change_log(paths, tmp_lake, num_partitions=P)  # no bounds yet
    one = pa.table({
        "lsn": pa.array([999], pa.int64()),
        "op": ["insert"],
        "doc_id": ["doc-new"],
        "tokens": pa.array([[1]], pa.list_(pa.int32())),
        "n_tok": pa.array([7], pa.int32()),
        "source": ["srcA"],
        "schema_version": pa.array([2], pa.int32()),
        "lang": ["de"],
    })
    p2 = tmp_path / "one.parquet"
    pq.write_table(one, p2)
    ingest_change_log([str(p2)], tmp_lake, num_partitions=P,
                      track_bounds=("n_tok",))
    # only doc-new's partition committed this window — others still lack
    # bounds, so the lake-wide readback refuses (partial view)
    with pytest.raises(ValueError, match="track_bounds"):
        read_live_bounds(tmp_lake, "n_tok")
    # the freshly-enabled partition's bounds cover its PRE-EXISTING rows,
    # not just the window's upsert
    pid = _pid_of("doc-new")
    b = read_manifest(tmp_lake, pid).agg_bounds["n_tok"]
    live = read_lake_arrow(tmp_lake)
    mine = live.filter(pa.array(
        assign_partitions(live["doc_id"].combine_chunks(), P) == pid))
    assert b[0] <= pc.min(mine["n_tok"]).as_py()
    assert b[1] >= pc.max(mine["n_tok"]).as_py()
    # untracked partitions simply don't prune: reads stay exact
    got = read_lake_filtered_arrow(tmp_lake, "n_tok", "<=", 7)
    assert got.equals(_expected(tmp_lake, "n_tok", "<=", 7))


def test_repartition_recomputes_bounds(ray_session, tmp_path, tmp_lake):
    from mex_extractors_ray.cdc.compact import repartition_lake

    ingest_change_log(_clustered_log(tmp_path), tmp_lake, num_partitions=P,
                      track_bounds=("n_tok",))
    repartition_lake(tmp_lake, P * 2)
    live = read_lake_arrow(tmp_lake)
    assert read_live_bounds(tmp_lake, "n_tok") == [
        pc.min(live["n_tok"]).as_py(), pc.max(live["n_tok"]).as_py()]


def test_lsn_watermark_pruning(ray_session, tmp_path, tmp_lake):
    """Upper-bounded lsn predicates prune from the manifest watermark alone
    — no tracking needed; reads stay exact."""
    ingest_change_log(_clustered_log(tmp_path), tmp_lake, num_partitions=P)
    marks = sorted(
        read_manifest(tmp_lake, p).last_lsn
        for p in range(P) if read_manifest(tmp_lake, p))
    all_pids = plan_filtered_read(tmp_lake, "source", "==", "srcA")
    # above the global watermark: every partition pruned
    assert plan_filtered_read(tmp_lake, "lsn", ">", marks[-1]) == []
    # between the lowest and highest per-partition watermark: strict subset
    plan = plan_filtered_read(tmp_lake, "lsn", ">", marks[0])
    assert 0 < len(plan) < len(all_pids)
    for op, v in [(">", marks[0]), (">=", marks[-1]), ("==", marks[0] + 1)]:
        got = read_lake_filtered_arrow(tmp_lake, "lsn", op, v)
        assert got.equals(_expected(tmp_lake, "lsn", op, v)), (op, v)


def test_unorderable_column_refused(ray_session, tmp_path, tmp_lake):
    with pytest.raises(Exception, match="orderable"):
        ingest_change_log(_clustered_log(tmp_path), tmp_lake,
                          num_partitions=P, track_bounds=("tokens",))


def test_nan_bounds_sound():
    """NaN rows never satisfy a range/equality predicate (IEEE), so bounds
    that EXCLUDE NaN are sound: pruning only claims 'no row matches'. This
    pyarrow's min_max skips NaN (like nulls) — assert that, plus the
    defensive never-prunes degrade if a NaN ever reaches the interval."""
    from mex_extractors_ray.cdc.apply import _bounds_of, _bounds_union
    from mex_extractors_ray.cdc.filtered import _bounds_may_match

    b = _bounds_of(pa.array([1.0, float("nan"), 5.0], pa.float64()))
    assert b == [1.0, 5.0]
    assert _bounds_may_match(b, ">=", 3.0)
    # NaN rows can't match, so a NaN-only partition pruning everything is
    # correct behavior — whatever min_max returns for it must never claim
    # a match it can't deliver; and the defensive unbounded interval (the
    # degrade path for min_max versions that propagate NaN) never prunes
    inf = [float("-inf"), float("inf")]
    assert _bounds_may_match(inf, "==", 42)
    assert _bounds_union(b, inf) == inf
    import json

    assert json.loads(json.dumps(inf)) == inf  # manifest round-trip
