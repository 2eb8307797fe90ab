"""Clustered compaction (compact(cluster_by=...)): base sorted by a
secondary column with bounded row groups so parquet row-group statistics
prune range predicates — state equality, audit, delta carry-forward, and
actual stats selectivity."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.cdc import ingest_change_log
from mex_extractors_ray.cdc.apply import read_lake_arrow
from mex_extractors_ray.cdc.compact import compact, verify_lake
from mex_extractors_ray.cdc.filtered import read_lake_filtered_arrow
from mex_extractors_ray.cdc.manifest import read_manifest
from mex_extractors_ray.gen import synth_change_log


def _build(tmp_path, tmp_lake, n=6000, windows=2):
    paths = synth_change_log(tmp_path / "log", n_events=n, n_docs=n // 8,
                             seed=13, shard_rows=n // windows)
    for p in paths:
        ingest_change_log([p], tmp_lake, num_partitions=4)
    return tmp_lake


def test_clustered_compact_preserves_state_and_audit(ray_session, tmp_path,
                                                     tmp_lake):
    _build(tmp_path, tmp_lake)
    before = read_lake_arrow(tmp_lake)
    out = compact(tmp_lake, cluster_by="n_tok", row_group_rows=48)
    assert all(r["action"] in ("rewritten", "noop") for r in out)
    assert read_lake_arrow(tmp_lake).equals(before)
    assert all(r["ok"] for r in verify_lake(tmp_lake))
    m = read_manifest(tmp_lake, 0)
    assert m.cluster_by == "n_tok" and len(m.files) == 1
    # the base really is n_tok-sorted with bounded row groups
    pf = pq.ParquetFile(f"{tmp_lake}/partition=00000/{m.files[0]}")
    assert pf.metadata.num_row_groups > 1
    mins = [pf.metadata.row_group(i).column(2).statistics.min
            for i in range(pf.metadata.num_row_groups)]
    assert mins == sorted(mins)


def test_row_group_stats_are_selective(ray_session, tmp_path, tmp_lake):
    _build(tmp_path, tmp_lake)
    compact(tmp_lake, cluster_by="n_tok", row_group_rows=16)
    m = read_manifest(tmp_lake, 0)
    pf = pq.ParquetFile(f"{tmp_lake}/partition=00000/{m.files[0]}")
    ncol = next(i for i, f in enumerate(pf.schema_arrow) if f.name == "n_tok")
    lo, hi = 100, 110
    overlapping = sum(
        1 for i in range(pf.metadata.num_row_groups)
        if not (pf.metadata.row_group(i).column(ncol).statistics.max < lo
                or pf.metadata.row_group(i).column(ncol).statistics.min > hi)
    )
    # a narrow range must touch a strict minority of row groups
    assert overlapping < pf.metadata.num_row_groups / 2


def test_filtered_read_equal_before_and_after_cluster(ray_session, tmp_path,
                                                      tmp_lake):
    _build(tmp_path, tmp_lake)
    pred = [("n_tok", ">=", 60), ("n_tok", "<", 90)]
    before = read_lake_filtered_arrow(tmp_lake, pred)
    compact(tmp_lake, cluster_by="n_tok", row_group_rows=48)
    after = read_lake_filtered_arrow(tmp_lake, pred)
    assert after.equals(before)


def test_delta_window_carries_cluster_flag_and_fold_resets(ray_session,
                                                           tmp_path, tmp_lake):
    _build(tmp_path, tmp_lake)
    compact(tmp_lake, cluster_by="n_tok", row_group_rows=48)
    last = int(pc.max(read_lake_arrow(tmp_lake)["lsn"]).as_py())
    # follow-on delta window: flag rides along, audit stays green
    more = synth_change_log(tmp_path / "log2", n_events=2000, n_docs=750,
                            seed=14, lsn_start=last + 1)
    ingest_change_log(more, tmp_lake, num_partitions=4)
    m = read_manifest(tmp_lake, 0)
    assert m.cluster_by == "n_tok" and len(m.files) > 1
    assert all(r["ok"] for r in verify_lake(tmp_lake))
    # a plain fold rewrites the base doc_id-sorted and resets the flag
    compact(tmp_lake)
    m = read_manifest(tmp_lake, 0)
    assert m.cluster_by is None
    assert all(r["ok"] for r in verify_lake(tmp_lake))


# ------------------------------------------------------------------- z-order


def test_zorder_key_interleaves_scaled_ranks():
    """Known tiny case: both columns scale onto the full 21-bit width, so
    the z order groups by the (lo/hi, lo/hi) quadrant, never by one
    column alone."""
    from mex_extractors_ray.cdc.compact import zorder_key

    t = pa.table({
        "s": ["a", "a", "b", "b"],
        "v": [0, 100, 0, 100],
    })
    z = zorder_key(t, ["s", "v"]).to_pylist()
    # (a,0) is the global minimum, (b,100) the global maximum
    assert z[0] == min(z) and z[3] == max(z)
    # quadrant keys are all distinct
    assert len(set(z)) == 4


def test_zorder_compact_preserves_state_and_audit(ray_session, tmp_path,
                                                  tmp_lake):
    _build(tmp_path, tmp_lake)
    before = read_lake_arrow(tmp_lake)
    out = compact(tmp_lake, cluster_by="z:source,n_tok", row_group_rows=48)
    assert all(r["action"] in ("rewritten", "noop") for r in out)
    assert read_lake_arrow(tmp_lake).equals(before)
    # the audit recomputes the z key from file content and checks order
    assert all(r["ok"] for r in verify_lake(tmp_lake))
    m = read_manifest(tmp_lake, 0)
    assert m.cluster_by == "z:source,n_tok" and len(m.files) == 1
    # operator surface: lake_stats reports the clustering state per spec
    from mex_extractors_ray.cdc.compact import lake_stats

    assert lake_stats(tmp_lake)["clustering"] == {"z:source,n_tok": 4}
    # re-compact with the same spec is a noop
    out2 = compact(tmp_lake, cluster_by="z:source,n_tok", row_group_rows=48)
    assert all(r["action"] == "noop" for r in out2)


def test_zorder_prunes_both_predicate_legs(ray_session, tmp_path, tmp_lake):
    """The point of z-order: a conjunctive (source = x AND n_tok range)
    predicate prunes row groups on BOTH legs, strictly better than
    clustering on n_tok alone."""
    _build(tmp_path, tmp_lake, n=8000)

    def overlapping(pred_src, lo, hi):
        m = read_manifest(tmp_lake, 0)
        pf = pq.ParquetFile(f"{tmp_lake}/partition=00000/{m.files[0]}")
        si = next(i for i, f in enumerate(pf.schema_arrow) if f.name == "source")
        ni = next(i for i, f in enumerate(pf.schema_arrow) if f.name == "n_tok")
        hits = 0
        for i in range(pf.metadata.num_row_groups):
            ss = pf.metadata.row_group(i).column(si).statistics
            ns = pf.metadata.row_group(i).column(ni).statistics
            if ss.max < pred_src or ss.min > pred_src:
                continue
            if ns.max < lo or ns.min > hi:
                continue
            hits += 1
        return hits, pf.metadata.num_row_groups

    pred = [("source", "==", "src2"), ("n_tok", ">=", 60), ("n_tok", "<", 90)]

    compact(tmp_lake, cluster_by="n_tok", row_group_rows=16)
    single_hits, total_single = overlapping("src2", 60, 89)
    expected = read_lake_filtered_arrow(tmp_lake, pred)

    compact(tmp_lake, cluster_by="z:source,n_tok", row_group_rows=16)
    z_hits, total_z = overlapping("src2", 60, 89)
    # filtered reads stay exact under z-order
    assert read_lake_filtered_arrow(tmp_lake, pred).equals(expected)

    assert total_z == total_single
    # z-order touches strictly fewer row groups than single-column
    # clustering for the two-legged predicate (source adds no pruning
    # under n_tok-only clustering: every group spans all sources)
    assert z_hits < single_hits


def test_zorder_flag_rides_delta_and_fold_resets(ray_session, tmp_path,
                                                 tmp_lake):
    _build(tmp_path, tmp_lake)
    compact(tmp_lake, cluster_by="z:source,n_tok", row_group_rows=48)
    last = int(pc.max(read_lake_arrow(tmp_lake)["lsn"]).as_py())
    more = synth_change_log(tmp_path / "log2", n_events=2000, n_docs=750,
                            seed=14, lsn_start=last + 1)
    ingest_change_log(more, tmp_lake, num_partitions=4)
    m = read_manifest(tmp_lake, 0)
    assert m.cluster_by == "z:source,n_tok" and len(m.files) > 1
    assert all(r["ok"] for r in verify_lake(tmp_lake))
    compact(tmp_lake)
    assert read_manifest(tmp_lake, 0).cluster_by is None
    assert all(r["ok"] for r in verify_lake(tmp_lake))


def test_zorder_rejects_bad_specs(ray_session, tmp_path, tmp_lake):
    import pytest

    from mex_extractors_ray.cdc.compact import zorder_cols

    with pytest.raises(ValueError, match="exactly 2"):
        zorder_cols("z:one")
    with pytest.raises(ValueError, match="exactly 2"):
        zorder_cols("z:a,b,c")
    _build(tmp_path, tmp_lake, n=1000)
    # the per-partition rewrite runs as a Ray task: the ValueError arrives
    # wrapped in RayTaskError — match the message, not the type
    with pytest.raises(Exception, match="not in lake schema"):
        compact(tmp_lake, cluster_by="z:source,nope")
