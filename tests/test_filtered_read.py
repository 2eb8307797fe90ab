"""Predicate-pushdown lake reads: exactness vs the unfiltered read,
partition pruning from the maintained value counts / the hash partitioner,
and supersession safety (a doc whose NEWEST version fails the predicate
must not resurrect through an older matching version)."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.cdc import ingest_change_log
from mex_extractors_ray.cdc.apply import read_lake_arrow
from mex_extractors_ray.cdc.filtered import (
    plan_filtered_read,
    read_lake_filtered,
    read_lake_filtered_arrow,
)


def _expected(lake, column, op, value):
    full = read_lake_arrow(lake)
    if op == "in":
        mask = pc.is_in(full[column], value_set=pa.array(list(value)))
    else:
        fn = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
              "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}[op]
        mask = fn(full[column], value)
    return full.filter(pc.fill_null(mask, False))


def test_filtered_equals_postfilter_tracked_eq(ray_session, small_log, tmp_lake):
    paths, _ = small_log
    ingest_change_log(list(paths), tmp_lake, num_partitions=4,
                      track_value_counts=("source",))
    got = read_lake_filtered_arrow(tmp_lake, "source", "==", "src3")
    assert got.num_rows > 0
    assert got.equals(_expected(tmp_lake, "source", "==", "src3"))


def test_filtered_range_and_in_and_ne(ray_session, small_log, tmp_lake):
    paths, _ = small_log
    ingest_change_log(list(paths), tmp_lake, num_partitions=4)
    for column, op, value in [
        ("n_tok", ">=", 96),
        ("n_tok", "<", 20),
        ("source", "in", ["src1", "src5"]),
        ("lang", "!=", "de"),
        ("lsn", ">", 4000),
    ]:
        got = read_lake_filtered_arrow(tmp_lake, column, op, value)
        exp = _expected(tmp_lake, column, op, value)
        assert got.equals(exp), (column, op, value, got.num_rows, exp.num_rows)


def test_supersession_not_resurrected(ray_session, tmp_path, tmp_lake):
    # doc a: insert srcA then update to srcB — filter srcA must NOT return it
    # doc b: insert srcA then delete           — must NOT return it
    # doc c: insert srcB then update to srcA   — MUST return it (newest matches)
    log = pa.table({
        "lsn": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "op": ["insert", "insert", "insert", "update", "delete", "update"],
        "doc_id": ["a", "b", "c", "a", "b", "c"],
        "tokens": pa.array([[1], [2], [3], [4], [5], [6]], pa.list_(pa.int32())),
        "n_tok": pa.array([1] * 6, pa.int32()),
        "source": ["srcA", "srcA", "srcB", "srcB", "srcA", "srcA"],
        "schema_version": pa.array([2] * 6, pa.int32()),
        "lang": ["de"] * 6,
    })
    p = tmp_path / "log.parquet"
    pq.write_table(log, p)
    ingest_change_log([str(p)], tmp_lake, num_partitions=2)
    got = read_lake_filtered_arrow(tmp_lake, "source", "==", "srcA")
    assert got["doc_id"].to_pylist() == ["c"]
    assert got["lsn"].to_pylist() == [6]


def test_plan_prunes_tracked_and_doc_id(ray_session, tmp_path, tmp_lake):
    # one rare source value confined to a single doc -> its partition set
    # must be a strict subset of the manifested partitions
    n = 64
    log = pa.table({
        "lsn": pa.array(range(1, n + 1), pa.int64()),
        "op": ["insert"] * n,
        "doc_id": [f"doc-{i}" for i in range(n)],
        "tokens": pa.array([[i] for i in range(n)], pa.list_(pa.int32())),
        "n_tok": pa.array([1] * n, pa.int32()),
        "source": ["rare" if i == 7 else "common" for i in range(n)],
        "schema_version": pa.array([2] * n, pa.int32()),
        "lang": ["de"] * n,
    })
    p = tmp_path / "log.parquet"
    pq.write_table(log, p)
    ingest_change_log([str(p)], tmp_lake, num_partitions=8,
                      track_value_counts=("source",))
    all_pids = plan_filtered_read(tmp_lake, "source", "==", "common")
    rare_pids = plan_filtered_read(tmp_lake, "source", "==", "rare")
    assert len(rare_pids) == 1 and len(all_pids) > 1
    got = read_lake_filtered_arrow(tmp_lake, "source", "==", "rare")
    assert got["doc_id"].to_pylist() == ["doc-7"]
    # doc_id equality routes via the hash partitioner: exactly one partition
    assert len(plan_filtered_read(tmp_lake, "doc_id", "==", "doc-7")) == 1
    got = read_lake_filtered_arrow(tmp_lake, "doc_id", "==", "doc-7")
    assert got["doc_id"].to_pylist() == ["doc-7"]
    # untracked column (no agg_counts entry) -> no pruning, still correct
    assert plan_filtered_read(tmp_lake, "lang", "==", "xx") == all_pids
    assert read_lake_filtered_arrow(tmp_lake, "lang", "==", "xx").num_rows == 0


def test_distributed_matches_driver(ray_session, small_log, tmp_lake):
    paths, _ = small_log
    ingest_change_log(list(paths), tmp_lake, num_partitions=4,
                      track_value_counts=("source",))
    ds = read_lake_filtered(tmp_lake, "source", "in", ["src0", "src2"])
    got = pa.concat_tables(
        [pa.Table.from_pandas(b, preserve_index=False)
         for b in [ds.to_pandas()]]
    ).sort_by([("doc_id", "ascending")])
    exp = read_lake_filtered_arrow(tmp_lake, "source", "in", ["src0", "src2"])
    assert got["doc_id"].to_pylist() == exp["doc_id"].to_pylist()
    assert got["lsn"].to_pylist() == exp["lsn"].to_pylist()


def test_filtered_read_across_delta_windows(ray_session, small_log, tmp_path, tmp_lake):
    # two ingest windows -> base + delta files + delete logs; the filtered
    # read must stay exact across the layered layout
    paths, _ = small_log
    ingest_change_log(list(paths[:-1]), tmp_lake, num_partitions=4,
                      track_value_counts=("source",))
    ingest_change_log([paths[-1]], tmp_lake, num_partitions=4)
    got = read_lake_filtered_arrow(tmp_lake, "source", "==", "src4")
    assert got.num_rows > 0
    assert got.equals(_expected(tmp_lake, "source", "==", "src4"))


def test_conjunctive_predicates_and_projection(ray_session, small_log, tmp_lake):
    paths, _ = small_log
    ingest_change_log(list(paths), tmp_lake, num_partitions=4,
                      track_value_counts=("source",))
    full = read_lake_arrow(tmp_lake)
    exp = full.filter(pc.and_(
        pc.fill_null(pc.equal(full["source"], "src2"), False),
        pc.fill_null(pc.greater_equal(full["n_tok"], 50), False),
    ))
    got = read_lake_filtered_arrow(
        tmp_lake, [("source", "==", "src2"), ("n_tok", ">=", 50)])
    assert got.num_rows > 0 and got.equals(exp)
    # projection on top: only the requested columns come back (and the
    # tokens payload is never read — spy in test_projected_read covers the
    # unfiltered path; here we check output shape + values)
    proj = read_lake_filtered_arrow(
        tmp_lake, [("source", "==", "src2"), ("n_tok", ">=", 50)],
        columns=["doc_id", "n_tok"])
    assert proj.column_names == ["doc_id", "n_tok"]
    assert proj.equals(exp.select(["doc_id", "n_tok"]))
    # conjunction pruning: impossible source value -> zero partitions planned
    assert plan_filtered_read(
        tmp_lake, [("source", "==", "nope"), ("n_tok", ">=", 50)]) == []


def test_filtered_rejects_bad_predicates(ray_session, small_log, tmp_lake):
    import pytest

    paths, _ = small_log
    ingest_change_log(list(paths[:1]), tmp_lake, num_partitions=2)
    with pytest.raises(TypeError):
        read_lake_filtered_arrow(tmp_lake, "tokens", "==", [1])
    with pytest.raises(KeyError):
        read_lake_filtered_arrow(tmp_lake, "nope", "==", 1)
    with pytest.raises(ValueError):
        read_lake_filtered_arrow(tmp_lake, "source", "~", "x")


def test_cli_where_parser():
    from mex_extractors_ray.cli import _parse_where

    assert _parse_where("source==src3") == ("source", "==", "src3")
    assert _parse_where("n_tok>=96") == ("n_tok", ">=", 96)
    assert _parse_where("lang != de") == ("lang", "!=", "de")
    assert _parse_where("source in src0,src5") == ("source", "in", ["src0", "src5"])
    assert _parse_where("n_tok in 1,2") == ("n_tok", "in", [1, 2])
    import pytest

    with pytest.raises(SystemExit):
        _parse_where("gibberish")
