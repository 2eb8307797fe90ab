"""Column profiler: counts, nulls, exact distinct, native-ordered min/max."""

from __future__ import annotations

import pyarrow as pa
import pytest

from mex_extractors_ray.stages.profile import profile_columns, profile_sql


def _ds():
    import ray.data

    return ray.data.from_arrow(pa.table({
        "i": pa.array([9, 10, 2, None, 2, 9], pa.int64()),
        "s": pa.array(["b", None, "a", "a", None, "c"], pa.string()),
        "z": pa.array([None] * 6, pa.string()),     # all-null column
    })).repartition(3)


def test_profile_matches_brute_force(ray_session):
    out = profile_columns(_ds(), ["i", "s", "z"], num_partitions=4).to_pydict()
    rows = {c: dict(n_rows=nr, n_null=nn, n_distinct=nd, min_v=mn, max_v=mx)
            for c, nr, nn, nd, mn, mx in zip(
                out["col"], out["n_rows"], out["n_null"], out["n_distinct"],
                out["min_v"], out["max_v"])}
    # native int ordering: min 2 / max 10 — string ordering would say "10" < "9"
    assert rows["i"] == dict(n_rows=6, n_null=1, n_distinct=3, min_v="2", max_v="10")
    assert rows["s"] == dict(n_rows=6, n_null=2, n_distinct=3, min_v="a", max_v="c")
    assert rows["z"] == dict(n_rows=6, n_null=6, n_distinct=0, min_v=None, max_v=None)
    assert out["col"] == sorted(out["col"])


def test_profile_validates_columns(ray_session):
    with pytest.raises(ValueError, match="not in dataset"):
        profile_columns(_ds(), ["i", "nope"])


def test_profile_sql_mirror_duckdb(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    t = pa.table({
        "i": pa.array([9, 10, 2, None, 2, 9], pa.int64()),
        "s": pa.array(["b", None, "a", "a", None, "c"], pa.string()),
    })
    p = tmp_path / "t.parquet"
    pq.write_table(t, p)
    con = duckdb.connect()
    sql = profile_sql(f"read_parquet('{p}')", ["i", "s"])
    want = con.execute(f"SELECT * FROM ({sql}) ORDER BY col").df()
    import ray.data

    got = profile_columns(ray.data.from_arrow(t).repartition(2),
                          ["i", "s"], num_partitions=4).to_pandas()
    assert got["col"].tolist() == want["col"].tolist()
    for c in ["n_rows", "n_null", "n_distinct"]:
        assert got[c].tolist() == want[c].tolist()
    assert got["min_v"].tolist() == want["min_v"].tolist()
    assert got["max_v"].tolist() == want["max_v"].tolist()
