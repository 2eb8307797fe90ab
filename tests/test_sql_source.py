"""SQL-source reader (the MSSQL extractors' contract, over DuckDB —
``mex/extractors/ifsg/connector.py:40-86``, ``grippeweb/extract.py:21-32``)."""

import duckdb
import pytest

from mex_extractors_ray.sources.sql import duckdb_factory, read_sql_columns, read_sql_table


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "meta.duckdb")
    con = duckdb.connect(path)
    con.execute(
        "CREATE TABLE meta_field AS "
        "SELECT i AS id_field, i % 7 AS id_type, 'f' || CAST(i AS VARCHAR) AS name "
        "FROM range(0, 500) t(i)"
    )
    con.execute("CREATE TABLE empty_t (x INTEGER)")
    con.close()
    return path


def test_partitioned_read_matches_full(ray_session, db):
    out = read_sql_table(
        "meta_field", duckdb_factory(db), partition_column="id_field", num_partitions=4
    ).to_pandas()
    assert len(out) == 500
    assert sorted(out["id_field"]) == list(range(500))


def test_column_projection_and_predicate(ray_session, db):
    out = read_sql_columns(
        "meta_field", duckdb_factory(db), ["id_field", "id_type"],
        partition_column="id_field", num_partitions=3,
    ).to_pandas()
    assert list(out.columns) == ["id_field", "id_type"]
    pred = read_sql_table(
        "meta_field", duckdb_factory(db), partition_column="id_field",
        num_partitions=3, predicate="id_type = 0",
    ).to_pandas()
    assert len(pred) == len([i for i in range(500) if i % 7 == 0])


def test_empty_table_and_identifier_whitelist(ray_session, db):
    out = read_sql_table("empty_t", duckdb_factory(db), partition_column="x").to_pandas()
    assert len(out) == 0
    with pytest.raises(ValueError, match="identifier"):
        read_sql_table("meta_field; DROP TABLE x", duckdb_factory(db))
