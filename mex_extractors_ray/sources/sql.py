"""SQL-source reader — the MSSQL full-table / columnar extractors, real.

The reference whitelists a ``SELECT *`` per model against MSSQL
(``mex/extractors/ifsg/connector.py:40-86`` → ``extract_sql_table``,
``mex/extractors/ifsg/extract.py:10-17``; clone ``kvis/extract.py:10``) and
a per-table column read (``mex/extractors/grippeweb/extract.py:21-32``).
Here the same contract over any DB-API2 connector, partitioned for scale:

- :func:`read_sql_table` — key-range partitioning: ONE cheap driver-side
  ``MIN/MAX`` probe on the partition column, then N independent
  ``WHERE pc >= lo AND pc < hi`` range reads, each its own Ray read task
  (union of lazy datasets — nothing materializes on the driver). This is
  the ``read_sql``-with-key-range-partitioning wrapper the survey calls
  for; it needs no DB-side MOD/CONCAT support (unlike hash sharding).
- Without a partition column it falls back to ``ray.data.read_sql``'s
  single-task (or hash-sharded, when ``shard_keys`` is given) path.
- Table/column names are interpolated into SQL, so they are validated
  against an identifier whitelist pattern — the reference's whitelisted-
  model discipline (only known tables are ever queried).

Tested against DuckDB files (the in-container stand-in for MSSQL; any
DB-API2 connector with ``cursor()``/``execute``/``description`` works).
"""

from __future__ import annotations

import re
from typing import Callable

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _check_ident(name: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


def _probe_bounds(connection_factory: Callable, table: str, column: str):
    con = connection_factory()
    try:
        cur = con.cursor()
        cur.execute(f"SELECT MIN({column}), MAX({column}) FROM {table}")
        lo, hi = cur.fetchone()
        return lo, hi
    finally:
        con.close()


def read_sql_table(
    table: str,
    connection_factory: Callable,
    columns: list[str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    predicate: str | None = None,
):
    """Partitioned full-table read. ``predicate`` is an optional extra WHERE
    clause applied to every range (pushdown)."""
    import ray.data

    _check_ident(table)
    cols = ", ".join(_check_ident(c) for c in columns) if columns else "*"
    where_extra = f" AND ({predicate})" if predicate else ""

    if partition_column is None:
        sql = f"SELECT {cols} FROM {table}"
        if predicate:
            sql += f" WHERE {predicate}"
        return ray.data.read_sql(sql, connection_factory)

    _check_ident(partition_column)
    lo, hi = _probe_bounds(connection_factory, table, partition_column)
    if lo is None:  # empty table (or all-NULL partition column)
        sql = f"SELECT {cols} FROM {table}"
        if predicate:
            sql += f" WHERE {predicate}"
        return ray.data.read_sql(sql, connection_factory)

    # integer key ranges only: int() would silently TRUNCATE float bounds
    # (lo=-2.5 → -2 drops rows in [-2.5, -2)), so non-integral bounds are an
    # explicit error — range partitioning needs exact bin edges
    import math

    flo, fhi = math.floor(lo), math.ceil(hi)
    if flo != lo or fhi != hi:
        raise ValueError(
            f"partition_column {partition_column!r} has non-integer bounds "
            f"({lo!r}, {hi!r}); key-range partitioning requires integer keys "
            "— pass partition_column=None or an integer column"
        )
    lo, hi = int(flo), int(fhi)

    # [lo, hi] split into num_partitions half-open bins
    span = hi - lo + 1
    n = max(1, min(num_partitions, span))
    step = -(-span // n)  # ceil
    parts = []
    for i in range(n):
        a = lo + i * step
        b = min(lo + (i + 1) * step, hi + 1)
        if a >= b:
            break
        # NULL partition keys match no range predicate; fold them into the
        # first range so the partitioned read keeps the full-table contract
        null_arm = f" OR {partition_column} IS NULL" if i == 0 else ""
        sql = (
            f"SELECT {cols} FROM {table} "
            f"WHERE ({partition_column} >= {a} AND {partition_column} < {b}"
            f"{null_arm}){where_extra}"
        )
        parts.append(ray.data.read_sql(sql, connection_factory))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def read_sql_columns(
    table: str,
    connection_factory: Callable,
    columns: list[str],
    partition_column: str | None = None,
    num_partitions: int = 8,
):
    """The columnar-extract shape (``grippeweb/extract.py:21-32``): project
    only the requested columns at the source — blocks arrive already
    columnar Arrow."""
    return read_sql_table(
        table, connection_factory, columns=columns,
        partition_column=partition_column, num_partitions=num_partitions,
    )


def duckdb_factory(path: str, read_only: bool = True) -> Callable:
    """Connection factory for a DuckDB file (multiple concurrent readers
    require read_only)."""

    def connect():
        import duckdb

        return duckdb.connect(path, read_only=read_only)

    return connect
