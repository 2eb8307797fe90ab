"""Shared fixtures. Ray is initialized ONCE per pytest session."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import os

    # Ray workers inherit these via raylet; forces glibc heap reuse so large
    # Arrow/numpy buffers don't pay this sandbox's first-touch fault cost on
    # every allocation (see bench.py)
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483648")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483648")
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture()
def tmp_lake(tmp_path):
    d = tmp_path / "lake"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def small_log(tmp_path_factory):
    """Seeded synthetic change log (FIXTURES.md t1 scale): paths + table."""
    import pyarrow.parquet as pq

    from mex_extractors_ray.gen import synth_change_log

    d = tmp_path_factory.mktemp("log")
    paths = synth_change_log(d, n_events=8000, n_docs=800, seed=42, shard_rows=2000)
    table = pa.concat_tables(pq.read_table(p) for p in paths)
    return paths, table
