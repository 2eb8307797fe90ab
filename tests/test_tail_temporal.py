"""Streaming tail driver + temporal parsing + composite keys."""

import pyarrow as pa
import pyarrow.parquet as pq

from mex_extractors_ray.cdc import replay_reference
from mex_extractors_ray.cdc.apply import read_lake_arrow
from mex_extractors_ray.cdc.tail import discover_new_segments, lake_watermark, tail_once
from mex_extractors_ray.stages.joins import composite_key
from mex_extractors_ray.stages.temporal import parse_temporal, year_threshold_mask


def test_tail_incremental(ray_session, small_log, tmp_path, tmp_lake):
    paths, table = small_log
    log_dir = tmp_path / "wal"
    log_dir.mkdir()
    # segment 0 arrives
    import shutil

    shutil.copy(paths[0], log_dir / "log-00000.parquet")
    r1 = tail_once(log_dir, tmp_lake, num_partitions=4)
    assert r1["segments"] == 1 and r1["applied"] > 0
    w1 = lake_watermark(tmp_lake)
    assert w1 > -1
    # nothing new → sensor says no-op without touching the lake
    r2 = tail_once(log_dir, tmp_lake, num_partitions=4)
    assert r2["noop"] and r2["segments"] == 0
    # remaining segments arrive; tail catches up to the full-replay oracle
    for i, p in enumerate(paths[1:], start=1):
        shutil.copy(p, log_dir / f"log-{i:05d}.parquet")
    assert len(discover_new_segments(log_dir, tmp_lake)) == len(paths) - 1
    r3 = tail_once(log_dir, tmp_lake, num_partitions=4)
    assert r3["applied"] > 0
    expected, _ = replay_reference(table)
    assert read_lake_arrow(tmp_lake).equals(expected)
    assert lake_watermark(tmp_lake) > w1


def test_parse_temporal_shapes():
    t = pa.table({"s": ["2020", "2020-05", "2020-05-17", "garbage", None, " 1999 "]})
    out = parse_temporal(t, "s")
    prec = out["ts_precision"].to_pylist()
    assert prec == ["year", "month", "day", "none", "none", "year"]
    ts = out["ts_parsed"].to_pylist()
    assert ts[0].year == 2020 and ts[0].month == 1
    assert ts[1].month == 5 and ts[2].day == 17
    assert ts[3] is None and ts[4] is None
    assert ts[5].year == 1999


def test_year_threshold_rule():
    t = pa.table({"s": ["1880", "1890", "2001"]})
    out = parse_temporal(t, "s")
    mask = year_threshold_mask(out, "ts_parsed", "< 1890")
    assert mask.to_pylist() == [True, False, False]


def test_composite_key():
    t = pa.table({"a": ["x", "y"], "b": pa.array([1, None], pa.int32()), "c": ["p", "q"]})
    out = composite_key(t, ["a", "b", "c"], out="k")
    assert out["k"].to_pylist() == ["x-1-p", "y--q"]
