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
    # segment 0 arrives with a .closed marker (rotated WAL segment)
    import shutil

    shutil.copy(paths[0], log_dir / "log-00000.parquet")
    (log_dir / "log-00000.parquet.closed").touch()
    r1 = tail_once(log_dir, tmp_lake, num_partitions=4)
    assert r1["segments"] == 1 and r1["applied"] > 0
    w1 = lake_watermark(tmp_lake)
    assert w1 > -1
    # nothing new → sensor says no-op without touching the lake
    r2 = tail_once(log_dir, tmp_lake, num_partitions=4)
    assert r2["noop"] and r2["segments"] == 0
    # remaining segments arrive WITHOUT markers: held one poll (size must be
    # observed stable), then ingested — tail catches up to the full replay
    for i, p in enumerate(paths[1:], start=1):
        shutil.copy(p, log_dir / f"log-{i:05d}.parquet")
    assert discover_new_segments(log_dir, tmp_lake) == []  # first sight: held
    assert len(discover_new_segments(log_dir, tmp_lake)) == len(paths) - 1
    r3 = tail_once(log_dir, tmp_lake, num_partitions=4)
    assert r3["applied"] > 0
    expected, _ = replay_reference(table)
    assert read_lake_arrow(tmp_lake).equals(expected)
    assert lake_watermark(tmp_lake) > w1


def test_tail_gate_holds_growing_segment(ray_session, small_log, tmp_path, tmp_lake):
    """A segment still being written is NOT ingested (partial read would be
    recorded as applied and later rows skipped forever); once it stops
    growing it is ingested whole."""
    paths, table = small_log
    log_dir = tmp_path / "wal"
    log_dir.mkdir()
    seg = log_dir / "log-00000.parquet"
    full = seg.read_bytes() if seg.exists() else open(paths[0], "rb").read()
    # writer mid-flush: only half the bytes are on disk
    seg.write_bytes(full[: len(full) // 2])
    r1 = tail_once(log_dir, tmp_lake, num_partitions=4)
    assert r1["segments"] == 0 and r1["noop"]
    # writer finishes between polls — size changed, still held
    seg.write_bytes(full)
    r2 = tail_once(log_dir, tmp_lake, num_partitions=4)
    assert r2["segments"] == 0
    # stable across a poll → ingested completely
    r3 = tail_once(log_dir, tmp_lake, num_partitions=4)
    assert r3["segments"] == 1 and r3["applied"] > 0
    import pyarrow.parquet as _pq

    expected, _ = replay_reference(_pq.read_table(paths[0]))
    assert read_lake_arrow(tmp_lake).equals(expected)


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
