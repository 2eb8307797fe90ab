"""Incremental training export driven by the change feed."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.cdc.apply import ingest_change_log, read_lake_arrow
from mex_extractors_ray.pipelines.incremental_export import (
    fold_export,
    incremental_export,
    lake_high_watermark,
    read_export_arrow,
)
from tests.test_change_feed import _log


def _payload(t: pa.Table):
    return sorted(zip(t["doc_id"].to_pylist(), t["lsn"].to_pylist(),
                      t["n_tok"].to_pylist()))


def _lake_equal(lake, out):
    live = read_lake_arrow(lake)
    exp = read_export_arrow(out)
    assert _payload(exp) == _payload(live)
    # token arrays ride along byte-identically
    assert exp["tokens"].to_pylist() == live["tokens"].to_pylist()


def test_incremental_export_tracks_lake(ray_session, tmp_path):
    lake, out = tmp_path / "lk", tmp_path / "exp"
    w1 = _log([("a", 1, "insert"), ("b", 2, "insert"), ("c", 3, "insert"),
               ("x", 4, "insert"), ("x", 5, "delete")])
    w2 = _log([("a", 11, "update"), ("b", 12, "delete"), ("d", 13, "insert")])
    w3 = _log([("b", 21, "update")])
    for i, w in enumerate([w1, w2, w3]):
        p = tmp_path / f"log{i}.parquet"
        pq.write_table(w, p)
        ingest_change_log([str(p)], lake, num_partitions=2)
        m = incremental_export(lake, out, num_shards=4)
        assert m["watermark"] == lake_high_watermark(lake)
        _lake_equal(lake, out)
    # three windows: one base + two incremental with retractions
    m = incremental_export(lake, out)  # caught up → no-op, same manifest
    assert len(m["windows"]) == 3
    assert m["windows"][0]["base"] and not m["windows"][1]["base"]
    names1 = [f["name"] for f in m["windows"][1]["files"]]
    assert any(n.startswith("retractions") for n in names1)
    # window 2 retracts a (updated), b (deleted), d (inserted: supersedes
    # nothing, but listing it is harmless and keeps the writer oblivious)
    r = pa.concat_tables([
        pq.read_table(out / m["windows"][1]["dir"] / n)
        for n in names1 if n.startswith("retractions")])
    assert sorted(r["doc_id"].to_pylist()) == ["a", "b", "d"]


def test_fold_export_clears_windows(ray_session, tmp_path):
    lake, out = tmp_path / "lk", tmp_path / "exp"
    w1 = _log([("a", 1, "insert"), ("b", 2, "insert")])
    w2 = _log([("a", 11, "update"), ("c", 12, "insert")])
    for i, w in enumerate([w1, w2]):
        p = tmp_path / f"log{i}.parquet"
        pq.write_table(w, p)
        ingest_change_log([str(p)], lake, num_partitions=2)
        incremental_export(lake, out, num_shards=2)
    m = fold_export(lake, out)
    assert len(m["windows"]) == 1 and m["windows"][0]["base"]
    _lake_equal(lake, out)
    assert not (out / f"window-{1:020d}").exists()


def test_export_watermark_guard(ray_session, tmp_path):
    lake, out = tmp_path / "lk", tmp_path / "exp"
    p = tmp_path / "log.parquet"
    pq.write_table(_log([("a", 5, "insert")]), p)
    ingest_change_log([str(p)], lake, num_partitions=2)
    incremental_export(lake, out)
    other = tmp_path / "lk2"
    pq.write_table(_log([("z", 1, "insert")]), tmp_path / "log2.parquet")
    ingest_change_log([str(tmp_path / "log2.parquet")], other, num_partitions=2)
    with pytest.raises(ValueError, match="AHEAD"):
        incremental_export(other, out)


def test_min_n_tok_filter(ray_session, tmp_path):
    lake, out = tmp_path / "lk", tmp_path / "exp"
    t = _log([("a", 1, "insert"), ("b", 2, "insert")])
    # give b a longer token payload
    t = t.set_column(t.column_names.index("n_tok"), "n_tok",
                     pa.array([1, 9], pa.int32()))
    p = tmp_path / "log.parquet"
    pq.write_table(t, p)
    ingest_change_log([str(p)], lake, num_partitions=2)
    incremental_export(lake, out, min_n_tok=5)
    assert read_export_arrow(out)["doc_id"].to_pylist() == ["b"]


def test_export_crash_rerun_converges(ray_session, tmp_path):
    """A crashed window write (files on disk, manifest not committed) is
    invisible to readers and fully overwritten by the re-run."""
    lake, out = tmp_path / "lk", tmp_path / "exp"
    p1, p2 = tmp_path / "l1.parquet", tmp_path / "l2.parquet"
    pq.write_table(_log([("a", 1, "insert"), ("b", 2, "insert")]), p1)
    pq.write_table(_log([("a", 11, "update"), ("c", 12, "insert")]), p2)
    ingest_change_log([str(p1)], lake, num_partitions=2)
    incremental_export(lake, out)
    ingest_change_log([str(p2)], lake, num_partitions=2)
    # simulate a crashed second window: partial files, no manifest update
    wm = lake_high_watermark(lake)
    crashed = out / f"window-{wm:020d}" / "shard=0"
    crashed.mkdir(parents=True)
    pq.write_table(pa.table({"doc_id": pa.array(["GARBAGE"])}),
                   crashed / "junk.parquet")
    m0 = incremental_export(lake, out)  # the re-run
    exp = read_export_arrow(out)
    assert "GARBAGE" not in exp["doc_id"].to_pylist()
    _lake_equal(lake, out)
    # and the re-run is idempotent
    assert incremental_export(lake, out) == m0


def test_tail_chains_export(ray_session, tmp_path):
    """The full WAL-segment → lake → export loop in one sensor tick."""
    import shutil

    from mex_extractors_ray.cdc.tail import tail_once

    log_dir, lake, out = tmp_path / "log", tmp_path / "lk", tmp_path / "exp"
    log_dir.mkdir()
    pq.write_table(_log([("a", 1, "insert"), ("b", 2, "insert")]),
                   log_dir / "log-00000.parquet")
    (log_dir / "log-00000.parquet.closed").touch()
    r1 = tail_once(log_dir, lake, num_partitions=2, export_out=out)
    assert r1["export_windows"] == 1
    _lake_equal(lake, out)
    pq.write_table(_log([("a", 11, "update"), ("b", 12, "delete")]),
                   log_dir / "log-00001.parquet")
    (log_dir / "log-00001.parquet.closed").touch()
    r2 = tail_once(log_dir, lake, num_partitions=2, export_out=out)
    assert r2["export_windows"] == 2 and r2["export_watermark"] == 12
    _lake_equal(lake, out)
    # idle poll: no segments, export untouched
    r3 = tail_once(log_dir, lake, num_partitions=2, export_out=out)
    assert r3["noop"] and "export_windows" not in r3


def test_export_survives_lake_fold(ray_session, tmp_path):
    """A lake fold raises the change-feed floor past the export watermark;
    the export must re-base instead of dying on the floor error."""
    lake, out = tmp_path / "lk", tmp_path / "exp"
    # window 0 exported, then enough ingest windows at compact_threshold=2
    # to guarantee every partition folded past the export watermark
    pq.write_table(_log([("a", 1, "insert"), ("b", 2, "insert")]),
                   tmp_path / "w0.parquet")
    ingest_change_log([str(tmp_path / "w0.parquet")], lake, num_partitions=2,
                      compact_threshold=2)
    incremental_export(lake, out, num_shards=4)
    lsn = 10
    for i in range(4):
        rows = [("a", lsn, "update"), ("b", lsn + 1, "update"),
                (f"n{i}", lsn + 2, "insert")]
        lsn += 10
        pq.write_table(_log(rows), tmp_path / f"w{i+1}.parquet")
        ingest_change_log([str(tmp_path / f"w{i+1}.parquet")], lake,
                          num_partitions=2, compact_threshold=2)
    m = incremental_export(lake, out, num_shards=4)  # must not raise
    _lake_equal(lake, out)
    # the rebase collapsed the window list to one fresh base
    assert len(m["windows"]) == 1 and m["windows"][0]["base"]


def test_fold_export_is_two_phase(ray_session, tmp_path):
    """The old manifest stays committed until the new base is written;
    stray (unlisted) window dirs are GC'd by the next run."""
    lake, out = tmp_path / "lk", tmp_path / "exp"
    pq.write_table(_log([("a", 1, "insert"), ("b", 2, "insert")]),
                   tmp_path / "w0.parquet")
    ingest_change_log([str(tmp_path / "w0.parquet")], lake, num_partitions=2)
    incremental_export(lake, out, num_shards=2)
    pq.write_table(_log([("a", 11, "update")]), tmp_path / "w1.parquet")
    ingest_change_log([str(tmp_path / "w1.parquet")], lake, num_partitions=2)
    incremental_export(lake, out, num_shards=2)
    before = read_export_arrow(out)

    # simulate a crashed fold: a partial unlisted window dir appears, the
    # manifest is untouched → readers still see the committed export
    stray = out / "window-99999999999999999999f9"
    (stray / "shard=0").mkdir(parents=True)
    assert read_export_arrow(out).equals(before)

    m = fold_export(lake, out)
    assert len(m["windows"]) == 1 and m["windows"][0]["base"]
    assert not stray.exists()  # GC'd
    _lake_equal(lake, out)
    # fold at the same watermark used the fold-counter dir name
    assert m["windows"][0]["dir"].endswith("f1")
    # folding again while current still works and bumps the counter
    m2 = fold_export(lake, out)
    assert m2["windows"][0]["dir"].endswith("f2")
    _lake_equal(lake, out)


def test_export_exact_fold_across_feed_blocks(ray_session, tmp_path):
    """A doc's upsert and delete in the same lagging window must collapse
    to the delete even if Ray splits the feed into many blocks — the
    doc-keyed shuffle guarantees it regardless of block boundaries."""
    lake, out = tmp_path / "lk", tmp_path / "exp"
    pq.write_table(_log([("seed", 1, "insert")]), tmp_path / "w0.parquet")
    ingest_change_log([str(tmp_path / "w0.parquet")], lake, num_partitions=2)
    incremental_export(lake, out, num_shards=2)
    # lag two windows: insert then delete of the same doc
    pq.write_table(_log([("ghost", 11, "insert")]), tmp_path / "w1.parquet")
    ingest_change_log([str(tmp_path / "w1.parquet")], lake, num_partitions=2)
    pq.write_table(_log([("ghost", 21, "delete")]), tmp_path / "w2.parquet")
    ingest_change_log([str(tmp_path / "w2.parquet")], lake, num_partitions=2)
    incremental_export(lake, out, num_shards=2)
    exp = read_export_arrow(out)
    assert "ghost" not in exp["doc_id"].to_pylist()
    _lake_equal(lake, out)


def _src_log(rows) -> pa.Table:
    """rows: (doc_id, lsn, op, source)"""
    t = _log([(r[0], r[1], r[2]) for r in rows])
    return t.set_column(t.column_names.index("source"), "source",
                        pa.array([r[3] for r in rows]))


def test_filtered_view_export(ray_session, tmp_path):
    """where= makes the export a MAINTAINED FILTERED VIEW: docs updated
    out of the predicate retract, docs updated into it appear."""
    lake, out = tmp_path / "lk", tmp_path / "exp"
    w1 = _src_log([("a", 1, "insert", "srcA"), ("b", 2, "insert", "srcB"),
                   ("c", 3, "insert", "srcB")])
    # a leaves the view (srcA->srcB), c enters it (srcB->srcA), b deleted
    w2 = _src_log([("a", 11, "update", "srcB"), ("c", 12, "update", "srcA"),
                   ("b", 13, "delete", "srcB")])
    where = [("source", "==", "srcA")]
    p1, p2 = tmp_path / "l1.parquet", tmp_path / "l2.parquet"
    pq.write_table(w1, p1)
    pq.write_table(w2, p2)
    ingest_change_log([str(p1)], lake, num_partitions=2)
    incremental_export(lake, out, where=where)
    assert read_export_arrow(out)["doc_id"].to_pylist() == ["a"]
    ingest_change_log([str(p2)], lake, num_partitions=2)
    m = incremental_export(lake, out, where=where)
    assert len(m["windows"]) == 2  # incremental window, not a rebase
    got = read_export_arrow(out)
    assert got["doc_id"].to_pylist() == ["c"]
    assert got["lsn"].to_pylist() == [12]
    # fold preserves the filter and the view
    fold_export(lake, out)
    folded = read_export_arrow(out)
    assert folded["doc_id"].to_pylist() == ["c"]
    m = incremental_export(lake, out, where=where)  # no-op at watermark
    assert len(m["windows"]) == 1


def test_filter_identity_guard(ray_session, tmp_path):
    lake, out = tmp_path / "lk", tmp_path / "exp"
    p = tmp_path / "l.parquet"
    pq.write_table(_src_log([("a", 1, "insert", "srcA")]), p)
    ingest_change_log([str(p)], lake, num_partitions=2)
    incremental_export(lake, out, where=[("source", "==", "srcA")])
    with pytest.raises(ValueError, match="refusing to append"):
        incremental_export(lake, out, where=[("source", "==", "srcB")])
    with pytest.raises(ValueError, match="refusing to append"):
        incremental_export(lake, out, where=None)  # explicit drop refuses
    with pytest.raises(ValueError, match="refusing to append"):
        incremental_export(lake, out, min_n_tok=5,
                           where=[("source", "==", "srcA")])
    # same filter (list-vs-tuple spelling) is accepted
    incremental_export(lake, out, where=[["source", "==", "srcA"]])
    # UNSPECIFIED filter inherits the manifest's (the tail-loop call shape)
    m = incremental_export(lake, out)
    assert m["where"] == [["source", "==", "srcA"]]
