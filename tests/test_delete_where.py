"""Bulk predicate delete (cdc/filtered.delete_where): the GDPR op runs
through the stock CDC path, so state, tombstones, change feed and replay
semantics all follow without side-channel bookkeeping."""

import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.cdc import ingest_change_log
from mex_extractors_ray.cdc.apply import read_changes_arrow, read_lake_arrow
from mex_extractors_ray.cdc.filtered import delete_where
from mex_extractors_ray.gen import synth_change_log


def _build(tmp_path, tmp_lake):
    paths = synth_change_log(tmp_path / "log", n_events=5000, n_docs=600,
                             seed=17)
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    return read_lake_arrow(tmp_lake)


def test_delete_where_state_and_feed(ray_session, tmp_path, tmp_lake):
    before = _build(tmp_path, tmp_lake)
    wm = int(pc.max(before["lsn"]).as_py())
    n_match = before.filter(pc.greater_equal(before["n_tok"], 100)).num_rows
    assert n_match > 0
    out = delete_where(tmp_lake, [("n_tok", ">=", 100)])
    assert out["matched"] == n_match and out["lsn"] > wm
    after = read_lake_arrow(tmp_lake)
    expected = before.filter(pc.less(before["n_tok"], 100))
    assert after.equals(expected)
    # the change feed sees ordinary deletes
    feed = read_changes_arrow(tmp_lake, since=wm)
    dels = feed.filter(pc.equal(feed["op"], "delete"))
    assert dels.num_rows == n_match
    assert set(dels["lsn"].to_pylist()) == {out["lsn"]}


def test_delete_where_is_idempotent_and_converges(ray_session, tmp_path,
                                                  tmp_lake):
    _build(tmp_path, tmp_lake)
    first = delete_where(tmp_lake, [("source", "==", "src3")])
    assert first["matched"] > 0
    snap = read_lake_arrow(tmp_lake)
    again = delete_where(tmp_lake, [("source", "==", "src3")])
    assert again["matched"] == 0  # nothing live matches anymore
    assert read_lake_arrow(tmp_lake).equals(snap)


def test_delete_where_no_match_is_noop(ray_session, tmp_path, tmp_lake):
    before = _build(tmp_path, tmp_lake)
    out = delete_where(tmp_lake, [("n_tok", ">=", 10_000)])
    assert out["matched"] == 0
    assert read_lake_arrow(tmp_lake).equals(before)
