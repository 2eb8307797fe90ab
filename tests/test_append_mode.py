"""``append`` apply mode — sequence-building CDC: update APPENDS (lists
concat, ints add, others last-wins), insert RESETS, delete clears with
re-creation from later updates. Checked against the single-process
replayer (the acceptance discipline of test_cdc_apply.py) plus hand-built
reset/resurrect fixtures."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.cdc import ingest_change_log, replay_reference
from mex_extractors_ray.cdc.apply import read_lake_arrow
from mex_extractors_ray.gen import change_log_from_events

_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int64()),
        ("source", pa.string()),
        ("schema_version", pa.int32()),
        ("lang", pa.string()),
    ]
)


def _log(rows):
    full = [
        {"tokens": None, "n_tok": None, "source": None, "lang": None,
         "schema_version": 3, **r}
        for r in rows
    ]
    return pa.Table.from_pylist(full, schema=_SCHEMA)


def _row(t: pa.Table, doc: str) -> dict:
    sel = t.filter(pc.equal(t["doc_id"], doc))
    assert sel.num_rows == 1
    return sel.to_pylist()[0]


def test_append_semantics_fixture(ray_session, tmp_path, tmp_lake):
    log = _log([
        # doc a: insert, two appends — tokens concat in LSN order, n_tok adds
        dict(lsn=1, op="insert", doc_id="a", tokens=[1, 2], n_tok=2,
             source="s0", lang="de"),
        dict(lsn=3, op="update", doc_id="a", tokens=[7], n_tok=1,
             source="s0", lang="fr"),
        dict(lsn=5, op="update", doc_id="a", tokens=[9, 9], n_tok=2,
             source="s1", lang="fr"),
        # doc b: appends, then a RE-INSERT resets the sequence
        dict(lsn=2, op="insert", doc_id="b", tokens=[4], n_tok=1,
             source="s0", lang="de"),
        dict(lsn=4, op="update", doc_id="b", tokens=[5], n_tok=1,
             source="s0", lang="de"),
        dict(lsn=6, op="insert", doc_id="b", tokens=[8], n_tok=1,
             source="s2", lang="en"),
        # doc c: deleted, then re-created by a bare update
        dict(lsn=7, op="insert", doc_id="c", tokens=[1], n_tok=1,
             source="s0", lang="de"),
        dict(lsn=8, op="delete", doc_id="c"),
        dict(lsn=9, op="update", doc_id="c", tokens=[2, 3], n_tok=2,
             source="s3", lang="es"),
        # doc d: deleted and gone
        dict(lsn=10, op="insert", doc_id="d", tokens=[6], n_tok=1,
             source="s0", lang="de"),
        dict(lsn=11, op="delete", doc_id="d"),
    ])
    p = tmp_path / "alog.parquet"
    pq.write_table(log, p)
    ingest_change_log([str(p)], tmp_lake, num_partitions=4, mode="append")
    lake = read_lake_arrow(tmp_lake)
    a = _row(lake, "a")
    assert a["tokens"] == [1, 2, 7, 9, 9] and a["n_tok"] == 5
    assert a["source"] == "s1" and a["lang"] == "fr" and a["lsn"] == 5
    b = _row(lake, "b")
    assert b["tokens"] == [8] and b["n_tok"] == 1 and b["source"] == "s2"
    c = _row(lake, "c")
    assert c["tokens"] == [2, 3] and c["n_tok"] == 2 and c["lang"] == "es"
    assert lake.filter(pc.equal(lake["doc_id"], "d")).num_rows == 0
    # replayer agrees byte-for-byte
    expected, tombs = replay_reference(log, mode="append")
    assert lake.equals(expected)
    assert "d" in tombs


def _tiny_events(n=800, users=60, seed=23):
    rng = np.random.default_rng(seed)
    lsn = np.arange(1, n + 1, dtype=np.int64)
    user = rng.integers(0, users, size=n, dtype=np.int64)
    etype = rng.choice(
        np.array(["signup", "click", "purchase", "error"]), size=n,
        p=[0.2, 0.4, 0.3, 0.1],
    )
    return pa.table(
        {"event_id": pa.array(lsn), "user_id": pa.array(user),
         "event_type": pa.array(etype)}
    )


def test_append_ingest_matches_replayer(ray_session, tmp_path, tmp_lake):
    log = change_log_from_events(_tiny_events())
    p = tmp_path / "alog.parquet"
    pq.write_table(log, p)
    ingest_change_log([str(p)], tmp_lake, num_partitions=4, mode="append")
    lake = read_lake_arrow(tmp_lake)
    expected, tombs = replay_reference(log, mode="append")
    assert lake.num_rows == expected.num_rows
    assert lake.equals(expected)  # per-row token-array equality included
    if tombs:
        assert lake.filter(
            pc.is_in(lake["doc_id"], value_set=pa.array(list(tombs)))
        ).num_rows == 0


def test_append_windows_equal_one_and_idempotent(ray_session, tmp_path,
                                                 tmp_lake):
    log = change_log_from_events(_tiny_events(900, 50, seed=31))
    cuts = [int(pc.max(log["lsn"]).as_py()) // 3,
            2 * int(pc.max(log["lsn"]).as_py()) // 3]
    w1 = log.filter(pc.less_equal(log["lsn"], cuts[0]))
    w2 = log.filter(pc.and_(pc.greater(log["lsn"], cuts[0]),
                            pc.less_equal(log["lsn"], cuts[1])))
    w3 = log.filter(pc.greater(log["lsn"], cuts[1]))
    paths = []
    for i, w in enumerate([w1, w2, w3]):
        p = tmp_path / f"w{i}.parquet"
        pq.write_table(w, p)
        paths.append(str(p))
        ingest_change_log([str(p)], tmp_lake, num_partitions=4, mode="append")
    lake = read_lake_arrow(tmp_lake)
    expected, _ = replay_reference(log, mode="append")
    assert lake.equals(expected)
    # replaying window 3 is an exactly-once no-op
    metrics = ingest_change_log([paths[2]], tmp_lake, num_partitions=4,
                                mode="append")
    assert pc.all(metrics["noop"]).as_py()
    assert read_lake_arrow(tmp_lake).equals(expected)


def test_append_small_compact_threshold_folds(ray_session, tmp_path, tmp_lake):
    """Delta folds (compact_threshold hit mid-sequence) must not double- or
    drop-count appended contributions."""
    log = change_log_from_events(_tiny_events(600, 20, seed=77))
    shard = 60
    for i, start in enumerate(range(0, log.num_rows, shard)):
        p = tmp_path / f"s{i}.parquet"
        pq.write_table(log.slice(start, shard), p)
        ingest_change_log([str(p)], tmp_lake, num_partitions=2, mode="append",
                          compact_threshold=3)
    expected, _ = replay_reference(log, mode="append")
    assert read_lake_arrow(tmp_lake).equals(expected)


def test_lake_mode_guard_refuses_mixing(ray_session, tmp_path, tmp_lake):
    import pytest

    log = change_log_from_events(_tiny_events(200, 10, seed=5))
    p = tmp_path / "g.parquet"
    pq.write_table(log, p)
    ingest_change_log([str(p)], tmp_lake, num_partitions=2, mode="append")
    with pytest.raises(ValueError, match="mode"):
        ingest_change_log([str(p)], tmp_lake, num_partitions=2,
                          mode="last_wins")
    # same mode replays fine (exactly-once noop)
    m = ingest_change_log([str(p)], tmp_lake, num_partitions=2, mode="append")
    assert pc.all(m["noop"]).as_py()


def test_tail_inherits_lake_mode(ray_session, tmp_path, tmp_lake):
    from mex_extractors_ray.cdc.tail import tail_once

    log = change_log_from_events(_tiny_events(400, 20, seed=9))
    cut = int(pc.max(log["lsn"]).as_py()) // 2
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    pq.write_table(log.filter(pc.less_equal(log["lsn"], cut)),
                   seg_dir / "seg-000.parquet")
    # first window establishes the mode explicitly
    tail_once(seg_dir, tmp_lake, num_partitions=2, require_stable=False,
              mode="append")
    pq.write_table(log.filter(pc.greater(log["lsn"], cut)),
                   seg_dir / "seg-001.parquet")
    # second window: mode=None must INHERIT append from the lake meta
    r = tail_once(seg_dir, tmp_lake, num_partitions=2, require_stable=False)
    assert r["applied"] > 0
    expected, _ = replay_reference(log, mode="append")
    assert read_lake_arrow(tmp_lake).equals(expected)


def test_repartition_carries_mode(ray_session, tmp_path, tmp_lake):
    import pytest

    from mex_extractors_ray.cdc.compact import repartition_lake

    log = change_log_from_events(_tiny_events(300, 15, seed=13))
    p = tmp_path / "r.parquet"
    pq.write_table(log, p)
    ingest_change_log([str(p)], tmp_lake, num_partitions=2, mode="append")
    repartition_lake(tmp_lake, 4)
    # the re-sharded lake still refuses a different mode...
    with pytest.raises(ValueError, match="mode"):
        ingest_change_log([str(p)], tmp_lake, num_partitions=4,
                          mode="last_wins")
    # ...and keeps answering in append semantics
    expected, _ = replay_reference(log, mode="append")
    assert read_lake_arrow(tmp_lake).equals(expected)
