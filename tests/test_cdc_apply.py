"""CDC core correctness: byte-identical vs the single-process replayer
(the BASELINE.json acceptance bar), exactly-once under duplicate delivery,
crash/resume, and schema evolution."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.cdc import ingest_change_log, replay_reference
from mex_extractors_ray.cdc.apply import read_lake_arrow
from mex_extractors_ray.cdc.manifest import read_manifest
from mex_extractors_ray.gen import synth_change_log


def test_ingest_matches_replayer_byte_identical(ray_session, small_log, tmp_lake):
    paths, table = small_log
    ingest_change_log(paths, tmp_lake, num_partitions=8)
    lake = read_lake_arrow(tmp_lake)
    expected, tombs = replay_reference(table)
    assert lake.num_rows == expected.num_rows
    assert lake.schema == expected.schema
    assert lake.equals(expected)  # includes per-row token-array equality
    # tombstone sets match the replayer's
    got_tombs = {}
    for pid in range(8):
        m = read_manifest(tmp_lake, pid)
        if m and m.tombstone_file:
            t = pq.read_table(f"{tmp_lake}/partition={pid:05d}/{m.tombstone_file}")
            got_tombs.update(zip(t["doc_id"].to_pylist(), t["lsn"].to_pylist()))
    assert got_tombs == tombs


def test_token_arrays_equal_per_row(ray_session, small_log, tmp_lake):
    paths, table = small_log
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    lake = read_lake_arrow(tmp_lake)
    expected, _ = replay_reference(table)
    assert lake["tokens"].equals(expected["tokens"])
    # n_tok invariant: always equals the token list length
    assert pc.all(
        pc.equal(pc.list_value_length(lake["tokens"]).cast(pa.int64()), lake["n_tok"])
    ).as_py()


def test_replay_is_idempotent(ray_session, small_log, tmp_lake):
    paths, table = small_log
    ingest_change_log(paths, tmp_lake, num_partitions=8)
    before = read_lake_arrow(tmp_lake)
    metrics = ingest_change_log(paths, tmp_lake, num_partitions=8)  # full replay
    assert pc.all(metrics["noop"]).as_py()
    # rows_in counts post-pre-reduce events (the map-side combiner drops
    # superseded events before the shuffle), so late_dropped is bounded by
    # the log size and must cover every surviving event
    dropped = pc.sum(metrics["late_dropped"]).as_py()
    assert 0 < dropped <= table.num_rows
    assert dropped == pc.sum(metrics["rows_in"]).as_py()
    assert read_lake_arrow(tmp_lake).equals(before)


def test_duplicate_delivery(ray_session, small_log, tmp_lake, tmp_path):
    """Each event delivered twice (same LSN) — FIXTURES.md duplicate-delivery
    variant. Final state must equal single-delivery state."""
    paths, table = small_log
    dup = pa.concat_tables([table, table]).sort_by([("lsn", "ascending")])
    dup_path = tmp_path / "dup.parquet"
    pq.write_table(dup, dup_path)
    ingest_change_log([str(dup_path)], tmp_lake, num_partitions=8)
    expected, _ = replay_reference(table)
    assert read_lake_arrow(tmp_lake).equals(expected)


def test_crash_resume_from_watermark(ray_session, small_log, tmp_lake):
    """Apply a prefix (simulated crash after partial progress), then replay
    the FULL log — resume must converge to the one-shot state."""
    paths, table = small_log
    prefix, suffix = paths[: len(paths) // 2], paths[len(paths) // 2 :]
    ingest_change_log(prefix, tmp_lake, num_partitions=8)
    m1 = {p: read_manifest(tmp_lake, p) for p in range(8)}
    ingest_change_log(paths, tmp_lake, num_partitions=8)  # full replay = resume
    expected, _ = replay_reference(table)
    assert read_lake_arrow(tmp_lake).equals(expected)
    # watermarks advanced monotonically
    for p in range(8):
        m2 = read_manifest(tmp_lake, p)
        if m1[p] is not None:
            assert m2.last_lsn >= m1[p].last_lsn


def test_crash_between_data_write_and_manifest_commit(ray_session, small_log, tmp_lake):
    """Orphan data files (phase-1 complete, phase-2 lost) are invisible to
    readers and harmless on re-apply."""
    paths, table = small_log
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    expected, _ = replay_reference(table)
    import pathlib

    pdir = pathlib.Path(tmp_lake) / "partition=00001"
    # simulate: a later writer crashed after writing data but before commit
    orphan = pdir / "part-00001-99999999999999999999.parquet"
    pq.write_table(pa.table({"doc_id": pa.array(["JUNK"])}), orphan)
    assert read_lake_arrow(tmp_lake).equals(expected)  # orphan ignored
    metrics = ingest_change_log(paths, tmp_lake, num_partitions=4)
    assert pc.all(metrics["noop"]).as_py()
    assert read_lake_arrow(tmp_lake).equals(expected)


def test_schema_evolution_mixed_versions(ray_session, small_log, tmp_lake):
    """v1/v2/v3 events in one log (additive lang column, int32→int64
    widening) resolve to one latest-version lake schema."""
    paths, table = small_log
    assert len(pc.unique(table["schema_version"])) == 3
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    lake = read_lake_arrow(tmp_lake)
    assert lake["n_tok"].type == pa.int64()
    assert "lang" in lake.column_names
    langs = set(pc.unique(lake["lang"]).to_pylist())
    assert "de" in langs  # v1 rows got the default
    expected, _ = replay_reference(table)
    assert lake.equals(expected)


def test_out_of_order_within_batch(ray_session, tmp_lake, tmp_path):
    """LSN order, not arrival order, decides the winner."""
    t = pa.table(
        {
            "lsn": pa.array([5, 3, 4], pa.int64()),
            "op": pa.array(["update", "insert", "delete"]),
            "doc_id": pa.array(["d", "d", "d"]),
            "tokens": pa.array([[9, 9], [1], None], pa.list_(pa.int32())),
            "n_tok": pa.array([2, 1, None], pa.int64()),
            "source": pa.array(["s", "s", None]),
            "schema_version": pa.array([1, 1, 1], pa.int32()),
            "lang": pa.array([None, None, None], pa.string()),
        }
    )
    p = tmp_path / "ooo.parquet"
    pq.write_table(t, p)
    ingest_change_log([str(p)], tmp_lake, num_partitions=2)
    lake = read_lake_arrow(tmp_lake)
    # lsn 5 update wins over lsn 4 delete → doc lives with tokens [9,9]
    assert lake["doc_id"].to_pylist() == ["d"]
    assert lake["tokens"].to_pylist() == [[9, 9]]
    assert lake["lsn"].to_pylist() == [5]
    expected, _ = replay_reference(t)
    assert lake.equals(expected)


def test_delete_then_resurrect_clears_tombstone(ray_session, tmp_lake, tmp_path):
    t = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["insert", "delete", "insert"]),
            "doc_id": pa.array(["d", "d", "d"]),
            "tokens": pa.array([[1], None, [2]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, None, 1], pa.int64()),
            "source": pa.array(["s", None, "s"]),
            "schema_version": pa.array([1, 1, 1], pa.int32()),
            "lang": pa.array([None, None, None], pa.string()),
        }
    )
    # apply in two runs so the tombstone is committed then cleared
    p1, p2 = tmp_path / "a.parquet", tmp_path / "b.parquet"
    pq.write_table(t.slice(0, 2), p1)
    pq.write_table(t.slice(2, 1), p2)
    ingest_change_log([str(p1)], tmp_lake, num_partitions=1)
    m = read_manifest(tmp_lake, 0)
    assert m.tombstone_count == 1 and m.row_count == 0
    ingest_change_log([str(p2)], tmp_lake, num_partitions=1)
    m = read_manifest(tmp_lake, 0)
    assert m.tombstone_count == 0 and m.row_count == 1
    lake = read_lake_arrow(tmp_lake)
    assert lake["tokens"].to_pylist() == [[2]]


def test_heavy_skew_matches_replayer(ray_session, tmp_lake, tmp_path):
    """90% of updates hit 1% of doc ids (hot-key stress): skew collapses in
    the map-side pre-reduce + per-partition last-wins; output still
    byte-identical to the replayer."""
    from mex_extractors_ray.gen import synth_change_log

    d = tmp_path / "skewlog"
    paths = synth_change_log(
        d, n_events=6000, n_docs=600, seed=11, shard_rows=1500,
        hot_key_fraction=0.01, hot_key_update_share=0.9,
    )
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    table = pa.concat_tables(pq.read_table(p) for p in paths)
    expected, _ = replay_reference(table)
    assert read_lake_arrow(tmp_lake).equals(expected)


def test_first_wins_mode_matches_replayer(ray_session, small_log, tmp_lake):
    """first_wins apply mode (SURVEY.md §7.4 non-standard semantics): the
    first-seen event per doc is immutable; updates/deletes after it are
    no-ops. Byte-identical to the sequential first-wins replayer."""
    paths, table = small_log
    ingest_change_log(paths, tmp_lake, num_partitions=4, mode="first_wins")
    lake = read_lake_arrow(tmp_lake)
    expected, _ = replay_reference(table, mode="first_wins")
    assert lake.equals(expected)
    # and incremental resume keeps the semantics
    metrics = ingest_change_log(paths, tmp_lake, num_partitions=4, mode="first_wins")
    assert pc.all(metrics["noop"]).as_py()


def test_first_wins_delete_never_shadows_insert(ray_session, tmp_lake, tmp_path):
    """Edge: a delete arriving before the first insert must not block it in
    first_wins mode (deletes are no-ops there)."""
    t = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["delete", "insert", "update"]),
            "doc_id": pa.array(["d", "d", "d"]),
            "tokens": pa.array([None, [7], [8, 8]], pa.list_(pa.int32())),
            "n_tok": pa.array([None, 1, 2], pa.int64()),
            "source": pa.array([None, "s", "s"]),
            "schema_version": pa.array([1, 1, 1], pa.int32()),
            "lang": pa.array([None, None, None], pa.string()),
        }
    )
    p = tmp_path / "fw.parquet"
    pq.write_table(t, p)
    ingest_change_log([str(p)], tmp_lake, num_partitions=1, mode="first_wins")
    lake = read_lake_arrow(tmp_lake)
    assert lake["tokens"].to_pylist() == [[7]]  # first insert wins; update ignored
    expected, _ = replay_reference(t, mode="first_wins")
    assert lake.equals(expected)


def test_skip_sources_config(ray_session, small_log, tmp_lake):
    """The reference's skip-list config (settings.py:74-77): listed sources
    are dropped before the shuffle; the lake matches a replay of the
    filtered log."""
    import pyarrow.compute as pc

    paths, table = small_log
    skipped = "src1"
    ingest_change_log(paths, tmp_lake, num_partitions=4, skip_sources=[skipped])
    lake = read_lake_arrow(tmp_lake)
    assert pc.sum(pc.cast(pc.equal(lake["source"], skipped), pa.int64())).as_py() in (0, None)
    filtered = table.filter(pc.not_equal(table["source"], skipped))
    expected, _ = replay_reference(filtered)
    assert lake.equals(expected)
