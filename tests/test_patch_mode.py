"""Column-level merge (``patch``) apply mode: sparse updates overlay their
non-null columns onto the live row; full rows and deletes are barriers.
Checked against the single-process replayer (the acceptance discipline of
test_cdc_apply.py) plus hand-built barrier/resurrect fixtures."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mex_extractors_ray.cdc import ingest_change_log, replay_reference
from mex_extractors_ray.cdc.apply import _fold_patches, read_lake_arrow
from mex_extractors_ray.gen import patch_log_from_events

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

_DATA_COLS = ["tokens", "n_tok", "source", "lang"]


def _log(rows):
    full = [
        {
            "tokens": None,
            "n_tok": None,
            "source": None,
            "lang": None,
            "schema_version": 3,
            **r,
        }
        for r in rows
    ]
    return pa.Table.from_pylist(full, schema=_SCHEMA)


def _row(t: pa.Table, doc: str) -> dict:
    sel = t.filter(pc.equal(t["doc_id"], doc))
    assert sel.num_rows == 1
    return sel.to_pylist()[0]


def test_fold_overlays_columns_in_lsn_order():
    t = _log(
        [
            dict(lsn=1, op="insert", doc_id="a", tokens=[1, 2], n_tok=2,
                 source="s0", lang="de"),
            dict(lsn=3, op="patch", doc_id="a", tokens=[7], n_tok=1),
            dict(lsn=5, op="patch", doc_id="a", lang="fr"),
            dict(lsn=2, op="patch", doc_id="a", source="s9"),
        ]
    )
    out = _fold_patches(t.select(["lsn", "op", "doc_id"] + _DATA_COLS), _DATA_COLS)
    r = _row(out, "a")
    assert r["op"] == "upsert" and r["lsn"] == 5
    assert r["tokens"] == [7] and r["n_tok"] == 1
    assert r["lang"] == "fr" and r["source"] == "s9"


def test_fold_delete_is_barrier_and_resurrects_from_nulls():
    t = _log(
        [
            dict(lsn=1, op="insert", doc_id="a", tokens=[1], n_tok=1,
                 source="s0", lang="de"),
            dict(lsn=2, op="patch", doc_id="a", lang="en"),
            dict(lsn=3, op="delete", doc_id="a"),
            dict(lsn=4, op="patch", doc_id="a", source="s5"),
            # doc b: last event is the delete -> tombstone
            dict(lsn=1, op="insert", doc_id="b", tokens=[2], n_tok=1,
                 source="s1", lang="de"),
            dict(lsn=6, op="delete", doc_id="b"),
            # doc c: created BY patch, never inserted
            dict(lsn=7, op="patch", doc_id="c", n_tok=3, tokens=[1, 2, 3]),
        ]
    )
    out = _fold_patches(t.select(["lsn", "op", "doc_id"] + _DATA_COLS), _DATA_COLS)
    a = _row(out, "a")
    assert a["op"] == "upsert" and a["source"] == "s5"
    # pre-delete values must NOT leak through the barrier
    assert a["lang"] is None and a["tokens"] is None and a["n_tok"] is None
    assert _row(out, "b")["op"] == "delete"
    c = _row(out, "c")
    assert c["op"] == "upsert" and c["n_tok"] == 3 and c["source"] is None


def _tiny_events(n=400, users=60):
    import numpy as np

    lsn = np.arange(1, n + 1, dtype=np.int64) * 3  # gaps
    rng = np.random.default_rng(7)
    user = rng.integers(0, users, size=n)
    etype = rng.choice(
        np.array(["signup", "click", "purchase", "error"]), size=n,
        p=[0.2, 0.4, 0.3, 0.1],
    )
    return pa.table(
        {"event_id": pa.array(lsn), "user_id": pa.array(user),
         "event_type": pa.array(etype)}
    )


def test_patch_ingest_matches_replayer(ray_session, tmp_path, tmp_lake):
    log = patch_log_from_events(_tiny_events())
    p = tmp_path / "plog.parquet"
    pq.write_table(log, p)
    ingest_change_log([str(p)], tmp_lake, num_partitions=4, mode="patch")
    lake = read_lake_arrow(tmp_lake)
    expected, tombs = replay_reference(log, mode="patch")
    assert lake.num_rows == expected.num_rows
    assert lake.schema == expected.schema
    assert lake.equals(expected)  # per-row token-array equality included
    if tombs:
        assert lake.filter(
            pc.is_in(lake["doc_id"], value_set=pa.array(list(tombs)))
        ).num_rows == 0


def test_patch_two_windows_equal_one_and_idempotent(ray_session, tmp_path,
                                                    tmp_lake):
    log = patch_log_from_events(_tiny_events(600, 40))
    cut = int(pc.max(log["lsn"]).as_py()) // 2
    w1 = log.filter(pc.less_equal(log["lsn"], cut))
    w2 = log.filter(pc.greater(log["lsn"], cut))
    p1, p2 = tmp_path / "w1.parquet", tmp_path / "w2.parquet"
    pq.write_table(w1, p1)
    pq.write_table(w2, p2)
    ingest_change_log([str(p1)], tmp_lake, num_partitions=4, mode="patch")
    ingest_change_log([str(p2)], tmp_lake, num_partitions=4, mode="patch")
    lake = read_lake_arrow(tmp_lake)
    expected, _ = replay_reference(log, mode="patch")
    assert lake.equals(expected)
    # replaying window 2 is an exactly-once no-op
    metrics = ingest_change_log([str(p2)], tmp_lake, num_partitions=4,
                                mode="patch")
    assert pc.all(metrics["noop"]).as_py()
    assert read_lake_arrow(tmp_lake).equals(expected)


def test_patch_log_derivation_is_well_formed():
    log = patch_log_from_events(_tiny_events(300, 30))
    ops = set(log["op"].to_pylist())
    assert ops <= {"insert", "patch", "delete"}
    ins = log.filter(pc.equal(log["op"], "insert"))
    # exactly one insert per doc that has any non-delete event
    assert ins.num_rows == pc.count_distinct(ins["doc_id"]).as_py()
    # inserts set every column; patches set exactly one mask group
    assert ins.filter(pc.is_null(ins["source"])).num_rows == 0
    assert ins.filter(pc.is_null(ins["lang"])).num_rows == 0
    pat = log.filter(pc.equal(log["op"], "patch"))
    set_cnt = sum(
        pc.sum(pc.cast(pc.invert(pc.is_null(pat[c])), pa.int64())).as_py() or 0
        for c in ("n_tok", "source", "lang")
    )
    assert set_cnt == pat.num_rows  # one group per patch (tokens rides n_tok)


def test_combiner_is_associative_and_compresses():
    """fold(combine(any batch split)) == fold(raw) — the associativity that
    makes the patch combiner exact — and partials are one row per doc."""
    import numpy as np

    from mex_extractors_ray.cdc.apply import _combine_patch_batch, _fold_patches

    log = patch_log_from_events(_tiny_events(500, 25))
    cols = _DATA_COLS
    sel = log.select(["lsn", "op", "doc_id"] + cols)
    direct = _fold_patches(sel, cols).sort_by([("doc_id", "ascending")])
    rng = np.random.default_rng(2)
    for _ in range(5):
        # random 3-way split, combine each part, fold the partials
        assign = rng.integers(0, 3, size=sel.num_rows)
        parts = [
            _combine_patch_batch(sel.filter(pa.array(assign == i)), cols)
            for i in range(3)
        ]
        for p in parts:
            # one partial per (part, doc): the shuffle ships docs, not events
            assert p.num_rows == pc.count_distinct(p["doc_id"]).as_py()
        merged = pa.concat_tables(parts, promote_options="permissive")
        got = _fold_patches(merged, cols).sort_by([("doc_id", "ascending")])
        assert got.equals(direct)


def test_combiner_collapses_hot_key():
    from mex_extractors_ray.cdc.apply import _combine_patch_batch

    rows = [dict(lsn=1, op="insert", doc_id="hot", tokens=[1], n_tok=1,
                 source="s0", lang="de")]
    rows += [dict(lsn=2 + i, op="patch", doc_id="hot",
                  lang=("en", "fr")[i % 2]) for i in range(200)]
    t = _log(rows).select(["lsn", "op", "doc_id"] + _DATA_COLS)
    out = _combine_patch_batch(t, _DATA_COLS)
    assert out.num_rows == 1  # 201 events -> ONE shuffled partial
    r = out.to_pylist()[0]
    assert r["lang"] == "fr" and r["lsn"] == 201 and r["tokens"] == [1]
    assert r["_lsn_lang"] == 201 and r["_lsn_tokens"] == 1
