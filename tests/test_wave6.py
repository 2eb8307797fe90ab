"""Session-6 wave: vocab remap, mixture upsampling, exact grouped
discrete quantiles, anti-entropy replica repair."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from mex_extractors_ray.cdc import ingest_change_log
from mex_extractors_ray.cdc.apply import read_lake_arrow
from mex_extractors_ray.cdc.diff import diff_lakes
from mex_extractors_ray.cdc.repair import repair_replica
from mex_extractors_ray.stages.aggregates import keyed_quantile_disc
from mex_extractors_ray.stages.sampling import (
    mixture_upsample, mixture_upsample_sql,
)
from mex_extractors_ray.stages.tokens import (
    remap_lut, token_histogram, vocab_remap,
)


# ---------------------------------------------------------------------- vocab

def _docs_ds(rng, n=200, vocab=50):
    lens = rng.integers(0, 9, size=n)
    toks = [rng.integers(0, vocab, size=m).astype(np.int32) for m in lens]
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n)]),
        "tokens": pa.array([list(x) for x in toks], pa.list_(pa.int32())),
    })
    return t, toks


def test_token_histogram_exact(ray_session):
    rng = np.random.default_rng(0)
    t, toks = _docs_ds(rng)
    hist = token_histogram(ray.data.from_arrow(t), vocab_size=50,
                           num_partitions=4)
    flat = np.concatenate([x for x in toks if len(x)]) if toks else []
    u, c = np.unique(np.asarray(flat, np.int64), return_counts=True)
    got = dict(zip(np.asarray(hist["token"]), np.asarray(hist["n"])))
    assert got == dict(zip(u.tolist(), c.tolist()))


def test_token_histogram_rejects_oov(ray_session):
    t = pa.table({"doc_id": pa.array(["a"]),
                  "tokens": pa.array([[99]], pa.list_(pa.int32()))})
    with pytest.raises(Exception, match="outside"):
        token_histogram(ray.data.from_arrow(t), vocab_size=50,
                        num_partitions=2)


def test_remap_lut_rank_and_ties():
    hist = pa.table({"token": pa.array([7, 3, 9, 1], pa.int64()),
                     "n": pa.array([5, 5, 2, 9], pa.int64())})
    lut = remap_lut(hist, vocab_size=12, top_k=3)
    # rank order: 1 (n=9), then ties n=5 broken by smaller token: 3, 7
    assert lut[1] == 0 and lut[3] == 1 and lut[7] == 2
    assert lut[9] == 3 and lut[0] == 3  # UNK


def test_vocab_remap_matches_pure_python(ray_session):
    rng = np.random.default_rng(1)
    t, toks = _docs_ds(rng, n=300, vocab=40)
    out = vocab_remap(ray.data.from_arrow(t), vocab_size=40, top_k=5,
                      num_partitions=4).to_pandas().set_index("doc_id")
    flat = np.concatenate([x for x in toks if len(x)])
    u, c = np.unique(np.asarray(flat, np.int64), return_counts=True)
    order = np.lexsort((u, -c))[:5]
    lut = {int(u[o]): i for i, o in enumerate(order)}
    for i, seq in enumerate(toks):
        new = [lut.get(int(x), 5) for x in seq]
        wsum = sum((j + 1) * v for j, v in enumerate(new))
        n_unk = sum(1 for v in new if v == 5)
        row = out.loc[f"d{i}"]
        assert row["remap_wsum"] == wsum and row["n_unk"] == n_unk


# -------------------------------------------------------------------- mixture

FACTORS = {"a": (5, 2), "b": (3, 1), "c": (0, 1), "d": (1, 2)}


def _mix_table(n=400):
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "grp": pa.array([["a", "b", "c", "d", "e"][i % 5] for i in range(n)]),
    })


def test_mixture_upsample_matches_sql(ray_session, tmp_path):
    t = _mix_table()
    pq.write_table(t, tmp_path / "t.parquet")
    got = mixture_upsample(ray.data.from_arrow(t), "id", "grp", FACTORS,
                           default=(1, 1), seed=9).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{tmp_path}/t.parquet'")
    sql = mixture_upsample_sql("t", "id", "grp", FACTORS, default=(1, 1),
                               seed=9)
    exp = con.execute(sql).df()
    key = ["id", "grp", "repeat_idx"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    exp_s = exp[key].astype(got_s.dtypes.to_dict()).sort_values(key) \
        .reset_index(drop=True)
    assert got_s.equals(exp_s)
    # group semantics: c dropped entirely, b exactly tripled, e (default) kept once
    assert (got["grp"] == "c").sum() == 0
    assert (got["grp"] == "b").sum() == 3 * (t.num_rows // 5)
    assert (got["grp"] == "e").sum() == t.num_rows // 5
    # a averages 2.5x: between 2x and 3x, and repeat_idx is 1-based dense
    n_a = (got["grp"] == "a").sum()
    assert 2 * 80 <= n_a <= 3 * 80
    assert set(got[got["grp"] == "b"]["repeat_idx"]) == {1, 2, 3}


def test_mixture_upsample_deterministic(ray_session):
    t = _mix_table(100)
    a = mixture_upsample(ray.data.from_arrow(t), "id", "grp", FACTORS,
                         seed=3).to_pandas()
    b = mixture_upsample(ray.data.from_arrow(t), "id", "grp", FACTORS,
                         seed=3).to_pandas()
    key = ["id", "repeat_idx"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


def test_mixture_upsample_rejects_bad_factor(ray_session):
    with pytest.raises(ValueError):
        mixture_upsample(ray.data.from_arrow(_mix_table(4)), "id", "grp",
                         {"a": (1, 0)})


# ------------------------------------------------------------------ quantiles

def test_keyed_quantile_disc_matches_duckdb(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.integers(0, 37, size=n).astype(np.int64)),
        "v": pa.array(rng.integers(-10_000, 10_000, size=n).astype(np.int64)),
    })
    pq.write_table(t, tmp_path / "q.parquet")
    got = keyed_quantile_disc(ray.data.from_arrow(t), "k", "v",
                              qs=(0.5, 0.9, 1.0), num_partitions=8).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW q AS SELECT * FROM '{tmp_path}/q.parquet'")
    exp = con.execute("""
        SELECT k, CAST(50 AS BIGINT) AS q_c100,
               PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY v) AS v FROM q GROUP BY k
        UNION ALL SELECT k, 90, PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY v) FROM q GROUP BY k
        UNION ALL SELECT k, 100, PERCENTILE_DISC(1.0) WITHIN GROUP (ORDER BY v) FROM q GROUP BY k
    """).df()
    key = ["k", "q_c100"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.astype(got_s.dtypes.to_dict()).sort_values(key) \
        .reset_index(drop=True)
    assert got_s.equals(exp_s)


def test_keyed_quantile_disc_nulls_and_bounds(ray_session):
    t = pa.table({"k": pa.array(["a", "a", "a", "b"]),
                  "v": pa.array([3, None, 1, None], pa.int64())})
    got = keyed_quantile_disc(ray.data.from_arrow(t), "k", "v",
                              qs=(0.5,), num_partitions=2).to_pandas()
    # b has only nulls -> no row; a's median over {1,3} is the lower one
    assert got.to_dict("records") == [{"k": "a", "q_c100": 50, "v": 1}]
    with pytest.raises(ValueError):
        keyed_quantile_disc(ray.data.from_arrow(t), "k", "v", qs=(0.0,))


# --------------------------------------------------------------------- repair

def _split_lakes(small_log, tmp_path):
    """Full lake (truth) + prefix lake (stale replica) from the shared
    seeded fixture."""
    paths, table = small_log
    cut = int(pa.compute.max(table["lsn"]).as_py()) // 2
    head = table.filter(pa.compute.less_equal(table["lsn"], cut))
    head_p = tmp_path / "head.parquet"
    pq.write_table(head, head_p)
    src, dst = tmp_path / "src", tmp_path / "dst"
    ingest_change_log(list(paths), src, num_partitions=4)
    ingest_change_log([str(head_p)], dst, num_partitions=4)
    return src, dst


def test_repair_converges_prefix_replica(ray_session, small_log, tmp_path):
    src, dst = _split_lakes(small_log, tmp_path)
    stats = repair_replica(src, dst)
    assert stats["upserts"] > 0
    # byte-identical live state, lsn included
    assert read_lake_arrow(dst).equals(read_lake_arrow(src))
    # second repair is a no-op (empty diff)
    again = repair_replica(src, dst)
    assert again == {"upserts": 0, "deletes": 0, "bumped": 0, "metrics": None}


def test_repair_refuses_forward_divergence_then_bumps(ray_session, small_log,
                                                      tmp_path):
    src, dst = _split_lakes(small_log, tmp_path)
    # rogue local write on the replica with an lsn PAST the source watermark
    w = 10**9
    rogue = pa.table({
        "lsn": pa.array([w], pa.int64()),
        "op": pa.array(["update"]),
        "doc_id": pa.array(["doc-1"]),
        "tokens": pa.array([[1, 2, 3]], pa.list_(pa.int32())),
        "n_tok": pa.array([3], pa.int64()),
        "source": pa.array(["rogue"]),
        "schema_version": pa.array([3], pa.int32()),
        "lang": pa.array(["xx"]),
    })
    p = tmp_path / "rogue.parquet"
    pq.write_table(rogue, p)
    ingest_change_log([str(p)], dst, num_partitions=4)
    with pytest.raises(ValueError, match="bump_lsn"):
        repair_replica(src, dst)
    stats = repair_replica(src, dst, bump_lsn=True)
    assert stats["bumped"] > 0
    # content converges (lsn intentionally excluded)
    d = diff_lakes(src, dst)
    assert d.count() == 0


def test_repair_ceiling(ray_session, small_log, tmp_path):
    src, dst = _split_lakes(small_log, tmp_path)
    with pytest.raises(ValueError, match="ceiling"):
        repair_replica(src, dst, broadcast_ceiling=1)


# ----------------------------------------------------------------------- gate

GATE = [{"name": "big", "column": "n_tok", "op": ">", "value": 64}]


def test_gated_ingest_matches_filtered_replayer(ray_session, small_log,
                                                tmp_path):
    import pyarrow.compute as pc

    from mex_extractors_ray.cdc import replay_reference

    paths, table = small_log
    lake = tmp_path / "lake"
    ingest_change_log(list(paths), lake, num_partitions=4, constraints=GATE,
                      rejects_out=tmp_path / "dlq")
    # rejected events are AS IF NEVER SENT: the replayer runs on the
    # manually filtered log (deletes pass — null n_tok never fires ">")
    keep = pc.or_kleene(pc.equal(table["op"], "delete"),
                        pc.less_equal(table["n_tok"], 64))
    expected, _ = replay_reference(table.filter(pc.fill_null(keep, False)))
    assert read_lake_arrow(lake).equals(expected)
    # the DLQ is the exact complement, with lineage
    import pyarrow.dataset as pads
    rej = pads.dataset(str(tmp_path / "dlq")).to_table()
    n_bad = table.filter(pc.and_kleene(
        pc.not_equal(table["op"], "delete"),
        pc.greater(table["n_tok"], 64))).num_rows
    assert rej.num_rows == n_bad
    assert set(rej["_reject_reason"].to_pylist()) == {"big"}


def test_gate_dlq_rebuilt_not_accumulated(ray_session, small_log, tmp_path):
    import pyarrow.dataset as pads

    paths, _ = small_log
    l1, l2 = tmp_path / "l1", tmp_path / "l2"
    ingest_change_log(list(paths), l1, num_partitions=4, constraints=GATE,
                      rejects_out=tmp_path / "dlq")
    n1 = pads.dataset(str(tmp_path / "dlq")).count_rows()
    # same window gated again (fresh lake): the DLQ dir is a recomputable
    # view — rebuilt, not appended
    ingest_change_log(list(paths), l2, num_partitions=4, constraints=GATE,
                      rejects_out=tmp_path / "dlq")
    assert pads.dataset(str(tmp_path / "dlq")).count_rows() == n1


def test_rejects_out_requires_constraints(ray_session, small_log, tmp_path):
    paths, _ = small_log
    with pytest.raises(ValueError, match="constraints"):
        ingest_change_log(list(paths), tmp_path / "l", num_partitions=4,
                          rejects_out=tmp_path / "dlq")


# ------------------------------------------------------------- token chunking

def test_chunk_token_stream_matches_pure_python(ray_session):
    from mex_extractors_ray.stages.packing import chunk_token_stream

    rng = np.random.default_rng(11)
    n, L = 120, 7
    lens = rng.integers(0, 12, size=n)
    toks = [rng.integers(0, 1000, size=m).astype(np.int32) for m in lens]
    shards = [["s0", "s1", "s2"][i % 3] for i in range(n)]
    t = pa.table({
        "src": pa.array(shards),
        "doc": pa.array([f"d{i:03d}" for i in range(n)]),
        "tokens": pa.array([list(x) for x in toks], pa.list_(pa.int32())),
    })
    got = chunk_token_stream(ray.data.from_arrow(t), "src", "doc", "tokens",
                             seq_len=L, num_partitions=4,
                             num_buckets=4).to_pandas()
    # pure python: concat per shard in doc order, cut every L
    exp = {}
    for s in ("s0", "s1", "s2"):
        stream = []
        for i in sorted(range(n), key=lambda i: f"d{i:03d}"):
            if shards[i] == s:
                stream.extend(int(x) for x in toks[i])
        for c in range(0, len(stream), L):
            seg = stream[c:c + L]
            exp[(s, c // L)] = (len(seg),
                                sum((j + 1) * v for j, v in enumerate(seg)))
    got_d = {(r.src, r.chunk_id): (r.n_in_chunk, r.wsum)
             for r in got.itertuples()}
    assert got_d == exp
    # every non-tail chunk is exactly full
    tails = {s: max(c for (s2, c) in exp if s2 == s) for s in ("s0", "s1", "s2")}
    for (s, c), (n_in, _) in got_d.items():
        if c < tails[s]:
            assert n_in == L


def test_chunk_token_stream_guards(ray_session):
    from mex_extractors_ray.stages.packing import chunk_token_stream

    t = pa.table({"src": pa.array(["a"]), "doc": pa.array(["d"]),
                  "tokens": pa.array([[1, 2]], pa.list_(pa.int32()))})
    with pytest.raises(ValueError):
        chunk_token_stream(ray.data.from_arrow(t), "src", "doc", "tokens",
                           seq_len=0)
