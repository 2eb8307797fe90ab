"""Exact substring-duplicate detection + winnowed scale path
(stages/substr.py): DuckDB parity in exact mode, the MOSS winnowing
guarantee (shared runs ≥ L+W-1 always detected), and the stop-gram cap."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray.stages.substr import GramExploder, substring_dup_pairs


def _docs(rows):
    return pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows])}
    )


def _pairs(ds):
    t = ds.to_pandas()
    if t.empty or "a" not in t.columns:
        return set()
    return set(zip(t["a"].astype(int), t["b"].astype(int)))


def test_exploder_window_math():
    tbl = _docs([(1, "abcdefg"), (2, "abc"), (3, ""), (4, "abcd")])
    out = GramExploder("text", "doc_id", L=4)(tbl)
    # rows shorter than L emit nothing; len n emits n-L+1 grams
    got = dict(zip(*np.unique(np.asarray(out["doc_id"]), return_counts=True)))
    assert got == {1: 4, 4: 1}
    grams = set(out["gram"].to_pylist())
    assert b"abcd" in grams and b"defg" in grams


def test_exact_pairs_and_dedup(ray_session):
    import ray.data

    shared = "X" * 35  # one shared 35-run => several shared 30-grams, ONE pair
    tbl = _docs(
        [
            (1, "aaa" + shared + "bbb"),
            (2, "ccc" + shared + "ddd"),
            (3, "unrelated text with no long runs at all........"),
        ]
    )
    out = substring_dup_pairs(
        ray.data.from_arrow(tbl), "text", "doc_id", L=30, num_partitions=4
    )
    assert _pairs(out) == {(1, 2)}


def test_winnow_guarantee_at_L_plus_W_minus_1(ray_session):
    import ray.data

    L, W = 12, 5
    rng = np.random.default_rng(3)

    def rand(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, n))

    run = rand(L + W - 1)  # minimum guaranteed-detectable shared length
    rows = [(1, rand(40) + run + rand(40)), (2, rand(40) + run + rand(40))]
    rows += [(10 + i, rand(120)) for i in range(20)]
    out = substring_dup_pairs(
        ray.data.from_arrow(_docs(rows)), "text", "doc_id", L=L, winnow=W,
        num_partitions=4,
    )
    assert (1, 2) in _pairs(out)
    # and winnowed results never exceed exact
    exact = substring_dup_pairs(
        ray.data.from_arrow(_docs(rows)), "text", "doc_id", L=L,
        num_partitions=4,
    )
    assert _pairs(out) <= _pairs(exact)


def test_winnow_keeps_short_docs(ray_session):
    import ray.data

    L, W = 10, 6
    s = "exactlysharedrun!"  # len 17 => 8 grams < W per doc
    rows = [(1, s), (2, s)]
    out = substring_dup_pairs(
        ray.data.from_arrow(_docs(rows)), "text", "doc_id", L=L, winnow=W,
        num_partitions=2,
    )
    assert (1, 2) in _pairs(out)


def test_stop_gram_cap(ray_session):
    import ray.data

    boiler = "B" * 30
    rows = [(i, f"doc{i} " + boiler) for i in range(5)]
    ds = ray.data.from_arrow(_docs(rows))
    capped = substring_dup_pairs(ds, "text", "doc_id", L=30, num_partitions=2,
                                 max_docs_per_gram=4)
    assert _pairs(capped) == set()  # 5 docs share the gram -> dropped
    full = substring_dup_pairs(ds, "text", "doc_id", L=30, num_partitions=2)
    assert len(_pairs(full)) == 10  # C(5,2)


def test_matches_duckdb_on_corpus(ray_session):
    import duckdb
    import ray.data

    src = "/root/testdata/sf0.001/documents.parquet"
    out = substring_dup_pairs(
        ray.data.read_parquet(src, columns=["doc_id", "text"]),
        "text", "doc_id", L=30, num_partitions=8,
    ).to_pandas()[["a", "b"]].sort_values(["a", "b"]).reset_index(drop=True)
    con = duckdb.connect()
    exp = con.execute(f"""
        WITH d AS (SELECT * FROM read_parquet('{src}')),
        pos AS (SELECT CAST(i AS INT) AS i FROM range(1, 10001) t(i)),
        g AS (SELECT doc_id, substr(text, i, 30) AS gr
              FROM d JOIN pos ON i <= length(text) - 29)
        SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
        ORDER BY a, b
    """).df()
    assert len(out) == len(exp) and len(out) > 0
    assert (out.values == exp.values).all()
