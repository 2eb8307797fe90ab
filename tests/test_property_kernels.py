"""Property tests for the round-4 pure kernels — Ray-free (the kernels are
plain numpy/Arrow/SQL), so hypothesis can afford real example counts."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from mex_extractors_ray.stages.pagerank import pagerank_sql
from mex_extractors_ray.stages.rangejoin import _key_codes, _window_ranks
from mex_extractors_ray.stages.sampling import negative_samples_sql
from mex_extractors_ray.stages.shuffle import shuffle_keys


@st.composite
def _two_sides(draw):
    n_keys = draw(st.integers(1, 6))
    n_l = draw(st.integers(0, 40))
    n_r = draw(st.integers(0, 40))
    key = lambda: st.integers(0, n_keys - 1)
    ts = lambda: st.integers(0, 1000)
    l = [(draw(key()), draw(ts())) for _ in range(n_l)]
    r = [(draw(key()), draw(ts())) for _ in range(n_r)]
    lo = draw(st.integers(-200, 200))
    hi = lo + draw(st.integers(0, 300))
    return l, r, lo, hi


@settings(max_examples=60, deadline=None)
@given(_two_sides())
def test_window_ranks_match_brute_force(case):
    l, r, lo, hi = case
    lu = np.array([k for k, _ in l], dtype=np.int64)
    lt = np.array([t for _, t in l], dtype=np.int64)
    ru = np.array([k for k, _ in r], dtype=np.int64)
    rt = np.array([t for _, t in r], dtype=np.int64)
    if len(l) == 0 or len(r) == 0:
        return
    lo_rank, hi_rank = _window_ranks(lu, lt, ru, rt, lo, hi)
    counts = hi_rank - lo_rank
    for i, (k, t) in enumerate(l):
        want = sum(1 for (rk, rt_) in r if rk == k and t + lo < rt_ <= t + hi)
        assert counts[i] == want


@settings(max_examples=30, deadline=None)
@given(st.lists(st.sampled_from(["a", "bb", "ccc", "d", "é"]), min_size=1, max_size=30),
       st.lists(st.sampled_from(["a", "bb", "ccc", "d", "é"]), min_size=1, max_size=30))
def test_key_codes_joint_encoding(lvals, rvals):
    lc, rc = _key_codes(pa.array(lvals), pa.array(rvals))
    joint = lvals + rvals
    codes = np.concatenate([lc, rc])
    # equal values ⇔ equal codes, across sides
    for i in range(len(joint)):
        for j in range(len(joint)):
            assert (codes[i] == codes[j]) == (joint[i] == joint[j])


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(2, 500), st.integers(1, 6))
def test_negative_samples_sql_mirrors_kernel(seed, n_items, k):
    ids = np.arange(n_items, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids})
    con = duckdb.connect()
    con.register("documents", df)
    sql = negative_samples_sql("documents", "doc_id", k=k, seed=seed)
    got = con.execute(sql + " ORDER BY doc_id, j").df()
    anchors = np.repeat(ids, k)
    j = np.tile(np.arange(k, dtype=np.int64), n_items)
    base = anchors.astype(np.uint64) * np.uint64(k) + j.astype(np.uint64)
    want = (shuffle_keys(base, seed, 0) % np.uint64(n_items)).astype(np.int64)
    hit = want == anchors
    want[hit] = (want[hit] + 1) % n_items
    assert (got["neg_id"].to_numpy() == want).all()
    assert (got["neg_id"].to_numpy() != anchors).all()


def _brute_pagerank(edges, nodes, iters, damping_pct=85, scale=10**9):
    sym = edges + [(b, a) for a, b in edges]
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    base = scale * (100 - damping_pct) // 100
    r = {n: scale for n in nodes}
    for _ in range(iters):
        nxt = {n: base for n in nodes}
        for s, d in sym:
            nxt[d] += (r[s] * damping_pct) // (100 * deg[s])
        r = nxt
    return r


@settings(max_examples=15, deadline=None)
@given(st.integers(2, 25), st.integers(0, 60), st.integers(1, 4),
       st.integers(0, 2**31 - 1))
def test_pagerank_sql_matches_reference_loop(n_nodes, n_edges, iters, seed):
    rng = np.random.default_rng(seed)
    edges = sorted({(int(min(x, y)), int(max(x, y)))
                    for x, y in rng.integers(0, n_nodes, size=(n_edges, 2))
                    if x != y})
    con = duckdb.connect()
    con.register("edges_t", pd.DataFrame(edges, columns=["a", "b"])
                 if edges else pd.DataFrame({"a": pd.Series(dtype="int64"),
                                             "b": pd.Series(dtype="int64")}))
    con.register("nodes_t", pd.DataFrame({"node": range(n_nodes)}))
    sql = pagerank_sql("SELECT a, b FROM edges_t", "SELECT node FROM nodes_t",
                       iters=iters)
    got = con.execute(sql + " ORDER BY node").df()
    want = _brute_pagerank(edges, list(range(n_nodes)), iters)
    assert got["rank"].tolist() == [want[n] for n in range(n_nodes)]


@st.composite
def _two_col_table(draw):
    n = draw(st.integers(1, 80))
    a = [draw(st.integers(0, 20)) for _ in range(n)]
    b = [draw(st.sampled_from(["p", "q", "r", "s"])) for _ in range(n)]
    return a, b


@settings(max_examples=60, deadline=None)
@given(_two_col_table())
def test_zorder_key_monotone_per_axis_and_bounded(case):
    """The Morton key is (1) bounded to 43 bits, (2) deterministic, and
    (3) MONOTONE along each axis: with the other coordinate fixed, a
    larger rank never gets a smaller key — the property row-group
    min/max pruning relies on."""
    from mex_extractors_ray.cdc.compact import zorder_key

    a, b = case
    t = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b)})
    z = np.asarray(zorder_key(t, ["a", "b"]))
    assert (z >= 0).all() and (z < (1 << 43)).all()
    assert np.array_equal(z, np.asarray(zorder_key(t, ["a", "b"])))  # deterministic
    # per-axis monotonicity via the pairwise check on equal other-coord
    av, bv = np.array(a), np.array(b)
    for i in range(len(a)):
        same_b = bv == bv[i]
        assert not ((av[same_b] > av[i]) & (z[same_b] < z[i])).any()
        same_a = av == av[i]
        bi = bv[same_a]
        assert not ((bi > bv[i]) & (z[same_a] < z[i])).any()


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 0x1FFFFF))
def test_spread2_roundtrip_bits(x):
    """_spread2 places bit i of the input at bit 2i of the output,
    exactly."""
    from mex_extractors_ray.cdc.compact import _spread2

    out = int(_spread2(np.array([x], dtype=np.uint64))[0])
    back = 0
    for i in range(21):
        back |= ((out >> (2 * i)) & 1) << i
    assert back == x
    # odd bit positions are all zero
    assert out & 0xAAAAAAAAAAAAAAAA == 0


@settings(max_examples=120, deadline=None)
@given(st.lists(
    st.tuples(st.one_of(st.none(),
                        st.text(alphabet="ab|:VN\x00\x1f", max_size=6)),
              st.one_of(st.none(),
                        st.text(alphabet="ab|:VN\x00\x1f", max_size=6))),
    min_size=1, max_size=30))
def test_composite_gkey_injective(rows):
    """The length-prefixed composite encoding is injective: two rows get
    the same gkey iff their (a, b) tuples are equal — even for values
    built from the separator/marker alphabet itself."""
    from mex_extractors_ray.hashing import composite_gkey

    t = pa.table({
        "a": pa.array([a for a, _ in rows], pa.string()),
        "b": pa.array([b for _, b in rows], pa.string()),
    })
    keys = composite_gkey(t, ["a", "b"]).to_pylist()
    for i in range(len(rows)):
        for j in range(len(rows)):
            assert (keys[i] == keys[j]) == (rows[i] == rows[j]), (
                rows[i], rows[j], keys[i], keys[j])


@settings(max_examples=80, deadline=None)
@given(st.lists(st.lists(st.integers(0, 9), max_size=8), max_size=10))
def test_bigram_keys_match_bruteforce(lists):
    from mex_extractors_ray.stages.tokens import _bigram_keys

    col = pa.array(lists, type=pa.list_(pa.int32()))
    got = sorted(_bigram_keys(col, 10).tolist())
    want = sorted(a * 10 + b for s in lists
                  for a, b in zip(s, s[1:]))
    assert got == want
