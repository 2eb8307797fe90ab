"""Range join, lag window function, rollup, pivot, negative sampling —
the round-4 window/reshape operator wave (custom operators Ray Data lacks;
the reference is exact-key/batch-only, SURVEY.md §2.5/§2.6/§2.10)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from mex_extractors_ray.stages.aggregates import pivot_counts, rollup_sum_count
from mex_extractors_ray.stages.rangejoin import range_join, range_join_count
from mex_extractors_ray.stages.sampling import negative_samples
from mex_extractors_ray.stages.sessions import keyed_lag_gaps
from mex_extractors_ray.stages.shuffle import shuffle_keys


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


def _t(s):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)


def _mk_two_sides(seed=11, n_l=300, n_r=400, n_keys=17):
    rng = np.random.default_rng(seed)
    left = [
        {"lid": i, "k": int(rng.integers(0, n_keys)), "ts": _t(int(rng.integers(0, 5000)))}
        for i in range(n_l)
    ]
    right = [
        {"k": int(rng.integers(0, n_keys)), "ts": _t(int(rng.integers(0, 5000))), "rid": i}
        for i in range(n_r)
    ]
    return left, right


def _brute_counts(left, right, lo, hi):
    out = {}
    for l in left:
        out[l["lid"]] = sum(
            1 for r in right
            if r["k"] == l["k"]
            and l["ts"] + pd.Timedelta(seconds=lo) < r["ts"] <= l["ts"] + pd.Timedelta(seconds=hi)
        )
    return out


def test_range_join_count_vs_brute_force(ray_session):
    left, right = _mk_two_sides()
    got = (
        range_join_count(_ds(left), _ds(right), "k", "ts", "ts", 0.0, 600.0,
                         out_col="n", num_partitions=8)
        .to_pandas().set_index("lid")["n"].to_dict()
    )
    assert got == _brute_counts(left, right, 0.0, 600.0)


def test_range_join_bounds_exclusive_lo_inclusive_hi(ray_session):
    left = [{"lid": 1, "k": "a", "ts": _t(100)}]
    right = [
        {"k": "a", "ts": _t(100), "rid": 0},  # == lo bound -> excluded
        {"k": "a", "ts": _t(101), "rid": 1},  # inside
        {"k": "a", "ts": _t(160), "rid": 2},  # == hi bound -> included
        {"k": "a", "ts": _t(161), "rid": 3},  # past hi -> excluded
        {"k": "b", "ts": _t(120), "rid": 4},  # other key -> excluded
    ]
    got = range_join_count(_ds(left), _ds(right), "k", "ts", "ts", 0.0, 60.0,
                           out_col="n", num_partitions=4).to_pandas()
    assert got["n"].tolist() == [2]
    pairs = range_join(_ds(left), _ds(right), "k", "ts", "ts", 0.0, 60.0,
                       num_partitions=4).to_pandas()
    assert sorted(pairs["rid"].tolist()) == [1, 2]


def test_range_join_pairs_vs_brute_force_string_keys(ray_session):
    left, right = _mk_two_sides(seed=5, n_l=120, n_r=150, n_keys=9)
    for row in left:
        row["k"] = f"k{row['k']}"
    for row in right:
        row["k"] = f"k{row['k']}"
    pairs = range_join(_ds(left), _ds(right), "k", "ts", "ts", -300.0, 300.0,
                       num_partitions=8).to_pandas()
    got = sorted(map(tuple, pairs[["lid", "rid"]].to_numpy().tolist()))
    want = sorted(
        (l["lid"], r["rid"])
        for l in left for r in right
        if r["k"] == l["k"]
        and l["ts"] - pd.Timedelta(seconds=300) < r["ts"] <= l["ts"] + pd.Timedelta(seconds=300)
    )
    assert got == want
    # left columns survive, shared right names suffixed
    assert {"lid", "k", "ts", "ts_r", "rid"} <= set(pairs.columns)


def test_range_join_sum_rolling_self_window(ray_session):
    # left == right, window (ts-100s, ts]: the SQL RANGE frame semantics
    rng = np.random.default_rng(2)
    rows = [
        {"eid": i, "k": int(rng.integers(0, 5)),
         "ts": _t(int(rng.integers(0, 500))), "v": int(rng.integers(1, 50))}
        for i in range(150)
    ]
    from mex_extractors_ray.stages.rangejoin import range_join_sum

    left = _ds([{"eid": r["eid"], "k": r["k"], "ts": r["ts"]} for r in rows])
    right = _ds([{"k": r["k"], "ts": r["ts"], "v": r["v"]} for r in rows])
    out = (
        range_join_sum(left, right, "k", "ts", "ts", -100.0, 0.0, value_col="v",
                       num_partitions=4)
        .to_pandas().set_index("eid")
    )
    for row in rows:
        want = [r["v"] for r in rows
                if r["k"] == row["k"]
                and row["ts"] - pd.Timedelta(seconds=100) < r["ts"] <= row["ts"]]
        assert out.loc[row["eid"], "win_sum"] == sum(want)
        assert out.loc[row["eid"], "win_n"] == len(want)


def test_range_join_salted_hot_key_matches_unsalted(ray_session):
    # one pathological key holding most rows — the salt path must agree
    rng = np.random.default_rng(4)
    left = [{"lid": i, "k": 7 if i % 5 else int(rng.integers(0, 3)),
             "ts": _t(int(rng.integers(0, 2000)))} for i in range(120)]
    right = [{"k": 7 if i % 4 else int(rng.integers(0, 3)),
              "ts": _t(int(rng.integers(0, 2000))),
              "v": int(rng.integers(1, 9))} for i in range(200)]
    from mex_extractors_ray.stages.rangejoin import range_join_sum

    plain = (
        range_join_sum(_ds(left), _ds(right), "k", "ts", "ts", -300.0, 300.0,
                       value_col="v", num_partitions=4)
        .to_pandas().set_index("lid")[["win_sum", "win_n"]]
    )
    salted = (
        range_join_sum(_ds(left), _ds(right), "k", "ts", "ts", -300.0, 300.0,
                       value_col="v", num_partitions=4, salt=4,
                       id_cols=["lid"])
        .to_pandas().set_index("lid")[["win_sum", "win_n"]]
    )
    assert salted.sort_index().equals(plain.sort_index())
    counted = (
        range_join_count(_ds(left), _ds(right), "k", "ts", "ts", -300.0, 300.0,
                         out_col="n", num_partitions=4, salt=3, id_cols=["lid"])
        .to_pandas().set_index("lid")["n"]
    )
    assert counted.sort_index().equals(plain["win_n"].rename("n").sort_index())


def test_range_join_empty_right(ray_session):
    left = [{"lid": 1, "k": 1, "ts": _t(0)}]
    right = [{"k": 2, "ts": _t(0), "rid": 9}]  # no key overlap
    got = range_join_count(_ds(left), _ds(right), "k", "ts", "ts", 0.0, 10.0,
                           out_col="n", num_partitions=4).to_pandas()
    assert got["n"].tolist() == [0]
    pairs = range_join(_ds(left), _ds(right), "k", "ts", "ts", 0.0, 10.0,
                       num_partitions=4).to_pandas()
    assert len(pairs) == 0


def test_keyed_lag_gaps(ray_session):
    rows = [
        {"eid": 1, "u": 1, "ts": _t(0)},
        {"eid": 2, "u": 1, "ts": _t(10)},
        {"eid": 3, "u": 1, "ts": _t(10)},  # tie broken by eid
        {"eid": 4, "u": 2, "ts": _t(100)},
        {"eid": 5, "u": 3, "ts": _t(7)},
        {"eid": 6, "u": 3, "ts": _t(1000)},
    ]
    out = (
        keyed_lag_gaps(_ds(rows), "u", "ts", order_cols=("eid",), num_partitions=4)
        .to_pandas().sort_values("eid")
    )
    assert out["prev_gap_us"].tolist() == [-1, 10_000_000, 0, -1, -1, 993_000_000]


def test_keyed_lead_scd2_intervals(ray_session):
    from mex_extractors_ray.stages.sessions import keyed_lead

    rows = [
        {"k": "a", "lsn": 1},
        {"k": "a", "lsn": 5},
        {"k": "a", "lsn": 9},
        {"k": "b", "lsn": 3},
        {"k": "c", "lsn": 2},
        {"k": "c", "lsn": 4},
    ]
    out = (
        keyed_lead(_ds(rows), "k", "lsn", out_col="valid_to", num_partitions=4)
        .to_pandas().sort_values(["k", "lsn"])
    )
    assert out["valid_to"].tolist() == [5, 9, -1, -1, 4, -1]
    # custom fill sentinel
    out2 = (
        keyed_lead(_ds(rows), "k", "lsn", out_col="v", fill=0, num_partitions=4)
        .to_pandas().sort_values(["k", "lsn"])
    )
    assert out2["v"].tolist() == [5, 9, 0, 0, 4, 0]


def test_keyed_cumsum_running_totals(ray_session):
    import pytest

    from mex_extractors_ray.stages.sessions import keyed_cumsum

    rows = [
        {"k": "a", "o": 1, "v": 10},
        {"k": "a", "o": 3, "v": 5},
        {"k": "a", "o": 2, "v": 7},
        {"k": "b", "o": 9, "v": 100},
        {"k": "b", "o": 10, "v": 1},
    ]
    out = (
        keyed_cumsum(_ds(rows), "k", "o", "v", out_col="rs", num_partitions=4)
        .to_pandas().sort_values(["k", "o"])
    )
    assert out["rs"].tolist() == [10, 17, 22, 100, 101]
    # float value columns refused (silent truncation guard)
    frows = [{"k": "a", "o": 1, "v": 1.5}]
    with pytest.raises(Exception, match="integer columns only"):
        keyed_cumsum(_ds(frows), "k", "o", "v").to_pandas()


def test_rollup_sum_count_levels(ray_session):
    rows = [
        {"a": "x", "b": 1, "v": 10},
        {"a": "x", "b": 1, "v": 5},
        {"a": "x", "b": 2, "v": 1},
        {"a": "y", "b": 1, "v": 100},
    ]
    out = rollup_sum_count(_ds(rows), ["a", "b"], "v").to_pandas()
    key = out.apply(
        lambda r: (None if pd.isna(r["a"]) else r["a"],
                   None if pd.isna(r["b"]) else int(r["b"])), axis=1)
    got = dict(zip(key, zip(out["sum"].astype(int), out["n"].astype(int))))
    assert got == {
        ("x", 1): (15, 2), ("x", 2): (1, 1), ("y", 1): (100, 1),
        ("x", None): (16, 3), ("y", None): (100, 1),
        (None, None): (116, 4),
    }


def test_pivot_counts(ray_session):
    rows = (
        [{"g": "g1", "c": "a"}] * 3
        + [{"g": "g1", "c": "b"}] * 2
        + [{"g": "g2", "c": "b"}]
        + [{"g": "g2", "c": "zzz"}]  # undeclared column value -> dropped
    )
    out = (
        pivot_counts(_ds(rows), "g", "c", ["a", "b"], num_partitions=4)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"g": "g1", "n_a": 3, "n_b": 2},
        {"g": "g2", "n_a": 0, "n_b": 1},
    ]


def test_negative_samples_deterministic_and_self_free(ray_session):
    rows = [{"id": i} for i in range(50)]
    out = (
        negative_samples(_ds(rows), "id", n_items=50, k=3, seed=9)
        .to_pandas().sort_values(["id", "j"]).reset_index(drop=True)
    )
    assert len(out) == 150
    assert (out["neg_id"] != out["id"]).all()
    assert out["neg_id"].between(0, 49).all()
    # pure function of (id, j, seed): mirrors the kernel exactly
    base = out["id"].to_numpy().astype(np.uint64) * np.uint64(3) + out["j"].to_numpy().astype(np.uint64)
    want = (shuffle_keys(base, 9, 0) % np.uint64(50)).astype(np.int64)
    hit = want == out["id"].to_numpy()
    want[hit] = (want[hit] + 1) % 50
    assert (out["neg_id"].to_numpy() == want).all()


def test_weighted_bernoulli_sample(ray_session):
    from mex_extractors_ray.stages.sampling import weighted_bernoulli_sample
    from mex_extractors_ray.stages.shuffle import shuffle_keys

    rows = [{"id": i, "w": (i * 7) % 120} for i in range(500)]
    out = (
        weighted_bernoulli_sample(_ds(rows), "id", "w", den=100, seed=3)
        .to_pandas()
    )
    kept = set(out["id"]) if len(out) else set()
    coins = shuffle_keys(np.arange(500, dtype=np.int64), 3, 0) % np.uint64(100)
    want = {i for i in range(500) if coins[i] < min((i * 7) % 120, 100)}
    assert kept == want
    # weight >= den rows are always kept
    assert all(i in kept for i in range(500) if (i * 7) % 120 >= 100)
