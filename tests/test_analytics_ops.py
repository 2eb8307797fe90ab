"""Markov transitions, cohort retention, exact-integer z-score gate,
grouped mode, full-outer bucketed join — the session-5 analytics wave
(sequence statistics + statistical gating over the SURVEY.md §2.6/§2.5
kernel family)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mex_extractors_ray.stages.aggregates import (
    grouped_count,
    keyed_topk,
    zscore_outliers,
)
from mex_extractors_ray.stages.joins import bucketed_join
from mex_extractors_ray.stages.sessions import cohort_retention, keyed_transitions


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


def _t(s):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)


# ---------------------------------------------------------------- transitions


def _brute_transitions(rows):
    out = {}
    by_key = {}
    for r in rows:
        by_key.setdefault(r["u"], []).append(r)
    for evs in by_key.values():
        evs.sort(key=lambda r: (r["ts"], r["eid"]))
        for a, b in zip(evs, evs[1:]):
            out[(a["ty"], b["ty"])] = out.get((a["ty"], b["ty"]), 0) + 1
    return out


def test_keyed_transitions_vs_brute_force(ray_session):
    rng = np.random.default_rng(7)
    rows = [
        {
            "u": int(rng.integers(0, 23)),
            "ts": _t(int(rng.integers(0, 900))),
            "eid": i,
            "ty": f"t{int(rng.integers(0, 5))}",
        }
        for i in range(800)
    ]
    got = (
        keyed_transitions(_ds(rows), "u", "ts", "ty", order_cols=("eid",),
                          num_partitions=8)
        .to_pandas()
    )
    expect = _brute_transitions(rows)
    assert len(got) == len(expect)
    for _, r in got.iterrows():
        assert expect[(r["from_type"], r["to_type"])] == r["n"]


def test_keyed_transitions_single_event_keys_emit_nothing(ray_session):
    rows = [{"u": i, "ts": _t(i), "eid": i, "ty": "x"} for i in range(5)]
    got = keyed_transitions(_ds(rows), "u", "ts", "ty", num_partitions=4).to_pandas()
    assert len(got) == 0


def test_keyed_transitions_tie_break_is_deterministic(ray_session):
    # two events share a timestamp; eid orders them a(1) -> b(2)
    rows = [
        {"u": 1, "ts": _t(0), "eid": 2, "ty": "b"},
        {"u": 1, "ts": _t(0), "eid": 1, "ty": "a"},
    ]
    got = keyed_transitions(_ds(rows), "u", "ts", "ty", order_cols=("eid",),
                            num_partitions=2).to_pandas()
    assert got.to_dict("records") == [{"from_type": "a", "to_type": "b", "n": 1}]


# ------------------------------------------------------------------- cohorts


def _brute_retention(rows):
    days = {}
    for r in rows:
        d = (r["ts"] - pd.Timestamp("1970-01-01")).days
        days.setdefault(r["u"], set()).add(d)
    out = {}
    for ds_ in days.values():
        c = min(ds_)
        for d in ds_:
            key = (c, d - c)
            out[key] = out.get(key, 0) + 1
    return {
        ((pd.Timestamp("1970-01-01") + pd.Timedelta(days=c)).strftime("%Y-%m-%d"), o): n
        for (c, o), n in out.items()
    }


def test_cohort_retention_vs_brute_force(ray_session):
    rng = np.random.default_rng(13)
    rows = [
        {
            "u": int(rng.integers(0, 40)),
            "ts": _t(int(rng.integers(0, 86400 * 12))),
        }
        for _ in range(600)
    ]
    got = cohort_retention(_ds(rows), "u", "ts", num_partitions=8).to_pandas()
    expect = _brute_retention(rows)
    assert len(got) == len(expect)
    for _, r in got.iterrows():
        assert expect[(r["cohort_day"], r["offset_days"])] == r["n_users"]


def test_cohort_retention_counts_each_user_once_per_offset(ray_session):
    # one user active twice on the same day: still one row, n_users == 1
    rows = [
        {"u": 1, "ts": _t(10)},
        {"u": 1, "ts": _t(20)},
        {"u": 1, "ts": _t(86400 + 5)},
    ]
    got = (
        cohort_retention(_ds(rows), "u", "ts", num_partitions=2)
        .to_pandas()
        .sort_values("offset_days")
        .reset_index(drop=True)
    )
    assert got["offset_days"].tolist() == [0, 1]
    assert got["n_users"].tolist() == [1, 1]
    assert set(got["cohort_day"]) == {"2024-01-01"}


# -------------------------------------------------------------------- zscore


def _brute_zscore(rows, z):
    from collections import defaultdict

    by_g = defaultdict(list)
    for r in rows:
        by_g[r["g"]].append(r["x"])
    keep = []
    for r in rows:
        xs = by_g[r["g"]]
        n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
        if abs(n * r["x"] - s) > math.isqrt(z * z * (n * q - s * s)):
            keep.append((r["g"], r["x"], r["i"]))
    return sorted(keep)


@pytest.mark.parametrize("z", [1, 2])
def test_zscore_outliers_vs_brute_force(ray_session, z):
    rng = np.random.default_rng(5)
    rows = [
        {"g": f"g{int(rng.integers(0, 4))}", "x": int(rng.integers(0, 200)), "i": i}
        for i in range(500)
    ]
    got = zscore_outliers(_ds(rows), "g", "x", z=z, num_partitions=4).to_pandas()
    # uniform data has no 2σ tail: the z=2 leg legitimately returns empty,
    # and Ray drops the schema of an all-empty dataset (columns vanish)
    got_rows = sorted(zip(got["g"], got["x"], got["i"])) if len(got) else []
    expect = _brute_zscore(rows, z)
    assert got_rows == expect
    if z == 1:
        assert len(expect) > 0  # keep the z=1 leg non-vacuous


def test_zscore_outliers_exact_boundary():
    # boundary case |d| == threshold is NOT an outlier (strict >), checked
    # through the same int identity the kernel uses
    # group: [0, 0, 6] -> n=3, s=6, q=36; var_num = 3*36-36 = 72
    # x=6: |3*6-6| = 12; isqrt(1*72) = 8 -> outlier at z=1
    # z=2: isqrt(4*72)=16 -> 12 > 16 false -> not an outlier
    assert 12 > math.isqrt(72)
    assert not 12 > math.isqrt(4 * 72)


def test_zscore_outliers_refuses_floats(ray_session):
    rows = [{"g": "a", "x": 1.5}]
    with pytest.raises(Exception, match="integer columns only"):
        zscore_outliers(_ds(rows), "g", "x").to_pandas()


# ---------------------------------------------------------------------- mode


def test_grouped_mode_via_keyed_topk(ray_session):
    rows = (
        [{"u": 1, "ty": "a"}] * 3
        + [{"u": 1, "ty": "b"}] * 5
        + [{"u": 2, "ty": "x"}] * 2
        + [{"u": 2, "ty": "w"}] * 2  # tie: w < x wins
    )
    counts = grouped_count(_ds(rows), ["u", "ty"], alias="n")
    top = keyed_topk(counts, "u", [("n", "descending"), ("ty", "ascending")],
                     k=1, num_partitions=2).to_pandas()
    got = {r["u"]: (r["ty"], r["n"]) for _, r in top.iterrows()}
    assert got == {1: ("b", 5), 2: ("w", 2)}


# ---------------------------------------------------------------- full outer


def test_bucketed_join_full_outer_both_sides_survive(ray_session):
    left = [{"k": 1, "a": 10}, {"k": 2, "a": 20}]
    right = [{"k": 2, "b": 200}, {"k": 3, "b": 300}]
    ds = bucketed_join(_ds(left), _ds(right), on="k", num_buckets=4, how="outer")
    # typed nulls INSIDE the pipeline: blocks stay int64 nullable (no float
    # widening) — Dataset.to_pandas() at the very end may still widen, but
    # that is final presentation, not the join
    t = pa.concat_tables(
        [pa.Table.from_pandas(b.to_pandas()) if not isinstance(b, pa.Table) else b
         for b in ds.iter_batches(batch_format="pyarrow")]
    )
    assert pa.types.is_integer(t.schema.field("a").type)
    assert pa.types.is_integer(t.schema.field("b").type)
    got = t.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [1, 2, 3]
    assert got["a"].tolist()[1] == 20 and got["b"].tolist()[1] == 200
    assert pd.isna(got["b"][0]) and pd.isna(got["a"][2])


# ----------------------------------------------------------------- triangles


def _brute_triangles(edges):
    es = set()
    for e in edges:
        u, v = e["a"], e["b"]
        if u != v:
            es.add((min(u, v), max(u, v)))
    nodes = sorted({x for e in es for x in e})
    out = []
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) not in es:
                continue
            for w in nodes:
                if w > v and (u, w) in es and (v, w) in es:
                    out.append((u, v, w))
    return sorted(out)


def test_triangles_vs_brute_force(ray_session):
    from mex_extractors_ray.stages.components import triangles

    rng = np.random.default_rng(3)
    edges = [
        {"a": int(rng.integers(0, 30)), "b": int(rng.integers(0, 30))}
        for _ in range(160)
    ]
    got = triangles(_ds(edges), num_partitions=4).to_pandas()
    got_t = sorted(zip(got["a"], got["b"], got["c"])) if len(got) else []
    expect = _brute_triangles(edges)
    assert got_t == expect
    assert len(expect) > 0  # non-vacuous at this density


def test_triangles_counts_each_once_on_clique(ray_session):
    from mex_extractors_ray.stages.components import triangles

    # K5 has exactly C(5,3) = 10 triangles; duplicated + reversed edges
    # must not inflate the count
    edges = []
    for u in range(5):
        for v in range(u + 1, 5):
            edges.append({"a": u, "b": v})
            edges.append({"a": v, "b": u})  # reversed duplicate
    got = triangles(_ds(edges), num_partitions=3).to_pandas()
    assert len(got) == 10
    assert sorted(zip(got["a"], got["b"], got["c"])) == _brute_triangles(edges)


def test_triangles_hub_star_is_triangle_free(ray_session):
    from mex_extractors_ray.stages.components import triangles

    # star around a hub: zero triangles, and the degree orientation points
    # every edge AWAY from the leaves (hub has max degree), so the hub
    # emits no wedges — the skew guarantee in action
    edges = [{"a": 0, "b": i} for i in range(1, 40)]
    got = triangles(_ds(edges), num_partitions=4).to_pandas()
    assert len(got) == 0


# ---------------------------------------------------------------- covariance


def test_price_qty_covariance_truncating_division_matches_duckdb():
    import duckdb

    # the kernel divides |num| // den with the sign re-applied (truncation
    # toward zero); DuckDB's // on HUGEINT must agree on negatives
    for num in (-7, -8, 7, 8, 0):
        q = abs(num) // 2
        mine = q if num >= 0 else -q
        theirs = duckdb.sql(f"SELECT CAST({num} AS HUGEINT) // 2").fetchone()[0]
        assert mine == theirs
