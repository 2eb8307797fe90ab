"""Unit tests for wide→long melt (UNPIVOT) and the row-level DISTINCT
set ops (SQL INTERSECT / EXCEPT)."""

import pandas as pd
import pyarrow as pa
import pytest

from mex_extractors_ray.stages.joins import except_distinct, intersect_distinct
from mex_extractors_ray.stages.reshape import melt


def _rows(ds, cols):
    df = ds.to_pandas()
    return sorted(map(tuple, df[cols].itertuples(index=False)))


def test_melt_roundtrips_wide_rows(ray_session):
    import ray.data

    wide = pa.table({
        "day": ["d1", "d2"],
        "n_a": [1, 0],
        "n_b": [5, 7],
    })
    long = melt(ray.data.from_arrow(wide), ["day"], ["n_a", "n_b"],
                var_col="measure", val_col="n").to_pandas()
    got = sorted(map(tuple, long.itertuples(index=False)))
    assert got == [("d1", "n_a", 1), ("d1", "n_b", 5),
                   ("d2", "n_a", 0), ("d2", "n_b", 7)]


def test_melt_rejects_mixed_types(ray_session):
    import ray.data

    wide = pa.table({"k": ["x"], "a": [1], "b": ["s"]})
    with pytest.raises((TypeError, Exception)):
        melt(ray.data.from_arrow(wide), ["k"], ["a", "b"]).to_pandas()


def test_intersect_and_except_distinct(ray_session):
    import ray.data

    # duplicates on both sides must collapse (SQL DISTINCT semantics)
    left = ray.data.from_arrow(pa.table({"u": [1, 1, 2, 3, 3, 4]}))
    right = ray.data.from_arrow(pa.table({"u": [2, 2, 3, 5]}))
    assert _rows(intersect_distinct(left, right, ["u"], num_partitions=4),
                 ["u"]) == [(2,), (3,)]
    assert _rows(except_distinct(left, right, ["u"], num_partitions=4),
                 ["u"]) == [(1,), (4,)]


def test_setops_composite_key_and_nulls(ray_session):
    import ray.data

    # NULL keys compare equal (form their own group), matching SQL set-op
    # semantics where INTERSECT treats NULLs as equal
    left = ray.data.from_arrow(pa.table({
        "a": [1, 1, None, 2], "b": ["x", "x", "y", "z"]}))
    right = ray.data.from_arrow(pa.table({
        "a": [1, None, 9], "b": ["x", "y", "z"]}))
    import math

    inter = intersect_distinct(left, right, ["a", "b"], num_partitions=4)
    df = inter.to_pandas()
    # pandas turns int+null into float NaN; normalize before comparing
    norm = {
        ((None if (isinstance(x, float) and math.isnan(x)) else int(x)), y)
        for x, y in df[["a", "b"]].itertuples(index=False)}
    assert norm == {(None, "y"), (1, "x")}


def test_bag_setops_multiplicity(ray_session):
    import ray.data

    # left bag {1:3, 2:1, 3:2}, right bag {1:1, 3:4, 5:1}
    left = ray.data.from_arrow(pa.table({"u": [1, 1, 1, 2, 3, 3]}))
    right = ray.data.from_arrow(pa.table({"u": [1, 3, 3, 3, 3, 5]}))
    from mex_extractors_ray.stages.joins import except_all, intersect_all

    # INTERSECT ALL: min counts -> {1:1, 3:2}
    assert _rows(intersect_all(left, right, ["u"], num_partitions=4),
                 ["u"]) == [(1,), (3,), (3,)]
    # EXCEPT ALL: max(l-r, 0) -> {1:2, 2:1}
    assert _rows(except_all(left, right, ["u"], num_partitions=4),
                 ["u"]) == [(1,), (1,), (2,)]


def test_union_by_name_fills_missing(ray_session):
    import ray.data

    from mex_extractors_ray.stages.reshape import union_by_name

    a = ray.data.from_arrow(pa.table({"k": [1, 2], "x": ["a", "b"]}))
    b = ray.data.from_arrow(pa.table({"k": [3], "y": [9.5]}))
    df = union_by_name([a, b]).to_pandas().sort_values("k")
    assert list(df.columns) == ["k", "x", "y"]
    assert df["x"].tolist()[:2] == ["a", "b"] and df["x"].isna().tolist()[2]
    assert df["y"].isna().tolist()[:2] == [True, True]
    assert df["y"].tolist()[2] == 9.5

    c = ray.data.from_arrow(pa.table({"k": ["s"]}))
    with pytest.raises(TypeError):
        union_by_name([a, c])


def test_json_scalar_field_and_general(ray_session):
    import ray.data

    from mex_extractors_ray.stages.jsonx import json_fields, json_scalar_field

    t = pa.table({"p": ['{"k": 87, "s": "hi"}', '{"k": -3}',
                        '{"other": 1}', None]})
    ds = ray.data.from_arrow(t)
    got = json_scalar_field(ds, "p", "k", "k").to_pandas()["k"].tolist()
    assert got[0] == 87 and got[1] == -3
    assert pd.isna(got[2]) and pd.isna(got[3])
    got_s = json_scalar_field(ds, "p", "s", "s", out_type="string") \
        .to_pandas()["s"].tolist()
    assert got_s[0] == "hi" and all(pd.isna(v) for v in got_s[1:])

    nested = pa.table({"p": ['{"a": {"b": 5}}', '{"a": {}}', "not json"]})
    df = json_fields(ray.data.from_arrow(nested), "p",
                     {"ab": "a.b"}).to_pandas()
    vals = df["ab"].tolist()
    assert vals[0] == 5 and pd.isna(vals[1]) and pd.isna(vals[2])


def test_keyed_quantile_cont_matches_numpy(ray_session):
    import numpy as np
    import ray.data

    from mex_extractors_ray.stages.aggregates import keyed_quantile_cont

    rng = np.random.default_rng(7)
    k = rng.integers(0, 5, 200)
    v = np.round(rng.uniform(0, 100, 200), 2)
    ds = ray.data.from_arrow(pa.table({"k": k, "v": v}))
    out = keyed_quantile_cont(ds, "k", "v", qs=(0.5,), num_partitions=4) \
        .to_pandas().set_index("k")["v"]
    for key in range(5):
        grp = np.sort(v[k == key])
        # the kernel's exact expression (DuckDB-matching)
        pos = 0.5 * (len(grp) - 1)
        lo = int(np.floor(pos)); frac = pos - lo
        hi = min(lo + 1, len(grp) - 1)
        assert out.loc[key] == grp[lo] * (1.0 - frac) + grp[hi] * frac
