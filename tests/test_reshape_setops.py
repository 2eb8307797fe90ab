"""Unit tests for wide→long melt (UNPIVOT) and the row-level DISTINCT
set ops (SQL INTERSECT / EXCEPT)."""

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
