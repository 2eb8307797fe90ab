"""Round-5 advisor fixes: malformed JSON float/string literals are
misses (delimiter-anchored patterns), apply_bpe_merge preserves
large_list offset width, union_by_name refuses unmappable schema types,
and _distinct_setop keeps a typed schema on empty results."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


def _ds(tbl):
    return ray.data.from_arrow(tbl)


# --- jsonx: delimiter anchors -------------------------------------------


def test_json_float_malformed_literal_is_miss(ray_session):
    from mex_extractors_ray.stages.jsonx import json_scalar_field

    t = pa.table({"j": [
        '{"k": 1.5}',          # valid
        '{"k": 1.2.3}',        # malformed: must be null, not 1.2
        '{"k": 5x, "o": 1}',   # malformed: must be null, not 5.0
        '{"k": -2e3, "o": 1}', # valid scientific
        '{"k": 7}',            # int literal is a valid float
    ]})
    out = json_scalar_field(_ds(t), "j", "k", "v", "float64").to_pandas()
    assert out["v"].tolist()[0] == 1.5
    assert pd.isna(out["v"].tolist()[1])
    assert pd.isna(out["v"].tolist()[2])
    assert out["v"].tolist()[3] == -2000.0
    assert out["v"].tolist()[4] == 7.0


def test_json_string_trailing_junk_is_miss(ray_session):
    from mex_extractors_ray.stages.jsonx import json_scalar_field

    t = pa.table({"j": [
        '{"k": "ab"}',
        '{"k": "ab"x}',        # junk after the closing quote: miss
        '{"k": "cd", "o": 1}',
    ]})
    out = json_scalar_field(_ds(t), "j", "k", "v", "string").to_pandas()
    assert out["v"].tolist()[0] == "ab"
    assert out["v"].tolist()[1] is None
    assert out["v"].tolist()[2] == "cd"


# --- tokens: large_list offset preservation ------------------------------


def test_apply_bpe_merge_preserves_large_list(ray_session):
    from mex_extractors_ray.stages.tokens import apply_bpe_merge

    vals = pa.array([1, 2, 3, 1, 2, 1, 2, 2], pa.int32())
    col = pa.LargeListArray.from_arrays(
        pa.array([0, 3, 5, 8], pa.int64()), vals)
    t = pa.table({"doc_id": ["a", "b", "c"], "tokens": col})
    out = apply_bpe_merge(_ds(t), (1, 2), 99).to_pandas()
    got = {d: list(v) for d, v in zip(out["doc_id"], out["tokens"])}
    assert got == {"a": [99, 3], "b": [99], "c": [99, 2]}
    # the Arrow schema stays large_list across the merge
    sch = apply_bpe_merge(_ds(t), (1, 2), 99).schema()
    assert pa.types.is_large_list(sch.base_schema.field("tokens").type)


def test_apply_bpe_merge_keeps_plain_list(ray_session):
    from mex_extractors_ray.stages.tokens import apply_bpe_merge

    t = pa.table({"tokens": pa.array([[1, 1, 1]], pa.list_(pa.int32()))})
    res = apply_bpe_merge(_ds(t), (1, 1), 7)
    assert pa.types.is_list(res.schema().base_schema.field("tokens").type)
    assert res.to_pandas()["tokens"].tolist()[0].tolist() == [7, 1]


# --- reshape: refuse unmappable types ------------------------------------


def test_union_by_name_refuses_unmappable_dtype(ray_session):
    from mex_extractors_ray.stages.reshape import union_by_name

    class FakeSchema:
        names = ["a"]
        types = [np.dtype([("x", "i4")])]  # structured dtype: unmappable

    class FakeDs:
        def schema(self):
            return FakeSchema()

    with pytest.raises(TypeError, match="cannot map schema type"):
        union_by_name([FakeDs()])


def test_union_by_name_maps_object_dtype_to_string(ray_session):
    # pandas-backed blocks report str columns as dtype('O') — must keep
    # unioning as string (the established pandas convention), not refuse
    import ray

    from mex_extractors_ray.stages.reshape import union_by_name

    left = ray.data.from_pandas(pd.DataFrame({"k": ["a", "b"]}))
    right = ray.data.from_pandas(pd.DataFrame({"k": ["c"], "v": [1]}))
    out = union_by_name([left, right]).to_pandas()
    assert sorted(out["k"]) == ["a", "b", "c"]
    assert out["v"].isna().sum() == 2


# --- joins: typed empty set-op result ------------------------------------


def test_empty_setop_keeps_schema(ray_session):
    from mex_extractors_ray.runtime import typed_to_pandas
    from mex_extractors_ray.stages.joins import (
        except_distinct,
        intersect_distinct,
    )

    left = _ds(pa.table({"k": pa.array([1, 2], pa.int64()),
                         "s": ["x", "y"]}))
    right = _ds(pa.table({"k": pa.array([3, 4], pa.int64()),
                          "s": ["z", "w"]}))
    inter = intersect_distinct(left, right, ["k", "s"], num_partitions=4)
    # the Dataset itself carries the typed schema even when empty
    base = inter.schema().base_schema
    assert base.names == ["k", "s"]
    assert base.field("k").type == pa.int64()
    df = typed_to_pandas(inter)
    assert df.empty
    assert list(df.columns) == ["k", "s"]
    assert df["k"].dtype == np.int64

    # EXCEPT where everything matches: also empty, also typed
    ex = typed_to_pandas(except_distinct(left, left, ["k"],
                                         num_partitions=4))
    assert ex.empty and list(ex.columns) == ["k"]
    assert ex["k"].dtype == np.int64

    # non-empty path unchanged
    both = typed_to_pandas(intersect_distinct(left, left, ["k", "s"],
                                              num_partitions=4))
    assert sorted(both["k"].tolist()) == [1, 2]
