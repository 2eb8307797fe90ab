"""Reference-rewrite by entity-type field matrix
(``mex/extractors/publisher/transform.py:54-115`` + ``fields.py:9-21``)."""

import pyarrow as pa

from mex_extractors_ray.stages.rewrite import ReferenceRewriter, rewrite_references


def _rw(**kw):
    base = dict(
        fields_by_type={"Activity": ["contact"], "Resource": ["contact", "creators"]},
        type_col="etype",
        allowed={"p1", "p2"},
        replacement={"gone1": "unit1"},
        fallback="fb",
    )
    base.update(kw)
    return ReferenceRewriter(**base)


def test_scalar_rewrite_respects_type_matrix():
    t = pa.table(
        {
            "etype": ["Activity", "Activity", "Activity", "Contact"],
            "contact": ["p1", "gone1", "gone2", "gone2"],
        }
    )
    out = _rw()(t)
    # allowed kept; replacement map wins over fallback; untouched type kept
    assert out["contact"].to_pylist() == ["p1", "unit1", "fb", "gone2"]


def test_list_rewrite_elementwise_preserves_nulls():
    t = pa.table(
        {
            "etype": ["Resource", "Resource", "Resource"],
            "contact": ["p1", "p1", "p1"],
            "creators": pa.array([["p1", "gone1", "zz"], [], None],
                                 pa.list_(pa.string())),
        }
    )
    out = _rw()(t)
    assert out["creators"].to_pylist() == [["p1", "unit1", "fb"], [], None]


def test_missing_field_and_absent_type_are_noops():
    t = pa.table({"etype": ["Other"], "contact": ["gone2"]})
    out = _rw()(t)
    assert out["contact"].to_pylist() == ["gone2"]


def test_rewrite_pipeline(ray_session):
    import ray.data

    rows = [
        {"etype": "Activity", "contact": "p1"},
        {"etype": "Activity", "contact": "dangling"},
    ] * 10
    ds = ray.data.from_items(rows)
    out = rewrite_references(
        ds, {"Activity": ["contact"]}, "etype", allowed={"p1"}, fallback="fb"
    ).to_pandas()
    assert set(out["contact"]) == {"p1", "fb"}
