"""Vocab/value-mapping stage (the reference's {forValues, setValues, rule}
mapping-YAML discipline — assets/mappings/synopse/resource.yaml:10-16,
consumed mex/extractors/ifsg/transform.py:96-101)."""

import pyarrow as pa

from mex_extractors_ray.stages.vocab import FieldMapping, VocabMapper, vocab_sql_case


def test_first_wins_precedence_and_default():
    spec = {
        "column": "v",
        "out": "m",
        "rules": [
            {"forValues": ["a", "b"], "setValue": "one"},
            {"forValues": ["b", "c"], "setValue": "two"},  # b shadowed by rule 1
            {"setValue": "fallback"},
        ],
    }
    t = pa.table({"v": ["a", "b", "c", "zzz", None]})
    out = VocabMapper([spec])(t)
    assert out["m"].to_pylist() == ["one", "one", "two", "fallback", "fallback"]


def test_no_default_yields_null_and_passthrough_keeps_source():
    t = pa.table({"v": ["a", "x", None]})
    no_default = VocabMapper([{"column": "v", "out": "m", "rules": [{"forValues": ["a"], "setValue": "A"}]}])(t)
    assert no_default["m"].to_pylist() == ["A", None, None]
    passthrough = VocabMapper(
        [{"column": "v", "out": "m", "passthrough": True, "rules": [{"forValues": ["a"], "setValue": "A"}]}]
    )(t)
    assert passthrough["m"].to_pylist() == ["A", "x", None]


def test_in_place_replacement_and_multi_field():
    specs = [
        {"column": "v", "rules": [{"forValues": ["a"], "setValue": "A"}, {"setValue": "o"}]},
        {"column": "w", "out": "w2", "rules": [{"forValues": ["1"], "setValue": "one"}]},
    ]
    t = pa.table({"v": ["a", "b"], "w": ["1", "2"]})
    out = VocabMapper(specs)(t)
    assert out["v"].to_pylist() == ["A", "o"]
    assert out["w2"].to_pylist() == ["one", None]
    assert out["w"].to_pylist() == ["1", "2"]  # source untouched when out differs


def test_sql_case_mirrors_translate():
    import duckdb

    spec = {
        "column": "v",
        "rules": [
            {"forValues": ["a", "b"], "setValue": "one"},
            {"forValues": ["b", "c"], "setValue": "two"},
            {"setValue": "dflt"},
        ],
    }
    vals = ["a", "b", "c", "q", None]
    got = FieldMapping(spec).translate(pa.array(vals)).to_pylist()
    case = vocab_sql_case(spec)
    values = ", ".join("(NULL)" if v is None else f"('{v}')" for v in vals)
    exp = [r[0] for r in duckdb.sql(
        f"SELECT {case} FROM (VALUES {values}) t(v)"
    ).fetchall()]
    # NULL source: translate() falls to default; SQL CASE x = 'a' is NULL → ELSE too
    assert got == exp
