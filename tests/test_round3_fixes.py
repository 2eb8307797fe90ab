"""Round-3 correctness fixes: null-safe run boundaries, NULL-partition SQL
reads, window timestamp contract, null-text quality features, large_list
rewrite, vectorized collect_distinct_sorted, enrichment miss side-stream,
absolute drift rules, YAML config loaders."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from mex_extractors_ray.config import (
    check_yaml_to_rules,
    filter_yaml_to_rules,
    mapping_yaml_to_vocab_specs,
)
from mex_extractors_ray.sources.sql import duckdb_factory, read_sql_table
from mex_extractors_ray.stages import aggregates, dedup, enrich, filters, vocab, windows
from mex_extractors_ray.stages.rewrite import ReferenceRewriter
from mex_extractors_ray.stages.text import QualityScore
from mex_extractors_ray.state import checks


# --- null-safe run boundaries ------------------------------------------------


def test_run_starts_null_keys():
    # nulls form their own run; null-vs-null stays one run
    col = pa.array(["a", "a", "b", None, None])
    assert list(dedup._run_starts(col)) == [True, False, True, True, False]


def test_exact_dedup_keeps_null_key_rows(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"k": ["a", "a", None, None, "b"], "v": [1, 2, 3, 4, 5]})
    )
    out = dedup.exact_dedup(ds, "k", order_by="v").to_pandas()
    # one row per key INCLUDING the null key (previously silently dropped)
    assert len(out) == 3
    assert out.loc[out["k"].isna(), "v"].tolist() == [3]


def test_uniqueness_violations_counts_null_keys(ray_session):
    ds = ray.data.from_arrow(pa.table({"k": [None, None, "x"], "v": [1, 2, 3]}))
    out = dedup.uniqueness_violations(ds, "k").to_pandas()
    assert len(out) == 1 and out["n"].iloc[0] == 2


# --- SQL reader: NULL partition keys + non-integer bounds --------------------


@pytest.fixture()
def nulldb(tmp_path):
    path = str(tmp_path / "n.duckdb")
    con = duckdb.connect(path)
    con.execute(
        "CREATE TABLE t AS SELECT CASE WHEN i % 5 = 0 THEN NULL ELSE i END AS pk, "
        "i AS payload FROM range(0, 100) r(i)"
    )
    con.execute("CREATE TABLE ft AS SELECT i * 0.5 - 2.5 AS pk, i AS payload FROM range(0, 10) r(i)")
    con.close()
    return path


def test_partitioned_read_keeps_null_keys(ray_session, nulldb):
    out = read_sql_table(
        "t", duckdb_factory(nulldb), partition_column="pk", num_partitions=4
    ).to_pandas()
    assert len(out) == 100  # 20 NULL-pk rows included
    assert out["pk"].isna().sum() == 20


def test_partitioned_read_rejects_float_bounds(ray_session, nulldb):
    with pytest.raises(ValueError, match="non-integer bounds"):
        read_sql_table("ft", duckdb_factory(nulldb), partition_column="pk")


# --- window timestamp contract ----------------------------------------------


def test_epoch_seconds_int_passthrough_and_reject():
    sec = windows._epoch_seconds(pa.array([0, 60, 3600], pa.int64()))
    assert sec.tolist() == [0, 60, 3600]
    ts = pa.array([pd.Timestamp("1970-01-01 00:01:00")])
    assert windows._epoch_seconds(pa.chunked_array([ts]))[0] == 60
    with pytest.raises(TypeError, match="timestamp"):
        windows._epoch_seconds(pa.array(["not a time"]))


# --- quality score null text -------------------------------------------------


def test_quality_score_null_text():
    out = QualityScore()(pa.table({"text": ["hello world", None, ""]}))
    assert out["n_chars"].to_pylist() == [11, 0, 0]
    assert out["n_punct"].to_pylist()[1] == 0
    q = out["quality"].to_pylist()
    assert all(0.0 <= v <= 1.0 for v in q)


# --- large_list rewrite keeps int64 offsets ----------------------------------


def test_rewrite_large_list_preserves_type():
    batch = pa.table(
        {
            "entity_type": ["Activity"],
            "contact": pa.array([["bad", "ok"]], pa.large_list(pa.string())),
        }
    )
    rw = ReferenceRewriter({"Activity": ["contact"]}, "entity_type", allowed={"ok"},
                           fallback="fb")
    out = rw(batch)
    assert pa.types.is_large_list(out["contact"].type)
    assert out["contact"].to_pylist() == [["fb", "ok"]]


# --- collect_distinct_sorted (coarse shuffle + run-boundary kernel) ----------


def test_collect_distinct_sorted_vectorized(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50, size=2000)
    vals = rng.choice(list("abcdefgh"), size=2000)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([f"u{k}" for k in keys]), "v": pa.array(vals)})
    )
    out = aggregates.collect_distinct_sorted(ds, "k", "v", out="vs").to_pandas()
    expect = (
        pd.DataFrame({"k": [f"u{k}" for k in keys], "v": vals})
        .groupby("k")["v"]
        .apply(lambda s: ",".join(sorted(set(s))))
        .reset_index(name="vs")
    )
    got = out.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect.sort_values("k").reset_index(drop=True))


# --- enrichment miss side-stream --------------------------------------------


def test_miss_sink_exactly_once_under_redelivery(tmp_path):
    import pyarrow.parquet as pq

    sink = enrich.DirectoryMissSink(tmp_path / "misses")
    calls = []
    enricher = enrich.CachedEnricher(
        lambda k: f"v:{k}", "k", "out", maxsize=64, miss_sink=sink
    )
    batch = pa.table({"k": ["a", "b", "a"]})
    enricher(batch)
    enricher(batch)  # re-delivery: cache hits, no new misses
    files = sorted((tmp_path / "misses").glob("miss-*.parquet"))
    assert len(files) == 2  # one per distinct key, not per delivery
    got = {r["k"]: r["out"] for f in files for r in pq.read_table(f).to_pylist()}
    assert got == {"a": "v:a", "b": "v:b"}

    # a SECOND actor re-resolving the same key overwrites the identical file
    enricher2 = enrich.CachedEnricher(
        lambda k: f"v:{k}", "k", "out", maxsize=64, miss_sink=sink
    )
    enricher2(pa.table({"k": ["a"]}))
    assert len(sorted((tmp_path / "misses").glob("miss-*.parquet"))) == 2


# --- absolute drift rules ----------------------------------------------------


def _lineage(tmp_path, totals):
    for i, n in enumerate(totals):
        checks.append_lineage(
            tmp_path, pa.table({"partition": [0], "row_count": [n]}), f"r{i:03d}"
        )


def test_abs_drift_rules(tmp_path):
    _lineage(tmp_path, [1000, 850])
    v = checks.evaluate_checks(
        tmp_path,
        [
            {"type": "x_items_abs_decrease_more_than", "value": 100},
            {"type": "x_items_abs_increase_more_than", "value": 100},
            {"type": "x_items_abs_change_more_than", "value": 200},
        ],
    )
    assert [x["rule"] for x in v] == ["x_items_abs_decrease_more_than"]
    assert v[0]["observed_delta"] == -150


# --- YAML loaders ------------------------------------------------------------


MAPPING_YAML = """
accessRestriction:
  - fieldInPrimarySource: zugang
    mappingRules:
      - forValues:
          - "protected"
        setValues: https://mex.rki.de/item/access-restriction-2
      - setValues: open
theme:
  - mappingRules:
      - rule: leave as is
"""

FILTER_YAML = """
fields:
  - fieldInPrimarySource: externalAssociate
    filterRules:
    - forValues:
      - "Erika Mustermann"
      rule:
  - fieldInPrimarySource: start
    filterRules:
    - forValues:
      - ' < 1890'
      rule:
"""


def test_mapping_yaml_to_vocab_specs_and_translate():
    specs = mapping_yaml_to_vocab_specs(MAPPING_YAML)
    assert len(specs) == 1  # theme has no value rules
    (spec,) = specs
    assert spec["column"] == "zugang" and spec["out"] == "accessRestriction"
    out = vocab.VocabMapper(specs)(pa.table({"zugang": ["protected", "frei"]}))
    assert out["accessRestriction"].to_pylist() == [
        "https://mex.rki.de/item/access-restriction-2",
        "open",
    ]


def test_filter_yaml_to_rules_applies():
    rules = filter_yaml_to_rules(FILTER_YAML)
    names = {r["name"] for r in rules}
    assert names == {"externalAssociate_blocklist", "start_year_<_1890"}
    batch = pa.table(
        {"externalAssociate": ["Erika Mustermann", "ok", "ok"],
         "start": [1950, 1700, 1950]}
    )
    tagged = filters.RuleFilter(rules)(batch)
    assert tagged["_reject_reason"].to_pylist() == [
        "externalAssociate_blocklist", "start_year_<_1890", None,
    ]


def test_check_yaml_to_rules_shapes():
    assert check_yaml_to_rules("- {type: x_items_less_than, value: 5}") == [
        {"type": "x_items_less_than", "value": 5}
    ]
    assert check_yaml_to_rules("x_items_abs_change_more_than: {value: 10}") == [
        {"type": "x_items_abs_change_more_than", "value": 10}
    ]


def test_empty_block_schema_filter_keeps_real_mismatches():
    """The executor-warning filter drops ONLY the zero-column-bundle noise;
    a genuine mismatch between two non-empty schemas must still log."""
    import logging

    from mex_extractors_ray.runtime import _EmptyBlockSchemaNoise

    f = _EmptyBlockSchemaNoise()

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, "x", 1, msg, None, None)

    noise_new = rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64\nb: double, new schema: . "
        "This may lead to unexpected behavior."
    )
    noise_prev = rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: , new schema: a: int64. "
        "This may lead to unexpected behavior."
    )
    real = rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64, new schema: a: double. "
        "This may lead to unexpected behavior."
    )
    other = rec("some unrelated warning")
    assert f.filter(noise_new) is False
    assert f.filter(noise_prev) is False
    assert f.filter(real) is True
    assert f.filter(other) is True
