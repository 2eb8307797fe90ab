"""Lineage + drift-check tests (reference: pipeline/checks/main.py rules)."""

import pyarrow as pa
import pytest

from mex_extractors_ray.cdc.apply import METRICS_SCHEMA
from mex_extractors_ray.state import checks


def _metrics(row_counts: list[int]) -> pa.Table:
    rows = [
        {
            "partition": i, "rows_in": rc, "late_dropped": 0, "upserts": rc,
            "deletes": 0, "row_count": rc, "tombstone_count": 0, "last_lsn": 10,
            "schema_version": 3, "noop": False,
        }
        for i, rc in enumerate(row_counts)
    ]
    return pa.Table.from_pylist(rows, schema=METRICS_SCHEMA)


def test_lineage_append_and_totals(tmp_path):
    checks.append_lineage(tmp_path, _metrics([10, 20]), run_id="001")
    checks.append_lineage(tmp_path, _metrics([15, 20]), run_id="002")
    lin = checks.read_lineage(tmp_path)
    assert lin.num_rows == 4
    assert checks.run_totals(lin) == [("001", 30), ("002", 35)]


def test_static_rules(tmp_path):
    checks.append_lineage(tmp_path, _metrics([5]), run_id="001")
    v = checks.evaluate_checks(tmp_path, [{"type": "x_items_less_than", "value": 10}])
    assert v and v[0]["rule"] == "x_items_less_than"
    assert checks.evaluate_checks(tmp_path, [{"type": "x_items_less_than", "value": 3}]) == []


def test_drift_rules_blocking(tmp_path):
    checks.append_lineage(tmp_path, _metrics([100]), run_id="001")
    checks.append_lineage(tmp_path, _metrics([40]), run_id="002")  # -60%
    rules = [{"type": "x_percent_less_than", "value": 50}]
    v = checks.evaluate_checks(tmp_path, rules)
    assert v and v[0]["rule"] == "x_percent_less_than"
    with pytest.raises(checks.DriftCheckError):
        checks.assert_checks(tmp_path, rules)
    # growth rule
    checks.append_lineage(tmp_path, _metrics([400]), run_id="003")  # +900%
    v = checks.evaluate_checks(tmp_path, [{"type": "x_percent_more_than", "value": 100}])
    assert v


def test_skew_report():
    rep = checks.partition_skew_report(_metrics([10, 10, 40]))
    assert rep["rows_total"] == 60
    assert rep["rows_max"] == 40
    assert rep["skew_ratio"] == pytest.approx(2.0)
