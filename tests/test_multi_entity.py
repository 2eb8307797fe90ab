"""Composed multi-entity ETL (pipelines/multi_entity.py): cross-entity id
wiring, checked loads with drift rules firing, and mint determinism.
The value-level parity is hash-checked by the catalog oracle
(``multi_entity_etl``); these tests cover the composition invariants and
the blocking-check behavior the oracle can't express."""

from pathlib import Path

import pyarrow.parquet as pq
import pytest

from mex_extractors_ray.pipelines import multi_entity as me
from mex_extractors_ray.state.checks import DriftCheckError

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def etl_result(ray_session, tmp_path_factory):
    out = tmp_path_factory.mktemp("me")
    t = me.multi_entity_etl(SF, out, run_id="r001")
    return t, out


def test_cross_entity_id_wiring(etl_result):
    t, _ = etl_result
    df = t.to_pandas()
    acts = df[df.entity_type == "act"]
    res = df[df.entity_type == "res"]
    vgs = df[df.entity_type == "vg"]
    assert len(acts) and len(res) and len(vgs)
    act_ids = set(acts.entity_id)
    # every child's parent_id is a minted activity id (the synopse wiring)
    assert set(res.parent_id) <= act_ids
    assert set(vgs.parent_id) <= act_ids
    # id namespaces are disjoint and prefixed
    assert acts.entity_id.str.startswith("act-").all()
    assert res.entity_id.str.startswith("res-").all()
    assert vgs.entity_id.str.startswith("vg-").all()
    # the rule filter dropped pending orders: no activity for a 'P' order
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    assert len(acts) == (orders.o_orderstatus != "P").sum()
    # rewrite fired: some supplier refs fell back, none outside allowed+fb
    sup = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    allowed = set(sup[sup.s_acctbal >= me.SUPPLIER_MIN_ACCTBAL].s_suppkey)
    rewritable = res[res.entity_class.isin(["returned", "accepted"])]
    assert (rewritable.n == me.REWRITE_FALLBACK).any()
    assert set(rewritable.n) <= allowed | {me.REWRITE_FALLBACK}
    # untouched class keeps raw refs (possibly outside the allowed set)
    assert (res[res.entity_class == "none"].n != me.REWRITE_FALLBACK).all()


def test_checked_loads_write_all_entities(etl_result):
    _, out = etl_result
    for name in ("activities", "resources", "variable_groups"):
        d = Path(out) / name
        files = list((d / "data-r001").glob("*.parquet"))
        assert files, name
        assert (d / "_lineage" / "run-r001.parquet").exists()


def test_drift_check_fires_on_shrunk_run(etl_result, ray_session, tmp_path):
    """The reference's blocking historical check: a second run that loses
    >50% of an entity's rows must raise (checks/main.py:120-218 analog)."""
    import ray.data

    _, out = etl_result
    acts = me.extract_activities(SF)
    # run 2 writes into the SAME lineage dirs as run 1 (etl_result above)
    import pyarrow.compute as pc

    shrunk = acts.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["o_orderkey"], 3), 0)),
        batch_format="pyarrow",
    )
    with pytest.raises(DriftCheckError):
        me.checked_load(shrunk, out, "activities", "r002",
                        me.DEFAULT_CHECK_RULES, blocking=True)
    # non-blocking mode reports instead of raising
    me.checked_load(shrunk, tmp_path, "activities", "r001",
                    me.DEFAULT_CHECK_RULES, blocking=False)


def test_mint_determinism_across_runs(ray_session):
    a1 = me.extract_activities(SF).to_pandas().sort_values("o_orderkey")
    a2 = me.extract_activities(SF).to_pandas().sort_values("o_orderkey")
    assert a1.activity_id.tolist() == a2.activity_id.tolist()


def test_summary_only_matches_full_union(etl_result, ray_session):
    """The production-scale return path: 3 rows of (count, commutative
    digest) must equal the same reduction computed locally from the
    full-union table — no entity row ever reaches the driver."""
    import numpy as np
    import pyarrow as pa

    from mex_extractors_ray.hashing import hash_string_array

    full, _ = etl_result
    s = me.multi_entity_etl(SF, None, run_id="r002", summary_only=True)
    assert s.column_names == ["entity_type", "n_rows", "digest"]
    assert s.num_rows == 3

    h = (hash_string_array(full["entity_id"])
         ^ hash_string_array(full["parent_id"]) * np.uint64(3)
         ^ hash_string_array(full["entity_class"]) * np.uint64(5)
         ^ np.asarray(full["n"].combine_chunks(),
                      dtype=np.int64).view(np.uint64) * np.uint64(7))
    ets = np.asarray(full["entity_type"].to_pylist())
    got = {r["entity_type"]: (r["n_rows"], r["digest"]) for r in s.to_pylist()}
    M = 1 << 64
    for e in np.unique(ets):
        m = ets == e
        want = int(h[m].sum(dtype=np.uint64))
        want = want - M if want >= (1 << 63) else want
        assert got[str(e)] == (int(m.sum()), want), e
