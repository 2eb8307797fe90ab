"""Composed multi-entity ETL — the reference's flagship job SHAPE.

The reference's ``synopse`` job chains entity extractions where each step's
minted identifiers feed the next step's transforms, with a checked ``load()``
per step (``mex/extractors/synopse/main.py:160-279``: projects → activities
→ resources → variable groups → variables, each ``load(...)`` + per-asset
``num_items`` check metadata). This module re-expresses that chain
Ray-Data-first over the engine's own operator set — every stage is one of
the already-hash-checked building blocks, composed:

  activities  ← orders:    vocab map (priority class, the mapping-YAML
                            discipline) → declarative rule filter (pending
                            orders rejected, with lineage) → get-or-create
                            deterministic id mint
  resources   ← lineitem:  bucketed large-large join to activities (the
                            cross-entity identity wiring — lineitems of
                            filtered-out orders drop) → vocab map (return
                            class) → reference rewrite (supplier refs
                            outside the allowed set → fallback, the
                            publisher matrix) → id mint over the composite
                            natural key
  var groups  ← resources:  grouped rollup per (activity, return class) →
                            id mint over the group natural key

Each entity is CHECK-LOADED: written to its own parquet dir with a lineage
row-count record, then the reference's drift rules run vs. the previous run
(``mex/extractors/pipeline/checks/main.py:120-218``; blocking like
``pipeline/base.py:107-127`` when ``blocking=True``).

Scale shape: the only all-to-all exchange is the ONE bucketed join lineitem
× activities (both sides large — broadcast would ship the order dimension
to every task); vocab/filter/rewrite/mint are per-batch Arrow kernels, and
the variable-group rollup pre-aggregates map-side before a small groupby.
The id mint is coordination-free by construction (deterministic hash ids —
the distributed analog of the reference's ``stableTargetId``).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

from mex_extractors_ray import runtime as _rt
from mex_extractors_ray.stages import filters, joins, vocab
from mex_extractors_ray.stages.rewrite import rewrite_references

# mapping-YAML analogs (the synopse activity.yaml / resource.yaml shapes)
PRIO_SPECS = [
    {
        "column": "o_orderpriority",
        "out": "prio_class",
        "rules": [
            {"forValues": ["1-URGENT", "2-HIGH"], "setValue": "high"},
            {"forValues": ["3-MEDIUM"], "setValue": "medium"},
            {"setValue": "routine"},
        ],
    }
]
RETURN_SPECS = [
    {
        "column": "l_returnflag",
        "out": "return_class",
        "rules": [
            {"forValues": ["A"], "setValue": "accepted"},
            {"forValues": ["R"], "setValue": "returned"},
            {"setValue": "none"},
        ],
    }
]
# activity_filter.yaml analog: reject-rules with lineage
ACTIVITY_RULES = [
    {"column": "o_orderstatus", "op": "==", "value": "P", "name": "pending_status"}
]
# rewrite matrix (publisher/fields.py analog): which entity classes get
# their supplier references rewritten to the fallback when disallowed
REWRITE_FIELDS = {"returned": ["supp_ref"], "accepted": ["supp_ref"]}
SUPPLIER_MIN_ACCTBAL = 3000.0
REWRITE_FALLBACK = -1

# drift rules evaluated per entity after each load (checks.main.py matrix)
DEFAULT_CHECK_RULES = [
    {"type": "x_items_less_than", "value": 1},
    {"type": "x_percent_less_than", "value": 50.0},
]


def _mint(ds, key_col: str, id_col: str, prefix: str):
    return ds.map_batches(
        _rt.stateless(joins.GetOrCreateDimension, key_col, id_col, prefix),
        batch_format="pyarrow",
    )


def extract_activities(sf_dir: str):
    """orders → vocab map → rule filter → minted activity dimension."""
    orders = _rt.read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )
    mapped = vocab.map_vocab(orders, PRIO_SPECS)
    kept = filters.apply_rule_filter(mapped, ACTIVITY_RULES)

    def with_key(b: pa.Table) -> pa.Table:
        return b.append_column("nat_key", pc.cast(b["o_orderkey"], pa.string()))

    return _mint(
        kept.map_batches(with_key, batch_format="pyarrow"),
        "nat_key", "activity_id", "act",
    ).select_columns(["o_orderkey", "o_custkey", "prio_class", "activity_id"])


def extract_resources(sf_dir: str, activities, allowed_suppliers):
    """lineitem ⋈ activities (bucketed) → vocab map → reference rewrite →
    minted resource entities. ``allowed_suppliers`` is the small broadcast
    side (supplier ids above the acct threshold)."""
    li = _rt.read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag",
                 "l_quantity"],
    )
    acts = activities.select_columns(["o_orderkey", "activity_id"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "activity_id"]),
        batch_format="pyarrow",
    )
    joined = joins.bucketed_join(li, acts, on="l_orderkey")
    mapped = vocab.map_vocab(joined, RETURN_SPECS)

    def prep(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(b["l_orderkey"], pa.string()),
            pc.cast(b["l_linenumber"], pa.string()), "-",
        )
        return (
            b.append_column("nat_key", key)
            .append_column("supp_ref", pc.cast(b["l_suppkey"], pa.int64()))
            .append_column(
                "qty",
                pc.cast(pc.round(b["l_quantity"]), pa.int64()),
            )
        )

    prepped = mapped.map_batches(prep, batch_format="pyarrow")
    rewritten = rewrite_references(
        prepped, REWRITE_FIELDS, type_col="return_class",
        allowed=allowed_suppliers, fallback=REWRITE_FALLBACK,
    )
    return _mint(rewritten, "nat_key", "resource_id", "res").select_columns(
        ["l_orderkey", "activity_id", "return_class", "supp_ref", "qty",
         "resource_id"]
    )


def extract_variable_groups(resources):
    """resources → per (activity, return class) rollup → minted group ids.

    Map-side partial aggregation per block, then the small keyed groupby —
    the pre-aggregate-before-shuffle discipline."""

    def partial(b: pa.Table) -> pa.Table:
        return (
            b.select(["l_orderkey", "activity_id", "return_class", "qty"])
            .group_by(["l_orderkey", "activity_id", "return_class"])
            .aggregate([([], "count_all"), ("qty", "sum")])
            .rename_columns(
                ["l_orderkey", "activity_id", "return_class", "n_items", "sum_qty"]
            )
        )

    from mex_extractors_ray.stages.aggregates import keyed_sums

    # coarse shuffle + reduceat merge instead of Dataset.aggregate — the
    # composite key's cardinality tracks the order count, the regime where
    # Ray's Aggregate exchange measured 16x slower (BASELINE.md round 4)
    rolled = keyed_sums(
        resources.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey", "activity_id", "return_class"],
        ["n_items", "sum_qty"],
    )

    def with_key(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(b["l_orderkey"], pa.string()), b["return_class"], "|"
        )
        return b.append_column("nat_key", key)

    return _mint(
        rolled.map_batches(with_key, batch_format="pyarrow"),
        "nat_key", "vg_id", "vg",
    ).select_columns(["activity_id", "return_class", "n_items", "vg_id"])


def checked_load(entity, out_dir: str | Path, name: str, run_id: str,
                 rules: list[dict], blocking: bool = True) -> int:
    """The per-step ``load()`` + asset-check: write the entity table as
    partitioned parquet, append a lineage row-count record, run the drift
    rules vs. the previous run of the same entity."""
    import pyarrow.parquet as pq

    from mex_extractors_ray.state.checks import append_lineage, assert_checks, evaluate_checks

    d = Path(out_dir) / name
    d.mkdir(parents=True, exist_ok=True)
    run_dir = d / f"data-{run_id}"
    entity.write_parquet(str(run_dir))
    n = sum(pq.read_metadata(p).num_rows for p in run_dir.glob("*.parquet"))
    append_lineage(d, pa.table({"partition": [0], "row_count": [n]}), run_id)
    if blocking:
        assert_checks(d, rules)
    else:
        evaluate_checks(d, rules)
    return n


def multi_entity_etl(sf_dir: str, out_dir: str | Path | None = None, *,
                     run_id: str = "r001",
                     check_rules: list[dict] | None = None,
                     blocking: bool = True,
                     summary_only: bool = False) -> pa.Table:
    """Run the full chain; returns the normalized union of the three entity
    tables (entity_type, entity_id, parent_id, entity_class, n) — one table so a
    single DuckDB oracle hash-checks all three loads AND the cross-entity
    id wiring at once.

    ``summary_only=True`` is the PRODUCTION return path at scale: the
    entity tables still stream to parquet via ``checked_load`` (pass
    ``out_dir``), but the return value is a 3-row per-entity summary
    (row count + order-insensitive content digest, reduced from
    constant-size per-batch partials) instead of collecting the
    normalized union driver-side — the driver never holds a row of
    entity data. The full-union mode stays for the oracle harness."""
    import pyarrow.parquet as pq

    rules = DEFAULT_CHECK_RULES if check_rules is None else check_rules
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"])
    allowed = sup.filter(
        pc.greater_equal(sup["s_acctbal"], SUPPLIER_MIN_ACCTBAL)
    )["s_suppkey"].to_pylist()

    # each entity Dataset fans out to MULTIPLE consumers (the next entity's
    # extract, its own checked load, the normalized union) — materialize
    # once per entity or every consumer re-executes the whole upstream
    # chain (measured 21.2 s -> ~8 s at sf0.1/32 CPUs). The pinned blocks
    # spill under pressure; this is the standard fan-out pattern, and it is
    # also what the reference's per-step load() boundary implies.
    acts = extract_activities(sf_dir).materialize()
    res = extract_resources(sf_dir, acts, allowed).materialize()
    vgs = extract_variable_groups(res).materialize()

    if out_dir is not None:
        for name, ds in (("activities", acts), ("resources", res),
                         ("variable_groups", vgs)):
            checked_load(ds, out_dir, name, run_id, rules, blocking=blocking)

    def norm_act(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "entity_type": pa.array(["act"] * n),
            "entity_id": b["activity_id"],
            "parent_id": pa.array([""] * n, pa.string()),
            "entity_class": b["prio_class"],
            "n": pc.cast(b["o_custkey"], pa.int64()),
        })

    def norm_res(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "entity_type": pa.array(["res"] * n),
            "entity_id": b["resource_id"],
            "parent_id": b["activity_id"],
            "entity_class": b["return_class"],
            "n": pc.cast(b["supp_ref"], pa.int64()),
        })

    def norm_vg(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "entity_type": pa.array(["vg"] * n),
            "entity_id": b["vg_id"],
            "parent_id": b["activity_id"],
            "entity_class": b["return_class"],
            "n": pc.cast(b["n_items"], pa.int64()),
        })

    union = (
        acts.map_batches(norm_act, batch_format="pyarrow")
        .union(res.map_batches(norm_res, batch_format="pyarrow"))
        .union(vgs.map_batches(norm_vg, batch_format="pyarrow"))
    )
    if summary_only:
        import numpy as np

        from mex_extractors_ray.hashing import hash_string_array

        def partial(b: pa.Table) -> pa.Table:
            # one constant-size row per (batch, entity_type): count + a
            # commutative content digest (uint64 sum of per-row hashes —
            # order-independent, so the driver reduce is exact)
            h = (hash_string_array(b["entity_id"])
                 ^ hash_string_array(b["parent_id"]) * np.uint64(3)
                 ^ hash_string_array(b["entity_class"]) * np.uint64(5)
                 ^ np.asarray(b["n"].combine_chunks(),
                              dtype=np.int64).view(np.uint64) * np.uint64(7))
            out_rows = []
            et = b["entity_type"].to_pylist()
            ets = np.asarray(et)
            for e in np.unique(ets):
                m = ets == e
                out_rows.append({"entity_type": str(e),
                                 "n_rows": int(m.sum()),
                                 "digest": int(h[m].sum(dtype=np.uint64)
                                               .view(np.int64))})
            return pa.Table.from_pylist(out_rows, schema=pa.schema(
                [("entity_type", pa.string()), ("n_rows", pa.int64()),
                 ("digest", pa.int64())]))

        M = 1 << 64
        parts = union.map_batches(partial, batch_format="pyarrow").to_pandas()
        agg: dict[str, tuple[int, int]] = {}
        for _, r in parts.iterrows():
            c, d = agg.get(r["entity_type"], (0, 0))
            agg[r["entity_type"]] = (
                c + int(r["n_rows"]), (d + int(r["digest"])) % M)
        return pa.table({
            "entity_type": pa.array(sorted(agg)),
            "n_rows": pa.array([agg[k][0] for k in sorted(agg)], pa.int64()),
            "digest": pa.array(
                [agg[k][1] - M if agg[k][1] >= (1 << 63) else agg[k][1]
                 for k in sorted(agg)], pa.int64()),
        })
    t = pa.Table.from_pandas(union.to_pandas(), preserve_index=False)
    return t.replace_schema_metadata(None).sort_by(
        [("entity_type", "ascending"), ("entity_id", "ascending")]
    )
