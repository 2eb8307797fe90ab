"""Declarative rule filters with rejection lineage.

Re-expresses the reference's YAML-driven global filter
(``mex/extractors/filters.py:18-84`` over
``assets/mappings/__all__/activity_filter.yaml``: partner block-list, unit
block-list, year thresholds parsed from strings like ``" < 1890"``) and its
logged per-source filters (``mex/extractors/blueant/filter.py:16-34``,
``mex/extractors/ff_projects/filter.py:18-142``) as a compiled, vectorized
predicate over Arrow batches. Every rejected row emits a lineage record with
the rule that fired (the analog of ``log_filtered_merged_item_identifiers``,
``mex/extractors/logging.py:13-32``) — surfaced as a ``_reject_reason``
column so the reject stream can be routed to a side table instead of being
dropped silently.

Rule forms (a JSON/YAML-able dict, one entry per rule):
    {"column": c, "op": "in"|"not_in", "values": [...]}       block/allow list
    {"column": c, "op": "<"|"<="|">"|">="|"=="|"!=", "value": v}
    {"column": c, "op": "null"|"not_null"}
    {"column": c, "op": "regex", "pattern": p}                match ⇒ reject
A row is REJECTED by the first rule it matches (rules are reject-rules, like
the reference's filter YAML).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _rule_mask(table: pa.Table, rule: dict) -> pa.ChunkedArray:
    """True where the rule FIRES (row rejected)."""
    col = table[rule["column"]]
    op = rule["op"]
    if op == "in":
        return pc.is_in(col, value_set=pa.array(rule["values"]))
    if op == "not_in":
        return pc.invert(pc.is_in(col, value_set=pa.array(rule["values"])))
    if op == "null":
        return pc.is_null(col)
    if op == "not_null":
        return pc.is_valid(col)
    if op == "regex":
        return pc.fill_null(pc.match_substring_regex(col, rule["pattern"]), False)
    cmp = {"<": pc.less, "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
           "==": pc.equal, "!=": pc.not_equal}[op]
    return pc.fill_null(cmp(col, rule["value"]), False)


def rule_name(rule: dict, i: int) -> str:
    return rule.get("name", f"rule_{i}_{rule['column']}_{rule['op']}")


class RuleFilter:
    """map_batches callable: compiles the rule list once per actor
    (``__init__``), applies the vectorized keep/reject split per batch.

    Output: the input batch plus a ``_reject_reason`` string column (null =
    kept). Chain with :func:`kept` / :func:`rejected` to split streams.
    """

    def __init__(self, rules: list[dict]):
        self.rules = list(rules)
        self.names = [rule_name(r, i) for i, r in enumerate(self.rules)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        reason = pa.nulls(n, pa.string())
        undecided = pa.chunked_array([pa.array([True] * n)])
        for r, name in zip(self.rules, self.names):
            fires = pc.and_(undecided, _rule_mask(batch, r))
            reason = pc.if_else(fires, pa.scalar(name, pa.string()), reason)
            undecided = pc.and_(undecided, pc.invert(fires))
        return batch.append_column("_reject_reason", reason)


def kept(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.is_null(batch["_reject_reason"])).drop_columns(["_reject_reason"])


def rejected(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.is_valid(batch["_reject_reason"]))


def apply_rule_filter(ds, rules: list[dict], reject_sink_dir: str | None = None):
    """Dataset helper: tag → optionally persist the reject stream (lineage)
    → return the kept stream. Both streams stay distributed; nothing
    materializes on the driver.

    With ``reject_sink_dir`` the reject stream is written *inside the same
    pass* (per-batch side-write of rejected rows to one parquet per block),
    so the input is not recomputed for the second output — Ray Data has no
    native multi-output operator, and re-executing the upstream would double
    the read at scale."""
    # rules compile in microseconds, so this ships as a STATELESS task fn
    # (compiled once on the driver, tiny closure) — an actor pool would cap
    # the stage and pay actor startup for no state worth keeping
    rf = RuleFilter(rules)
    tagged = ds.map_batches(rf, batch_format="pyarrow")
    if reject_sink_dir:
        import os
        import uuid
        from pathlib import Path

        import pyarrow.parquet as pq

        out = Path(reject_sink_dir)
        out.mkdir(parents=True, exist_ok=True)

        def split_and_sink(batch: pa.Table) -> pa.Table:
            rej = rejected(batch)
            if rej.num_rows:
                tmp = out / f".tmp-{uuid.uuid4().hex}"
                pq.write_table(rej, tmp, compression="snappy")
                os.replace(tmp, out / f"rejects-{uuid.uuid4().hex}.parquet")
            return kept(batch)

        return tagged.map_batches(split_and_sink, batch_format="pyarrow")
    return tagged.map_batches(kept, batch_format="pyarrow")
