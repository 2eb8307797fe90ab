"""Vocab / value-mapping operator — the reference's mapping-YAML discipline.

The reference drives essentially every extractor through per-field mapping
rule lists ``{forValues, setValues, rule}`` declared in YAML
(``assets/mappings/synopse/resource.yaml:10-16``: ``accessRestriction:
forValues ["protected"] → setValues …access-restriction-2``) and consumed as
first-wins value dictionaries (``mex/extractors/ifsg/transform.py:96-101``:
``{rule.forValues[0]: rule.setValues for rule in field.mappingRules}``).

This stage is the distributed, vectorized form:

- a **FieldMapping** is one target column: an ordered rule list where each
  rule maps a set of source values (``forValues``) to one target value
  (``setValue``); a rule *without* ``forValues`` is the default rule
  (matches everything left — the reference's bare ``rule:`` entries);
- rule precedence is first-wins, exactly like the reference's dict build
  (an earlier rule's forValues shadow a later rule's);
- translation is pure Arrow: one ``pc.index_in`` against the flattened
  (source value → rule index) table and one ``pc.take`` — no per-row
  Python, no shuffle (the mapping tables are tiny and ship inside the actor
  constructor, the broadcast-small-side discipline).

Config is a JSON-able dict (the YAML analog)::

    {"column": "event_type",            # source column
     "out": "event_class",              # output column (omit = in-place)
     "rules": [
        {"forValues": ["signup", "login"], "setValue": "engagement"},
        {"forValues": ["purchase"],        "setValue": "conversion"},
        {"setValue": "other"}],          # default rule (no forValues)
     "passthrough": false}               # true: unmatched keeps source value
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc
from .. import runtime as _rt


class FieldMapping:
    """One column's compiled mapping: value_set → target values + default."""

    def __init__(self, spec: dict):
        self.column: str = spec["column"]
        self.out: str = spec.get("out", self.column)
        self.passthrough: bool = bool(spec.get("passthrough", False))
        self.default = None
        has_default = False
        seen: dict = {}
        for rule in spec["rules"]:
            for_values = rule.get("forValues")
            if for_values is None:
                if not has_default:  # first default rule wins too
                    self.default = rule.get("setValue")
                    has_default = True
                continue
            for v in for_values:
                seen.setdefault(v, rule.get("setValue"))  # first-wins
        self.has_default = has_default
        self.value_set = pa.array(list(seen.keys()))
        self.targets = pa.array(list(seen.values()), pa.string())

    def translate(self, col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
        if len(self.value_set) == 0:
            idx = pa.nulls(len(col), pa.int32())
        else:
            idx = pc.index_in(col, value_set=self.value_set)
        mapped = pc.take(self.targets, idx) if len(self.targets) else pa.nulls(len(col), pa.string())
        if self.passthrough:
            fallback = pc.cast(col, pa.string())
        elif self.has_default:
            fallback = pa.scalar(self.default, pa.string())
        else:
            return mapped
        return pc.coalesce(mapped, fallback)


class VocabMapper:
    """map_batches callable: compile the field specs once per actor
    (``__init__`` — the lru_cache-service discipline), translate per batch
    with zero-copy Arrow kernels."""

    def __init__(self, specs: list[dict] | str):
        if isinstance(specs, str):
            specs = json.loads(specs)
        self.fields = [FieldMapping(s) for s in specs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        for f in self.fields:
            out = f.translate(batch[f.column])
            if f.out in batch.column_names:
                batch = batch.set_column(batch.column_names.index(f.out), f.out, out)
            else:
                batch = batch.append_column(f.out, out)
        return batch


def map_vocab(ds, specs: list[dict], concurrency=None):
    """Dataset helper: apply the mapping specs as stateless tasks (spec
    compilation is a few dict walks — cheap per batch; no actor pool)."""
    return ds.map_batches(
        _rt.stateless(VocabMapper, json.dumps(specs)),
        batch_format="pyarrow",
    )


def vocab_sql_case(spec: dict) -> str:
    """The DuckDB-equivalent CASE expression for one field spec (used by the
    catalog oracles; mirrors :meth:`FieldMapping.translate` exactly,
    including first-wins precedence)."""
    f = FieldMapping(spec)
    col = spec["column"]
    whens = []
    for v, t in zip(f.value_set.to_pylist(), f.targets.to_pylist()):
        tv = "NULL" if t is None else f"'{t}'"
        whens.append(f"WHEN {col} = '{v}' THEN {tv}")
    if f.passthrough:
        default = f"CAST({col} AS VARCHAR)"
    elif f.has_default:
        default = "NULL" if f.default is None else f"'{f.default}'"
    else:
        default = "NULL"
    return "CASE " + " ".join(whens) + f" ELSE {default} END"
