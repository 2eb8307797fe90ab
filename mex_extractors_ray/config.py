"""YAML config loading — parity with the reference's actual config surface.

The reference's mapping / filter / check specs live as YAML under
``assets/mappings/**`` and are loaded with ``load_yaml`` + pydantic
(``mex/extractors/filters.py:29-32``; mapping consumption
``mex/extractors/ifsg/transform.py:96-101``). This module parses those YAML
shapes into the JSON-dict specs the engine's stages already consume:

- :func:`mapping_yaml_to_vocab_specs` — the ``ResourceMapping`` shape
  (``assets/mappings/synopse/resource.yaml``: target field → entry list →
  ``mappingRules: [{forValues, setValues, rule}]``) → :mod:`stages.vocab`
  ``FieldMapping`` specs.
- :func:`filter_yaml_to_rules` — the ``ActivityFilter`` shape
  (``assets/mappings/__all__/activity_filter.yaml``: ``fields:
  [{fieldInPrimarySource, filterRules: [{forValues, rule}]}]``) →
  :mod:`stages.filters` reject-rule dicts. String-encoded year thresholds
  (``" < 1890"``, applied at ``mex/extractors/filters.py:52-64``) become
  comparison rules; plain value lists become block-lists.
- :func:`check_yaml_to_rules` — drift-check rule lists (already our JSON
  shape, YAML-serialized) → :mod:`state.checks` rules.

All loaders accept a path or a YAML string.
"""

from __future__ import annotations

import re
from pathlib import Path

_YEAR_RULE = re.compile(r"^\s*(<=|>=|<|>)\s*(\d{1,4})\s*$")


def load_yaml(path_or_text: str | Path):
    """``yaml.safe_load`` of a file path (if it exists) or a YAML string."""
    import yaml

    p = Path(path_or_text) if not isinstance(path_or_text, Path) else path_or_text
    try:
        is_file = p.is_file()
    except OSError:  # text with NUL / too long for a path
        is_file = False
    text = p.read_text() if is_file else str(path_or_text)
    return yaml.safe_load(text)


def _first_set_value(rule: dict):
    sv = rule.get("setValues")
    if isinstance(sv, list):
        return sv[0] if sv else None
    return sv


def mapping_yaml_to_vocab_specs(doc, fields: list[str] | None = None,
                                passthrough: bool = False) -> list[dict]:
    """ResourceMapping YAML → vocab ``FieldMapping`` specs.

    Each target field's entries contribute rules in document order
    (first-wins, exactly the reference's
    ``{rule.forValues[0]: rule.setValues for rule in field.mappingRules}``
    dict build). ``fieldInPrimarySource`` names the source column (falls
    back to the target field name); a rule with ``setValues`` but no
    ``forValues`` is the default rule; rules with neither are the
    reference's bare ``rule:`` placeholders and are skipped."""
    doc = load_yaml(doc) if isinstance(doc, (str, Path)) else doc
    specs = []
    for target, entries in doc.items():
        if fields is not None and target not in fields:
            continue
        if not isinstance(entries, list):
            continue
        column = None
        rules = []
        for entry in entries:
            if not isinstance(entry, dict):
                continue
            column = column or entry.get("fieldInPrimarySource")
            for rule in entry.get("mappingRules") or []:
                if not isinstance(rule, dict):
                    continue
                for_values = rule.get("forValues")
                set_value = _first_set_value(rule)
                if for_values:
                    rules.append({"forValues": list(for_values), "setValue": set_value})
                elif rule.get("setValues") is not None:
                    rules.append({"setValue": set_value})  # default rule
        if rules:
            specs.append(
                {
                    "column": column or target,
                    "out": target,
                    "rules": rules,
                    "passthrough": passthrough,
                }
            )
    return specs


def filter_yaml_to_rules(doc) -> list[dict]:
    """ActivityFilter YAML → reject-rule dicts for
    :func:`stages.filters.apply_rule_filter`.

    Per field, every ``filterRules`` entry with ``forValues`` becomes one
    rule; values parse as year thresholds when they match ``"< 1890"``
    (comparison rule on the column) and as a block-list otherwise (``in``
    rule — the externalAssociate / responsibleUnit shape). Entries with a
    bare ``rule:`` and no values carry no machine-checkable predicate and
    are skipped, like the reference does."""
    doc = load_yaml(doc) if isinstance(doc, (str, Path)) else doc
    rules: list[dict] = []
    for field in (doc or {}).get("fields", []):
        col = field.get("fieldInPrimarySource")
        if not col:
            continue
        for fr in field.get("filterRules") or []:
            values = fr.get("forValues")
            if not values:
                continue
            plain: list = []
            for v in values:
                m = _YEAR_RULE.match(v) if isinstance(v, str) else None
                if m:
                    rules.append(
                        {"column": col, "op": m.group(1), "value": int(m.group(2)),
                         "name": f"{col}_year_{m.group(1)}_{m.group(2)}"}
                    )
                else:
                    plain.append(v)
            if plain:
                rules.append({"column": col, "op": "in", "values": plain,
                              "name": f"{col}_blocklist"})
    return rules


def check_yaml_to_rules(doc) -> list[dict]:
    """Drift-check rules from YAML (list of ``{type, value}`` dicts, or the
    reference's keyed form ``{rule_name: {value: N}}``)."""
    doc = load_yaml(doc) if isinstance(doc, (str, Path)) else doc
    if isinstance(doc, list):
        return [dict(r) for r in doc]
    if isinstance(doc, dict):
        return [
            {"type": name, **(body if isinstance(body, dict) else {"value": body})}
            for name, body in doc.items()
        ]
    return []
