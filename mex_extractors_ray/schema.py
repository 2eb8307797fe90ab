"""Versioned Arrow schema registry with per-batch resolution.

The reference handles schema change *socially*: fixed pydantic models with
column aliases (``mex/extractors/synopse/models/project.py:18-31``) plus
mapping YAMLs that translate source values
(``assets/mappings/synopse/resource.yaml``), edited by humans when sources
change. This module makes that discipline a runtime feature (north_rule:
"schema evolution ... resolved per-batch against a versioned Arrow schema
registry"): every change-log batch carries a ``schema_version`` column and is
upgraded to the registry's latest version before the keyed apply —

- **additive columns** appear with a declared default (v2 adds
  ``lang: string`` defaulting to ``"de"``, echoing the reference's
  ``Text{value, language}`` default-language idea,
  ``mex/extractors/synopse/transform.py:190``),
- **type widening** casts up (v3 widens ``n_tok`` int32 → int64); data
  written under an older version is up-cast at scan time and rewritten on
  compaction,
- **renames** re-title a column without touching its data (the runtime
  form of the reference's column *aliases* — ``alias="StudienID"`` on raw
  models is exactly "this data is called something else upstream"); a
  version declares ``renames={"old": "new"}`` and reads of files written
  under any older version resolve the old name transparently.

The registry itself is a JSON document (the runtime analog of the mapping
YAMLs) so deployments can ship new versions without code changes.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import pyarrow as pa

_TYPE_NAMES: dict[str, pa.DataType] = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
    "binary": pa.binary(),
    "timestamp[us]": pa.timestamp("us"),
    "list<int32>": pa.list_(pa.int32()),
    "list<int64>": pa.list_(pa.int64()),
    "list<float>": pa.list_(pa.float32()),
    "list<double>": pa.list_(pa.float64()),
    "list<string>": pa.list_(pa.string()),
}
_NAME_OF_TYPE = {v: k for k, v in _TYPE_NAMES.items()}

# widenings we accept silently (anything else is a registry error)
_WIDENINGS = {
    (pa.int32(), pa.int64()),
    (pa.float32(), pa.float64()),
    (pa.list_(pa.int32()), pa.list_(pa.int64())),
    (pa.list_(pa.float32()), pa.list_(pa.float64())),
}


@dataclass(frozen=True)
class SchemaVersion:
    version: int
    fields: tuple[tuple[str, pa.DataType], ...]  # ordered (name, type)
    defaults: dict[str, object] = field(default_factory=dict)  # name -> fill value (None = null)
    renames: dict[str, str] = field(default_factory=dict)  # old name -> new name, at this version

    def to_arrow(self) -> pa.Schema:
        return pa.schema([pa.field(n, t) for n, t in self.fields])


class SchemaRegistry:
    """Ordered set of schema versions; resolves any batch to any version."""

    def __init__(self, versions: list[SchemaVersion]):
        if not versions:
            raise ValueError("registry needs at least one version")
        self._by_version = {v.version: v for v in sorted(versions, key=lambda v: v.version)}
        self.latest_version = max(self._by_version)
        self._validate()
        self._aliases = self._build_aliases()

    def _validate(self) -> None:
        prev: SchemaVersion | None = None
        for v in self._by_version.values():
            if prev is not None:
                prev_types = dict(prev.fields)
                v_names = {n for n, _ in v.fields}
                for old, new in v.renames.items():
                    if old not in prev_types:
                        raise ValueError(
                            f"v{v.version} renames unknown column {old!r} "
                            f"(not in v{prev.version})")
                    if new not in v_names:
                        raise ValueError(
                            f"v{v.version} renames {old!r} -> {new!r} but "
                            f"{new!r} is not a v{v.version} field")
                    if old in v_names:
                        raise ValueError(
                            f"v{v.version} renames {old!r} -> {new!r} but keeps "
                            f"a field named {old!r} too — ambiguous")
                for name, typ in v.fields:
                    prev_name = next(
                        (o for o, nw in v.renames.items() if nw == name), name)
                    if prev_name in prev_types and prev_types[prev_name] != typ:
                        if (prev_types[prev_name], typ) not in _WIDENINGS:
                            raise ValueError(
                                f"illegal type change {name}: {prev_types[prev_name]} -> {typ} "
                                f"(v{prev.version} -> v{v.version}); only widening is allowed"
                            )
                dropped = set(prev_types) - v_names - set(v.renames)
                if dropped:
                    raise ValueError(f"columns may not be dropped (v{v.version} drops {dropped})")
            prev = v

    def _build_aliases(self, upto: int | None = None) -> dict[str, tuple[str, ...]]:
        """field name AT version ``upto`` (default latest) -> every
        historical name it has carried, NEWEST alias first (resolution
        prefers the most recent spelling when a file somehow carries
        several)."""
        upto = self.latest_version if upto is None else upto
        # walk versions oldest -> newest, tracking each column's name history
        history: dict[str, list[str]] = {}  # current name -> past names, newest first
        first = True
        for v in self._by_version.values():
            if v.version > upto:
                break
            if first:
                history = {n: [] for n, _ in v.fields}
                first = False
                continue
            for old, new in v.renames.items():
                history[new] = [old] + history.pop(old, [])
            for n, _ in v.fields:
                history.setdefault(n, [])
        return {n: tuple(past) for n, past in history.items()}

    def __getitem__(self, version: int) -> SchemaVersion:
        return self._by_version[version]

    @property
    def latest(self) -> SchemaVersion:
        return self._by_version[self.latest_version]

    def source_name(self, name: str, present, to_version: int | None = None) -> str | None:
        """The spelling under which current-version column ``name`` appears
        in a file whose columns are ``present``: the name itself if there,
        else its newest alias that is there, else None (the file predates
        the column entirely). Read paths use this so projection pushdown
        still fetches a renamed column's DATA from pre-rename files instead
        of silently filling defaults."""
        if name in present:
            return name
        aliases = (self._aliases if to_version in (None, self.latest_version)
                   else self._build_aliases(to_version))
        for old in aliases.get(name, ()):
            if old in present:
                return old
        return None

    def resolve_table(self, table: pa.Table, to_version: int | None = None,
                      columns=None, fill_null_defaults: bool = True) -> pa.Table:
        """Upgrade ``table`` (written under any registered version) to
        ``to_version`` (default latest): add missing columns with their
        declared default, up-cast widened types, order columns canonically.
        Extra columns not in the target schema are passed through at the end
        (the engine's system columns ``lsn``/``op``/``schema_version`` ride
        along).

        ``columns`` restricts resolution to the named subset (projection
        pushdown support: a column-pruned parquet read hands over only the
        requested columns, and unrequested target fields must NOT be
        re-materialized from their defaults).

        ``fill_null_defaults=False`` preserves nulls in columns that carry a
        declared default. Two callers need it: the ``patch`` apply mode
        (null = "unchanged"/"never set", NOT "written pre-evolution") and
        lake-file READ paths — ingest always writes post-resolve, so a null
        in a default-bearing lake column can only be patch-mode "never set"
        and must survive the read. Missing-column fill is unaffected (a file
        written before the column existed still gets the default).
        """
        target = self[to_version if to_version is not None else self.latest_version]
        aliases = (self._aliases if target.version == self.latest_version
                   else self._build_aliases(target.version))
        n = table.num_rows
        cols: list[pa.ChunkedArray | pa.Array] = []
        names: list[str] = []
        have = {name: i for i, name in enumerate(table.column_names)}
        consumed: set[str] = set()
        wanted = None if columns is None else set(columns)
        for name, typ in target.fields:
            if wanted is not None and name not in wanted:
                continue
            if name not in have:
                # a file written before a rename carries the OLD name:
                # resolve through the alias chain, newest spelling first
                for old in aliases.get(name, ()):
                    if old in have:
                        have[name] = have[old]
                        consumed.add(old)
                        break
            if name in have:
                col = table.column(have[name])
                if col.type != typ:
                    col = col.cast(typ)
                default = target.defaults.get(name)
                if fill_null_defaults and default is not None and col.null_count:
                    # rows written under a version that lacked the column
                    # carry nulls; the declared default applies to them too
                    import pyarrow.compute as pc

                    col = pc.fill_null(col, default)
                cols.append(col)
            else:
                default = target.defaults.get(name)
                if default is None:
                    cols.append(pa.nulls(n, typ))
                else:
                    cols.append(pa.chunked_array([pa.array([default] * n, typ)]))
            names.append(name)
        target_names = {n for n, _ in target.fields}
        for name in table.column_names:
            if (name not in target_names and name not in consumed
                    and (wanted is None or name in wanted)):
                cols.append(table.column(name))
                names.append(name)
        return pa.table(dict(zip(names, cols)))

    # -- persistence (the runtime mapping-YAML analog) ------------------------

    def to_json(self) -> str:
        doc = [
            {
                "version": v.version,
                "fields": [[n, _NAME_OF_TYPE[t]] for n, t in v.fields],
                "defaults": {k: val for k, val in v.defaults.items()},
                **({"renames": dict(v.renames)} if v.renames else {}),
            }
            for v in self._by_version.values()
        ]
        return json.dumps(doc, indent=2)

    def dump(self, path: str | Path) -> None:
        Path(path).write_text(self.to_json())

    @classmethod
    def from_json(cls, text: str) -> "SchemaRegistry":
        doc = json.loads(text)
        versions = [
            SchemaVersion(
                version=e["version"],
                fields=tuple((n, _TYPE_NAMES[t]) for n, t in e["fields"]),
                defaults=dict(e.get("defaults", {})),
                renames=dict(e.get("renames", {})),
            )
            for e in doc
        ]
        return cls(versions)

    @classmethod
    def load(cls, path: str | Path) -> "SchemaRegistry":
        return cls.from_json(Path(path).read_text())


def sequence_registry() -> SchemaRegistry:
    """The engine's stock registry for the tokenized-sequence table
    (BASELINE.json input_hint; evolution fixtures per FIXTURES.md §2):

    v1: doc_id:string, tokens:list<int32>, n_tok:int32, source:string
    v2: + lang:string (default "de")
    v3: n_tok widened int32 → int64
    """
    base = (
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    )
    v1 = SchemaVersion(1, base)
    v2 = SchemaVersion(2, base + (("lang", pa.string()),), {"lang": "de"})
    v3 = SchemaVersion(
        3,
        (
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int64()),
            ("source", pa.string()),
            ("lang", pa.string()),
        ),
        {"lang": "de"},
    )
    return SchemaRegistry([v1, v2, v3])
