"""Excel (.xlsx) reader — pure stdlib, no external engine.

The reference ingests xlsx in 5 extractors (``mex/extractors/sumo/
extract.py:26-54``, ``odk/extract.py:17-56``, ``ff_projects/extract.py:27-50``,
``international_projects/extract.py:30-58``, ``biospecimen/extract.py:66-92``)
via ``pandas.ExcelFile.parse`` per sheet with a NaN→None scrub. This
container has no openpyxl, but xlsx is simply a ZIP of XML (ECMA-376):
``zipfile`` + ``xml.etree`` read it exactly, so the operator is REAL, not a
pre-converted-parquet stand-in.

Semantics matched to the reference:
- multi-sheet: one table per sheet, first row = header
  (``ExcelFile.parse(sheet_name=...)``);
- empty cells and empty strings → None (the ``replace(NaN, None)`` scrub of
  ``sumo/extract.py:30-43``);
- ``numbers_as_str=True`` renders numeric cells as their Excel-general
  string form (the pydantic ``coerce_numbers_to_str=True`` discipline,
  ``synopse/models/variable.py:9``).

Scale note: the reference's xlsx files are metadata-sized (config sheets,
hundreds of rows), so per-FILE parallelism is the right unit —
:func:`excel_source` parses each file inside ``flat_map`` tasks; the
driver-side :func:`read_excel_sheets` is for the common one-small-file case.

:func:`write_xlsx` is a minimal inline-string writer so tests can build
fixtures hermetically (mirror of the import-gated report sink in
stages/sinks.py).
"""

from __future__ import annotations

import io
import re
import zipfile
from pathlib import Path
from xml.etree import ElementTree as ET

import pyarrow as pa

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_R_ATTR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
_CELL_RE = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 …"""
    m = _CELL_RE.match(ref)
    out = 0
    for ch in (m.group(1) if m else "A"):
        out = out * 26 + (ord(ch) - 64)
    return out - 1


def _num_to_str(v: float) -> str:
    """Excel 'General' rendering: integral floats print without '.0'."""
    return str(int(v)) if float(v).is_integer() and abs(v) < 1e15 else repr(v)


def _parse_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall("m:si", _NS):
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _sheet_paths(zf: zipfile.ZipFile) -> dict[str, str]:
    """sheet name → zip member path, via workbook.xml + its rels."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        rel.get("Id"): rel.get("Target") for rel in rels.findall("r:Relationship", _REL_NS)
    }
    out = {}
    for sheet in wb.iter(f"{{{_NS['m']}}}sheet"):
        target = target_by_rid.get(sheet.get(_R_ATTR), "")
        if target.startswith("/"):
            member = target.lstrip("/")
        else:
            member = "xl/" + target
        out[sheet.get("name")] = member
    return out


def _parse_sheet(zf: zipfile.ZipFile, member: str, shared: list[str],
                 numbers_as_str: bool) -> list[list]:
    root = ET.fromstring(zf.read(member))
    rows: list[list] = []
    for row in root.iter(f"{{{_NS['m']}}}row"):
        cells: list = []
        for c in row.findall("m:c", _NS):
            idx = _col_index(c.get("r", "A1"))
            while len(cells) < idx:
                cells.append(None)
            t = c.get("t", "n")
            if t == "inlineStr":
                is_el = c.find("m:is", _NS)
                v = "".join(x.text or "" for x in is_el.iter(f"{{{_NS['m']}}}t")) if is_el is not None else None
            else:
                v_el = c.find("m:v", _NS)
                raw = v_el.text if v_el is not None else None
                if raw is None:
                    v = None
                elif t == "s":
                    v = shared[int(raw)]
                elif t in ("str",):
                    v = raw
                elif t == "b":
                    v = bool(int(raw)) if not numbers_as_str else ("TRUE" if int(raw) else "FALSE")
                else:  # number
                    v = _num_to_str(float(raw)) if numbers_as_str else float(raw)
            # NaN→None scrub: empty strings are missing values
            cells.append(None if v == "" else v)
        rows.append(cells)
    return rows


def _rows_to_table(rows: list[list]) -> pa.Table:
    if not rows:
        return pa.table({})
    header = ["" if h is None else str(h) for h in rows[0]]
    width = max([len(header)] + [len(r) for r in rows[1:]] or [0])
    header += [f"col_{i}" for i in range(len(header), width)]
    cols: dict[str, list] = {h: [] for h in header}
    for r in rows[1:]:
        for i, h in enumerate(header):
            cols[h].append(r[i] if i < len(r) else None)
    return pa.table({h: pa.array(v) for h, v in cols.items()})


def read_excel_sheets(path: str | Path | bytes, sheets: list[str] | None = None,
                      numbers_as_str: bool = True) -> dict[str, pa.Table]:
    """Parse an xlsx file into {sheet name: Arrow table} (first row =
    header). ``path`` may be a filesystem path or raw bytes."""
    buf = io.BytesIO(path) if isinstance(path, bytes) else None
    with zipfile.ZipFile(buf or str(path)) as zf:
        shared = _parse_shared_strings(zf)
        members = _sheet_paths(zf)
        wanted = sheets or list(members)
        out = {}
        for name in wanted:
            if name not in members:
                raise KeyError(f"sheet {name!r} not in workbook (has {list(members)})")
            out[name] = _rows_to_table(_parse_sheet(zf, members[name], shared, numbers_as_str))
        return out


def excel_source(paths, sheet: str | None = None, numbers_as_str: bool = True):
    """Distributed form: one parse task per FILE (files are the parallelism
    unit, like the reference's per-file iteration); rows carry ``_sheet`` +
    ``_path`` provenance columns."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(row: dict) -> list[dict]:
        tables = read_excel_sheets(bytes(row["bytes"]), [sheet] if sheet else None,
                                   numbers_as_str=numbers_as_str)
        out = []
        for name, t in tables.items():
            for rec in t.to_pylist():
                rec["_sheet"] = name
                rec["_path"] = row["path"]
                out.append(rec)
        return out

    return ds.flat_map(parse)


def write_xlsx(path: str | Path, sheets: dict[str, pa.Table | list[dict]]) -> None:
    """Minimal xlsx writer (inline strings; numbers written as numeric
    cells) — fixture builder for hermetic reader tests."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    def col_ref(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(65 + rem) + out
        return out

    sheet_xml = {}
    for si, (name, data) in enumerate(sheets.items(), start=1):
        if isinstance(data, pa.Table):
            header = data.column_names
            records = data.to_pylist()
        else:
            header = list(data[0].keys()) if data else []
            records = data
        rows = [header] + [[rec.get(h) for h in header] for rec in records]
        body = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, v in enumerate(row):
                if v is None:
                    continue
                ref = f"{col_ref(ci)}{ri}"
                if isinstance(v, (int, float)) and not isinstance(v, bool) and ri > 1:
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{esc(str(v))}</t></is></c>')
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_xml[si] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(body)}</sheetData></worksheet>'
        )

    names = list(sheets)
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        + "".join(
            f'<sheet name="{esc(n)}" sheetId="{i}" r:id="rId{i}"/>'
            for i, n in enumerate(names, start=1)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(names) + 1)
        )
        + "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/'
        '2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType="application/'
            'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(1, len(names) + 1)
        )
        + "</Types>"
    )
    with zipfile.ZipFile(str(path), "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, xml in sheet_xml.items():
            zf.writestr(f"xl/worksheets/sheet{i}.xml", xml)
