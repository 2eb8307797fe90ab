"""Export sinks.

Parity with the reference's sink registry (``mex/extractors/sinks/__init__.py``):

- :func:`write_ndjson_with_manifest` — the S3 NDJSON sink
  (``mex/extractors/sinks/s3.py:52-133``): stream items to ndjson part
  files, sha256 every part, then write a ``metadata.json`` manifest with
  checksums + ``write_completed_at``. Here it is distributed (one part per
  block, written by workers) with the manifest committed atomically by the
  driver after all parts land — same two-phase discipline as the lake.
- :func:`write_report_xlsx` — the XLSX report sink (``sinks/s3.py:136-190``),
  REAL: a pure-stdlib OOXML writer (:func:`write_xlsx_bytes` — zip of
  workbook/worksheet XML with inline strings, the write-side mirror of the
  pure-stdlib reader in ``sources/excel.py``; round-trip tested against it).
  The naming scheme (class/primary-source/unit) is preserved. Reports are
  aggregate-sized, so the writer is driver-side by design.
- :func:`smtp_sink` — the consent-mailer SMTP sink
  (``mex/extractors/consent_mailer/main.py:27-49``, ``transform.py:15-61``):
  render one message per row, send via a pluggable transport (stdlib
  ``smtplib`` by default; injectable for tests / dry runs).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

import pandas as pd
import pyarrow as pa

from mex_extractors_ray.cdc.manifest import atomic_write_bytes, sha256_file


def write_ndjson_with_manifest(ds, out_dir: str | Path) -> dict:
    """Distributed NDJSON export + atomic manifest commit. Returns manifest."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    ds.write_json(str(out))
    parts = sorted(p.name for p in out.glob("*.json"))
    manifest = {
        "items": "ndjson",
        "files": [
            {"name": name, "sha256_checksum": sha256_file(out / name)} for name in parts
        ],
        "write_completed_at": datetime.now(timezone.utc).isoformat(),
    }
    atomic_write_bytes(out / "metadata.json", json.dumps(manifest, indent=1).encode())
    return manifest


def verify_ndjson_manifest(out_dir: str | Path) -> bool:
    """Re-hash every manifest-listed part (consumer-side integrity check)."""
    out = Path(out_dir)
    manifest = json.loads((out / "metadata.json").read_text())
    return all(
        sha256_file(out / f["name"]) == f["sha256_checksum"] for f in manifest["files"]
    )


def report_name(kind: str, primary_source: str, unit: str) -> str:
    """The reference's report naming scheme (``sinks/s3.py:136-190``)."""
    return f"{kind}_{primary_source}_{unit}".replace(" ", "_").lower()


def _col_letter(i: int) -> str:
    """0-based column index → A, B, …, Z, AA, AB, …"""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(65 + r) + out
    return out


_XLSX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_XLSX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_XLSX_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def write_xlsx_bytes(df: pd.DataFrame, sheet_name: str = "Sheet1") -> bytes:
    """Pure-stdlib XLSX (OOXML) writer: zip of workbook/worksheet XML with
    inline strings — the write-side mirror of the pure-stdlib reader in
    ``sources/excel.py`` (round-trip tested against it). Numbers are written
    as numeric cells, everything else as inline strings, None as blanks."""
    import io
    import zipfile
    from xml.sax.saxutils import escape

    rows_xml: list[str] = []
    header = list(df.columns)
    data_rows = [tuple(header)] + [tuple(r) for r in df.itertuples(index=False, name=None)]
    for ri, row in enumerate(data_rows, start=1):
        cells = []
        for ci, v in enumerate(row):
            ref = f"{_col_letter(ci)}{ri}"
            if v is None or (isinstance(v, float) and v != v):
                continue  # blank cell
            if ri > 1 and isinstance(v, (int, float)) and not isinstance(v, bool):
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(str(v))}</t></is></c>"
                )
        rows_xml.append(f'<row r="{ri}">{"".join(cells)}</row>')
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(rows_xml)}</sheetData></worksheet>'
    )
    from xml.sax.saxutils import quoteattr

    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets><sheet name={quoteattr(sheet_name)} sheetId=\"1\" r:id=\"rId1\"/></sheets>"
        "</workbook>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        zf.writestr("_rels/.rels", _XLSX_RELS)
        zf.writestr("xl/workbook.xml", workbook_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return buf.getvalue()


def write_report_xlsx(df: pd.DataFrame | pa.Table, out_dir: str | Path,
                      kind: str, primary_source: str, unit: str) -> str:
    """Small driver-side report export (reports are aggregate-sized) — a
    REAL .xlsx via the pure-stdlib OOXML writer (no openpyxl dependency)."""
    if isinstance(df, pa.Table):
        df = df.to_pandas()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    base = report_name(kind, primary_source, unit)
    path = out / f"{base}.xlsx"
    atomic_write_bytes(path, write_xlsx_bytes(df))
    return str(path)


def smtp_sink(rows, render, transport=None, host: str = "localhost",
              port: int = 25, sender: str = "noreply@example.org") -> int:
    """Consent-mailer SMTP sink (``mex/extractors/consent_mailer/main.py:27-49``,
    ``transform.py:15-61``): one rendered message per row.

    ``render(row) -> (recipient, subject, body)``; ``transport`` is a
    callable ``(sender, recipient, message_bytes) -> None`` — defaults to
    stdlib ``smtplib`` against ``host:port``. Inject a fake transport for
    tests / dry runs. Driver-side by design (the reference sends one mail
    per person from the pipeline process; notification side-effects don't
    belong in a retryable distributed task — a task retry would re-send).
    Returns the number of messages sent."""
    from email.message import EmailMessage

    close = None
    if transport is None:
        import smtplib

        server = smtplib.SMTP(host, port)
        close = server.quit

        def transport(frm, to, msg_bytes):
            server.sendmail(frm, to, msg_bytes)

    sent = 0
    try:
        for row in rows:
            recipient, subject, body = render(row)
            if not recipient:
                continue
            msg = EmailMessage()
            msg["From"] = sender
            msg["To"] = recipient
            msg["Subject"] = subject
            msg.set_content(body)
            transport(sender, recipient, msg.as_bytes())
            sent += 1
    finally:
        if close is not None:
            close()
    return sent


def render_template(template: str, args: dict) -> str:
    """Minimal ``{{ var }}`` substitution — the subset of jinja2 the
    reference's consent template actually uses (plain variable
    interpolation, ``consent_mailer/transform.py:64-82``); unknown
    placeholders render empty, like jinja2's default undefined."""
    import re

    return re.sub(
        r"\{\{\s*(\w+)\s*\}\}",
        lambda m: str(args.get(m.group(1), "")),
        template,
    )


def consent_email_renderer(config: dict, template: str,
                           domain: str = "@rki.de",
                           sender_display: str = "Metadata Exchange"):
    """Row renderer mirroring the reference's consent-mail field selection
    (``mex/extractors/consent_mailer/transform.py:15-61``):

    - recipients = the person's email addresses ending in ``domain``,
      joined with ``"; "``; a person with none yields recipient None and
      the sink skips them (the reference returns None);
    - ``full_name`` = first entry of the person's fullName list, default
      ``"Mitarbeitende/r"``;
    - subject from ``config["consent"]["subject"]``, body from the
      template rendered with full_name + ``template_args``.

    Returns a ``render(row) -> (recipient, subject, body)`` for
    :func:`smtp_sink`. ``sender_display`` is accepted for parity with the
    reference's From header; smtp_sink's ``sender`` carries the address.
    """
    subject = config["consent"]["subject"]
    targs = dict(config["consent"].get("template_args", {}))

    def render(row):
        emails = row.get("email") or []
        if isinstance(emails, str):
            emails = [emails]
        to = "; ".join(e for e in emails if e and e.endswith(domain))
        if not to:
            return None, None, None
        names = row.get("fullName") or []
        full_name = names[0] if len(names) else "Mitarbeitende/r"
        body = render_template(template, {"full_name": full_name, **targs})
        return to, subject, body

    return render


def persons_without_consent(persons_ds, consent_ds,
                            person_id: str = "identifier",
                            consent_subject: str = "hasDataSubject"):
    """The consent-mailer's upstream filter
    (``mex/extractors/consent_mailer/filter.py:7-25``): drop persons who
    already consented — a broadcast anti join (the consent table is the
    small side: ids only ship once via the closure)."""
    from mex_extractors_ray.stages import joins

    ids = [x for x in consent_ds.unique(consent_subject) if x is not None]
    return joins.anti_join(persons_ds, person_id, ids)
