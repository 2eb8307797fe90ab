"""Export sinks.

Parity with the reference's sink registry (``mex/extractors/sinks/__init__.py``):

- :func:`write_ndjson_with_manifest` — the S3 NDJSON sink
  (``mex/extractors/sinks/s3.py:52-133``): stream items to ndjson part
  files, sha256 every part, then write a ``metadata.json`` manifest with
  checksums + ``write_completed_at``. Here it is distributed (one part per
  block, written by workers) with the manifest committed atomically by the
  driver after all parts land — same two-phase discipline as the lake.
- :func:`write_report_xlsx` — the XLSX report sink (``sinks/s3.py:136-190``).
  No xlsx library ships in this container, so the writer is gated behind an
  import-try and falls back to CSV with an ``.xlsx-unavailable`` marker; the
  naming scheme (class/primary-source/unit) is preserved.
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


def write_report_xlsx(df: pd.DataFrame | pa.Table, out_dir: str | Path,
                      kind: str, primary_source: str, unit: str) -> str:
    """Small driver-side report export (reports are aggregate-sized)."""
    if isinstance(df, pa.Table):
        df = df.to_pandas()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    base = report_name(kind, primary_source, unit)
    try:
        import openpyxl  # noqa: F401

        path = out / f"{base}.xlsx"
        df.to_excel(path, index=False)
    except ImportError:
        path = out / f"{base}.csv"
        df.to_csv(path, index=False)
        (out / f"{base}.xlsx-unavailable").write_text(
            "openpyxl not installed; CSV fallback written"
        )
    return str(path)
