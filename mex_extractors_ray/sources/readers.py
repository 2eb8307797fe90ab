"""Reader implementations.

| Reference reader | file:line | Here |
|---|---|---|
| CSV → pydantic rows | ``mex/extractors/synopse/extract.py:30-47`` | :func:`read_csv_source` (read_csv + alias rename + cast) |
| Excel multi-sheet → models | ``mex/extractors/sumo/extract.py:26-54`` | pre-converted parquet/CSV per sheet → union (no xlsx lib in container) |
| XML records via XPath | ``mex/extractors/endnote/extract.py:22-95`` | :func:`read_xml_records` (read_binary_files + flat_map parse) |
| JSON files per x_system | ``mex/extractors/drop.py:30-70`` | :func:`read_json_source` |
| paginated REST (Zenodo/Confluence) | ``open_data/connector.py:48-73``, ``confluence_vvt/extract.py:20-76`` | :func:`paginated_source`: page-range dataset → rate-limited actor-pool fetch |
"""

from __future__ import annotations

import time
from typing import Callable

import pyarrow as pa


def read_csv_source(paths, aliases: dict[str, str] | None = None,
                    schema_cast: pa.Schema | None = None):
    """CSV → Dataset with the reference's alias-rename + cast discipline
    (``alias="StudienID"`` etc., ``synopse/models/project.py:18-31``).
    Unknown columns pass through (pydantic ``extra="ignore"`` analog happens
    at select time)."""
    import ray.data

    ds = ray.data.read_csv(paths)

    def normalize(batch: pa.Table) -> pa.Table:
        if aliases:
            batch = batch.rename_columns(
                [aliases.get(c, c) for c in batch.column_names]
            )
        if schema_cast is not None:
            cols = {}
            for f in schema_cast:
                if f.name in batch.column_names:
                    cols[f.name] = batch[f.name].cast(f.type)
            for c in batch.column_names:
                cols.setdefault(c, batch[c])
            batch = pa.table(cols)
        return batch

    return ds.map_batches(normalize, batch_format="pyarrow")


def read_json_source(paths, **kwargs):
    import ray.data

    return ray.data.read_json(paths, **kwargs)


def read_xml_records(paths, record_parser: Callable[[bytes], list[dict]]):
    """Binary files → flat_map of parsed record dicts (endnote shape). The
    parser runs per FILE (files are the parallelism unit, matching the
    reference's per-file iteration)."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(row: dict) -> list[dict]:
        return record_parser(row["bytes"])

    return ds.flat_map(parse)


def read_zip_json(paths, member_pattern: str = r"\.json$"):
    """ZIP-of-JSON reader (``mex/extractors/open_data/extract.py:78-110``:
    fetch zip, extract the ``tableschema_*.json`` members): one task per
    archive via ``read_binary_files`` + flat_map; each matching member
    becomes one row dict with ``_member``/``_path`` provenance. Non-dict
    JSON roots (arrays) explode to one row per element."""
    import io
    import json
    import re
    import zipfile

    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)
    pat = re.compile(member_pattern)

    def parse(row: dict) -> list[dict]:
        out: list[dict] = []
        with zipfile.ZipFile(io.BytesIO(bytes(row["bytes"]))) as zf:
            for member in zf.namelist():
                if not pat.search(member):
                    continue
                doc = json.loads(zf.read(member))
                docs = doc if isinstance(doc, list) else [doc]
                for d in docs:
                    d = d if isinstance(d, dict) else {"value": d}
                    d["_member"] = member
                    d["_path"] = row["path"]
                    out.append(d)
        return out

    return ds.flat_map(parse)


class PaginatedFetch:
    """Actor stage for page-fetch sources: honors a requests/min budget per
    actor (the Zenodo 133-req/min constant-backoff shape,
    ``open_data/connector.py:29-46``). ``fetch_page(page_index) -> list[dict]``
    is injected; retries use constant backoff × ``max_tries``."""

    def __init__(self, fetch_page: Callable[[int], list[dict]],
                 requests_per_minute: float | None = None,
                 max_tries: int = 5, backoff_seconds: float = 1.0):
        self.fetch_page = fetch_page
        self.min_interval = 60.0 / requests_per_minute if requests_per_minute else 0.0
        self.max_tries = max_tries
        self.backoff_seconds = backoff_seconds
        self._last = 0.0

    def _one(self, page: int) -> list[dict]:
        for attempt in range(self.max_tries):
            wait = self.min_interval - (time.monotonic() - self._last)
            if wait > 0:
                time.sleep(wait)
            self._last = time.monotonic()
            try:
                return self.fetch_page(page)
            except Exception:
                if attempt == self.max_tries - 1:
                    raise
                time.sleep(self.backoff_seconds)
        return []

    def __call__(self, batch: dict) -> pa.Table:
        rows: list[dict] = []
        for page in batch["id"].tolist():
            rows.extend(self._one(int(page)))
        return pa.Table.from_pylist(rows) if rows else pa.table({})


def paginated_source(n_pages: int, fetch_page: Callable[[int], list[dict]],
                     concurrency: int = 4, requests_per_minute: float | None = None):
    """Page-range dataset → rate-limited actor-pool fetch. The page list is
    the input partition list (Confluence start/limit loop shape)."""
    import ray.data

    return ray.data.range(n_pages).map_batches(
        PaginatedFetch,
        fn_constructor_args=(fetch_page,),
        fn_constructor_kwargs={"requests_per_minute": requests_per_minute},
        batch_size=1,
        concurrency=concurrency,
        batch_format="numpy",
    )
