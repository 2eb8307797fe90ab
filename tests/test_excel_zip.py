"""Excel (.xlsx) + ZIP-of-JSON readers (pure-stdlib parsing).

Reference parity: multi-sheet Excel ingest with NaN→None scrub
(``mex/extractors/sumo/extract.py:26-54`` and 4 clones) and the
ZIP-of-JSON tableschema reader (``mex/extractors/open_data/extract.py:78-110``).
"""

import json
import zipfile

import pyarrow as pa

from mex_extractors_ray.sources.excel import excel_source, read_excel_sheets, write_xlsx
from mex_extractors_ray.sources.readers import read_zip_json


def _fixture_xlsx(path):
    write_xlsx(
        path,
        {
            "projects": pa.table(
                {
                    "StudienID": ["s1", "s2", "s3"],
                    "Titel": ["Alpha", None, "Gamma <& >"],
                    "Jahr": [1999, 2005, 2024],
                }
            ),
            "valuesets": [
                {"key": "k1", "val": "protected"},
                {"key": "k2", "val": ""},
            ],
        },
    )


def test_read_excel_multi_sheet_roundtrip(tmp_path):
    p = tmp_path / "fixture.xlsx"
    _fixture_xlsx(p)
    sheets = read_excel_sheets(p)
    assert set(sheets) == {"projects", "valuesets"}
    proj = sheets["projects"]
    assert proj.column_names == ["StudienID", "Titel", "Jahr"]
    assert proj["StudienID"].to_pylist() == ["s1", "s2", "s3"]
    # None survives; XML-escaped text round-trips
    assert proj["Titel"].to_pylist() == ["Alpha", None, "Gamma <& >"]
    # coerce_numbers_to_str discipline: integral floats render without '.0'
    assert proj["Jahr"].to_pylist() == ["1999", "2005", "2024"]
    # NaN→None scrub: empty string cell → None
    assert sheets["valuesets"]["val"].to_pylist() == ["protected", None]


def test_read_excel_numbers_native_and_sheet_select(tmp_path):
    p = tmp_path / "fixture.xlsx"
    _fixture_xlsx(p)
    only = read_excel_sheets(p, sheets=["projects"], numbers_as_str=False)
    assert list(only) == ["projects"]
    assert only["projects"]["Jahr"].to_pylist() == [1999.0, 2005.0, 2024.0]


def test_excel_source_distributed(ray_session, tmp_path):
    p = tmp_path / "fixture.xlsx"
    _fixture_xlsx(p)
    out = excel_source([str(p)], sheet="projects").to_pandas()
    assert len(out) == 3
    assert set(out["_sheet"]) == {"projects"}
    assert sorted(out["StudienID"]) == ["s1", "s2", "s3"]


def _fixture_zip(path):
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "tableschema_10.json",
            json.dumps({"fields": [{"name": "a"}], "version": 10}),
        )
        zf.writestr(
            "nested/tableschema_11.json",
            json.dumps({"fields": [{"name": "b"}], "version": 11}),
        )
        zf.writestr("README.txt", "not json")


def test_read_zip_json(ray_session, tmp_path):
    p = tmp_path / "bundle.zip"
    _fixture_zip(p)
    out = read_zip_json([str(p)], member_pattern=r"tableschema_.*\.json$").to_pandas()
    assert sorted(out["version"]) == [10, 11]
    assert set(out["_member"]) == {"tableschema_10.json", "nested/tableschema_11.json"}


def test_read_json_source(ray_session, tmp_path):
    import json as _json

    p = tmp_path / "drop.json"
    p.write_text("\n".join(_json.dumps({"k": i, "v": f"x{i}"}) for i in range(5)))
    from mex_extractors_ray.sources.readers import read_json_source

    out = read_json_source([str(p)]).to_pandas()
    assert sorted(out["k"]) == list(range(5))
