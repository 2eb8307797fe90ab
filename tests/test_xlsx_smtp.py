"""Round-3 sink completions: real pure-stdlib XLSX writer (round-trips
through the pure-stdlib reader) and the SMTP consent-mailer sink."""

import pandas as pd

from mex_extractors_ray.sources.excel import read_excel_sheets
from mex_extractors_ray.stages.sinks import smtp_sink, write_report_xlsx, write_xlsx_bytes


def test_xlsx_round_trip_through_own_reader(tmp_path):
    df = pd.DataFrame(
        {
            "name": ["alice", "böb <&> \"q\"", None],
            "n": [1, 2, 30],
            "score": [1.5, -2.25, 0.0],
        }
    )
    path = write_report_xlsx(df, tmp_path, "Consent", "grippeweb", "FG 99")
    assert path.endswith("consent_grippeweb_fg_99.xlsx")
    sheets = read_excel_sheets(path, numbers_as_str=False)
    (t,) = sheets.values()
    assert t.column_names == ["name", "n", "score"]
    assert t["name"].to_pylist() == ["alice", 'böb <&> "q"', None]
    assert t["n"].to_pylist() == [1.0, 2.0, 30.0]  # xlsx numbers are doubles
    assert t["score"].to_pylist() == [1.5, -2.25, 0.0]


def test_xlsx_wide_sheet_column_letters(tmp_path):
    df = pd.DataFrame({f"c{i}": [i] for i in range(30)})  # crosses Z → AA
    b = write_xlsx_bytes(df)
    (t,) = read_excel_sheets(b, numbers_as_str=False).values()
    assert t.num_columns == 30
    assert t["c29"].to_pylist() == [29.0]


def test_smtp_sink_renders_and_sends_via_transport():
    sent = []

    def transport(frm, to, msg_bytes):
        sent.append((frm, to, msg_bytes))

    rows = [
        {"email": "a@rki.de", "name": "A"},
        {"email": None, "name": "skipped"},
        {"email": "b@rki.de", "name": "B"},
    ]
    n = smtp_sink(
        rows,
        render=lambda r: (r["email"], f"Consent for {r['name']}", f"Hello {r['name']}"),
        transport=transport,
        sender="mex@rki.de",
    )
    assert n == 2 and len(sent) == 2
    frm, to, raw = sent[0]
    assert frm == "mex@rki.de" and to == "a@rki.de"
    assert b"Subject: Consent for A" in raw and b"Hello A" in raw
