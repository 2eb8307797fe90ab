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


def test_consent_email_renderer_parity():
    """Mirrors mex/extractors/consent_mailer/transform.py:15-61: domain
    filter + '; ' join, skip-on-no-address, fullName[0] default, template
    variable interpolation with template_args."""
    from mex_extractors_ray.stages.sinks import consent_email_renderer, render_template

    config = {"consent": {"subject": "Bitte Einwilligung",
                          "template_args": {"deadline": "2026-09-01"}}}
    template = "<p>Hallo {{ full_name }},</p><p>bitte bis {{ deadline }}.</p>"
    render = consent_email_renderer(config, template)

    # multi-address person: only @rki.de addresses, joined with '; '
    to, subj, body = render({
        "email": ["x@gmail.com", "a@rki.de", "b@rki.de"],
        "fullName": ["Dr. A. Person", "A. P."],
    })
    assert to == "a@rki.de; b@rki.de"
    assert subj == "Bitte Einwilligung"
    assert "Hallo Dr. A. Person," in body and "bis 2026-09-01." in body

    # no in-domain address → skipped (the reference returns None)
    to2, _, _ = render({"email": ["x@gmail.com"], "fullName": ["B"]})
    assert to2 is None

    # missing fullName → the reference's fallback salutation
    _, _, body3 = render({"email": ["c@rki.de"], "fullName": []})
    assert "Hallo Mitarbeitende/r," in body3

    # unknown placeholder renders empty (jinja2 default-undefined analog)
    assert render_template("x{{ nope }}y", {}) == "xy"


def test_consent_mailer_end_to_end(ray_session):
    """filter_persons_without_consent analog (broadcast anti join) chained
    into smtp_sink with the consent renderer and a fake transport."""
    import ray.data

    from mex_extractors_ray.stages.sinks import (
        consent_email_renderer,
        persons_without_consent,
        smtp_sink,
    )

    persons = ray.data.from_items([
        {"identifier": "p1", "email": ["a@rki.de"], "fullName": ["A"]},
        {"identifier": "p2", "email": ["b@rki.de"], "fullName": ["B"]},
        {"identifier": "p3", "email": ["c@other.org"], "fullName": ["C"]},
        {"identifier": "p4", "email": ["d@rki.de"], "fullName": ["D"]},
    ])
    consents = ray.data.from_items([{"hasDataSubject": "p2"}])
    todo = persons_without_consent(persons, consents)
    config = {"consent": {"subject": "S", "template_args": {}}}
    render = consent_email_renderer(config, "Hi {{ full_name }}")
    sent = []
    n = smtp_sink(todo.take_all(), render,
                  transport=lambda f, t, m: sent.append(t), sender="mex@rki.de")
    # p2 consented (filtered), p3 has no in-domain address (skipped)
    assert n == 2 and sorted(sent) == ["a@rki.de", "d@rki.de"]
