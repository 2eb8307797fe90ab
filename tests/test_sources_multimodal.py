"""Source readers + multimodal plumbing tests."""

import numpy as np
import pyarrow as pa

from mex_extractors_ray.sources import (
    PaginatedFetch,
    paginated_source,
    read_csv_source,
    read_xml_records,
)
from mex_extractors_ray.stages.multimodal import (
    MediaFeatures,
    extract_media_features,
    media_content_hash,
)


def test_csv_reader_alias_and_cast(ray_session, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("StudienID,Titel\n1,alpha\n2,beta\n")
    ds = read_csv_source(
        [str(p)],
        aliases={"StudienID": "studien_id", "Titel": "titel"},
        schema_cast=pa.schema([("studien_id", pa.string())]),
    )
    df = ds.to_pandas()
    assert sorted(df.columns) == ["studien_id", "titel"]
    assert df["studien_id"].tolist() == ["1", "2"]


def test_xml_reader(ray_session, tmp_path):
    p = tmp_path / "r.xml"
    p.write_text("<records><r><id>1</id></r><r><id>2</id></r></records>")

    def parse(data: bytes):
        import xml.etree.ElementTree as ET

        root = ET.fromstring(data.decode())
        return [{"id": int(r.find("id").text)} for r in root.findall("r")]

    out = read_xml_records([str(p)], parse).to_pandas()
    assert sorted(out["id"].tolist()) == [1, 2]


def test_paginated_source(ray_session):
    def fetch(page: int):
        return [{"page": page, "item": i} for i in range(3)]

    out = paginated_source(4, fetch, concurrency=2).to_pandas()
    assert len(out) == 12
    assert sorted(out["page"].unique().tolist()) == [0, 1, 2, 3]


def test_paginated_fetch_retries():
    calls = {"n": 0}

    def flaky(page: int):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return [{"ok": page}]

    f = PaginatedFetch(flaky, max_tries=5, backoff_seconds=0.0)
    assert f._one(7) == [{"ok": 7}]
    assert calls["n"] == 3


def test_media_features_shape():
    mf = MediaFeatures()
    batch = pa.table(
        {
            "media_id": pa.array(["a", "b"]),
            "media_type": pa.array(["image/png", "audio/wav"]),
            "payload": pa.array([b"xxxx", b"yyyyyy"], pa.binary()),
        }
    )
    out = mf(batch)
    assert out.column_names == ["media_id", "features"]
    assert all(len(v) == MediaFeatures.FEATURE_DIM for v in out["features"].to_pylist())
    # deterministic fake codec: same payload -> same features
    assert out["features"].to_pylist() == mf(batch)["features"].to_pylist()


def test_media_pipeline(ray_session):
    import ray.data

    items = [
        {"media_id": str(i), "media_type": "image/png", "payload": bytes([i]) * (i + 1)}
        for i in range(10)
    ]
    ds = ray.data.from_items(items)
    out = extract_media_features(ds, concurrency=2, batch_size=4).to_pandas()
    assert len(out) == 10


def test_media_content_hash():
    b = pa.table({"payload": pa.array([b"aa", b"aa", b"bb"], pa.binary())})
    out = media_content_hash(b)
    h = out["payload_hash"].to_pylist()
    assert h[0] == h[1] != h[2]
