"""End-to-end test of the composed training-data export pipeline."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs_table() -> pa.Table:
    rng = np.random.default_rng(11)
    words = np.array(["alpha", "beta", "gamma", "delta", "the", "of", "to",
                      "in", "is", "customer", "merge"])
    texts, langs = [], []
    for i in range(300):
        texts.append(" ".join(rng.choice(words, size=int(rng.integers(5, 40)))))
        langs.append(["en", "de", "fr"][i % 3])
    # plant exact duplicates: docs 200..219 copy docs 0..19
    for j in range(20):
        texts[200 + j] = texts[j]
    # plant a degenerate high-repetition doc
    texts[250] = "spam " * 30
    return pa.table({
        "doc_id": pa.array(np.arange(300, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
    })


def _run(tmp_path, name):
    import ray.data

    from mex_extractors_ray.pipelines.training_export import export_training_data

    ds = ray.data.from_arrow(_docs_table())
    return export_training_data(
        ds, tmp_path / name,
        rates={"en": (1, 1), "de": (1, 2), "fr": (1, 1)},
        max_dup_word_frac=0.92,
        redact_patterns=[(r"\bcustomer\b", "<PII>")],
        seed=5, epoch=2, num_shards=4, concurrency=2,
    )


def _read_shards(root) -> dict[int, pa.Table]:
    out = {}
    for d in sorted(root.glob("shard=*")):
        shard = int(d.name.split("=")[1])
        t = pa.concat_tables([pq.read_table(p) for p in sorted(d.glob("*.parquet"))])
        out[shard] = t.sort_by([("shuffle_key", "ascending")])
    return out


def test_export_end_to_end(ray_session, tmp_path):
    manifest = _run(tmp_path, "run1")
    shards = _read_shards(tmp_path / "run1")
    assert set(shards) == {0, 1, 2, 3}

    all_rows = pa.concat_tables(
        [t.select(["doc_id", "text", "lang"]) for t in shards.values()],
        promote_options="default").to_pandas()

    # dedup: the 20 planted copies lost to their doc_id<20 originals
    assert not set(range(200, 220)) & set(all_rows["doc_id"])
    assert set(range(0, 20)) <= set(all_rows["doc_id"]) | {
        i for i in range(20)}  # originals eligible (may drop via lang rate)

    # repetition gate: the degenerate doc is gone
    assert 250 not in set(all_rows["doc_id"])

    # stratified mix: de rows obey doc_id % 2 < 1
    de = all_rows[all_rows["lang"] == "de"]
    assert (de["doc_id"] % 2 < 1).all()

    # redaction applied
    assert not all_rows["text"].str.contains("customer").any()

    # shard routing is the shuffle-key residue
    for shard, t in shards.items():
        keys = np.asarray(t["shuffle_key"], dtype=np.uint64)
        assert (keys % 4 == shard).all()

    # manifest lists every parquet file with a valid checksum
    from mex_extractors_ray.cdc.manifest import sha256_file

    listed = {f["name"]: f["sha256_checksum"] for f in manifest["files"]}
    on_disk = {str(p.relative_to(tmp_path / "run1"))
               for p in (tmp_path / "run1").rglob("*.parquet")}
    assert set(listed) == on_disk and len(on_disk) > 0
    for name, digest in listed.items():
        assert sha256_file(tmp_path / "run1" / name) == digest
    assert json.loads((tmp_path / "run1" / "manifest.json").read_text())["num_shards"] == 4


def test_export_rerun_selects_identical_rows(ray_session, tmp_path):
    _run(tmp_path, "a")
    _run(tmp_path, "b")
    a, b = _read_shards(tmp_path / "a"), _read_shards(tmp_path / "b")
    assert set(a) == set(b)
    for shard in a:
        ta = a[shard].select(["doc_id", "text", "shuffle_key"])
        tb = b[shard].select(["doc_id", "text", "shuffle_key"])
        assert ta.equals(tb), f"shard {shard} differs between re-runs"


def test_export_commit_marker_skip_and_invalidate(ray_session, tmp_path):
    m1 = _run(tmp_path, "c")
    # committed + intact + same params -> returned without recompute
    m2 = _run(tmp_path, "c")
    assert m2["write_completed_at"] == m1["write_completed_at"]

    # tampering with a shard file invalidates the commit -> full re-export
    victim = next((tmp_path / "c").rglob("*.parquet"))
    victim.write_bytes(victim.read_bytes() + b"x")
    m3 = _run(tmp_path, "c")
    assert m3["write_completed_at"] != m1["write_completed_at"]
    from mex_extractors_ray.pipelines.training_export import _verified_manifest

    assert _verified_manifest(tmp_path / "c") is not None

    # different parameters over the same dir also re-export
    import ray.data

    from mex_extractors_ray.pipelines.training_export import export_training_data

    m4 = export_training_data(
        ray.data.from_arrow(_docs_table()), tmp_path / "c",
        seed=99, epoch=0, num_shards=4, concurrency=2)
    assert m4["params"]["seed"] == 99
    assert m4["write_completed_at"] != m3["write_completed_at"]


def test_export_near_dedup_keeps_cluster_min(ray_session, tmp_path):
    import ray.data

    from mex_extractors_ray.pipelines.training_export import export_training_data

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    texts = {
        10: base,
        11: base + " phi",          # near-dup of 10 (not exact)
        12: base + " chi psi",      # near-dup of 10/11 → one cluster {10,11,12}
        20: "totally different words entirely unrelated content here now " * 2,
        21: "another unique document with its own vocabulary and phrasing " * 2,
    }
    t = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)]),
        "lang": pa.array(["en"] * len(texts)),
    })
    manifest = export_training_data(
        ray.data.from_arrow(t), tmp_path / "nd",
        near_dedup=True,
        near_dedup_params={"k": 2, "num_perm": 64, "bands": 32, "threshold": 0.5},
        seed=1, epoch=0, num_shards=2,
    )
    kept = pa.concat_tables(
        [pq.read_table(p) for p in sorted((tmp_path / "nd").rglob("*.parquet"))])
    ids = sorted(kept["doc_id"].to_pylist())
    assert ids == [10, 20, 21]  # cluster {10,11,12} collapsed to its min
    assert manifest["params"]["near_dedup"] is True

    # re-run is a no-op (manifest commit marker covers the near-dedup params)
    again = export_training_data(
        ray.data.from_arrow(t), tmp_path / "nd",
        near_dedup=True,
        near_dedup_params={"k": 2, "num_perm": 64, "bands": 32, "threshold": 0.5},
        seed=1, epoch=0, num_shards=2,
    )
    assert again == manifest


def test_export_near_dedup_no_pairs_is_noop(ray_session, tmp_path):
    import ray.data

    from mex_extractors_ray.pipelines.training_export import export_training_data

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["one single document alpha beta gamma delta epsilon",
                          "completely different second text zeta eta theta iota"]),
        "lang": pa.array(["en", "en"]),
    })
    export_training_data(ray.data.from_arrow(t), tmp_path / "np",
                         near_dedup=True, seed=0, num_shards=1)
    kept = pa.concat_tables(
        [pq.read_table(p) for p in sorted((tmp_path / "np").rglob("*.parquet"))])
    assert sorted(kept["doc_id"].to_pylist()) == [1, 2]


def test_export_near_dedup_requires_integer_ids(ray_session, tmp_path):
    import ray.data

    from mex_extractors_ray.pipelines.training_export import export_training_data

    t = pa.table({
        "doc_id": pa.array(["doc-1", "doc-2"]),
        "text": pa.array(["alpha beta gamma delta", "epsilon zeta eta theta"]),
        "lang": pa.array(["en", "en"]),
    })
    with pytest.raises(ValueError, match="integer"):
        export_training_data(ray.data.from_arrow(t), tmp_path / "bad",
                             near_dedup=True, num_shards=1)
