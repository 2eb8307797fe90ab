import pyarrow as pa
import pytest

from mex_extractors_ray.schema import SchemaRegistry, SchemaVersion, sequence_registry


def test_roundtrip_json(tmp_path):
    reg = sequence_registry()
    p = tmp_path / "registry.json"
    reg.dump(p)
    reg2 = SchemaRegistry.load(p)
    assert reg2.latest_version == reg.latest_version
    assert reg2.latest.to_arrow() == reg.latest.to_arrow()
    assert reg2.latest.defaults == reg.latest.defaults


def test_resolve_adds_column_with_default():
    reg = sequence_registry()
    v1 = pa.table(
        {
            "doc_id": pa.array(["a"]),
            "tokens": pa.array([[1, 2]], pa.list_(pa.int32())),
            "n_tok": pa.array([2], pa.int32()),
            "source": pa.array(["s"]),
        }
    )
    out = reg.resolve_table(v1)
    assert out["lang"].to_pylist() == ["de"]
    assert out["n_tok"].type == pa.int64()  # widened


def test_resolve_fills_nulls_with_default_and_passes_system_cols():
    reg = sequence_registry()
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "tokens": pa.array([[1], [2]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1], pa.int32()),
            "source": pa.array(["s", "s"]),
            "lang": pa.array(["en", None]),
            "lsn": pa.array([7, 8], pa.int64()),
        }
    )
    out = reg.resolve_table(t)
    assert out["lang"].to_pylist() == ["en", "de"]
    assert out["lsn"].to_pylist() == [7, 8]
    assert out.column_names[:5] == ["doc_id", "tokens", "n_tok", "source", "lang"]


def test_illegal_narrowing_rejected():
    v1 = SchemaVersion(1, (("a", pa.int64()),))
    v2 = SchemaVersion(2, (("a", pa.int32()),))
    with pytest.raises(ValueError, match="widening"):
        SchemaRegistry([v1, v2])


def test_dropping_column_rejected():
    v1 = SchemaVersion(1, (("a", pa.int64()), ("b", pa.string())))
    v2 = SchemaVersion(2, (("a", pa.int64()),))
    with pytest.raises(ValueError, match="drop"):
        SchemaRegistry([v1, v2])


def test_resolve_to_specific_version():
    reg = sequence_registry()
    t = pa.table(
        {
            "doc_id": pa.array(["a"]),
            "tokens": pa.array([[1]], pa.list_(pa.int32())),
            "n_tok": pa.array([1], pa.int32()),
            "source": pa.array(["s"]),
        }
    )
    out = reg.resolve_table(t, to_version=2)
    assert out["n_tok"].type == pa.int32()  # v2 not yet widened
    assert out["lang"].to_pylist() == ["de"]


# -------------------------------------------------------------------- renames


def _rename_registry() -> SchemaRegistry:
    """v1 (doc_id, n_tok) -> v2 renames n_tok -> len (same type)
    -> v3 renames len -> length AND widens int32 -> int64, adds lang."""
    v1 = SchemaVersion(1, (("doc_id", pa.string()), ("n_tok", pa.int32())))
    v2 = SchemaVersion(2, (("doc_id", pa.string()), ("len", pa.int32())),
                       renames={"n_tok": "len"})
    v3 = SchemaVersion(
        3,
        (("doc_id", pa.string()), ("length", pa.int64()), ("lang", pa.string())),
        defaults={"lang": "de"},
        renames={"len": "length"},
    )
    return SchemaRegistry([v1, v2, v3])


def test_rename_resolves_oldest_name_through_chain():
    reg = _rename_registry()
    v1_file = pa.table({"doc_id": pa.array(["a"]), "n_tok": pa.array([7], pa.int32())})
    out = reg.resolve_table(v1_file)
    assert out.column_names == ["doc_id", "length", "lang"]
    assert out["length"].to_pylist() == [7]
    assert out["length"].type == pa.int64()  # rename + widening compose
    assert out["lang"].to_pylist() == ["de"]
    # the consumed old name must NOT ride along as an extra column
    assert "n_tok" not in out.column_names


def test_rename_resolves_intermediate_name_and_to_version():
    reg = _rename_registry()
    v2_file = pa.table({"doc_id": pa.array(["a"]), "len": pa.array([7], pa.int32())})
    out = reg.resolve_table(v2_file)
    assert out["length"].to_pylist() == [7]
    # resolving a v1 file TO v2 uses only the renames at/below v2
    v1_file = pa.table({"doc_id": pa.array(["a"]), "n_tok": pa.array([7], pa.int32())})
    mid = reg.resolve_table(v1_file, to_version=2)
    assert mid.column_names == ["doc_id", "len"]
    assert mid["len"].type == pa.int32()


def test_rename_current_name_wins_over_alias():
    reg = _rename_registry()
    both = pa.table({
        "doc_id": pa.array(["a"]),
        "length": pa.array([9], pa.int64()),
        "n_tok": pa.array([7], pa.int32()),  # stale alias rides along
    })
    out = reg.resolve_table(both)
    assert out["length"].to_pylist() == [9]
    # the alias was NOT consumed (the real column won) so it passes through
    assert out["n_tok"].to_pylist() == [7]


def test_rename_json_roundtrip(tmp_path):
    reg = _rename_registry()
    p = tmp_path / "r.json"
    reg.dump(p)
    reg2 = SchemaRegistry.load(p)
    v1_file = pa.table({"doc_id": pa.array(["a"]), "n_tok": pa.array([7], pa.int32())})
    assert reg2.resolve_table(v1_file).equals(reg.resolve_table(v1_file))


def test_rename_validation_errors():
    with pytest.raises(ValueError, match="renames unknown column"):
        SchemaRegistry([
            SchemaVersion(1, (("a", pa.int32()),)),
            SchemaVersion(2, (("b", pa.int32()),), renames={"zzz": "b"}),
        ])
    with pytest.raises(ValueError, match="is not a v2 field"):
        SchemaRegistry([
            SchemaVersion(1, (("a", pa.int32()),)),
            SchemaVersion(2, (("a", pa.int32()),), renames={"a": "b"}),
        ])
    with pytest.raises(ValueError, match="ambiguous"):
        SchemaRegistry([
            SchemaVersion(1, (("a", pa.int32()),)),
            SchemaVersion(2, (("a", pa.int32()), ("b", pa.int32())),
                          renames={"a": "b"}),
        ])
    # a rename does not bypass the narrowing check
    with pytest.raises(ValueError, match="only widening"):
        SchemaRegistry([
            SchemaVersion(1, (("a", pa.int64()),)),
            SchemaVersion(2, (("b", pa.int32()),), renames={"a": "b"}),
        ])
    # a rename does not bypass the drop check for the OTHER columns
    with pytest.raises(ValueError, match="may not be dropped"):
        SchemaRegistry([
            SchemaVersion(1, (("a", pa.int32()), ("c", pa.int32()))),
            SchemaVersion(2, (("b", pa.int32()),), renames={"a": "b"}),
        ])


def test_rename_lake_compact_rewrites_to_new_name(ray_session, tmp_path, tmp_lake):
    """End-to-end: a lake written under the stock registry is compacted
    under a v4 that renames source -> origin; reads under v4 resolve old
    files transparently and the rewrite makes the new name physical."""
    from mex_extractors_ray.cdc import ingest_change_log
    from mex_extractors_ray.cdc.apply import read_lake_arrow
    from mex_extractors_ray.cdc.compact import compact, verify_lake
    from mex_extractors_ray.gen import synth_change_log

    stock = sequence_registry()
    v4 = SchemaVersion(
        4,
        (("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
         ("n_tok", pa.int64()), ("origin", pa.string()), ("lang", pa.string())),
        defaults={"lang": "de"},
        renames={"source": "origin"},
    )
    reg4 = SchemaRegistry([stock[1], stock[2], stock[3], v4])

    paths = synth_change_log(tmp_path / "log", n_events=3000, n_docs=400, seed=9)
    ingest_change_log(paths, tmp_lake, num_partitions=4)
    before = read_lake_arrow(tmp_lake)

    # read under the rename registry BEFORE any rewrite: alias resolution
    viewed = read_lake_arrow(tmp_lake, registry=reg4)
    assert "origin" in viewed.column_names and "source" not in viewed.column_names
    assert viewed["origin"].to_pylist() == before["source"].to_pylist()

    # compact under v4: the new name becomes physical; audit green
    compact(tmp_lake, registry=reg4)
    assert all(r["ok"] for r in verify_lake(tmp_lake, registry=reg4))
    after = read_lake_arrow(tmp_lake, registry=reg4)
    assert after.sort_by("doc_id").equals(
        viewed.sort_by("doc_id")), "rename rewrite changed data"


def test_rename_filtered_read_pushes_old_spelling(ray_session, tmp_path, tmp_lake):
    """A predicate on a renamed column against PRE-rename files must push
    the old spelling into the parquet reader (data, not defaults) and
    match the post-filtered full read exactly."""
    import pyarrow.compute as pc

    from mex_extractors_ray.cdc import ingest_change_log
    from mex_extractors_ray.cdc.apply import read_lake_arrow
    from mex_extractors_ray.cdc.filtered import read_lake_filtered_arrow
    from mex_extractors_ray.gen import synth_change_log

    stock = sequence_registry()
    v4 = SchemaVersion(
        4,
        (("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
         ("n_tok", pa.int64()), ("origin", pa.string()), ("lang", pa.string())),
        defaults={"lang": "de"},
        renames={"source": "origin"},
    )
    reg4 = SchemaRegistry([stock[1], stock[2], stock[3], v4])

    paths = synth_change_log(tmp_path / "log", n_events=3000, n_docs=400, seed=9)
    ingest_change_log(paths, tmp_lake, num_partitions=4)

    got = read_lake_filtered_arrow(tmp_lake, [("origin", "==", "src2")],
                                   registry=reg4)
    full = read_lake_arrow(tmp_lake, registry=reg4)
    expect = full.filter(pc.equal(full["origin"], "src2"))
    assert got.num_rows > 0
    assert got.sort_by("doc_id").equals(expect.sort_by("doc_id"))
