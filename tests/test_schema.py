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
