"""Projection pushdown on lake reads: `columns=` prunes at the parquet
reader (the tokens payload never leaves disk for metadata queries) while
the live merge — which needs (doc_id, lsn) internally — stays exact, and
registry defaults still fill additive columns absent from old files."""

import pyarrow as pa
import pytest

from mex_extractors_ray.cdc import ingest_change_log
from mex_extractors_ray.cdc.apply import read_lake, read_lake_arrow


@pytest.fixture(scope="module")
def lake(ray_session, small_log, tmp_path_factory):
    paths, _ = small_log
    d = str(tmp_path_factory.mktemp("projlake") / "lake")
    # two windows -> base + delta layout, so the merge is real
    ingest_change_log(list(paths[:-1]), d, num_partitions=4)
    ingest_change_log([paths[-1]], d, num_partitions=4)
    return d


def test_projected_equals_full_select(lake):
    full = read_lake_arrow(lake)
    for cols in [["doc_id", "source"], ["source", "n_tok"], ["lang"],
                 ["doc_id", "lsn"], ["n_tok"]]:
        got = read_lake_arrow(lake, columns=cols)
        exp = full.select(cols)
        if "doc_id" not in cols:  # projected reads sort by first output col
            exp = exp.sort_by([(cols[0], "ascending")])
            got = got.sort_by([(c, "ascending") for c in cols])
            exp = exp.sort_by([(c, "ascending") for c in cols])
        assert got.equals(exp), cols


def test_projected_restores_additive_default(lake):
    # schema_mix logs contain v1 rows (no lang column in old files); the
    # column-restricted resolve must still fill the registry default
    got = read_lake_arrow(lake, columns=["doc_id", "lang"])
    assert got["lang"].null_count == 0
    full = read_lake_arrow(lake)
    assert got["lang"].to_pylist() == full["lang"].to_pylist()


def test_projected_distributed_matches(ray_session, lake):
    import ray

    ds = read_lake(lake, columns=["doc_id", "n_tok"])
    got = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by(
        [("doc_id", "ascending")])
    assert got.column_names == ["doc_id", "n_tok"]
    exp = read_lake_arrow(lake).select(["doc_id", "n_tok"])
    assert got.equals(exp)


def test_projected_rejects_unknown(lake):
    with pytest.raises(KeyError):
        read_lake_arrow(lake, columns=["doc_id", "nope"])


def test_projected_prunes_payload_bytes(lake, monkeypatch):
    # the tokens column must never be requested from the parquet reader
    import pyarrow.parquet as pq_mod

    seen: list[list[str] | None] = []
    orig = pq_mod.read_table

    def spy(path, *a, **kw):
        seen.append(kw.get("columns"))
        return orig(path, *a, **kw)

    monkeypatch.setattr("mex_extractors_ray.cdc.apply.pq.read_table", spy)
    read_lake_arrow(lake, columns=["source"])
    data_reads = [c for c in seen if c is not None]
    assert data_reads and all("tokens" not in c for c in data_reads)
