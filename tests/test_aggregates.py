

def test_percentile_gate(ray_session):
    import pyarrow as pa
    import ray.data

    from mex_extractors_ray.stages.aggregates import percentile_gate

    t = pa.table({"x": pa.array([1, 2, 3, 4, 5, 6, 7, 8, None], pa.int64())})
    ds = ray.data.from_arrow(t)
    kept, thr = percentile_gate(ds, "x", q=0.25, mode="above", num_partitions=4)
    # nearest-rank P25 of 8 non-null values: rank ceil(0.25*8)=2 → value 2
    assert thr == 2
    assert sorted(kept.to_pandas()["x"].tolist()) == [2, 3, 4, 5, 6, 7, 8]
    below, thr2 = percentile_gate(ds, "x", q=0.5, mode="below", num_partitions=4)
    assert thr2 == 4
    assert sorted(below.to_pandas()["x"].tolist()) == [1, 2, 3]


def test_percentile_gate_empty(ray_session):
    import pyarrow as pa
    import ray.data

    from mex_extractors_ray.stages.aggregates import percentile_gate

    ds = ray.data.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    kept, thr = percentile_gate(ds, "x", q=0.5)
    assert thr is None and kept.count() == 0


def test_grouped_distinct_count_exact(ray_session):
    import pyarrow as pa
    import ray.data

    from mex_extractors_ray.stages.aggregates import grouped_distinct_count

    t = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b", None, "a", "b"]),
        "v": pa.array([1, 1, 2, 7, 7, 5, None, 8], pa.int64()),
    })
    # repartition(4): the same (k,v) pair recurs across batches — the
    # pair-hash shuffle must still count it once
    ds = ray.data.from_arrow(t).repartition(4)
    out = grouped_distinct_count(ds, "k", "v", out_col="n",
                                 num_partitions=4).to_pandas()
    got = {(None if pd_isna(r.k) else r.k): int(r.n)
           for r in out.itertuples()}
    # nulls in v excluded; null key its own group
    assert got == {"a": 2, "b": 2, None: 1}


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_token_concentration_brute(ray_session):
    import pyarrow as pa
    import ray.data

    from mex_extractors_ray.stages.text import token_concentration

    docs = [
        (0, "a a a a"),          # conc = 16/16 → 1_000_000
        (1, "a b c d"),          # 4/16 → 250_000
        (2, "a a b"),            # (4+1)/9 → 555_555
        (3, ""),                 # dropped
        (4, None),               # dropped
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })).repartition(2)
    out = token_concentration(ds).to_pandas().sort_values("doc_id")
    assert dict(zip(out["doc_id"], out["conc_c6"])) == {
        0: 1_000_000, 1: 250_000, 2: 555_555}
