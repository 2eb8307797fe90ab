

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
