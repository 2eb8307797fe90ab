import pyarrow.parquet as pq

from mex_extractors_ray.stages import filters


def test_rule_filter_with_reject_sink_single_pass(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_items(
        [{"t": "x", "v": 9}, {"t": "a", "v": 1}, {"t": "b", "v": 9}] * 10
    )
    rules = [
        {"name": "bad_type", "column": "t", "op": "in", "values": ["x"]},
        {"name": "low", "column": "v", "op": "<", "value": 5},
    ]
    sink = tmp_path / "rejects"
    kept = filters.apply_rule_filter(ds, rules, reject_sink_dir=str(sink)).to_pandas()
    assert len(kept) == 10
    assert set(kept["t"]) == {"b"}
    files = list(sink.glob("rejects-*.parquet"))
    assert files
    rej = pq.read_table(files).to_pandas() if len(files) == 1 else None
    import pandas as pd

    rej = pd.concat([pq.read_table(f).to_pandas() for f in files])
    assert len(rej) == 20
    assert set(rej["_reject_reason"]) == {"bad_type", "low"}
