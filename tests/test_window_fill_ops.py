"""Unit tests for the session-7 window/reshape additions: ROWS-frame
moving sum, date-spine gap filling, ordered string_agg, percent_rank."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mex_extractors_ray.stages.aggregates import (collect_concat_sorted,
                                                  keyed_percent_rank)
from mex_extractors_ray.stages.sessions import keyed_moving_sum
from mex_extractors_ray.stages.temporal import fill_daily_gaps


def test_keyed_moving_sum_frame(ray_session):
    import ray.data

    t = pa.table({
        "k": ["a", "a", "a", "a", "b"],
        "o": [1, 2, 3, 4, 1],
        "v": [10, 20, 30, 40, 7],
    })
    out = keyed_moving_sum(ray.data.from_arrow(t), "k", ("o",), "v", k=3,
                           num_partitions=2).to_pandas()
    out = out.sort_values(["k", "o"])
    # frames: [10], [10,20], [10,20,30], [20,30,40], b:[7]
    assert out["moving_sum"].tolist() == [10, 30, 60, 90, 7]

    with pytest.raises(Exception):  # float values refused
        keyed_moving_sum(
            ray.data.from_arrow(pa.table({"k": ["a"], "o": [1], "v": [1.5]})),
            "k", ("o",), "v", k=2).to_pandas()


def test_fill_daily_gaps_spine(ray_session):
    import ray.data

    day = 86_400_000_000  # us
    ts = pa.array(np.array([0, 2 * day, 2 * day, 5 * day, day],
                           dtype=np.int64)).cast(pa.timestamp("us"))
    t = pa.table({"k": ["u1", "u1", "u1", "u1", "u2"], "ts": ts,
                  "v": [5, 1, 2, 9, 4]})
    out = fill_daily_gaps(ray.data.from_arrow(t), "k", "ts", "v",
                          num_partitions=2).to_pandas()
    u1 = out[out["k"] == "u1"].sort_values("day")
    # u1 spans day 0..5 inclusive: 6 rows, gaps zero-filled, day 2 summed
    assert u1["v"].tolist() == [5, 0, 3, 0, 0, 9]
    assert u1["day"].tolist() == [
        "1970-01-01", "1970-01-02", "1970-01-03",
        "1970-01-04", "1970-01-05", "1970-01-06"]
    u2 = out[out["k"] == "u2"]
    assert u2["v"].tolist() == [4] and u2["day"].tolist() == ["1970-01-02"]


def test_collect_concat_sorted_keeps_dups(ray_session):
    import ray.data

    t = pa.table({"k": [1, 1, 1, 2, 2], "v": ["b", "a", "b", "x", None]})
    out = collect_concat_sorted(ray.data.from_arrow(t), "k", "v",
                                num_partitions=2).to_pandas()
    m = dict(zip(out["k"], out["value_list"]))
    assert m == {1: "a,b,b", 2: "x"}


def test_keyed_percent_rank_ties(ray_session):
    import ray.data

    t = pa.table({"k": ["a"] * 4 + ["b"], "v": [10, 20, 20, 30, 5]})
    out = keyed_percent_rank(ray.data.from_arrow(t), "k", "v",
                             num_partitions=2).to_pandas()
    a = sorted(out[out["k"] == "a"]["pct_rank"].tolist())
    # ranks over n=4: 1,2,2,4 -> (r-1)/3 = 0, 1/3, 1/3, 1
    assert a == [0.0, 1 / 3, 1 / 3, 1.0]
    assert out[out["k"] == "b"]["pct_rank"].tolist() == [0.0]


def test_keyed_cume_dist_ties(ray_session):
    import ray.data

    from mex_extractors_ray.stages.aggregates import keyed_cume_dist

    t = pa.table({"k": ["a"] * 4 + ["b"], "v": [10, 20, 20, 30, 5]})
    out = keyed_cume_dist(ray.data.from_arrow(t), "k", "v",
                          num_partitions=2).to_pandas()
    a = sorted(out[out["k"] == "a"]["cume_dist"].tolist())
    # <=-counts over n=4: 1,3,3,4 -> .25, .75, .75, 1.0
    assert a == [0.25, 0.75, 0.75, 1.0]
    assert out[out["k"] == "b"]["cume_dist"].tolist() == [1.0]


def test_sliding_distinct_count_window(ray_session):
    import ray.data

    from mex_extractors_ray.stages.windows import sliding_distinct_count

    day = 86_400_000_000
    ts = pa.array(np.array([0, 0, day, 3 * day], dtype=np.int64)) \
        .cast(pa.timestamp("us"))
    # u1 active d0 and d0 (dup), u2 active d1, u1 active d3
    t = pa.table({"u": ["u1", "u1", "u2", "u1"], "ts": ts})
    out = sliding_distinct_count(ray.data.from_arrow(t), "u", "ts",
                                 window_days=2, num_partitions=2) \
        .to_pandas().set_index("day")["n"]
    # window ends: d0:{u1}, d1:{u1,u2}, d2:{u2}, d3:{u1}, d4:{u1}
    assert out.loc["1970-01-01"] == 1
    assert out.loc["1970-01-02"] == 2
    assert out.loc["1970-01-03"] == 1
    assert out.loc["1970-01-04"] == 1
    assert out.loc["1970-01-05"] == 1
    assert len(out) == 5


def test_keyed_moving_extreme_masks_runs(ray_session):
    import ray.data

    from mex_extractors_ray.stages.sessions import keyed_moving_extreme

    t = pa.table({
        "k": ["a", "a", "a", "b", "b"],
        "o": [1, 2, 3, 1, 2],
        "v": [5, 1, 9, 100, 2],
    })
    mx = keyed_moving_extreme(ray.data.from_arrow(t), "k", ("o",), "v",
                              k=2, mode="max", num_partitions=2) \
        .to_pandas().sort_values(["k", "o"])
    # a: [5], [5,1], [1,9]; b: [100], [100,2] — no bleed across keys
    assert mx["moving_max"].tolist() == [5, 5, 9, 100, 100]
    mn = keyed_moving_extreme(ray.data.from_arrow(t), "k", ("o",), "v",
                              k=2, mode="min", num_partitions=2) \
        .to_pandas().sort_values(["k", "o"])
    assert mn["moving_min"].tolist() == [5, 1, 1, 100, 2]


def test_keyed_ohlc_order_and_extremes(ray_session):
    import ray.data

    from mex_extractors_ray.stages.aggregates import keyed_ohlc

    t = pa.table({
        "k": ["a", "a", "a", "b"],
        "d": ["x", "x", "x", "x"],
        "o": [2, 1, 3, 1],
        "v": [50, 10, 30, 7],
    })
    out = keyed_ohlc(ray.data.from_arrow(t), ["k", "d"], ["o"], "v",
                     num_partitions=2).to_pandas().set_index("k")
    a = out.loc["a"]
    # order by o: values 10 (o=1), 50 (o=2), 30 (o=3)
    assert (a.open_c, a.high_c, a.low_c, a.close_c) == (10, 50, 10, 30)
    b = out.loc["b"]
    assert (b.open_c, b.high_c, b.low_c, b.close_c) == (7, 7, 7, 7)
