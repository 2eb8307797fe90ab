"""As-of join + windowed aggregates (custom operators Ray Data lacks;
streaming extensions — the reference is batch-only, SURVEY.md §2.10)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from mex_extractors_ray.stages.asof import asof_join
from mex_extractors_ray.stages.windows import hopping_window, tumbling_window


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


def test_asof_backward_with_misses(ray_session):
    left = _ds(
        [
            {"id": 1, "k": "a", "t": 10},
            {"id": 2, "k": "a", "t": 25},
            {"id": 3, "k": "b", "t": 5},   # before any right row for b
            {"id": 4, "k": "c", "t": 50},  # key with no right rows
        ]
    )
    right = _ds(
        [
            {"k": "a", "t": 8, "state": "a8"},
            {"k": "a", "t": 20, "state": "a20"},
            {"k": "b", "t": 7, "state": "b7"},
        ]
    )
    out = (
        asof_join(left, right, on="t", by="k", direction="backward")
        .to_pandas().sort_values("id")
    )
    assert out["state"].tolist() == ["a8", "a20", None, None]


def test_asof_forward(ray_session):
    left = _ds([{"id": 1, "k": "a", "t": 10}])
    right = _ds([{"k": "a", "t": 9, "state": "old"}, {"k": "a", "t": 12, "state": "new"}])
    out = asof_join(left, right, on="t", by="k", direction="forward").to_pandas()
    assert out["state"].tolist() == ["new"]


def _mk_events(n=500, seed=3):
    rng = np.random.default_rng(seed)
    ts = pd.to_datetime(rng.integers(0, 100_000, size=n), unit="s")
    return [{"ts": t, "value": float(v)} for t, v in zip(ts, rng.random(n) * 50)]


def _oracle_tumbling(rows, width):
    df = pd.DataFrame(rows)
    sec = df["ts"].astype("int64") // 10**9
    ws = (sec // width) * width
    v = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    g = pd.DataFrame({"window_start": ws, "v": v}).groupby("window_start")
    return g["v"].sum().to_dict(), g.size().to_dict()


def test_tumbling_matches_local_oracle(ray_session):
    rows = _mk_events()
    out = tumbling_window(_ds(rows), "ts", "value", 3600).to_pandas()
    sums, counts = _oracle_tumbling(rows, 3600)
    assert dict(zip(out["window_start"], out["value_c100"])) == sums
    assert dict(zip(out["window_start"], out["n"])) == counts


def test_hopping_panes_equals_rowwise(ray_session):
    rows = _mk_events()
    a = hopping_window(_ds(rows), "ts", "value", 7200, 3600, panes=False).to_pandas()
    b = hopping_window(_ds(rows), "ts", "value", 7200, 3600, panes=True).to_pandas()
    ka = a.sort_values("window_start").reset_index(drop=True)
    kb = b.sort_values("window_start").reset_index(drop=True)
    assert ka.equals(kb)
    # every row lands in exactly width/hop windows (minus edge clamp at 0)
    assert ka["n"].sum() >= len(rows)
