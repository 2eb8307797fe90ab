"""Token-array n-gram analytics (stages/tokens.py): row-boundary masking
in the vectorized bigram kernel and distributed top-k vs brute force."""

from collections import Counter

import numpy as np
import pyarrow as pa

from mex_extractors_ray.stages.tokens import _bigram_keys, token_bigram_topk


def test_bigram_kernel_masks_row_boundaries():
    col = pa.array([[1, 2, 3], [], [4], [5, 6], [], [7]], pa.list_(pa.int32()))
    assert sorted(_bigram_keys(col, 10).tolist()) == [12, 23, 56]
    assert len(_bigram_keys(pa.array([[]], pa.list_(pa.int32())), 10)) == 0
    assert len(_bigram_keys(pa.array([], pa.list_(pa.int32())), 10)) == 0


def test_topk_matches_brute_force(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    rows = [rng.integers(0, 7, size=rng.integers(0, 12)).tolist()
            for _ in range(400)]
    brute = Counter()
    for r in rows:
        for x, y in zip(r, r[1:]):
            brute[x * 50 + y] += 1
    expected = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    ds = ray.data.from_arrow(
        pa.table({"tokens": pa.array(rows, pa.list_(pa.int32()))}))
    got = token_bigram_topk(ds, "tokens", vocab_size=50, k=10,
                            num_partitions=4)
    assert list(zip(got["bg"].to_pylist(), got["n"].to_pylist())) == expected
