"""Product-quantization ANN: lossless-machinery check plus determinism."""

import numpy as np
import pyarrow as pa

from mex_extractors_ray.stages.similarity import (PQCodebooks, _normalize,
                                                  ann_topk, pq_topk)


def _corpus(n, d, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d))


def test_pq_lossless_when_ksub_covers_corpus(ray_session):
    import ray.data

    # ksub >= corpus size: every subvector becomes its own centroid, so
    # ADC reconstructs the exact inner products and the top-k SET equals
    # brute force (order may differ only on float-sum ties)
    n, d = 60, 16
    x = _corpus(n, d, 5)
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in x],
                                        pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    q = _normalize(_corpus(3, d, 9))
    qids = np.arange(3)
    exact = ann_topk(ds, q, qids, k=5)
    pq_res = pq_topk(ds, q, qids, k=5, m=4, ksub=64, sample_size=n)
    for qid in qids:
        e = set(exact[exact.query_id == qid].vec_id)
        p = set(pq_res[pq_res.query_id == qid].vec_id)
        assert e == p, (qid, e, p)


def test_pq_codebooks_deterministic_and_bounded():
    x = _corpus(100, 32, 1)
    a = PQCodebooks(x, m=8, ksub=16, seed=3)
    b = PQCodebooks(x, m=8, ksub=16, seed=3)
    for ca, cb in zip(a.books, b.books):
        assert np.array_equal(ca, cb)
    codes = a.encode(_normalize(x))
    assert codes.shape == (100, 8) and codes.dtype == np.uint8
    assert codes.max() < 16
    # ADC score equals the sum of per-subspace LUT entries by definition
    lut = a.lut(_normalize(x[:2]))
    assert lut.shape == (2, 8, 16)
