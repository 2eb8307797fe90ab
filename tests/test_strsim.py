"""Edit-distance-1 similarity join (deletion-neighborhood buckets)."""

import numpy as np

from mex_extractors_ray.stages.strsim import edit1_pairs


def _ds(words):
    import ray.data

    return ray.data.from_items([{"word": w} for w in words])


def _lev(a, b):
    la, lb = len(a), len(b)
    d = np.arange(lb + 1)
    for i in range(1, la + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, lb + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (a[i - 1] != b[j - 1]))
    return d[lb]


def _run(words):
    out = edit1_pairs(_ds(words), "word", num_partitions=4).to_pandas()
    if out.empty:
        return set()
    return set(map(tuple, out[["a", "b"]].to_numpy().tolist()))


def test_edit1_semantics(ray_session):
    got = _run(["cat", "bat", "cats", "ca", "dog", "cat"])  # incl. duplicate
    assert got == {("bat", "cat"), ("cat", "cats"), ("ca", "cat")}


def test_edit1_no_distance2_false_positives(ray_session):
    # "ab" and "ba" share delete-1 variants at different positions
    # (both "a" and "b") but are distance 2 — must NOT pair
    got = _run(["ab", "ba"])
    assert got == set()


def test_edit1_vs_reference_dp(ray_session):
    rng = np.random.default_rng(13)
    words = list({"".join(rng.choice(list("abcd"), size=rng.integers(1, 6)))
                  for _ in range(200)})
    got = _run(words)
    want = {(a, b) for i, a in enumerate(words) for b in words[i + 1:]
            if _lev(*sorted((a, b))) == 1}
    want = {tuple(sorted(p)) for p in want}
    assert got == want
