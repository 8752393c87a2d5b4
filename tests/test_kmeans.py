"""Deterministic k-means (functions/kmeans.py) vs a NumPy Lloyd twin."""

from __future__ import annotations

import numpy as np
import pytest

from graphscope_spark.functions.kmeans import kmeans_assign


def _np_kmeans(ids, X, k, iters):
    order = np.argsort(ids)
    ids, X = np.asarray(ids)[order], np.asarray(X, dtype=float)[order]
    C = X[:k].copy()

    def assign(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        dr = np.round(d, 6)
        return dr.argmin(axis=1), dr

    for _ in range(iters):
        a, _ = assign(C)
        for c in range(k):
            m = a == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    a, dr = assign(C)
    return {int(i): (int(c), float(dr[j, c]))
            for j, (i, c) in enumerate(zip(ids, a))}


@pytest.fixture(scope="module")
def blob_data():
    rng = np.random.default_rng(7)
    centers = np.array([[0, 0, 0], [6, 6, 6], [-6, 6, 0]], dtype=float)
    X, ids = [], []
    for i in range(90):
        c = centers[i % 3]
        X.append(c + rng.normal(0, 0.8, size=3))
        ids.append(i)
    return ids, np.array(X)


def test_matches_numpy_twin(spark, blob_data):
    ids, X = blob_data
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x]) for i, x in zip(ids, X)],
        "vec_id long, embedding array<double>",
    )
    for k, iters in [(3, 2), (5, 1), (2, 3)]:
        want = _np_kmeans(ids, X, k, iters)
        got = {r["vec_id"]: (r["cluster"], r["dist2"])
               for r in kmeans_assign(df, k=k, iters=iters).collect()}
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0], (k, iters, i)
            assert got[i][1] == pytest.approx(want[i][1], abs=2e-6), i


def test_blobs_recovered(spark, blob_data):
    ids, X = blob_data
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x]) for i, x in zip(ids, X)],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_assign(df, k=3, iters=4).collect()}
    # all members of a generated blob land in the same cluster
    for blob in range(3):
        cl = {got[i] for i in ids if i % 3 == blob}
        assert len(cl) == 1, blob


def test_empty_cluster_kept_and_k1(spark):
    # two far blobs, k=3 with all three init points in blob A -> at
    # least one centroid can go empty after the first update; the run
    # must not crash and every vector must be assigned
    rows = [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [0.0, 0.1]),
            (3, [9.0, 9.0]), (4, [9.1, 9.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign(df, k=3, iters=2).collect()
    assert len(out) == 5
    one = kmeans_assign(df, k=1, iters=1).collect()
    assert {r["cluster"] for r in one} == {0}
    with pytest.raises(ValueError):
        kmeans_assign(df, k=0)
