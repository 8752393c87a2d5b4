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


def test_semantic_dedup_prunes_planted_dups(spark):
    """Plant near-identical pairs inside separated blobs: keep-first
    drops the larger id of each planted pair and nothing else."""
    from graphscope_spark.functions.kmeans import semantic_dedup
    rows = [
        (0, [0.0, 1.0]), (1, [0.02, 1.0]),     # near-dup pair, blob A
        (2, [1.0, 0.9]),                        # same blob, distinct
        (10, [5.0, -5.0]), (11, [5.0, -4.9]),   # near-dup pair, blob B
        (12, [-5.0, -5.0]),                     # blob C, alone
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semantic_dedup(df, k=3, iters=2, threshold=0.999).collect()}
    assert len(out) == 6
    assert out[1]["keep"] is False and out[11]["keep"] is False
    for i in (0, 2, 10, 12):
        assert out[i]["keep"] is True, i
    # smallest id per cluster carries the -1 sentinel
    assert out[0]["max_sim_smaller"] == -1.0
    # cross-check the max-sim values against numpy
    import numpy as np
    v = {i: np.array(x) for i, x in rows}
    cos = float(v[0] @ v[1] / (np.linalg.norm(v[0]) * np.linalg.norm(v[1])))
    assert out[1]["max_sim_smaller"] == pytest.approx(round(cos, 6), abs=1e-6)


def test_semantic_dedup_cluster_boundary(spark):
    """Identical vectors in DIFFERENT clusters are NOT compared — the
    documented trade of cluster-bounded pruning."""
    from graphscope_spark.functions.kmeans import semantic_dedup
    rows = [(0, [0.0, 1.0]), (1, [10.0, -10.0]), (2, [10.0, -10.0]),
            (3, [0.0, 1.01])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semantic_dedup(df, k=2, iters=2, threshold=0.999).collect()}
    # 1 and 2 identical + same cluster -> 2 dropped; 0 and 3 same
    # cluster near-identical -> 3 dropped
    assert out[2]["keep"] is False
    assert out[3]["keep"] is False
    assert out[0]["keep"] is True and out[1]["keep"] is True
