"""Distributed PCA (functions/embeddings.py) vs numpy."""

from __future__ import annotations

import numpy as np
import pytest

from graphscope_spark.functions.embeddings import (
    embedding_covariance,
    pca_project,
)


def _data(n=200, d=6, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic gaussian so components are well separated
    scales = np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    x = rng.normal(size=(n, d)) * scales
    x = x + np.array([1.0, -2.0, 0.0, 0.5, 0.0, 3.0])
    return x.astype(np.float32)


def _df(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )


def test_covariance_matches_numpy(spark):
    x = _data()
    got = embedding_covariance(_df(spark, x), "embedding").collect()
    want = np.cov(x.astype(np.float64).T, bias=True)
    assert len(got) == 6 * 7 // 2
    for r in got:
        assert r["cov"] == pytest.approx(want[r["i"], r["j"]], abs=1e-9)


def test_projection_matches_numpy(spark):
    x = _data()
    k = 3
    got = {
        r["vec_id"]: np.array(r["proj"])
        for r in pca_project(_df(spark, x), "embedding", k=k).collect()
    }
    xd = x.astype(np.float64)
    cov = np.cov(xd.T, bias=True)
    w, u = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = []
    for idx in order:
        c = u[:, idx]
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        comps.append(c)
    want = (xd - xd.mean(axis=0)) @ np.array(comps).T
    for i in range(len(xd)):
        assert np.allclose(got[i], want[i], atol=1e-6)


def test_whiten_unit_variance(spark):
    x = _data(n=400)
    proj = pca_project(_df(spark, x), "embedding", k=2, whiten=True)
    vals = np.array([r["proj"] for r in proj.collect()])
    var = vals.var(axis=0)
    assert np.allclose(var, 1.0, atol=0.05)


def test_null_vector(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [3.0, 5.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r["proj"] for r in pca_project(df, k=1).collect()}
    assert rows[1] is None
    assert rows[0] is not None
