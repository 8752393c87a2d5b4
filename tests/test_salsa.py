"""SALSA (algorithms/salsa.py) vs a NumPy power-iteration twin, plus
the paper's stationary-distribution property."""

from __future__ import annotations

import numpy as np
import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import salsa

from tests.conftest import TOY_EDGES, TOY_VERTICES


def _np_salsa(nodes, edges, rounds):
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    indeg = np.zeros(n)
    outdeg = np.zeros(n)
    E = [(idx[u], idx[v]) for u, v in edges]
    for u, v in E:
        outdeg[u] += 1
        indeg[v] += 1
    na = (indeg > 0).sum()
    a = np.where(indeg > 0, 1.0 / na, 0.0)
    h = np.zeros(n)
    for _ in range(rounds):
        h = np.zeros(n)
        for u, v in E:
            h[u] += a[v] / indeg[v]
        a = np.zeros(n)
        for u, v in E:
            if outdeg[u] > 0:
                a[v] += h[u] / outdeg[u]
    return ({v: a[idx[v]] for v in nodes}, {v: h[idx[v]] for v in nodes})


def _lg(spark, edges, vertices=None):
    return LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"),
        vertices=(
            spark.createDataFrame([(v,) for v in vertices], "id long")
            if vertices is not None else None
        ),
        directed=True,
    ).build()


def test_fixed_rounds_match_numpy(spark):
    wa, wh = _np_salsa(TOY_VERTICES, TOY_EDGES, rounds=6)
    got = {r["id"]: r for r in
           salsa(_lg(spark, TOY_EDGES, TOY_VERTICES), fixed_rounds=6).collect()}
    for v in TOY_VERTICES:
        assert got[v]["authority"] == pytest.approx(wa[v], abs=1e-12), v
        assert got[v]["hub"] == pytest.approx(wh[v], abs=1e-12), v


def test_mass_conservation(spark):
    out = salsa(_lg(spark, TOY_EDGES, TOY_VERTICES), fixed_rounds=9).collect()
    assert sum(r["authority"] for r in out) == pytest.approx(1.0, abs=1e-12)


def test_converged_is_indeg_proportional(spark):
    """Paper Thm 2 on a strongly connected authority graph: stationary
    authority mass is indegree-proportional. 3-cycle: uniform."""
    cyc = [(0, 1), (1, 2), (2, 0)]
    got = {r["id"]: r["authority"]
           for r in salsa(_lg(spark, cyc), tol=1e-12).collect()}
    for v in (0, 1, 2):
        assert got[v] == pytest.approx(1.0 / 3, abs=1e-9)


def test_degenerate_and_undirected(spark):
    # no in-edges at all is impossible with edges; edgeless graph:
    g = LinkGraph.from_edges(
        spark.createDataFrame([], "src long, dst long"),
        vertices=spark.createDataFrame([(1,), (2,)], "id long"),
        directed=True,
    ).build()
    rows = {r["id"]: r for r in salsa(g, fixed_rounds=3).collect()}
    assert all(r["authority"] == 0.0 and r["hub"] == 0.0 for r in rows.values())
    und = LinkGraph.from_edges(
        spark.createDataFrame([(1, 2)], "src long, dst long"), directed=False
    ).build()
    with pytest.raises(ValueError):
        salsa(und)
