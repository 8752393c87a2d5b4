"""SimRank (algorithms/simrank.py + nx wrapper) vs real networkx
(upstream similarity.py::simrank_similarity — the vendored upstream
simrank tests parametrize over callables captured from REAL networkx
at import time, so parity is asserted here directly instead)."""

from __future__ import annotations

import networkx as realnx
import pytest

import graphscope_spark.nx as gnx
from graphscope_spark import LinkGraph
from graphscope_spark.algorithms.simrank import simrank


def _cmp(ours: dict, theirs: dict, tol=1e-3):
    for u in theirs:
        for v in theirs[u]:
            assert ours[u][v] == pytest.approx(theirs[u][v], abs=tol), (u, v)


@pytest.mark.parametrize("maker", [
    lambda m: m.cycle_graph(4),
    lambda m: m.path_graph(5),
    lambda m: m.star_graph(3),
])
def test_simrank_undirected_vs_networkx(spark, maker):
    _cmp(gnx.simrank_similarity(maker(gnx), importance_factor=0.5),
         realnx.simrank_similarity(maker(realnx), importance_factor=0.5))


def test_simrank_directed_and_point_forms(spark):
    edges = [(1, 2), (1, 3), (2, 4), (3, 4)]
    D, R = gnx.DiGraph(edges, spark=spark), realnx.DiGraph(edges)
    a = gnx.simrank_similarity(D, importance_factor=0.6)
    _cmp(a, realnx.simrank_similarity(R, importance_factor=0.6))
    assert gnx.simrank_similarity(D, source=2,
                                  importance_factor=0.6)[3] == a[2][3]
    assert gnx.simrank_similarity(D, source=2, target=3,
                                  importance_factor=0.6) == a[2][3]
    with pytest.raises(gnx.NodeNotFound):
        gnx.simrank_similarity(D, source=99)


def test_simrank_fixed_rounds_monotone(spark):
    """Fixed-round values increase toward the fixpoint (C4 analytic
    fixpoint S(0,2) = 1/3 at C=0.5)."""
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 0)],
                              "src long, dst long")
    lg = LinkGraph.from_edges(e, directed=False).build()
    vals = []
    for r in (1, 2, 8):
        d = {(x["u"], x["v"]): x["s"]
             for x in simrank(lg, importance_factor=0.5,
                              fixed_rounds=r).collect()}
        vals.append(d[(0, 2)])
    assert vals[0] < vals[1] < vals[2]
    assert vals[2] == pytest.approx(1 / 3, abs=1e-3)


def test_simrank_pair_guard(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(50)],
                              "src long, dst long")
    lg = LinkGraph.from_edges(e, directed=True).build()
    with pytest.raises(ValueError, match="max_pairs"):
        simrank(lg, max_pairs=100)
