"""Standalone graph-quality metrics: modularity, degree histogram,
power-law alpha (louvain.modularity, degree.degree_histogram,
degree.powerlaw_alpha) vs hand twins and real networkx."""

from __future__ import annotations

import math

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms.degree import degree_histogram, powerlaw_alpha
from graphscope_spark.algorithms.louvain import modularity

nx = pytest.importorskip("networkx")

# two 4-cliques joined by one bridge — the textbook 2-community graph
_CLIQUES = (
    [(a, b) for a in range(4) for b in range(a + 1, 4)]
    + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    + [(3, 10)]
)


def _g(spark, edges, directed=False):
    return LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=directed
    ).build()


def test_modularity_matches_networkx(spark):
    g = _g(spark, _CLIQUES)
    comm = {frozenset(range(4)), frozenset(range(10, 14))}
    labels = [(v, min(c)) for c in comm for v in c]
    lab_df = spark.createDataFrame(labels, "id long, label long")
    row = modularity(g, lab_df).collect()[0]
    G = nx.Graph(_CLIQUES)
    want = nx.algorithms.community.modularity(G, comm)
    assert row["modularity"] == pytest.approx(round(want, 6), abs=2e-6)
    assert row["n_communities"] == 2


def test_modularity_trivial_partitions(spark):
    g = _g(spark, _CLIQUES)
    verts = sorted({v for e in _CLIQUES for v in e})
    # all-in-one community: Q = 0 by definition
    one = spark.createDataFrame([(v, 1) for v in verts], "id long, label long")
    assert modularity(g, one).collect()[0]["modularity"] == pytest.approx(
        0.0, abs=1e-9
    )
    # singletons: Q = -Σ (d_v/2m)^2 < 0
    solo = spark.createDataFrame([(v, v) for v in verts], "id long, label long")
    assert modularity(g, solo).collect()[0]["modularity"] < 0


def test_modularity_weighted(spark):
    edges = [(1, 2, 3.0), (2, 3, 1.0), (3, 4, 3.0)]
    g = LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        directed=True,
    ).build()
    lab = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "id long, label long"
    )
    row = modularity(g, lab, weight="weight").collect()[0]
    G = nx.Graph()
    G.add_weighted_edges_from(edges)
    want = nx.algorithms.community.modularity(
        G, [{1, 2}, {3, 4}], weight="weight"
    )
    assert row["modularity"] == pytest.approx(round(want, 6), abs=2e-6)


def test_degree_histogram(spark):
    # star: hub in-degree 0/out-degree 5; leaves in-degree 1
    g = _g(spark, [(0, i) for i in range(1, 6)], directed=True)
    hist = {r["degree"]: r["cnt"] for r in degree_histogram(g, "in").collect()}
    assert hist == {0: 1, 1: 5}
    hist_out = {
        r["degree"]: r["cnt"] for r in degree_histogram(g, "out").collect()
    }
    assert hist_out == {5: 1, 0: 5}
    hist_both = {
        r["degree"]: r["cnt"] for r in degree_histogram(g, "both").collect()
    }
    assert hist_both == {5: 1, 1: 5}


def test_powerlaw_alpha_formula(spark):
    edges = []
    # hand-built in-degrees: vertex v has in-degree v (v = 1..6)
    for v in range(1, 7):
        edges += [(100 + i, v) for i in range(v)]
    g = _g(spark, edges, directed=True)
    row = powerlaw_alpha(g, d_min=2, mode="in").collect()[0]
    tail = [d for d in range(1, 7) if d >= 2]
    want = 1 + len(tail) / sum(math.log(d / 1.5) for d in tail)
    assert row["alpha"] == pytest.approx(round(want, 6), abs=2e-6)
    assert (row["n_tail"], row["d_min"]) == (len(tail), 2)


def test_powerlaw_alpha_guards(spark):
    g = _g(spark, [(1, 2)], directed=True)
    with pytest.raises(ValueError):
        powerlaw_alpha(g, d_min=1)
    row = powerlaw_alpha(g, d_min=2).collect()[0]  # empty tail
    assert row["alpha"] is None and row["n_tail"] == 0
