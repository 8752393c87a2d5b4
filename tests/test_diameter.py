"""Double-sweep diameter lower bound (algorithms/paths.py) — exact on
paths/trees/cycles, a valid lower bound everywhere (vs networkx)."""

from __future__ import annotations

import hashlib

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms.paths import diameter_double_sweep

nx = pytest.importorskip("networkx")


def _g(spark, edges):
    return LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long")
    ).build()


def test_path_graph_exact(spark):
    row = diameter_double_sweep(_g(spark, [(i, i + 1) for i in range(6)])).collect()[0]
    assert row["start"] == 0
    assert row["ecc_start"] == 6
    assert row["far"] == 6
    assert row["diameter_lb"] == 6


def test_star_exact(spark):
    row = diameter_double_sweep(_g(spark, [(0, i) for i in range(1, 6)])).collect()[0]
    assert row["diameter_lb"] == 2
    assert row["far"] == 1  # min-id tiebreak among depth-1 leaves


def test_tree_exact_and_cycle(spark):
    # random tree: double sweep is exact on trees
    T = nx.random_labeled_tree(24, seed=5)
    row = diameter_double_sweep(_g(spark, list(T.edges()))).collect()[0]
    assert row["diameter_lb"] == nx.diameter(T)
    C = nx.cycle_graph(9)
    row = diameter_double_sweep(_g(spark, list(C.edges()))).collect()[0]
    assert row["diameter_lb"] == nx.diameter(C)  # 4


def test_lower_bound_on_random_graph(spark):
    es = []
    for i in range(30):
        for j in range(i + 1, 30):
            h = int(hashlib.md5(f"9:{i}:{j}".encode()).hexdigest(), 16)
            if h % 11 == 0:
                es.append((i, j))
    G = nx.Graph(es)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    start = min(G.nodes)
    row = diameter_double_sweep(
        _g(spark, list(G.edges())), start=start
    ).collect()[0]
    assert row["diameter_lb"] <= nx.diameter(G)
    assert row["diameter_lb"] >= nx.eccentricity(G, start)
