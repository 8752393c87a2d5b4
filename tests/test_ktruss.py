"""k-truss (algorithms/ktruss.py) vs real networkx."""

from __future__ import annotations

import networkx as realnx
import pytest

import graphscope_spark.nx as gnx
from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import k_truss


def _lg(spark, edges, directed=True):
    return LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=directed
    ).build()


def _want(nxg, k):
    T = realnx.k_truss(realnx.Graph(nxg), k)
    return {(min(u, v), max(u, v)) for u, v in T.edges}


def _got(spark, edges, k):
    return {(r["src"], r["dst"])
            for r in k_truss(_lg(spark, edges), k).collect()}


def test_two_triangles_sharing_edge(spark):
    # K4 minus one edge: every edge in >=1 triangle; 3-truss = all,
    # 4-truss = only the edges of... verify against NX
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]
    for k in (3, 4, 5):
        assert _got(spark, edges, k) == _want(realnx.Graph(edges), k), k


def test_random_graphs_match_networkx(spark):
    for seed, p in [(21, 0.25), (22, 0.35)]:
        nxg = realnx.gnp_random_graph(18, p, seed=seed)
        edges = [(u, v) for u, v in nxg.edges]
        for k in (3, 4, 5):
            assert _got(spark, edges, k) == _want(nxg, k), (seed, k)


def test_deep_peel_cascade(spark):
    """A triangle chain where removing the weakest edge cascades:
    forces multiple peel rounds."""
    edges = [(0, 1), (1, 2), (0, 2),
             (2, 3), (3, 4), (2, 4),
             (4, 5), (5, 6), (4, 6)]
    for k in (3, 4):
        assert _got(spark, edges, k) == _want(realnx.Graph(edges), k), k


def test_k_below_3_and_selfloop(spark):
    edges = [(1, 1), (1, 2), (2, 3)]
    got = _got(spark, edges, 2)
    assert got == {(1, 2), (2, 3)}  # canonical simple edges unchanged
    assert _got(spark, edges, 3) == set()


def test_nx_wrapper(spark):
    nxg = realnx.gnp_random_graph(16, 0.3, seed=5)
    g = gnx.Graph(spark=spark)
    g.add_nodes_from(nxg.nodes)
    g.add_edges_from(nxg.edges)
    ours = gnx.k_truss(g, 4)
    theirs = realnx.k_truss(nxg, 4)
    ours_e = {(min(u, v), max(u, v)) for u, v in ours.edges}
    theirs_e = {(min(u, v), max(u, v)) for u, v in theirs.edges}
    assert ours_e == theirs_e
