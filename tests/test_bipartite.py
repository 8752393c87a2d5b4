"""Bipartiteness (algorithms/bipartite.py) vs real networkx."""

from __future__ import annotations

import networkx as realnx
import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import (
    bipartite_components,
    is_bipartite,
    two_coloring,
)

from tests.conftest import TOY_EDGES, TOY_VERTICES


def _lg(spark, edges, vertices=None, directed=True):
    return LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"),
        vertices=(
            spark.createDataFrame([(v,) for v in vertices], "id long")
            if vertices is not None else None
        ),
        directed=directed,
    ).build()


def _want(edges, vertices=None):
    G = realnx.Graph()
    G.add_edges_from(edges)
    if vertices is not None:
        G.add_nodes_from(vertices)
    out = {}
    for c in realnx.connected_components(G):
        out[min(c)] = (len(c), realnx.is_bipartite(G.subgraph(c)))
    return out


def test_toy_components_match_networkx(spark):
    got = {r["comp"]: (r["n_vertices"], r["is_bipartite"])
           for r in bipartite_components(
               _lg(spark, TOY_EDGES, TOY_VERTICES)).collect()}
    assert got == _want(TOY_EDGES, TOY_VERTICES)
    assert not is_bipartite(_lg(spark, TOY_EDGES, TOY_VERTICES))


def test_even_cycle_and_odd_cycle(spark):
    even = [(0, 1), (1, 2), (2, 3), (3, 0)]
    odd = [(10, 11), (11, 12), (12, 10)]
    g = _lg(spark, even + odd)
    got = {r["comp"]: r["is_bipartite"]
           for r in bipartite_components(g).collect()}
    assert got == {0: True, 10: False}


def test_two_coloring_proper(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 5)]
    cols = {r["id"]: r["color"] for r in
            two_coloring(_lg(spark, edges)).collect()}
    assert cols[0] == 0
    for u, v in edges:
        assert cols[u] != cols[v], (u, v)
    # odd component: colors NULL for doubled-parity vertices
    tri = two_coloring(_lg(spark, [(7, 8), (8, 9), (9, 7)])).collect()
    assert all(r["color"] is None for r in tri)


def test_self_loop_not_bipartite(spark):
    got = bipartite_components(_lg(spark, [(1, 1)])).collect()
    assert got[0]["is_bipartite"] is False


def test_random_graphs_match(spark):
    for seed, p in [(31, 0.04), (32, 0.12)]:
        nxg = realnx.gnp_random_graph(30, p, seed=seed)
        edges = list(nxg.edges)
        if not edges:
            continue
        got = {r["comp"]: (r["n_vertices"], r["is_bipartite"])
               for r in bipartite_components(
                   _lg(spark, edges, list(nxg.nodes))).collect()}
        assert got == _want(edges, list(nxg.nodes)), seed
