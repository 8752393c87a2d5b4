"""Strongly connected components (algorithms/scc.py) vs real networkx,
plus the nx-layer wrappers."""

from __future__ import annotations

import networkx as realnx
import pytest

import graphscope_spark.nx as gnx
from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import (
    is_strongly_connected,
    number_strongly_connected_components,
    scc,
)

from tests.conftest import TOY_EDGES, TOY_VERTICES


def _want(nxg):
    out = {}
    for comp in realnx.strongly_connected_components(nxg):
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def _got(graph, **kw):
    return {r["id"]: r["scc"] for r in scc(graph, **kw).collect()}


def _lg(spark, edges, vertices=None):
    g = LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"),
        vertices=(
            spark.createDataFrame([(v,) for v in vertices], "id long")
            if vertices is not None
            else None
        ),
        directed=True,
    )
    return g.build()


def test_toy_matches_networkx(spark):
    nxg = realnx.DiGraph(TOY_EDGES)
    nxg.add_nodes_from(TOY_VERTICES)
    assert _got(_lg(spark, TOY_EDGES, TOY_VERTICES)) == _want(nxg)


def test_random_digraphs_match_networkx(spark):
    for seed, p in [(1, 0.05), (2, 0.08), (3, 0.03)]:
        nxg = realnx.gnp_random_graph(40, p, seed=seed, directed=True)
        edges = list(nxg.edges)
        if not edges:
            continue
        assert _got(_lg(spark, edges, list(nxg.nodes))) == _want(nxg), seed


def test_nested_peel_order(spark):
    """SCC {5,6} feeds SCC {1,2}: the downstream SCC contains the
    smaller ids, so forward coloring paints {1,2} with color 1 while
    {5,6} keeps color 5 — both settle in ONE peel. The reverse wiring
    ({1,2} -> {5,6}) floods color 1 over the downstream SCC, whose
    members can't reach vertex 1, forcing a second peel round."""
    for edges in (
        [(5, 6), (6, 5), (1, 2), (2, 1), (5, 1)],
        [(5, 6), (6, 5), (1, 2), (2, 1), (1, 5)],
    ):
        nxg = realnx.DiGraph(edges)
        assert _got(_lg(spark, edges)) == _want(nxg), edges


def test_dag_all_singletons(spark):
    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)]
    got = _got(_lg(spark, edges))
    assert got == {v: v for v in (1, 2, 3, 4)}


def test_self_loop_and_trim_off(spark):
    edges = [(1, 1), (1, 2), (3, 2)]
    nxg = realnx.DiGraph(edges)
    want = _want(nxg)
    assert _got(_lg(spark, edges)) == want
    assert _got(_lg(spark, edges), trim=False) == want


def test_empty_graph(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame([], "src long, dst long"), directed=True
    ).build()
    assert scc(g).count() == 0


def test_undirected_rejected(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame([(1, 2)], "src long, dst long"), directed=False
    ).build()
    with pytest.raises(ValueError):
        scc(g)


def test_counts_and_strong_connectivity(spark):
    cycle = [(0, 1), (1, 2), (2, 0)]
    g = _lg(spark, cycle)
    assert number_strongly_connected_components(g) == 1
    assert is_strongly_connected(g)
    chain = _lg(spark, [(0, 1), (1, 2)])
    assert number_strongly_connected_components(chain) == 3
    assert not is_strongly_connected(chain)


def test_nx_wrappers(spark):
    nxg = realnx.gnp_random_graph(25, 0.08, seed=7, directed=True)
    g = gnx.DiGraph(spark=spark)
    g.add_nodes_from(nxg.nodes)
    g.add_edges_from(nxg.edges)
    ours = sorted(map(sorted, gnx.strongly_connected_components(g)))
    theirs = sorted(map(sorted, realnx.strongly_connected_components(nxg)))
    assert ours == theirs
    assert gnx.number_strongly_connected_components(g) == len(theirs)
    assert gnx.is_strongly_connected(g) == realnx.is_strongly_connected(nxg)
    und = gnx.Graph(spark=spark)
    und.add_edge(1, 2)
    with pytest.raises(TypeError):
        list(gnx.strongly_connected_components(und))
