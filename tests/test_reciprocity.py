"""Reciprocity + condensation (algorithms/reciprocity.py) vs real
networkx, incl. the nx-layer wrappers."""

from __future__ import annotations

import networkx as realnx
import pytest

import graphscope_spark.nx as gnx
from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import (
    condensation_edges,
    overall_reciprocity,
    reciprocity,
)

from tests.conftest import TOY_EDGES, TOY_VERTICES


def _lg(spark, edges):
    return LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=True
    ).build()


def _gnx(spark, nxg):
    g = gnx.DiGraph(spark=spark)
    g.add_nodes_from(nxg.nodes)
    g.add_edges_from(nxg.edges)
    return g


def test_per_node_matches_networkx(spark):
    nxg = realnx.DiGraph(TOY_EDGES)
    got = {r["id"]: r["reciprocity"]
           for r in reciprocity(_lg(spark, TOY_EDGES)).collect()}
    want = realnx.reciprocity(nxg, nodes=list(nxg.nodes))
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v


def test_overall_matches_networkx(spark):
    for edges in (TOY_EDGES, [(1, 2), (2, 1)], [(1, 2), (2, 3)]):
        nxg = realnx.DiGraph(edges)
        got = overall_reciprocity(_lg(spark, edges)).collect()[0]["reciprocity"]
        assert got == pytest.approx(realnx.overall_reciprocity(nxg), abs=1e-12)


def test_nx_wrappers_reciprocity(spark):
    nxg = realnx.gnp_random_graph(20, 0.15, seed=3, directed=True)
    g = _gnx(spark, nxg)
    assert gnx.overall_reciprocity(g) == pytest.approx(
        realnx.overall_reciprocity(nxg), abs=1e-12)
    some = [n for n in nxg.nodes if nxg.degree(n) > 0][:5]
    assert gnx.reciprocity(g, some) == pytest.approx(
        realnx.reciprocity(nxg, some), abs=1e-12)
    n0 = some[0]
    assert gnx.reciprocity(g, n0) == pytest.approx(
        realnx.reciprocity(nxg, n0), abs=1e-12)
    iso = gnx.DiGraph(spark=spark)
    iso.add_node(99)
    iso.add_edge(1, 2)
    with pytest.raises(ValueError):
        gnx.reciprocity(iso, 99)


def test_condensation_matches_networkx(spark):
    nxg = realnx.gnp_random_graph(25, 0.1, seed=9, directed=True)
    g = _gnx(spark, nxg)
    ours = gnx.condensation(g)
    theirs = realnx.condensation(nxg)
    # compare as quotient graphs keyed by member frozensets
    # the compat layer stores node attrs in _node (its .nodes is a
    # plain id list, unlike real NX's NodeView)
    ours_nodes = {ours._node[n]["members"] for n in ours.nodes}
    theirs_nodes = {frozenset(theirs.nodes[n]["members"]) for n in theirs.nodes}
    assert ours_nodes == theirs_nodes
    def eset(pairs, memb_of):
        return {(memb_of(u), memb_of(v)) for u, v in pairs}
    ours_edges = eset(ours.edges, lambda n: ours._node[n]["members"])
    theirs_edges = eset(theirs.edges,
                        lambda n: frozenset(theirs.nodes[n]["members"]))
    assert ours_edges == theirs_edges


def test_condensation_edges_distributed(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (5, 1)]
    got = {(r["scc_src"], r["scc_dst"])
           for r in condensation_edges(_lg(spark, edges)).collect()}
    assert got == {(1, 3), (5, 1)}


def test_undirected_rejected(spark):
    und = LinkGraph.from_edges(
        spark.createDataFrame([(1, 2)], "src long, dst long"), directed=False
    ).build()
    with pytest.raises(ValueError):
        reciprocity(und)
    with pytest.raises(ValueError):
        overall_reciprocity(und)
