"""Distributed DAG operators (algorithms/dag.py) vs real networkx,
plus the driver-bound NX dag surface on randomized DAGs. The vendored
upstream test_dag slice lives in tests/test_nx_upstream.py; this file
covers the DataFrame API directly."""

from __future__ import annotations

import networkx as realnx
import pytest

import graphscope_spark.nx as gnx
from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import dag as DAGA


def _random_dag(n=60, seed=7):
    """Random DAG: arcs only from lower to higher ids."""
    import random

    rng = random.Random(seed)
    edges = []
    for v in range(1, n):
        for _ in range(rng.randint(1, 3)):
            u = rng.randrange(v)
            edges.append((u, v))
    return sorted(set(edges))


@pytest.fixture(scope="module")
def dag_pair(spark):
    edges = _random_dag()
    lg = LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=True
    ).build(4)
    R = realnx.DiGraph(edges)
    return lg, R


def test_topological_generations_distributed(dag_pair):
    lg, R = dag_pair
    got = {r["id"]: r["generation"]
           for r in DAGA.topological_generations(lg).collect()}
    want = {n: g for g, gen in enumerate(realnx.topological_generations(R))
            for n in gen}
    assert got == want


def test_dag_longest_path_distributed(dag_pair):
    lg, R = dag_pair
    path = DAGA.dag_longest_path(lg)
    # length must equal networkx's optimum; the specific path must be
    # a real path of that length
    assert len(path) - 1 == realnx.dag_longest_path_length(R)
    for u, v in zip(path, path[1:]):
        assert R.has_edge(u, v)


def test_reachability_distributed(dag_pair):
    lg, R = dag_pair
    for s in (0, 1, 7):
        assert {r["id"] for r in DAGA.descendants(lg, s).collect()} \
            == realnx.descendants(R, s)
        assert {r["id"] for r in DAGA.ancestors(lg, s).collect()} \
            == realnx.ancestors(R, s)


def test_cycle_raises(spark):
    lg = LinkGraph.from_edges(
        spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long"),
        directed=True).build()
    with pytest.raises(DAGA.GraphContainsCycle):
        DAGA.topological_generations(lg).collect()


def test_nx_dag_surface_random(spark):
    """Driver NX surface sweep on a random DAG vs real networkx."""
    edges = _random_dag(n=25, seed=13)
    G = gnx.DiGraph(edges, spark=spark)
    R = realnx.DiGraph(edges)
    assert list(gnx.topological_sort(G)) == list(realnx.topological_sort(R))
    assert list(gnx.lexicographical_topological_sort(G)) == \
        list(realnx.lexicographical_topological_sort(R))
    assert [sorted(g) for g in gnx.topological_generations(G)] == \
        [sorted(g) for g in realnx.topological_generations(R)]
    assert gnx.dag_longest_path(G) == realnx.dag_longest_path(R)
    assert gnx.dag_longest_path_length(G) == realnx.dag_longest_path_length(R)
    assert sorted(gnx.transitive_reduction(G).edges) == \
        sorted(realnx.transitive_reduction(R).edges)
    assert sorted(gnx.transitive_closure_dag(G).edges) == \
        sorted(realnx.transitive_closure_dag(R).edges)


def test_all_topological_sorts_raises(spark):
    """The Graph/cycle halves of upstream test_all_topological_sorts_3
    (the vendored original constructs a MultiGraph mid-test and
    xfails)."""
    DG = gnx.DiGraph([(1, 2), (2, 3), (3, 4), (4, 2), (4, 5)], spark=spark)
    with pytest.raises(gnx.NetworkXUnfeasible):
        list(gnx.all_topological_sorts(DG))
    G = gnx.Graph([(1, 2), (2, 3)], spark=spark)
    with pytest.raises(gnx.NetworkXNotImplemented):
        list(gnx.all_topological_sorts(G))
