"""betweenness_centrality / harmonic_centrality vs real networkx
(the reference pins these semantics by forwarding networkx's own test
suites — nx/tests/algorithms/forward/centrality/
test_betweenness_centrality.py, test_harmonic_centrality.py)."""

from __future__ import annotations

import math
import warnings

import networkx as realnx
import pytest

import graphscope_spark.nx as gnx
from graphscope_spark.algorithms import (
    betweenness_centrality,
    harmonic_centrality,
)
from graphscope_spark.graph import LinkGraph


def _mirror(nxg, spark):
    g = gnx.DiGraph(spark=spark) if nxg.is_directed() else gnx.Graph(spark=spark)
    g.add_nodes_from(nxg.nodes)
    g.add_edges_from(nxg.edges)
    return g


@pytest.fixture(scope="module")
def und(spark):
    nxg = realnx.gnp_random_graph(30, 0.12, seed=5)
    nxg.add_edge(100, 101)  # disconnected 2-clique
    nxg.add_node(200)  # isolate
    return nxg, _mirror(nxg, spark)


@pytest.fixture(scope="module")
def dig(spark):
    nxg = realnx.gnp_random_graph(26, 0.1, seed=9, directed=True)
    return nxg, _mirror(nxg, spark)


def _close(a: dict, b: dict, tol=1e-9):
    assert set(a) == set(b)
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=0, abs_tol=tol), (
            k, a[k], b[k])


def test_betweenness_undirected(und):
    nxg, g = und
    _close(gnx.betweenness_centrality(g),
           realnx.betweenness_centrality(nxg))


def test_betweenness_directed(dig):
    nxg, g = dig
    _close(gnx.betweenness_centrality(g),
           realnx.betweenness_centrality(nxg))


def test_betweenness_unnormalized(und, dig):
    nxg, g = und
    _close(gnx.betweenness_centrality(g, normalized=False),
           realnx.betweenness_centrality(nxg, normalized=False))
    nxg, g = dig
    _close(gnx.betweenness_centrality(g, normalized=False),
           realnx.betweenness_centrality(nxg, normalized=False))


def test_betweenness_endpoints(und, dig):
    nxg, g = und
    _close(gnx.betweenness_centrality(g, endpoints=True),
           realnx.betweenness_centrality(nxg, endpoints=True))
    nxg, g = dig
    _close(gnx.betweenness_centrality(g, endpoints=True),
           realnx.betweenness_centrality(nxg, endpoints=True))


def test_betweenness_path_graph_exact(spark):
    # P4: inner nodes lie on 1*2=2... textbook values, exact
    nxg = realnx.path_graph(4)
    g = _mirror(nxg, spark)
    _close(gnx.betweenness_centrality(g, normalized=False),
           realnx.betweenness_centrality(nxg, normalized=False))


def test_betweenness_sampled_k_rescale(und):
    """k-sample estimator: deterministic draw, NX n/k rescale; on a
    graph where k == n it must equal the exact values."""
    nxg, g = und
    n = nxg.number_of_nodes()
    _close(gnx.betweenness_centrality(g, k=n),
           realnx.betweenness_centrality(nxg))


def test_betweenness_auto_sample_warns(spark):
    nxg = realnx.path_graph(12)
    g = _mirror(nxg, spark)
    lg = g._flush()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        betweenness_centrality(lg, landmark_threshold=8, auto_k=12).count()
    assert any("sampled-source estimator" in str(x.message) for x in w)


def test_harmonic_undirected(und):
    nxg, g = und
    _close(gnx.harmonic_centrality(g), realnx.harmonic_centrality(nxg), 1e-9)


def test_harmonic_directed_incoming(dig):
    """directed harmonic uses INCOMING distances (NX semantics)."""
    nxg, g = dig
    _close(gnx.harmonic_centrality(g), realnx.harmonic_centrality(nxg), 1e-9)


def test_harmonic_nbunch(und):
    nxg, g = und
    nb = [0, 3, 100]
    _close(gnx.harmonic_centrality(g, nbunch=nb),
           realnx.harmonic_centrality(nxg, nbunch=nb), 1e-9)


def test_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    lg = LinkGraph.from_edges(e).build()
    assert betweenness_centrality(lg).count() == 0
    assert harmonic_centrality(lg).count() == 0


def test_betweenness_multi_edges_collapse(spark):
    """parallel edges must not multiply shortest-path counts."""
    e = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 3), (2, 3), (2, 3)], "src long, dst long")
    lg = LinkGraph.from_edges(e, directed=False).build()
    nxg = realnx.Graph([(1, 2), (2, 3)])
    got = {r["id"]: r["centrality"]
           for r in betweenness_centrality(lg, normalized=False).collect()}
    want = realnx.betweenness_centrality(nxg, normalized=False)
    assert got == pytest.approx(want)


def _mirror_w(nxg, spark):
    g = gnx.DiGraph(spark=spark) if nxg.is_directed() else gnx.Graph(spark=spark)
    g.add_nodes_from(nxg.nodes)
    g.add_weighted_edges_from(
        (u, v, d["weight"]) for u, v, d in nxg.edges(data=True))
    return g


@pytest.fixture(scope="module")
def und_w(spark):
    nxg = realnx.gnp_random_graph(24, 0.14, seed=7)
    rng = __import__("random").Random(3)
    for u, v in nxg.edges:
        # small integers: equal-cost multi-path ties are common, so the
        # float-equality path counting is genuinely exercised
        nxg[u][v]["weight"] = rng.choice([1.0, 2.0, 3.0])
    nxg.add_edge(100, 101, weight=5.0)  # disconnected component
    nxg.add_node(200)  # isolate
    return nxg, _mirror_w(nxg, spark)


@pytest.fixture(scope="module")
def dig_w(spark):
    nxg = realnx.gnp_random_graph(22, 0.12, seed=11, directed=True)
    rng = __import__("random").Random(5)
    for u, v in nxg.edges:
        nxg[u][v]["weight"] = float(rng.randint(1, 4))
    return nxg, _mirror_w(nxg, spark)


def test_betweenness_weighted_undirected(und_w):
    nxg, g = und_w
    _close(gnx.betweenness_centrality(g, weight="weight"),
           realnx.betweenness_centrality(nxg, weight="weight"))


def test_betweenness_weighted_directed(dig_w):
    nxg, g = dig_w
    _close(gnx.betweenness_centrality(g, weight="weight"),
           realnx.betweenness_centrality(nxg, weight="weight"))


def test_betweenness_weighted_unnormalized_endpoints(und_w):
    nxg, g = und_w
    _close(gnx.betweenness_centrality(g, weight="weight", normalized=False),
           realnx.betweenness_centrality(nxg, weight="weight",
                                         normalized=False))
    _close(gnx.betweenness_centrality(g, weight="weight", endpoints=True),
           realnx.betweenness_centrality(nxg, weight="weight",
                                         endpoints=True))


def test_betweenness_weighted_vs_unweighted_differ(spark):
    """A weighted detour flips which vertex is the broker: P3 1-2-3
    plus a heavy direct edge 1-3 — unweighted says 2 has 0 (direct
    edge wins ties? no: direct path length 1 < 2, so 2 gets 0);
    weighted with w(1,3)=10 routes through 2."""
    nxg = realnx.Graph()
    nxg.add_edge(1, 2, weight=1.0)
    nxg.add_edge(2, 3, weight=1.0)
    nxg.add_edge(1, 3, weight=10.0)
    g = _mirror_w(nxg, spark)
    got_w = gnx.betweenness_centrality(g, weight="weight",
                                       normalized=False)
    want_w = realnx.betweenness_centrality(nxg, weight="weight",
                                           normalized=False)
    _close(got_w, want_w)
    assert got_w[2] == pytest.approx(1.0)
    got_u = gnx.betweenness_centrality(g, normalized=False)
    assert got_u[2] == pytest.approx(0.0)


def test_betweenness_weighted_equal_cost_paths(spark):
    """diamond with equal-cost parallel routes: sigma must split the
    dependency between the two mid vertices."""
    nxg = realnx.Graph()
    for u, v, w in [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0),
                    (3, 4, 2.0), (0, 4, 4.0)]:
        nxg.add_edge(u, v, weight=w)
    g = _mirror_w(nxg, spark)
    _close(gnx.betweenness_centrality(g, weight="weight",
                                      normalized=False),
           realnx.betweenness_centrality(nxg, weight="weight",
                                         normalized=False))


def _ebc_close(a: dict, b: dict, und: bool, tol=1e-9):
    bk = {tuple(sorted(k)) if und else k: v for k, v in b.items()}
    ak = {tuple(sorted(k)) if und else k: v for k, v in a.items()}
    assert set(ak) == set(bk)
    for k in ak:
        assert math.isclose(ak[k], bk[k], rel_tol=0, abs_tol=tol), (
            k, ak[k], bk[k])


def test_edge_betweenness_undirected(und):
    nxg, g = und
    _ebc_close(gnx.edge_betweenness_centrality(g),
               realnx.edge_betweenness_centrality(nxg), und=True)
    _ebc_close(gnx.edge_betweenness_centrality(g, normalized=False),
               realnx.edge_betweenness_centrality(nxg, normalized=False),
               und=True)


def test_edge_betweenness_directed(dig):
    nxg, g = dig
    _ebc_close(gnx.edge_betweenness_centrality(g),
               realnx.edge_betweenness_centrality(nxg), und=False)


def test_edge_betweenness_weighted(und_w, dig_w):
    nxg, g = und_w
    _ebc_close(gnx.edge_betweenness_centrality(g, weight="weight"),
               realnx.edge_betweenness_centrality(nxg, weight="weight"),
               und=True)
    nxg, g = dig_w
    _ebc_close(gnx.edge_betweenness_centrality(g, weight="weight"),
               realnx.edge_betweenness_centrality(nxg, weight="weight"),
               und=False)
