"""core_numbers / max_core / k_shell-via-decomposition vs real
networkx (reference semantics apps/kcore/kcore.h:79-90 generalized to
the full decomposition; h-index fixpoint = core number, Lü et al.
2016)."""

from __future__ import annotations

import networkx as realnx
import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms import core_numbers, k_core, k_shell, max_core
from tests.conftest import TOY_EDGES, p2p_like_edges


def _nx_cores(edges):
    G = realnx.Graph()
    G.add_edges_from(edges)
    G.remove_edges_from(realnx.selfloop_edges(G))
    return realnx.core_number(G)


def test_core_numbers_toy_vs_networkx(toy_graph):
    got = {r["id"]: r["core"] for r in core_numbers(toy_graph).collect()}
    assert got == _nx_cores(TOY_EDGES)


def test_core_numbers_p2p_vs_networkx(p2p_graph, p2p_edges):
    got = {r["id"]: r["core"] for r in core_numbers(p2p_graph).collect()}
    assert got == _nx_cores(p2p_edges)


def test_max_core_equals_peel(p2p_graph, p2p_edges):
    cores = _nx_cores(p2p_edges)
    kmax = max(cores.values())
    got = sorted(r["id"] for r in max_core(p2p_graph).collect())
    assert got == sorted(v for v, c in cores.items() if c == kmax)
    # and agrees with the iterative peel at k = kmax
    peel = sorted(r["id"] for r in k_core(p2p_graph, kmax).collect())
    assert got == peel


def test_k_shell_equals_decomposition_slice(p2p_graph, p2p_edges):
    cores = _nx_cores(p2p_edges)
    for k in (1, 2, 3):
        got = sorted(r["id"] for r in k_shell(p2p_graph, k).collect())
        assert got == sorted(v for v, c in cores.items() if c == k), k


def test_isolated_vertices_core_zero(spark):
    from graphscope_spark.graph import LinkGraph

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    v = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    g = LinkGraph.from_edges(e, vertices=v)
    got = {r["id"]: r["core"] for r in core_numbers(g).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0}


@pytest.fixture(scope="module")
def small_pair(spark):
    """120-node slice of the p2p generator — every onion layer / core
    value still exercised, at a fraction of the peel rounds (the full
    p2p onion has 24 layers ≈ 100 Spark jobs; this keeps the file
    fast)."""
    edges = p2p_like_edges(n=120, seed=42)
    e = spark.createDataFrame(edges, "src long, dst long")
    from graphscope_spark import LinkGraph

    lg = LinkGraph.from_edges(e).build(4)
    G = realnx.Graph()
    G.add_edges_from(edges)
    G.remove_edges_from(realnx.selfloop_edges(G))
    return lg, G


def test_onion_layers_vs_networkx(small_pair):
    from graphscope_spark.algorithms import onion_layers

    lg, G = small_pair
    want = realnx.onion_layers(G)
    got = {r["id"]: r["layer"] for r in onion_layers(lg).collect()}
    assert got == {k: int(v) for k, v in want.items()}


def test_k_crust_and_corona_vs_networkx(small_pair):
    from graphscope_spark.algorithms import k_corona, k_crust

    lg, G = small_pair
    cores = realnx.core_number(G)
    kmax = max(cores.values())
    for k in (1, kmax - 1):
        got = sorted(r["id"] for r in k_crust(lg, k).collect())
        assert got == sorted(realnx.k_crust(G, k).nodes), f"crust k={k}"
    for k in (2, kmax):
        got = sorted(r["id"] for r in k_corona(lg, k).collect())
        assert got == sorted(realnx.k_corona(G, k).nodes), f"corona k={k}"
