"""Louvain vs the pure-Python oracle (identical reference semantics,
louvain.h:74-329) — exact community match on deterministic graphs,
modularity sanity. Mirrors the reference test shape
(test_app.py:342 louvain(p2p_undirected, min_progress=50,
progress_tries=2))."""

from __future__ import annotations

from graphscope_spark.algorithms import louvain
from graphscope_spark.oracles import oracle_louvain
from tests.conftest import TOY_EDGES, TOY_VERTICES, p2p_like_edges


def _communities(df):
    return {r["id"]: r["community"] for r in df.collect()}


def test_louvain_toy_adaptive(toy_graph):
    got = _communities(louvain(toy_graph))
    exp = oracle_louvain(TOY_EDGES, vertices=TOY_VERTICES)
    assert got == exp
    # two structural components must never merge
    assert {got[v] for v in (0, 1, 2)} & {got[v] for v in (9, 10, 11)} == set()


def test_louvain_toy_fixed(toy_graph):
    got = _communities(louvain(toy_graph, fixed_levels=1, fixed_iters=2))
    exp = oracle_louvain(TOY_EDGES, vertices=TOY_VERTICES, fixed_levels=1, fixed_iters=2)
    assert got == exp


def test_louvain_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge — the canonical louvain
    case: each clique is one community."""
    from graphscope_spark import LinkGraph

    cliq = [(a, b) for a in range(4) for b in range(4) if a < b]
    cliq += [(a + 10, b + 10) for a, b in cliq]
    cliq.append((3, 10))
    e = spark.createDataFrame(cliq, "src long, dst long")
    g = LinkGraph.from_edges(e, directed=False).build(4)
    info: dict = {}
    got = _communities(louvain(g, info_out=info))
    exp = oracle_louvain(cliq)
    assert got == exp
    assert len({got[v] for v in range(4)}) == 1
    assert len({got[v + 10] for v in range(4)}) == 1
    assert got[0] != got[10]
    assert info["levels"][-1]["modularity"] > 0.3


def test_louvain_p2p_fixed(p2p_graph, p2p_edges):
    got = _communities(louvain(p2p_graph, fixed_levels=1, fixed_iters=3))
    exp = oracle_louvain(p2p_edges, fixed_levels=1, fixed_iters=3)
    assert got == exp
