"""North-rule correctness gate (BASELINE.json): PageRank/LPA allclose
1e-6 per vertex; components & triangle counts exact — vs the NumPy
oracles carrying the reference semantics (graphscope_spark/oracles.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from graphscope_spark.algorithms import (
    cdlp,
    pagerank,
    triangle_count,
    triangles,
    wcc,
)
from graphscope_spark.oracles import (
    oracle_cdlp,
    oracle_pagerank,
    oracle_triangles,
    oracle_wcc,
)
from tests.conftest import TOY_EDGES, TOY_VERTICES


def _as_dict(df, key="id", val=None):
    rows = df.collect()
    val = val or [c for c in df.columns if c != key][0]
    return {r[key]: r[val] for r in rows}


# ---------------------------------------------------------------- pagerank
@pytest.mark.parametrize("fixed_rounds", [None, 5])
def test_pagerank_toy(toy_graph, fixed_rounds):
    got = _as_dict(pagerank(toy_graph, fixed_rounds=fixed_rounds, checkpoint_every=2))
    exp = oracle_pagerank(TOY_EDGES, vertices=TOY_VERTICES, fixed_rounds=fixed_rounds)
    assert set(got) == set(exp)
    g = np.array([got[v] for v in TOY_VERTICES])
    e = np.array([exp[v] for v in TOY_VERTICES])
    assert np.allclose(g, e, atol=1e-6)
    assert abs(g.sum() - 1.0) < 1e-6  # ranks are a distribution


def test_pagerank_p2p(p2p_graph, p2p_edges):
    got = _as_dict(pagerank(p2p_graph, max_iter=100, tol=1e-6))
    exp = oracle_pagerank(p2p_edges, max_iter=100, tol=1e-6)
    ids = sorted(exp)
    assert np.allclose(
        np.array([got[v] for v in ids]), np.array([exp[v] for v in ids]), atol=1e-6
    )


def test_pagerank_salted_matches_unsalted(toy_graph):
    base = _as_dict(pagerank(toy_graph, fixed_rounds=4))
    salted = _as_dict(pagerank(toy_graph, fixed_rounds=4, salt_mod=4))
    ids = sorted(base)
    assert np.allclose(
        np.array([base[v] for v in ids]), np.array([salted[v] for v in ids]), atol=1e-9
    )


def _close(got: dict, exp: dict, atol=1e-6):
    ids = sorted(exp)
    assert set(got) == set(exp)
    assert np.allclose(
        np.array([got[v] for v in ids]), np.array([exp[v] for v in ids]), atol=atol
    )


def test_pagerank_personalization(toy_graph):
    pers = {0: 2.0, 3: 1.0, 9: 1.0}
    got = _as_dict(pagerank(toy_graph, fixed_rounds=6, personalization=pers))
    exp = oracle_pagerank(
        TOY_EDGES, vertices=TOY_VERTICES, fixed_rounds=6, personalization=pers
    )
    _close(got, exp)


def test_pagerank_dangling_nstart(toy_graph):
    dang = {6: 1.0, 7: 3.0}
    nst = {v: float(v + 1) for v in TOY_VERTICES}
    got = _as_dict(pagerank(toy_graph, fixed_rounds=6, dangling=dang, nstart=nst))
    exp = oracle_pagerank(
        TOY_EDGES, vertices=TOY_VERTICES, fixed_rounds=6, dangling=dang, nstart=nst
    )
    _close(got, exp)


def test_pagerank_weighted_undirected(spark):
    # Small undirected weighted graph incl. an isolated (dangling) vertex.
    wedges = [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 4.0), (2, 3, 0.5)]
    from graphscope_spark.graph import LinkGraph

    e = spark.createDataFrame(wedges, "src long, dst long, w double")
    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    g = LinkGraph(vertices=v, edges=e, directed=False).build(4)
    got = _as_dict(pagerank(g, fixed_rounds=8, weight_col="w"))
    sym = wedges + [(d, s, w) for s, d, w in wedges]
    exp = oracle_pagerank(
        [(s, d) for s, d, _ in sym],
        vertices=list(range(5)),
        fixed_rounds=8,
        weights=[w for _, _, w in sym],
    )
    _close(got, exp)


def test_pagerank_convergence_with_personalization(toy_graph):
    pers = {0: 1.0, 6: 1.0}
    got = _as_dict(pagerank(toy_graph, max_iter=100, tol=1e-8, personalization=pers))
    exp = oracle_pagerank(
        TOY_EDGES, vertices=TOY_VERTICES, max_iter=100, tol=1e-8, personalization=pers
    )
    _close(got, exp, atol=1e-5)


# ---------------------------------------------------------------- wcc
def test_wcc_toy(toy_graph):
    got = _as_dict(wcc(toy_graph))
    exp = oracle_wcc(TOY_EDGES, vertices=TOY_VERTICES)
    assert got == exp
    assert len(set(got.values())) == 3  # {0-5}, {6-8}, {9-11}


def test_wcc_p2p(p2p_graph, p2p_edges):
    got = _as_dict(wcc(p2p_graph, checkpoint_every=3))
    exp = oracle_wcc(p2p_edges)
    assert got == exp


# ---------------------------------------------------------------- cdlp
@pytest.mark.parametrize("rounds", [2, 10])
def test_cdlp_toy(toy_graph, rounds):
    got = _as_dict(cdlp(toy_graph, max_round=rounds))
    exp = oracle_cdlp(TOY_EDGES, vertices=TOY_VERTICES, max_round=rounds)
    assert got == exp


def test_cdlp_p2p(p2p_graph, p2p_edges):
    got = _as_dict(cdlp(p2p_graph, max_round=5))
    exp = oracle_cdlp(p2p_edges, max_round=5)
    assert got == exp


# ---------------------------------------------------------------- triangles
@pytest.mark.parametrize("mode", ["array", "join"])
def test_triangles_toy(toy_graph, mode):
    got = _as_dict(triangles(toy_graph, mode=mode))
    exp = oracle_triangles(TOY_EDGES, vertices=TOY_VERTICES)
    assert got == exp


@pytest.mark.parametrize("mode", ["array", "join"])
def test_triangles_p2p(p2p_graph, p2p_edges, mode):
    got = _as_dict(triangles(p2p_graph, mode=mode))
    exp = oracle_triangles(p2p_edges)
    assert got == exp
    total = triangle_count(p2p_graph)
    assert total == sum(exp.values()) // 3
