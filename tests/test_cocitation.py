"""Co-citation / bibliographic coupling vs a pure-Python twin."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import bibliographic_coupling, cocitation

from tests.conftest import TOY_EDGES


def _twin(edges, by_in=True, min_common=1):
    nbrs = defaultdict(set)   # node -> matching-side neighbor set
    for u, v in set(edges):
        if by_in:
            nbrs[v].add(u)    # In(v)
        else:
            nbrs[u].add(v)    # Out(u)
    nodes = sorted(nbrs)
    out = {}
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            c = len(nbrs[u] & nbrs[v])
            if c >= min_common:
                du, dv = len(nbrs[u]), len(nbrs[v])
                out[(u, v)] = (c, c / math.sqrt(du * dv), c / (du + dv - c))
    return out


def _lg(spark, edges):
    return LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=True
    ).build()


@pytest.mark.parametrize("fn,by_in", [(cocitation, True),
                                      (bibliographic_coupling, False)])
def test_matches_twin(spark, fn, by_in):
    got = {(r["u"], r["v"]): (r["common"], r["cosine"], r["jaccard"])
           for r in fn(_lg(spark, TOY_EDGES)).collect()}
    want = _twin(TOY_EDGES, by_in=by_in)
    assert set(got) == set(want)
    for k, (c, cos, jac) in want.items():
        gc, gcos, gjac = got[k]
        assert gc == c, k
        assert gcos == pytest.approx(cos, abs=1e-12), k
        assert gjac == pytest.approx(jac, abs=1e-12), k


def test_min_common_filters(spark):
    got = {(r["u"], r["v"]) for r in
           cocitation(_lg(spark, TOY_EDGES), min_common=2).collect()}
    want = set(_twin(TOY_EDGES, by_in=True, min_common=2))
    assert got == want and got  # nonempty (0,1,2 share two citers)


def test_max_fanout_drops_hub(spark):
    """Hub 3 cites 0,1,2,4,5 — capping source fanout below 5 removes
    its pairs from co-citation."""
    capped = {(r["u"], r["v"]): r["common"] for r in
              cocitation(_lg(spark, TOY_EDGES), max_fanout=4).collect()}
    hubless = [(u, v) for u, v in TOY_EDGES if u != 3]
    want = {k: v[0] for k, v in _twin(hubless, by_in=True).items()}
    assert capped == want
