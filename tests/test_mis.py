"""Deterministic-Luby maximal independent set (algorithms/mis.py) vs
a pure-Python twin, plus the MIS invariants on random graphs."""

from __future__ import annotations

import hashlib

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms.mis import maximal_independent_set


def _key(v: int, r: int) -> str:
    return (
        hashlib.md5(f"{v}:{r}".encode()).hexdigest() + str(v).rjust(20, "0")
    )


def _twin(edges, rounds=None):
    nbr = {}
    verts = set()
    for a, b in edges:
        verts.add(a)
        verts.add(b)
        if a != b:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
    active = set(verts)
    out = {}
    r = 0
    while active and (rounds is None or r < rounds):
        r += 1
        k = {v: _key(v, r) for v in active}
        winners = {
            v for v in active
            if all(k[v] < k[u] for u in nbr.get(v, ()) if u in active)
        }
        removed = {
            u for v in winners for u in nbr.get(v, ()) if u in active
        }
        for v in winners:
            out[v] = (True, r)
        for v in removed:
            out[v] = (False, r)
        active -= winners | removed
    for v in active:
        out[v] = (None, None)
    return out


def _edges(n=60, seed=3):
    # deterministic sparse-ish graph
    es = []
    for i in range(n):
        for j in range(i + 1, n):
            h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest(), 16)
            if h % 13 == 0:
                es.append((i, j))
    es.append((70, 70))  # self-loop-only vertex
    return es


@pytest.fixture(scope="module")
def graph(spark):
    return LinkGraph.from_edges(
        spark.createDataFrame(_edges(), "src long, dst long")
    ).build()


def test_matches_python_twin_to_completion(graph):
    got = {
        r["id"]: (r["in_mis"], r["round"])
        for r in maximal_independent_set(graph).collect()
    }
    assert got == _twin(_edges())


def test_fixed_rounds_matches_twin(graph):
    got = {
        r["id"]: (r["in_mis"], r["round"])
        for r in maximal_independent_set(graph, fixed_rounds=1).collect()
    }
    assert got == _twin(_edges(), rounds=1)


def test_independence_and_maximality(graph):
    rows = maximal_independent_set(graph).collect()
    mis = {r["id"] for r in rows if r["in_mis"]}
    assert all(r["in_mis"] is not None for r in rows)  # total
    nbr = {}
    for a, b in _edges():
        if a != b:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
    for a, b in ((a, b) for a, b in _edges() if a != b):
        assert not (a in mis and b in mis), (a, b)
    for r in rows:
        if not r["in_mis"]:
            assert nbr.get(r["id"], set()) & mis, r["id"]
    # self-loop-only vertex has no simple-graph neighbors -> in MIS
    assert 70 in mis


def test_directed_input_symmetrized(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long"),
        directed=True,
    ).build()
    mis = {
        r["id"] for r in maximal_independent_set(g).collect() if r["in_mis"]
    }
    assert not ({1, 2} <= mis or {2, 3} <= mis)
