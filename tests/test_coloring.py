"""Jones–Plassmann greedy coloring (algorithms/coloring.py) vs a
pure-Python twin, plus the proper-coloring invariants."""

from __future__ import annotations

import hashlib

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms.coloring import greedy_color


def _key(v: int) -> str:
    return hashlib.md5(str(v).encode()).hexdigest() + str(v).rjust(20, "0")


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
    k = {v: _key(v) for v in verts}
    out = {}
    r = 0
    while active and (rounds is None or r < rounds):
        r += 1
        ready = {
            v for v in active
            if all(k[v] < k[u] for u in nbr.get(v, ()) if u in active)
        }
        for v in sorted(ready):
            used = {
                out[u][0] for u in nbr.get(v, ()) if u in out
            }
            c = 0
            while c in used:
                c += 1
            out[v] = (c, r)
        active -= ready
    for v in active:
        out[v] = (None, None)
    return out


def _edges(n=60, seed=3):
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
        r["id"]: (r["color"], r["round"])
        for r in greedy_color(graph).collect()
    }
    assert got == _twin(_edges())


def test_fixed_rounds_matches_twin(graph):
    got = {
        r["id"]: (r["color"], r["round"])
        for r in greedy_color(graph, fixed_rounds=2).collect()
    }
    assert got == _twin(_edges(), rounds=2)


def test_proper_total_and_bounded(graph):
    rows = greedy_color(graph).collect()
    color = {r["id"]: r["color"] for r in rows}
    assert all(c is not None for c in color.values())  # total
    nbr = {}
    for a, b in _edges():
        if a != b:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
    for a, b in ((a, b) for a, b in _edges() if a != b):
        assert color[a] != color[b], (a, b)  # proper
    max_deg = max((len(s) for s in nbr.values()), default=0)
    assert max(color.values()) <= max_deg  # ≤ Δ+1 colors
    # self-loop-only vertex: no simple-graph neighbors -> color 0
    assert color[70] == 0


def test_directed_input_symmetrized(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long"),
        directed=True,
    ).build()
    color = {r["id"]: r["color"] for r in greedy_color(g).collect()}
    assert color[1] != color[2] and color[2] != color[3]
