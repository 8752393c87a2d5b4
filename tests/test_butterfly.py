"""Butterfly counting (algorithms/butterfly.py) — known-value motifs,
a pure-Python twin on a hashed bipartite graph, and the hub cap."""

from __future__ import annotations

import hashlib
from itertools import combinations

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms.butterfly import butterflies, butterfly_stats


def _bf_twin(edges, max_fanout=None):
    """(per-left-vertex dict, B, L3) over distinct (src, dst) edges."""
    es = sorted(set(edges))
    if max_fanout is not None:
        from collections import Counter
        dc = Counter(d for _, d in es)
        es = [(s, d) for s, d in es if dc[d] <= max_fanout]
    nbrs = {}
    for s, d in es:
        nbrs.setdefault(s, set()).add(d)
    per = {u: 0 for u, _ in es}
    b_total = 0
    for u, v in combinations(sorted(nbrs), 2):
        w = len(nbrs[u] & nbrs[v])
        if w >= 2:
            c = w * (w - 1) // 2
            per[u] += c
            per[v] += c
            b_total += c
    du = {}
    dx = {}
    for s, d in es:
        du[s] = du.get(s, 0) + 1
        dx[d] = dx.get(d, 0) + 1
    l3 = sum((du[s] - 1) * (dx[d] - 1) for s, d in es)
    return per, b_total, l3


def _edges(n_left=40, n_right=12, seed=7):
    es = []
    for i in range(n_left):
        for j in range(n_right):
            h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest(), 16)
            if h % 5 == 0:
                es.append((i, 1000 + j))
    return es


@pytest.fixture(scope="module")
def graph(spark):
    return LinkGraph.from_edges(
        spark.createDataFrame(_edges(), "src long, dst long"), directed=True
    )


def test_single_butterfly_k22(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame(
            [(1, 10), (1, 11), (2, 10), (2, 11)], "src long, dst long"
        ),
        directed=True,
    )
    per = {r["id"]: r["butterflies"] for r in butterflies(g).collect()}
    assert per == {1: 1, 2: 1}
    row = butterfly_stats(g).collect()[0]
    # K2,2: B=1; every edge is the middle of exactly one 3-path
    assert (row["n_butterflies"], row["n_paths3"]) == (1, 4)
    assert row["bipartite_cc"] == 1.0


def test_k23_counts(spark):
    edges = [(u, d) for u in (1, 2) for d in (10, 11, 12)]
    g = LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=True
    )
    per = {r["id"]: r["butterflies"] for r in butterflies(g).collect()}
    assert per == {1: 3, 2: 3}  # C(3,2) butterflies share both vertices
    row = butterfly_stats(g).collect()[0]
    assert row["n_butterflies"] == 3
    assert row["n_paths3"] == sum((2 - 1) * (2 - 1) for _ in edges) * 2


def test_matches_python_twin(graph):
    per, b_total, l3 = _bf_twin(_edges())
    got = {r["id"]: r["butterflies"] for r in butterflies(graph).collect()}
    assert got == per
    row = butterfly_stats(graph).collect()[0]
    assert row["n_butterflies"] == b_total
    assert row["n_paths3"] == l3
    exp_cc = round(4.0 * b_total / l3, 6) if l3 else 0.0
    assert row["bipartite_cc"] == pytest.approx(exp_cc, abs=1e-9)


def test_max_fanout_cap(graph):
    per, b_total, _ = _bf_twin(_edges(), max_fanout=8)
    got = {
        r["id"]: r["butterflies"]
        for r in butterflies(graph, max_fanout=8).collect()
    }
    # capped run only keeps vertices still incident to a kept edge
    assert {k: v for k, v in got.items() if k in per} == per
    row = butterfly_stats(graph, max_fanout=8).collect()[0]
    assert row["n_butterflies"] == b_total


def test_butterfly_free_graph(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame([(1, 10), (2, 11)], "src long, dst long"),
        directed=True,
    )
    per = {r["id"]: r["butterflies"] for r in butterflies(g).collect()}
    assert per == {1: 0, 2: 0}
    row = butterfly_stats(g).collect()[0]
    assert (row["n_butterflies"], row["n_paths3"], row["bipartite_cc"]) == (
        0, 0, 0.0,
    )
