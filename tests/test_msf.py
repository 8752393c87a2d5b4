"""Deterministic Borůvka minimum spanning forest (algorithms/msf.py)
vs a pure-Python twin and real networkx."""

from __future__ import annotations

import hashlib

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms.msf import boruvka_msf, msf_weight

nx = pytest.importorskip("networkx")


def _twin(edges, rounds=None):
    """Borůvka under the (w, u, v) total order; returns the chosen
    edge set {(u, v, w)}."""
    eu = {}
    verts = set()
    for a, b, w in edges:
        verts.add(a)
        verts.add(b)
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        eu[(u, v)] = min(eu.get((u, v), w), w)
    comp = {v: v for v in verts}
    forest = set()
    r = 0
    while rounds is None or r < rounds:
        r += 1
        pick = {}
        for (u, v), w in eu.items():
            cu, cv = comp[u], comp[v]
            if cu == cv:
                continue
            key = (w, u, v)
            for c in (cu, cv):
                if c not in pick or key < pick[c][0]:
                    pick[c] = (key, (u, v, w, cu, cv))
        if not pick:
            break
        chosen = {t for _, t in pick.values()}
        forest |= {(u, v, w) for u, v, w, _, _ in chosen}
        # min-label closure over contracted graph
        adj = {}
        for _, _, _, cu, cv in chosen:
            adj.setdefault(cu, set()).add(cv)
            adj.setdefault(cv, set()).add(cu)
        lbl = {c: c for c in adj}
        for c0 in sorted(adj):
            stack, seen = [c0], {c0}
            while stack:
                x = stack.pop()
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            m = min(seen)
            for x in seen:
                lbl[x] = min(lbl[x], m)
        comp = {v: lbl.get(c, c) for v, c in comp.items()}
        if rounds is None and not pick:
            break
    return forest


def _edges(n=35, seed=13):
    es = []
    for i in range(n):
        for j in range(i + 1, n):
            h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest(), 16)
            if h % 4 == 0:
                es.append((i, j, float(h % 17)))  # ties on purpose
    return es


@pytest.fixture(scope="module")
def graph(spark):
    return LinkGraph.from_edges(
        spark.createDataFrame(_edges(), "src long, dst long, w double"),
        directed=True,
    ).build()


def test_matches_python_twin(graph):
    got = {
        (r["src"], r["dst"], r["w"]) for r in boruvka_msf(graph).collect()
    }
    assert got == _twin(_edges())


def test_fixed_round_subset(graph):
    one = {
        (r["src"], r["dst"], r["w"])
        for r in boruvka_msf(graph, fixed_rounds=1).collect()
    }
    assert one == _twin(_edges(), rounds=1)
    assert one <= _twin(_edges())


def test_weight_matches_networkx(graph):
    G = nx.Graph()
    for u, v, w in _edges():
        if not G.has_edge(u, v) or G[u][v]["weight"] > w:
            G.add_edge(u, v, weight=w)
    want_w = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_edges(G, data=True)
    )
    n_comp = nx.number_connected_components(G)
    row = msf_weight(graph).collect()[0]
    assert row["total_weight"] == pytest.approx(round(want_w, 6), abs=1e-9)
    assert row["n_edges"] == G.number_of_nodes() - n_comp


def test_disconnected_forest(spark):
    es = [(0, 1, 1.0), (1, 2, 2.0), (10, 11, 5.0)]
    g = LinkGraph.from_edges(
        spark.createDataFrame(es, "src long, dst long, w double"),
        directed=True,
    ).build()
    got = {(r["src"], r["dst"], r["w"]) for r in boruvka_msf(g).collect()}
    assert got == {(0, 1, 1.0), (1, 2, 2.0), (10, 11, 5.0)}


def test_parallel_and_self_edges(spark):
    es = [(1, 2, 9.0), (2, 1, 3.0), (1, 1, 0.5), (2, 3, 4.0)]
    g = LinkGraph.from_edges(
        spark.createDataFrame(es, "src long, dst long, w double"),
        directed=True,
    ).build()
    got = {(r["src"], r["dst"], r["w"]) for r in boruvka_msf(g).collect()}
    assert got == {(1, 2, 3.0), (2, 3, 4.0)}


def test_single_linkage_vs_scipy_semantics(spark):
    """Single-linkage clusters at threshold t = connected components
    of the w<=t subgraph (exact equivalence via the MSF)."""
    from graphscope_spark.algorithms.msf import single_linkage

    es = _edges()
    g = LinkGraph.from_edges(
        spark.createDataFrame(es, "src long, dst long, w double"),
        directed=True,
    ).build()
    t = 6.0
    got = {r["id"]: r["cluster"] for r in single_linkage(g, t).collect()}
    G = nx.Graph()
    G.add_nodes_from({v for a, b, _ in es for v in (a, b)})
    for u, v, w in es:
        if w <= t and u != v:
            G.add_edge(u, v)
    for comp in nx.connected_components(G):
        m = min(comp)
        for v in comp:
            assert got[v] == m, (v, comp)


def test_single_linkage_extremes(spark):
    from graphscope_spark.algorithms.msf import single_linkage

    es = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 9.0)]
    g = LinkGraph.from_edges(
        spark.createDataFrame(es, "src long, dst long, w double"),
        directed=True,
    ).build()
    # t below all weights: singletons
    got = {r["id"]: r["cluster"] for r in single_linkage(g, 0.5).collect()}
    assert got == {v: v for v in range(4)}
    # t above all weights: one cluster
    got = {r["id"]: r["cluster"] for r in single_linkage(g, 10.0).collect()}
    assert got == {v: 0 for v in range(4)}
