"""Structure reports (algorithms/structure.py) vs real networkx:
average_neighbor_degree, average_degree_connectivity,
rich_club_coefficient, eccentricity/radius/center/periphery."""

from __future__ import annotations

import hashlib

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms.structure import (
    average_degree_connectivity,
    average_neighbor_degree,
    eccentricity,
    graph_extremes,
    rich_club_coefficient,
)

nx = pytest.importorskip("networkx")


def _edges(n=40, seed=11, mod=7):
    es = []
    for i in range(n):
        for j in range(i + 1, n):
            h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest(), 16)
            if h % mod == 0:
                es.append((i, j))
    return es


@pytest.fixture(scope="module")
def fixture(spark):
    es = _edges()
    g = LinkGraph.from_edges(
        spark.createDataFrame(es, "src long, dst long"), directed=False
    ).build()
    return g, nx.Graph(es)


def test_average_neighbor_degree(fixture):
    g, G = fixture
    got = {
        r["id"]: r["avg_nbr_deg"]
        for r in average_neighbor_degree(g).collect()
    }
    want = nx.average_neighbor_degree(G)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v


def test_average_degree_connectivity(fixture):
    g, G = fixture
    got = {
        r["degree"]: r["knn"]
        for r in average_degree_connectivity(g).collect()
    }
    want = nx.average_degree_connectivity(G)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_average_degree_connectivity_isolates(spark):
    """NX emits dc[0] = 0.0 when isolates exist — so do we (r3 ADVICE:
    the edge-endpoint aggregate alone would omit it)."""
    es = [(1, 2), (2, 3), (3, 1)]
    e = spark.createDataFrame(es, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    g = LinkGraph.from_edges(e, vertices=v, directed=False).build()
    G = nx.Graph(es)
    G.add_nodes_from([4, 5])
    got = {
        r["degree"]: r["knn"]
        for r in average_degree_connectivity(g).collect()
    }
    want = nx.average_degree_connectivity(G)
    assert set(got) == set(want) and 0 in got
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_rich_club(fixture):
    g, G = fixture
    G2 = G.copy()
    G2.remove_nodes_from(list(nx.isolates(G2)))
    got = {r["k"]: r["phi"] for r in rich_club_coefficient(g).collect()}
    want = nx.rich_club_coefficient(G2, normalized=False)
    # nx emits k while >1 node remains; ours requires >= 2 (same set)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_eccentricity_and_extremes(spark):
    # connected fixture (path + chords)
    es = [(i, i + 1) for i in range(12)] + [(0, 6), (3, 11)]
    g = LinkGraph.from_edges(
        spark.createDataFrame(es, "src long, dst long")
    ).build()
    G = nx.Graph(es)
    got = {r["id"]: r["eccentricity"] for r in eccentricity(g).collect()}
    want = nx.eccentricity(G)
    assert got == {v: float(e) for v, e in want.items()}
    row = graph_extremes(g).collect()[0]
    assert row["radius"] == nx.radius(G)
    assert row["diameter"] == nx.diameter(G)
    assert row["n_center"] == len(nx.center(G))
    assert row["n_periphery"] == len(nx.periphery(G))


def test_eccentricity_disconnected_per_component(spark):
    es = [(0, 1), (1, 2), (10, 11)]
    g = LinkGraph.from_edges(
        spark.createDataFrame(es, "src long, dst long")
    ).build()
    got = {r["id"]: r["eccentricity"] for r in eccentricity(g).collect()}
    assert got == {0: 2.0, 1: 1.0, 2: 2.0, 10: 1.0, 11: 1.0}
