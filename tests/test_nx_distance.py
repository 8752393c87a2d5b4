"""NX-compat wrappers for the distance-measures / degree-correlation
/ coloring / community-quality additions, vs real networkx."""

from __future__ import annotations

import pytest

import graphscope_spark.nx as gnx

nx = pytest.importorskip("networkx")

EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 3), ("a", 0)]


@pytest.fixture(scope="module")
def pair(spark):
    G = gnx.Graph()
    R = nx.Graph()
    for u, v in EDGES:
        G.add_edge(u, v)
        R.add_edge(u, v)
    return G, R


def test_eccentricity_family(pair):
    G, R = pair
    assert gnx.eccentricity(G) == nx.eccentricity(R)
    assert gnx.eccentricity(G, v=2) == nx.eccentricity(R, v=2)
    assert gnx.radius(G) == nx.radius(R)
    assert gnx.diameter(G) == nx.diameter(R)
    assert sorted(map(str, gnx.center(G))) == sorted(map(str, nx.center(R)))
    assert sorted(map(str, gnx.periphery(G))) == sorted(
        map(str, nx.periphery(R))
    )


def test_eccentricity_disconnected_raises(spark):
    G = gnx.Graph()
    G.add_edge(1, 2)
    G.add_edge(10, 11)
    with pytest.raises(ValueError, match="not connected"):
        gnx.eccentricity(G)


def test_average_neighbor_degree(pair):
    G, R = pair
    got = gnx.average_neighbor_degree(G)
    want = nx.average_neighbor_degree(R)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_rich_club(pair):
    G, R = pair
    # default is normalized=True for upstream signature parity (and
    # raises the documented NotImplementedError, asserted below)
    got = gnx.rich_club_coefficient(G, normalized=False)
    want = nx.rich_club_coefficient(R, normalized=False)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(round(want[k], 6), abs=2e-6)
    with pytest.raises(NotImplementedError):
        gnx.rich_club_coefficient(G, normalized=True)


def test_greedy_color_proper(pair):
    G, R = pair
    colors = gnx.greedy_color(G)
    assert set(colors) == set(R.nodes)
    for u, v in R.edges:
        assert colors[u] != colors[v]
    assert max(colors.values()) <= max(d for _, d in R.degree)


def test_modularity(pair):
    G, R = pair
    comm = [{0, 1, 2, "a"}, {3, 4, 5}]
    got = gnx.modularity(G, comm)
    want = nx.algorithms.community.modularity(R, comm)
    assert got == pytest.approx(round(want, 6), abs=2e-6)
