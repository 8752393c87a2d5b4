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


def test_harmonic_diameter_vs_networkx(spark):
    """upstream distance_measures.py::harmonic_diameter semantics
    (finite on disconnected graphs, nan/inf degenerate cases,
    weighted distances)."""
    import math

    assert gnx.harmonic_diameter(gnx.star_graph(3, ), ) == pytest.approx(
        nx.harmonic_diameter(nx.star_graph(3)))
    assert math.isnan(gnx.harmonic_diameter(gnx.empty_graph()))
    assert math.isinf(gnx.harmonic_diameter(gnx.empty_graph(3)))
    D = gnx.DiGraph(spark=spark)
    D.add_edge(0, 1)
    assert gnx.harmonic_diameter(D) == 2
    g = gnx.gnp_random_graph(30, 0.15, seed=3)
    r = nx.Graph(list(g.edges))
    r.add_nodes_from(g.nodes)
    assert gnx.harmonic_diameter(g) == pytest.approx(nx.harmonic_diameter(r))


def test_barycenter_and_spl_vs_networkx(spark):
    """barycenter + generic shortest_path_length return-shape matrix
    (the vendored TestBarycenter covers the upstream cases; this adds
    weighted and directed shapes)."""
    g = gnx.Graph(spark=spark)
    g.add_weighted_edges_from([(0, 1, 2.0), (1, 2, 1.0), (0, 2, 5.0)])
    r = nx.Graph()
    r.add_weighted_edges_from([(0, 1, 2.0), (1, 2, 1.0), (0, 2, 5.0)])
    assert gnx.shortest_path_length(g, 0, 2, weight="weight") == \
        nx.shortest_path_length(r, 0, 2, weight="weight")
    assert gnx.barycenter(g, weight="weight") == nx.barycenter(r, weight="weight")
    assert dict(gnx.shortest_path_length(g, source=0, weight="weight")) == \
        dict(nx.shortest_path_length(r, source=0, weight="weight"))
    with pytest.raises(gnx.NetworkXNoPath):
        h = gnx.Graph(spark=spark)
        h.add_nodes_from([1, 2])
        gnx.shortest_path_length(h, 1, 2)
