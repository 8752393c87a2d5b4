"""ANF (approximate neighborhood function) — Spark vs an independent
pure-Python sketch twin, plus accuracy/monotonicity/edge-case probes."""

from __future__ import annotations

import hashlib

import pytest

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms.anf import (
    _avg_distance,
    _interp_quantile,
    anf_balls,
    average_distance,
    distance_stats,
    effective_diameter,
    neighborhood_function,
)

from tests.conftest import TOY_EDGES

PHI = 0.77351


# -- pure-Python twin (independent of the Spark plan AND the SQL twin) --

def _draw_mask(k: int, vid: int, r_max: int = 59) -> int:
    h = int(hashlib.md5(f"anf|{k}|{vid}".encode()).hexdigest()[:15], 16)
    cap = 1 << r_max
    if h == 0:
        return cap
    return min(h & -h, cap)


def _lowest_zero_index(mask: int) -> int:
    r = 0
    while mask & (1 << r):
        r += 1
    return r


def _twin_curve(edges, vertices, radius, k=4, directed=False):
    """NF(t) list via explicit per-vertex mask propagation."""
    adj: dict[int, set[int]] = {v: set() for v in vertices}
    for s, d in edges:
        if directed:
            adj[s].add(d)  # mask flows dst->src: v gains w's mask for v->w
        else:
            adj[s].add(d)
            adj[d].add(s)
    masks = {(v, j): _draw_mask(j, v) for v in vertices for j in range(k)}

    def nf():
        total = 0.0
        for v in vertices:
            sumr = sum(
                _lowest_zero_index(masks[(v, j)]) for j in range(k)
            )
            total += 2 ** (sumr / k) / PHI
        return total

    curve = [nf()]
    for _ in range(radius):
        nxt = dict(masks)
        for s in vertices:
            for d in adj[s]:
                for j in range(k):
                    nxt[(d if not directed else s, j)] |= masks[
                        ((s if not directed else d), j)
                    ]
        masks = nxt
        curve.append(nf())
    return curve


def _toy_graph(spark, directed=True):
    df = spark.createDataFrame(TOY_EDGES, "src long, dst long")
    return LinkGraph.from_edges(df, directed=directed).build()


def test_nf_matches_python_twin_undirected(spark):
    g = _toy_graph(spark)
    got = {
        r["radius"]: r["nf"]
        for r in neighborhood_function(g, max_radius=3, num_trials=4).collect()
    }
    verts = sorted({v for e in TOY_EDGES for v in e})
    want = _twin_curve(TOY_EDGES, verts, 3, k=4)
    assert set(got) == {0, 1, 2, 3}
    for t in range(4):
        assert got[t] == pytest.approx(want[t], rel=1e-9)


def test_nf_matches_python_twin_directed(spark):
    g = _toy_graph(spark)
    got = {
        r["radius"]: r["nf"]
        for r in neighborhood_function(
            g, max_radius=2, num_trials=4, directed=True
        ).collect()
    }
    verts = sorted({v for e in TOY_EDGES for v in e})
    want = _twin_curve(TOY_EDGES, verts, 2, k=4, directed=True)
    for t in range(3):
        assert got[t] == pytest.approx(want[t], rel=1e-9)


def test_nf_monotone_and_saturates(spark):
    g = _toy_graph(spark)
    rows = neighborhood_function(g, max_radius=8, num_trials=8).orderBy("radius")
    vals = [r["nf"] for r in rows.collect()]
    assert len(vals) == 9
    assert all(b >= a for a, b in zip(vals, vals[1:]))
    # toy components have diameter <= 4; the curve must be flat after
    assert vals[8] == vals[5] == vals[4]


def test_balls_estimate_accuracy(spark):
    """Complete bipartite K(20,20): every ball at radius 2 is all 40
    vertices — with 64 trials the FM estimate lands within 35%."""
    edges = [(i, 100 + j) for i in range(20) for j in range(20)]
    g = LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=False
    ).build()
    est = anf_balls(g, radius=2, num_trials=64).collect()
    assert len(est) == 40
    for r in est:
        assert r["est"] == pytest.approx(40.0, rel=0.35)


def test_effective_diameter_and_avg_distance(spark):
    g = _toy_graph(spark)
    eff = effective_diameter(g, q=0.9, max_radius=8, num_trials=8)
    avg = average_distance(g, max_radius=8, num_trials=8)
    assert 0.0 < eff <= 5.0
    assert 0.0 < avg <= 5.0
    row = distance_stats(g, q=0.9, max_radius=8, num_trials=8).first()
    assert row["eff_diam"] == pytest.approx(eff, rel=1e-12)
    assert row["avg_dist"] == pytest.approx(avg, rel=1e-12)


def test_interp_quantile_pure():
    assert _interp_quantile([], 0.9) == 0.0
    assert _interp_quantile([0.0, 0.0], 0.9) == 0.0
    assert _interp_quantile([10.0, 10.0], 0.9) == 0.0  # NF(0) already >= tgt
    # linear segment: tgt = 0.9*20 = 18, between t=0 (10) and t=1 (20)
    assert _interp_quantile([10.0, 20.0], 0.9) == pytest.approx(0.8)
    assert _avg_distance([10.0, 20.0]) == pytest.approx(1.0)
    assert _avg_distance([5.0, 5.0]) == 0.0


def test_empty_graph(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame([], "src long, dst long"), directed=True
    ).build()
    rows = neighborhood_function(g, max_radius=2, num_trials=4).collect()
    assert [r["nf"] for r in rows] == [0.0, 0.0, 0.0]
    assert effective_diameter(g, max_radius=2, num_trials=4) == 0.0


# -- HyperBall harmonic centrality ------------------------------------

def _twin_hyperball(edges, vertices, radius, k=4, directed=False):
    """Per-vertex harmonic accumulator via the same mask twin."""
    adj: dict[int, set[int]] = {v: set() for v in vertices}
    for s, d in edges:
        adj[s].add(d)
        if not directed:
            adj[d].add(s)
    masks = {(v, j): _draw_mask(j, v) for v in vertices for j in range(k)}

    def est(v, m):
        sumr = sum(_lowest_zero_index(m[(v, j)]) for j in range(k))
        return 2 ** (sumr / k) / PHI

    pest = {v: est(v, masks) for v in vertices}
    acc = {v: 0.0 for v in vertices}
    for t in range(1, radius + 1):
        nxt = dict(masks)
        for s in vertices:
            for d in adj[s]:
                for j in range(k):
                    nxt[(d, j)] |= masks[(s, j)]
        masks = nxt
        for v in vertices:
            e = est(v, masks)
            acc[v] += (e - pest[v]) / t
            pest[v] = e
    return acc


def test_hyperball_matches_python_twin(spark):
    from graphscope_spark.algorithms.anf import hyperball_harmonic

    g = _toy_graph(spark)
    got = {
        r["id"]: r["centrality"]
        for r in hyperball_harmonic(g, max_radius=5, num_trials=4).collect()
    }
    verts = sorted({v for e in TOY_EDGES for v in e})
    want = _twin_hyperball(TOY_EDGES, verts, 5, k=4)
    assert set(got) == set(verts)
    for v in verts:
        assert got[v] == pytest.approx(want[v], rel=1e-9, abs=1e-9)


def test_hyperball_matches_python_twin_directed(spark):
    """Directed = incoming distances (masks flow src->dst), the NX
    harmonic convention the exact implementation uses."""
    from graphscope_spark.algorithms.anf import hyperball_harmonic

    g = _toy_graph(spark)
    got = {
        r["id"]: r["centrality"]
        for r in hyperball_harmonic(
            g, max_radius=4, num_trials=4, directed=True
        ).collect()
    }
    verts = sorted({v for e in TOY_EDGES for v in e})
    want = _twin_hyperball(TOY_EDGES, verts, 4, k=4, directed=True)
    for v in verts:
        assert got[v] == pytest.approx(want[v], rel=1e-9, abs=1e-9)


def test_hyperball_star_center_dominates(spark):
    """Star K(1,40): the hub is at distance 1 from everyone, leaves at
    2 from each other — the hub's harmonic score must dominate with
    enough trials."""
    from graphscope_spark.algorithms.anf import hyperball_harmonic

    edges = [(0, i) for i in range(1, 41)]
    g = LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=False
    ).build()
    rows = hyperball_harmonic(g, max_radius=4, num_trials=32).collect()
    scores = {r["id"]: r["centrality"] for r in rows}
    hub = scores.pop(0)
    assert hub > max(scores.values())
