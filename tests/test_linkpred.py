"""Link prediction vs real networkx (upstream
networkx/algorithms/link_prediction.py — the semantics the reference's
nx layer re-exports)."""

from __future__ import annotations

import networkx as realnx
import pytest

import graphscope_spark.nx as gnx
from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import link_prediction_scores


def _mirror(nxg, spark):
    g = gnx.Graph(spark=spark)
    g.add_nodes_from(nxg.nodes)
    for u, v in nxg.edges:
        g.add_edge(u, v)
    return g


@pytest.fixture(scope="module")
def und(spark):
    nxg = realnx.gnp_random_graph(30, 0.12, seed=5)
    nxg.add_edge(100, 101)  # extra small component (degree-1 endpoints)
    return nxg, _mirror(nxg, spark)


def _cmp(ours, theirs, tol=1e-9):
    a = {(min(u, v), max(u, v)): s for u, v, s in ours}
    b = {(min(u, v), max(u, v)): s for u, v, s in theirs}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=tol), k


def test_jaccard(und):
    nxg, g = und
    _cmp(gnx.jaccard_coefficient(g), realnx.jaccard_coefficient(nxg))


def test_adamic_adar(und):
    nxg, g = und
    _cmp(gnx.adamic_adar_index(g), realnx.adamic_adar_index(nxg))


def test_resource_allocation(und):
    nxg, g = und
    _cmp(gnx.resource_allocation_index(g),
         realnx.resource_allocation_index(nxg))


def test_preferential_attachment(und):
    nxg, g = und
    _cmp(gnx.preferential_attachment(g), realnx.preferential_attachment(nxg))


def test_explicit_ebunch_including_edges(und):
    nxg, g = und
    e = list(nxg.edges)[0]
    non = next(iter(realnx.non_edges(nxg)))
    ebunch = [e, non]
    _cmp(gnx.jaccard_coefficient(g, ebunch),
         realnx.jaccard_coefficient(nxg, ebunch))
    _cmp(gnx.adamic_adar_index(g, ebunch),
         realnx.adamic_adar_index(nxg, ebunch))


def test_common_neighbors(und):
    nxg, g = und
    pairs = list(realnx.non_edges(nxg))[:5] + list(nxg.edges)[:5]
    for u, v in pairs:
        assert sorted(gnx.common_neighbors(g, u, v)) == \
            sorted(realnx.common_neighbors(nxg, u, v))


def test_directed_raises(spark):
    g = gnx.DiGraph(spark=spark)
    g.add_edge(1, 2)
    with pytest.raises(TypeError):
        list(gnx.jaccard_coefficient(g))


def test_wedge_degree_cap(spark):
    # star 0-(1..5) plus edge 1-2: capping out the hub (deg 5) leaves
    # only the wedges through 1 and 2
    edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
    sym = edges + [(v, u) for u, v in edges]
    lg = LinkGraph.from_edges(
        spark.createDataFrame(sym, "src long, dst long"), directed=False
    )
    full = {(r["u"], r["v"]) for r in
            link_prediction_scores(lg, include_edges=True).collect()}
    capped = {(r["u"], r["v"]) for r in
              link_prediction_scores(lg, include_edges=True,
                                     max_wedge_degree=3).collect()}
    assert (1, 2) in full and len(full) == 10 + 2  # C(5,2) leaf pairs + (0,1),(0,2)
    assert capped == {(0, 2), (0, 1)}  # only wedges through 1 or 2 survive


def test_community_scores_distributed_vs_networkx(spark):
    """community_link_prediction_scores (ONE distributed wedge pass)
    against upstream cn_soundarajan_hopcroft /
    ra_index_soundarajan_hopcroft / within_inter_cluster, for every
    distance-2 non-edge pair of a seeded random graph."""
    from graphscope_spark.algorithms import community_link_prediction_scores

    nxg = realnx.gnp_random_graph(40, 0.1, seed=11)
    for n in nxg.nodes:
        nxg.nodes[n]["community"] = n % 4
    edges = [(int(u), int(v)) for u, v in nxg.edges]
    lg = LinkGraph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=False
    ).build()
    comm = spark.createDataFrame(
        [(int(n), int(n) % 4) for n in nxg.nodes], "id long, community long")
    got = {(r["u"], r["v"]): r
           for r in community_link_prediction_scores(lg, comm).collect()}
    pairs = [tuple(sorted(p)) for p in got]
    want_cn = {tuple(sorted((u, v))): s
               for u, v, s in realnx.cn_soundarajan_hopcroft(nxg, pairs)}
    want_ra = {tuple(sorted((u, v))): s
               for u, v, s in realnx.ra_index_soundarajan_hopcroft(nxg, pairs)}
    want_wic = {tuple(sorted((u, v))): s
                for u, v, s in realnx.within_inter_cluster(nxg, pairs)}
    assert got, "expected at least one distance-2 candidate pair"
    for p, r in got.items():
        key = tuple(sorted(p))
        assert r["cn_sh"] == want_cn[key], key
        assert r["ra_sh"] == pytest.approx(want_ra[key], abs=1e-9), key
        assert r["wic"] == pytest.approx(want_wic[key], abs=1e-9), key
    # the candidate set is exactly the distance-2 non-edge pairs (no
    # pair lost by the wedge generation)
    import itertools

    exp_pairs = {
        (u, v)
        for u, v in itertools.combinations(sorted(nxg.nodes), 2)
        if not nxg.has_edge(u, v)
        and len(list(realnx.common_neighbors(nxg, u, v))) > 0
    }
    assert set(got) == exp_pairs
