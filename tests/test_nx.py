"""NetworkX-compat layer vs the real networkx (installed in the test
env) — the strongest possible oracle for the reference's
nx/algorithms/builtin.py surface: identical graphs, identical
signatures, compare dict results.

Graphs are small (NX compat is the convenience path); distributed
execution itself is covered by the driver oracle queries.
"""

from __future__ import annotations

import networkx as realnx
import pytest
from pyspark.sql import functions as F

import graphscope_spark.nx as gnx
from graphscope_spark import oracles as O


def _mirror(nxg, spark):
    """Copy a networkx graph into the compat layer."""
    g = gnx.DiGraph(spark=spark) if nxg.is_directed() else gnx.Graph(spark=spark)
    g.add_nodes_from(nxg.nodes)
    for u, v, d in nxg.edges(data=True):
        g.add_edge(u, v, **d)
    return g


def _sym(nxg) -> list[tuple[int, int]]:
    """Directed edge list the NumPy oracles expect (both directions for
    undirected graphs)."""
    if nxg.is_directed():
        return list(nxg.edges)
    return [e for u, v in nxg.edges for e in ((u, v), (v, u)) if u != v] + \
        [(u, v) for u, v in nxg.edges if u == v]


@pytest.fixture(scope="module")
def und(spark):
    nxg = realnx.gnp_random_graph(40, 0.1, seed=7)
    nxg.add_edge(100, 101)  # extra small component
    return nxg, _mirror(nxg, spark)


@pytest.fixture(scope="module")
def dig(spark):
    nxg = realnx.gnp_random_graph(36, 0.09, seed=11, directed=True)
    return nxg, _mirror(nxg, spark)


@pytest.fixture(scope="module")
def wg(spark):
    nxg = realnx.gnp_random_graph(30, 0.14, seed=3)
    for i, (u, v) in enumerate(nxg.edges):
        nxg[u][v]["weight"] = 1.0 + (i % 7)
    return nxg, _mirror(nxg, spark)


def _close(a: dict, b: dict, tol=1e-4):
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) <= tol, (k, a[k], b[k])


def test_graph_bookkeeping(spark):
    g = gnx.Graph(spark=spark)
    g.add_edges_from([(1, 2), (2, 3)])
    g.add_node("x", color="red")
    assert g.number_of_nodes() == 4 and g.number_of_edges() == 2
    assert g.has_edge(2, 1) and not g.has_edge(1, 3)
    assert set(g.neighbors(2)) == {1, 3}
    assert g.degree(2) == 2
    g.remove_edge(1, 2)
    assert g.number_of_edges() == 1 and not g.has_edge(1, 2)
    g.remove_node(2)
    assert g.number_of_nodes() == 3 and g.number_of_edges() == 0
    d = g.to_directed()
    assert d.is_directed() and d.number_of_nodes() == 3


def test_pagerank_vs_oracle(und):
    # networkx.pagerank needs scipy (absent here); the repo's NumPy
    # oracle implements the same NX convergence semantics and is
    # pytest-verified against NX elsewhere. max_iter capped identically
    # on both sides: identical iterates, exact parity, fast test.
    nxg, g = und
    ora = O.oracle_pagerank(_sym(nxg), vertices=sorted(nxg.nodes),
                            tol=1e-6, max_iter=12)
    _close(gnx.pagerank(g, tol=1e-6, max_iter=12), ora, tol=1e-9)


def test_pagerank_directed_vs_oracle(dig):
    nxg, g = dig
    ora = O.oracle_pagerank(list(nxg.edges), vertices=sorted(nxg.nodes),
                            tol=1e-6, max_iter=12)
    _close(gnx.pagerank(g, tol=1e-6, max_iter=12), ora, tol=1e-9)


def test_hits_vs_oracle(dig):
    nxg, g = dig
    h, a = gnx.hits(g, tol=1e-2, max_iter=20)
    ora = O.oracle_hits(list(nxg.edges), vertices=sorted(nxg.nodes),
                        tolerance=1e-2, max_round=20)
    _close(h, {k: v[0] for k, v in ora.items()}, tol=1e-9)
    _close(a, {k: v[1] for k, v in ora.items()}, tol=1e-9)


def test_degree_centrality_vs_networkx(und, dig):
    nxg, g = und
    _close(gnx.degree_centrality(g), realnx.degree_centrality(nxg), tol=1e-12)
    nxd, gd = dig
    _close(gnx.degree_centrality(gd), realnx.degree_centrality(nxd), tol=1e-12)
    _close(gnx.in_degree_centrality(gd), realnx.in_degree_centrality(nxd), tol=1e-12)
    _close(gnx.out_degree_centrality(gd), realnx.out_degree_centrality(nxd), tol=1e-12)


def test_eigenvector_katz_vs_oracle(dig):
    # reference semantics (x' = x + A^T x) differ from NX's power
    # iteration, so the repo NumPy oracles are the truth here;
    # fixed_rounds pinned identically on both sides
    nxg, g = dig
    ev = gnx.eigenvector_centrality(g, fixed_rounds=6)
    _close(ev, O.oracle_eigenvector(list(nxg.edges), sorted(nxg.nodes),
                                    rounds=6), tol=1e-9)
    kz = gnx.katz_centrality(g, alpha=0.05, fixed_rounds=6)
    _close(kz, O.oracle_katz(list(nxg.edges), sorted(nxg.nodes),
                             alpha=0.05, rounds=6), tol=1e-9)


def test_weighted_eigenvector_katz_vs_oracle(spark):
    nxg = realnx.gnp_random_graph(30, 0.12, seed=19, directed=True)
    for i, (u, v) in enumerate(nxg.edges):
        nxg[u][v]["weight"] = 0.5 + (i % 5)
    g = _mirror(nxg, spark)
    edges = list(nxg.edges)
    ws = [nxg[u][v]["weight"] for u, v in edges]
    ev = gnx.eigenvector_centrality(g, weight="weight", fixed_rounds=6)
    _close(ev, O.oracle_eigenvector(edges, sorted(nxg.nodes), rounds=6,
                                    weights=ws), tol=1e-9)
    kz = gnx.katz_centrality(g, alpha=0.02, weight="weight", fixed_rounds=6)
    _close(kz, O.oracle_katz(edges, sorted(nxg.nodes), alpha=0.02, rounds=6,
                             weights=ws), tol=1e-9)


def test_weighted_assortativity_vs_networkx(spark):
    nxg = realnx.gnp_random_graph(30, 0.12, seed=23, directed=True)
    for i, (u, v) in enumerate(nxg.edges):
        nxg[u][v]["weight"] = 1.0 + (i % 4)
    g = _mirror(nxg, spark)
    assert abs(
        gnx.degree_assortativity_coefficient(g, x="out", y="in", weight="weight")
        - realnx.degree_assortativity_coefficient(nxg, x="out", y="in",
                                                  weight="weight")) < 1e-9


def test_clustering_triangles_vs_networkx(und):
    nxg, g = und
    _close(gnx.clustering(g), realnx.clustering(nxg), tol=1e-12)
    tri = gnx.triangles(g)
    assert tri == realnx.triangles(nxg)
    assert abs(gnx.transitivity(g) - realnx.transitivity(nxg)) < 1e-12
    assert abs(gnx.average_clustering(g) - realnx.average_clustering(nxg)) < 1e-12


def test_sssp_vs_networkx(wg):
    nxg, g = wg
    src = next(iter(nxg.nodes))
    d = gnx.single_source_dijkstra_path_length(g, src)
    rd = realnx.single_source_dijkstra_path_length(nxg, src)
    _close(d, rd, tol=1e-9)
    # shortest_path: NX picks an arbitrary optimal path; check ours is
    # optimal and valid instead of identical
    paths = gnx.shortest_path(g, src, weight="weight")
    for t, p in paths.items():
        assert p[0] == src and p[-1] == t
        cost = sum(nxg[a][b]["weight"] for a, b in zip(p, p[1:]))
        assert abs(cost - rd[t]) < 1e-9
        for a, b in zip(p, p[1:]):
            assert nxg.has_edge(a, b)


def test_has_path_and_average_length(und):
    nxg, g = und
    comp = max(realnx.connected_components(nxg), key=len)
    inside = sorted(comp)[:2]
    assert gnx.has_path(g, inside[0], inside[1])
    assert not gnx.has_path(g, inside[0], 100)
    sub, gsub = nxg.subgraph(comp), g.subgraph(comp)
    assert abs(gnx.average_shortest_path_length(gsub)
               - realnx.average_shortest_path_length(sub)) < 1e-9


def test_bfs_family_vs_networkx(und):
    nxg, g = und
    src = next(iter(nxg.nodes))
    depth = realnx.single_source_shortest_path_length(nxg, src)
    edges = gnx.bfs_edges(g, src)
    # every visited node appears exactly once as child, with a valid
    # min-id parent at depth-1 (NX parent choice is traversal-dependent)
    children = [v for _, v in edges]
    assert sorted(children) == sorted(k for k in depth if k != src)
    for u, v in edges:
        assert depth[u] + 1 == depth[v] and nxg.has_edge(u, v)
        assert u == min(w for w in nxg.neighbors(v) if depth.get(w) == depth[v] - 1)
    preds = dict(gnx.bfs_predecessors(g, src))
    assert set(preds) == set(children)
    succ = dict(gnx.bfs_successors(g, src))
    assert sorted(c for cs in succ.values() for c in cs) == sorted(children)
    t = gnx.bfs_tree(g, src)
    assert t.number_of_nodes() == len(depth) and t.number_of_edges() == len(depth) - 1
    # depth_limit
    lim_edges = gnx.bfs_edges(g, src, depth_limit=2)
    assert {v for _, v in lim_edges} == {k for k, d in depth.items() if 0 < d <= 2}


def test_apsp_and_closeness_vs_networkx(und):
    nxg, g = und
    apsp = gnx.all_pairs_shortest_path_length(g)
    rap = dict(realnx.all_pairs_shortest_path_length(nxg))
    assert set(apsp) == set(rap)
    for s in rap:
        assert {k: int(v) for k, v in apsp[s].items()} == rap[s]
    _close(gnx.closeness_centrality(g), realnx.closeness_centrality(nxg), tol=1e-9)
    u = next(iter(nxg.nodes))
    assert abs(gnx.closeness_centrality(g, u=u)
               - realnx.closeness_centrality(nxg, u)) < 1e-9


def test_k_core_vs_networkx(und, spark):
    nxg, g = und
    core = gnx.k_core(g, 2)
    rcore = realnx.k_core(nxg, 2)
    assert sorted(core.nodes) == sorted(rcore.nodes)
    assert sorted(map(tuple, map(sorted, core.edges))) == \
        sorted(map(tuple, map(sorted, rcore.edges)))
    # max-core (k=None) on a small dense graph to bound the k-walk
    small = realnx.gnp_random_graph(16, 0.3, seed=5)
    gs = _mirror(small, spark)
    assert sorted(gnx.k_core(gs, None).nodes) == sorted(realnx.k_core(small).nodes)


def test_components_vs_networkx(und, dig):
    nxg, g = und
    ours = list(gnx.connected_components(g))
    theirs = list(realnx.connected_components(nxg))
    assert sorted(map(sorted, ours)) == sorted(map(sorted, theirs))
    nxd, gd = dig
    ours_d = list(gnx.weakly_connected_components(gd))
    theirs_d = list(realnx.weakly_connected_components(nxd))
    assert sorted(map(sorted, ours_d)) == sorted(map(sorted, theirs_d))


def test_assortativity_vs_networkx(dig):
    nxg, g = dig
    assert abs(gnx.degree_assortativity_coefficient(g, x="out", y="in")
               - realnx.degree_assortativity_coefficient(nxg, x="out", y="in")) < 1e-9


def test_boundary_vs_networkx(und):
    nxg, g = und
    s = sorted(nxg.nodes)[:15]
    assert gnx.node_boundary(g, s) == realnx.node_boundary(nxg, s)
    ours = {tuple(sorted(e)) for e in gnx.edge_boundary(g, s)}
    theirs = {tuple(sorted(e)) for e in realnx.edge_boundary(nxg, s)}
    assert ours == theirs


def test_is_simple_path(und):
    nxg, g = und
    comp = sorted(max(realnx.connected_components(nxg), key=len))
    u = comp[0]
    v = next(iter(nxg.neighbors(u)))
    assert gnx.is_simple_path(g, [u, v])
    assert not gnx.is_simple_path(g, [u, u])
    assert not gnx.is_simple_path(g, [u, 99999])


def test_louvain_communities_shape(und):
    nxg, g = und
    comms = gnx.louvain_communities(g, fixed_levels=1, fixed_iters=2)
    nodes = [n for c in comms for n in c]
    assert sorted(nodes) == sorted(nxg.nodes)  # a partition
    assert len(comms) > 1


def test_string_nodes(spark):
    g = gnx.Graph(spark=spark)
    g.add_edges_from([("a", "b"), ("b", "c"), ("c", "a"), ("d", "e")])
    pr = gnx.pagerank(g)
    assert set(pr) == {"a", "b", "c", "d", "e"}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert gnx.triangles(g)["a"] == 1
    comps = sorted(map(sorted, gnx.connected_components(g)))
    assert comps == [["a", "b", "c"], ["d", "e"]]


def test_from_link_graph_readonly(spark, toy_graph):
    g = gnx.Graph.from_link_graph(toy_graph)
    assert g.is_directed()  # toy_graph is directed
    pr = gnx.pagerank(g, max_iter=5)
    assert set(pr) == set(range(12))
    with pytest.raises(TypeError):
        g.add_edge(1, 2)
    core = gnx.k_core(g, 2)
    assert core.number_of_nodes() > 0


# ----------------------------------------------------------------------
# round 3: generators + readwrite (reference nx/generators/classic.py,
# random_graphs.py, nx/readwrite/edgelist.py)
# ----------------------------------------------------------------------
def test_generators_vs_networkx():
    for ours, real, args in [
        (gnx.path_graph, realnx.path_graph, (7,)),
        (gnx.cycle_graph, realnx.cycle_graph, (6,)),
        (gnx.complete_graph, realnx.complete_graph, (5,)),
        (gnx.star_graph, realnx.star_graph, (4,)),
        (gnx.empty_graph, realnx.empty_graph, (3,)),
        (gnx.complete_bipartite_graph, realnx.complete_bipartite_graph, (3, 4)),
        (gnx.barbell_graph, realnx.barbell_graph, (4, 2)),
        (gnx.barbell_graph, realnx.barbell_graph, (3, 0)),
        (gnx.balanced_tree, realnx.balanced_tree, (2, 3)),
        (gnx.balanced_tree, realnx.balanced_tree, (3, 2)),
    ]:
        g, r = ours(*args), real(*args)
        assert sorted(g.nodes) == sorted(r.nodes), ours.__name__
        assert sorted(map(tuple, map(sorted, g.edges))) == \
            sorted(map(tuple, map(sorted, r.edges))), ours.__name__


def test_complete_graph_directed_edge_count():
    g = gnx.complete_graph(6, gnx.DiGraph())
    assert g.number_of_edges() == 30


def test_gnp_deterministic_and_plausible():
    a = gnx.gnp_random_graph(60, 0.2, seed=5)
    b = gnx.gnp_random_graph(60, 0.2, seed=5)
    assert sorted(map(tuple, map(sorted, a.edges))) == \
        sorted(map(tuple, map(sorted, b.edges)))
    c = gnx.gnp_random_graph(60, 0.2, seed=6)
    assert sorted(map(tuple, map(sorted, a.edges))) != \
        sorted(map(tuple, map(sorted, c.edges)))
    # edge count within loose binomial bounds: n(n-1)/2 * p = 354
    m = a.number_of_edges()
    assert 240 < m < 480
    # p=0 / p=1 degenerate cases exact
    assert gnx.gnp_random_graph(10, 0.0, seed=1).number_of_edges() == 0
    assert gnx.gnp_random_graph(10, 1.0, seed=1).number_of_edges() == 45


def test_edgelist_roundtrip(tmp_path):
    g = gnx.gnp_random_graph(25, 0.2, seed=9)
    p = str(tmp_path / "el.txt")
    gnx.write_edgelist(g, p, data=False)
    back = gnx.read_edgelist(p, nodetype=int)
    assert sorted(map(tuple, map(sorted, back.edges))) == \
        sorted(map(tuple, map(sorted, g.edges)))
    # and real networkx parses our file identically
    rb = realnx.read_edgelist(p, nodetype=int)
    assert sorted(map(tuple, map(sorted, rb.edges()))) == \
        sorted(map(tuple, map(sorted, g.edges)))


def test_edgelist_roundtrip_with_attrs(tmp_path):
    g = gnx.Graph()
    g.add_edge(1, 2, weight=3.5)
    g.add_edge(2, 4, weight=1.0)
    p = str(tmp_path / "elw.txt")
    gnx.write_edgelist(g, p, data=True)
    back = gnx.read_edgelist(p, nodetype=int)
    assert back._succ[1][2]["weight"] == 3.5
    rb = realnx.read_edgelist(p, nodetype=int)
    assert rb[1][2]["weight"] == 3.5


def test_closeness_single_node_any_graph(und, spark):
    nxg, g = und
    # single-node closeness computed exactly as its own source
    for u in (0, 17, 100):
        assert abs(gnx.closeness_centrality(g, u)
                   - realnx.closeness_centrality(nxg, u)) < 1e-4


def test_degree_distributed_in_linkgraph_mode(spark, und):
    """from_link_graph mode computes degree() distributedly instead of
    silently returning {} (ADVICE r2)."""
    nxg, g = und
    lg = g._flush()
    wrapped = gnx.Graph.from_link_graph(lg)
    want = dict(realnx.degree(nxg))
    got = wrapped.degree()
    # node keys are raw int ids in linkgraph mode (same ints here)
    assert got == {int(k): v for k, v in want.items()}
    assert wrapped.degree(0) == want[0]
    with pytest.raises(KeyError):
        wrapped.degree(424242)
    with pytest.raises(NotImplementedError):
        wrapped.nodes


def test_dfs_wrappers_vs_networkx(spark):
    # build BOTH graphs with sorted edge insertion so networkx's
    # adjacency-insertion order equals our min-id child order
    base = realnx.gnp_random_graph(30, 0.12, seed=13)
    edges = sorted(map(tuple, map(sorted, base.edges())))
    nxg = realnx.Graph()
    nxg.add_nodes_from(range(30))
    nxg.add_edges_from(edges)
    g = _mirror(nxg, spark)
    src = 0
    assert gnx.dfs_preorder_nodes(g, src) == \
        list(realnx.dfs_preorder_nodes(nxg, src))
    t, rt = gnx.dfs_tree(g, src), realnx.dfs_tree(nxg, src)
    assert sorted(map(tuple, t.edges)) == sorted(map(tuple, rt.edges()))


def test_adjlist_roundtrip(tmp_path):
    nxg = realnx.gnp_random_graph(25, 0.15, seed=3)
    g = _mirror(nxg, spark=None)
    p = str(tmp_path / "g.adjlist")
    gnx.write_adjlist(g, p)
    # our file is readable by REAL networkx, and vice versa
    back_real = realnx.read_adjlist(p, nodetype=int)
    assert sorted(map(tuple, map(sorted, back_real.edges))) == \
        sorted(map(tuple, map(sorted, nxg.edges)))
    p2 = str(tmp_path / "real.adjlist")
    realnx.write_adjlist(nxg, p2)
    back_ours = gnx.read_adjlist(p2, nodetype=int)
    assert sorted(map(tuple, map(sorted, back_ours.edges))) == \
        sorted(map(tuple, map(sorted, nxg.edges)))
    assert sorted(back_ours.nodes) == sorted(nxg.nodes)


def test_adjlist_directed(tmp_path):
    nxg = realnx.gnp_random_graph(15, 0.2, seed=8, directed=True)
    g = _mirror(nxg, spark=None)
    p = str(tmp_path / "d.adjlist")
    gnx.write_adjlist(g, p)
    back = realnx.read_adjlist(p, nodetype=int,
                               create_using=realnx.DiGraph)
    assert sorted(back.edges) == sorted(nxg.edges)


def test_graphml_roundtrip(tmp_path):
    g = gnx.Graph()
    g.add_node(1, color="red", score=0.5, flag=True, count=7)
    g.add_node(2)
    g.add_edge(1, 2, weight=3.5)
    g.add_edge(2, 3, weight=1.0, kind="link")
    p = str(tmp_path / "g.graphml")
    gnx.write_graphml(g, p)
    back = gnx.read_graphml(p, node_type=int)
    assert sorted(back.nodes) == [1, 2, 3]
    assert back._node[1] == {"color": "red", "score": 0.5,
                             "flag": True, "count": 7}
    assert back._succ[1][2]["weight"] == 3.5
    assert back._succ[2][3] == {"weight": 1.0, "kind": "link"}
    assert not back._directed


def test_graphml_directed_roundtrip(tmp_path):
    g = gnx.DiGraph()
    g.add_edge("a", "b", w=2.0)
    p = str(tmp_path / "d.graphml")
    gnx.write_graphml(g, p)
    back = gnx.read_graphml(p)
    assert back._directed
    assert list(back.edges) == [("a", "b")]
    assert back._succ["a"]["b"]["w"] == 2.0


def test_graphml_cross_parse_with_networkx(tmp_path):
    # real networkx reads our file, and we read real networkx's file
    g = gnx.Graph()
    g.add_edge(1, 2, weight=3.5)
    g.add_node(1, color="red")
    ours = str(tmp_path / "ours.graphml")
    gnx.write_graphml(g, ours)
    rb = realnx.read_graphml(ours, node_type=int)
    assert rb[1][2]["weight"] == 3.5
    assert rb.nodes[1]["color"] == "red"

    ng = realnx.Graph()
    ng.add_edge(1, 2, weight=3.5)
    ng.add_node(1, color="red")
    theirs = str(tmp_path / "theirs.graphml")
    realnx.write_graphml(ng, theirs)
    back = gnx.read_graphml(theirs, node_type=int)
    assert back._succ[1][2]["weight"] == 3.5
    assert back._node[1]["color"] == "red"


def test_degree_unsymmetrized_undirected_storage(spark):
    """Undirected from_link_graph degree must be right even when the
    stored edge set is NOT a symmetric closure (from_edges keeps rows
    as given) — including a self-loop counted twice."""
    from graphscope_spark.graph import LinkGraph
    e = spark.createDataFrame([(1, 2), (3, 1), (4, 4)], "src long, dst long")
    lg = LinkGraph.from_edges(e, directed=False)
    g = gnx.Graph.from_link_graph(lg)
    assert g.degree(2) == 1        # dst-side only in storage
    assert g.degree(1) == 2
    assert g.degree(4) == 2        # self-loop counts twice
    nxg = realnx.Graph([(1, 2), (3, 1), (4, 4)])
    assert g.degree() == dict(realnx.degree(nxg))


def test_harmonic_generator_nbunch_and_weight(spark, und):
    nxg, g = und
    want = realnx.harmonic_centrality(nxg, nbunch=[0, 3])
    got = gnx.harmonic_centrality(g, nbunch=(n for n in [0, 3]))
    assert set(got) == {0, 3}
    for k in got:
        assert abs(got[k] - want[k]) < 1e-6
    # weighted distance in from_link_graph mode resolves the column
    # name as-is (regression: used to hardcode 'w')
    lg = g._flush()
    lgw = type(lg)(vertices=lg.vertices,
                   edges=lg.edges.withColumn("cost", F.lit(1.0)),
                   directed=lg.directed)
    wrapped = gnx.Graph.from_link_graph(lgw)
    gw = gnx.harmonic_centrality(wrapped, distance="cost")
    gu = gnx.harmonic_centrality(wrapped)
    for k in gu:
        assert abs(gw[k] - gu[k]) < 1e-6  # unit costs == unweighted


def test_transitive_closure_like_upstream(spark):
    """The DiGraph/Graph halves of upstream test_dag's transitive
    closure tests (the vendored originals hit MultiGraph mid-test and
    xfail; this re-asserts the supported surface byte-for-byte)."""
    G = gnx.DiGraph([(1, 2), (2, 3), (3, 4)], spark=spark)
    solution = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert sorted(gnx.transitive_closure(G).edges) == solution
    assert sorted(gnx.transitive_closure(G, False).edges) == solution
    assert sorted(gnx.transitive_closure(G, None).edges) == solution
    assert sorted(gnx.transitive_closure(G, True).edges) == sorted(
        solution + [(n, n) for n in G])
    Gc = gnx.DiGraph([(1, 2), (2, 3), (3, 1)], spark=spark)
    cyc = sorted([(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)])
    assert sorted(gnx.transitive_closure(Gc).edges) == sorted(
        cyc + [(n, n) for n in Gc])  # default False: loops via cycles
    assert sorted(gnx.transitive_closure(Gc, None).edges) == cyc
    U = gnx.Graph([(1, 2), (2, 3), (3, 4)], spark=spark)
    assert sorted(tuple(sorted(e)) for e in gnx.transitive_closure(U).edges) \
        == solution
    # edge data copied for pre-existing edges
    Gd = gnx.DiGraph([(1, 2, {"a": 3}), (2, 3, {"b": 0}), (3, 4)], spark=spark)
    H = gnx.transitive_closure(Gd)
    for u, v in Gd.edges:
        assert Gd.get_edge_data(u, v) == H.get_edge_data(u, v)
    with pytest.raises(gnx.NetworkXError):
        gnx.transitive_closure(gnx.Graph(spark=spark), reflexive="wrong input")


def test_topological_generations_digraph_half(spark):
    """The DiGraph half of upstream test_topological_generations (the
    vendored original continues into MultiDiGraph and xfails)."""
    G = gnx.DiGraph(
        {1: [2, 3], 2: [4, 5], 3: [7], 4: [], 5: [6, 7], 6: [], 7: []},
        spark=spark).reverse()
    generations = [sorted(gen) for gen in gnx.topological_generations(G)]
    assert generations == [[4, 6, 7], [3, 5], [2], [1]]
