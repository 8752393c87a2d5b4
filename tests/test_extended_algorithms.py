"""Extended algorithm suite vs NumPy oracles (SURVEY.md §2.3 beyond
the four north-rule algorithms) — toy graph, exact/allclose 1e-6.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from graphscope_spark.algorithms import (
    all_pairs_shortest_path_length,
    bfs,
    cdlp,
    closeness_centrality,
    clustering,
    edge_boundary,
    eigenvector_centrality,
    hits,
    is_simple_path,
    k_core,
    katz_centrality,
    lpa_u2i,
    node_boundary,
    sssp,
    transitivity,
)
from graphscope_spark.oracles import (
    oracle_bfs_depths,
    oracle_closeness,
    oracle_clustering,
    oracle_eigenvector,
    oracle_hits,
    oracle_katz,
    oracle_kcore,
    oracle_sssp,
    oracle_triangles,
)
from tests.conftest import TOY_EDGES, TOY_VERTICES


def _as_dict(df, key="id", val=None):
    rows = df.collect()
    val = val or [c for c in df.columns if c != key][0]
    return {r[key]: r[val] for r in rows}


def _close(got: dict, exp: dict, atol=1e-6):
    assert set(got) == set(exp)
    ids = sorted(exp)
    assert np.allclose(
        np.array([got[v] for v in ids]), np.array([exp[v] for v in ids]), atol=atol
    )


def test_bfs_toy(toy_graph):
    got = _as_dict(bfs(toy_graph, src=3))
    exp = oracle_bfs_depths(TOY_EDGES, 3, vertices=TOY_VERTICES)
    assert got == exp
    assert got[6] == -1  # component B unreachable


def test_sssp_toy_weighted(toy_graph, spark):
    wedges = [(s, d, float((s + d) % 3 + 1)) for s, d in TOY_EDGES]
    e = spark.createDataFrame(wedges, "src long, dst long, w double")
    from graphscope_spark import LinkGraph

    v = spark.createDataFrame([(i,) for i in TOY_VERTICES], "id long")
    g = LinkGraph.from_edges(e, vertices=v).build(4)
    got = _as_dict(sssp(g, src=3, weight_col="w"))
    exp = oracle_sssp(wedges, 3, vertices=TOY_VERTICES)
    _close(got, exp)


def test_hits_fixed_rounds(toy_graph):
    df = hits(toy_graph, fixed_rounds=5, normalized=True)
    rows = {r["id"]: (r["hub"], r["auth"]) for r in df.collect()}
    exp = oracle_hits(
        TOY_EDGES, vertices=TOY_VERTICES, tolerance=-1.0, max_round=5, normalized=True
    )
    _close({k: v[0] for k, v in rows.items()}, {k: v[0] for k, v in exp.items()})
    _close({k: v[1] for k, v in rows.items()}, {k: v[1] for k, v in exp.items()})


def test_katz_fixed_rounds(toy_graph):
    got = _as_dict(katz_centrality(toy_graph, alpha=0.1, beta=1.0, fixed_rounds=5))
    exp = oracle_katz(TOY_EDGES, vertices=TOY_VERTICES, rounds=5)
    _close(got, exp)


def test_eigenvector_fixed_rounds(toy_graph):
    got = _as_dict(eigenvector_centrality(toy_graph, fixed_rounds=5))
    exp = oracle_eigenvector(TOY_EDGES, vertices=TOY_VERTICES, rounds=5)
    _close(got, exp)


def test_kcore_toy(toy_graph):
    got = {r["id"] for r in k_core(toy_graph, k=2).collect()}
    exp = oracle_kcore(TOY_EDGES, 2)
    assert got == exp


def test_closeness_toy(toy_graph):
    got = _as_dict(closeness_centrality(toy_graph))
    exp = oracle_closeness(TOY_EDGES, vertices=TOY_VERTICES)
    _close(got, exp)


def test_apsp_toy(toy_graph):
    df = all_pairs_shortest_path_length(toy_graph)
    got = {(r["source"], r["id"]): r["distance"] for r in df.collect()}
    exp = {}
    for u in TOY_VERTICES:
        for v, d in oracle_bfs_depths(TOY_EDGES, u, vertices=TOY_VERTICES).items():
            if d >= 0:
                exp[(u, v)] = float(d)
    assert got == exp


def test_clustering_transitivity_toy(toy_graph):
    got = _as_dict(clustering(toy_graph), val="clustering")
    exp = oracle_clustering(TOY_EDGES, vertices=TOY_VERTICES)
    _close(got, exp)
    tri = oracle_triangles(TOY_EDGES, vertices=TOY_VERTICES)
    from collections import Counter

    simple = {(min(s, d), max(s, d)) for s, d in TOY_EDGES if s != d}
    deg = Counter()
    for a, b in simple:
        deg[a] += 1
        deg[b] += 1
    triads = sum(d * (d - 1) for d in deg.values())
    exp_t = (2.0 * sum(tri.values())) / triads if triads else 0.0
    assert abs(transitivity(toy_graph) - exp_t) < 1e-9


def test_lpa_unit_weight_equals_cdlp(toy_graph):
    got = _as_dict(lpa_u2i(toy_graph, max_round=5))
    exp = _as_dict(cdlp(toy_graph, max_round=5))
    assert got == exp


def test_boundaries_toy(toy_graph, spark):
    s = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    nb = {r["id"] for r in node_boundary(toy_graph, s).collect()}
    exp_nb = {d for (a, d) in TOY_EDGES if a in {0, 1, 2} and d not in {0, 1, 2}}
    assert nb == exp_nb
    eb = {(r["src"], r["dst"]) for r in edge_boundary(toy_graph, s).collect()}
    exp_eb = {(a, d) for (a, d) in TOY_EDGES if a in {0, 1, 2} and d not in {0, 1, 2}}
    assert eb == exp_eb


def test_is_simple_path_toy(toy_graph):
    assert is_simple_path(toy_graph, [0, 1, 2]) is True
    assert is_simple_path(toy_graph, [0, 2, 1]) is False  # no 2->1 edge
    assert is_simple_path(toy_graph, [0, 1, 0]) is False  # repeated node
    assert is_simple_path(toy_graph, [7]) is True
    assert is_simple_path(toy_graph, []) is False


# ------------------------------------------------------- path extraction
def test_sssp_path_toy(toy_graph):
    """Tree rows (pred, id, distance) for reached != src; min-id
    optimal predecessor (sssp_path.h semantics, deterministic)."""
    from graphscope_spark.algorithms import sssp_path

    rows = {r["id"]: (r["pred"], r["distance"]) for r in sssp_path(toy_graph, src=3).collect()}
    # toy: 3→{0,1,2,4,5} at depth 1; 4→3 and 3's targets only
    assert rows[0] == (3, 1.0)
    assert rows[4] == (3, 1.0)
    assert 3 not in rows  # source excluded
    assert 6 not in rows  # other component unreachable
    # vertex 5 reachable via 3 (d=1) — min pred among optimal is 3
    assert rows[5] == (3, 1.0)


def test_bfs_generic_modes(toy_graph):
    from graphscope_spark.algorithms import bfs_generic

    tree = {r["id"]: (r["depth"], r["pred"]) for r in
            bfs_generic(toy_graph, src=3, output_format="tree").collect()}
    assert tree[3] == (0, 3)
    assert tree[0] == (1, 3) and tree[5] == (1, 3)
    edges = {(r["src"], r["dst"]) for r in
             bfs_generic(toy_graph, src=3, output_format="edges").collect()}
    preds = {r["id"]: r["predecessor"] for r in
             bfs_generic(toy_graph, src=3, output_format="predecessors").collect()}
    succs = {(r["id"], r["successor"]) for r in
             bfs_generic(toy_graph, src=3, output_format="successors").collect()}
    assert edges == succs == {(p, v) for v, p in preds.items()}
    assert {v for v, (d, p) in tree.items() if v != 3} == set(preds)
    # depth_limit truncates the frontier
    lim = {r["id"] for r in
           bfs_generic(toy_graph, src=4, depth_limit=1, output_format="tree").collect()}
    assert lim == {4, 3}


def test_closeness_landmark_default(toy_graph):
    """Above landmark_threshold the all-pairs default must be
    unreachable: the auto-sampled landmark run equals the explicit-
    sources run, and rows are restricted to the landmarks."""
    from graphscope_spark.algorithms import closeness_centrality
    from pyspark.sql import functions as F

    full = {r["id"]: round(r["centrality"], 9) for r in
            closeness_centrality(toy_graph).collect()}
    assert len(full) == 12  # below threshold: every vertex

    import pytest as _pytest

    with _pytest.warns(RuntimeWarning, match="landmark"):
        auto = closeness_centrality(
            toy_graph, landmark_threshold=4, auto_landmarks=5)
    auto_rows = {r["id"]: round(r["centrality"], 9) for r in auto.collect()}
    assert len(auto_rows) == 5  # landmark-bounded
    # landmark rows agree with the all-pairs values for those vertices
    for v, c in auto_rows.items():
        assert c == full[v], v

    explicit_src = toy_graph.vertices.where(F.col("id").isin([0, 3, 9]))
    expl = {r["id"]: round(r["centrality"], 9) for r in
            closeness_centrality(toy_graph, sources=explicit_src).collect()}
    assert set(expl) == {0, 3, 9}
    for v, c in expl.items():
        assert c == full[v], v


def test_property_graph_labels(spark):
    """add_vertices/add_edges (add_labels_to_graph,
    dag_utils.py:165-213) + property_sssp/bfs labeled contexts."""
    from graphscope_spark import LinkGraph
    from graphscope_spark.algorithms import property_bfs, property_sssp, sssp

    users = spark.createDataFrame([(1,), (2,)], "id long")
    items = spark.createDataFrame([(10,), (11,)], "id long")
    e = spark.createDataFrame([(1, 10), (2, 10), (2, 11)], "src long, dst long")
    g = (
        LinkGraph.empty(spark, directed=False)
        .add_vertices(users, "user")
        .add_vertices(items, "item")
        .add_edges(e, "bought")
    )
    assert g.num_vertices() == 4 and g.num_edges() == 3
    labels = {r["id"]: r["label"] for r in g.vertices.collect()}
    assert labels == {1: "user", 2: "user", 10: "item", 11: "item"}

    d = {(r["label"], r["id"]): r["distance"]
         for r in property_sssp(g, src=1).collect()}
    plain = {r["id"]: r["distance"] for r in sssp(g, src=1).collect()}
    assert d == {(labels[v], v): plain[v] for v in labels}
    assert d[("item", 11)] == 3.0

    b = {r["id"]: r["depth"] for r in property_bfs(g, src=1).collect()}
    assert b == {1: 0, 10: 1, 2: 2, 11: 3}


def test_salted_sum_spreads_constant_values(spark):
    """Unit-weight hub rows (value constant per key) must spread across
    salt buckets (ADVICE r2: a (value,key)-only salt collapses them),
    while staying deterministic and exact."""
    from graphscope_spark.skew import salted_sum

    df = spark.createDataFrame(
        [(1, i, 1.0) for i in range(400)] + [(2, 7, 2.0)],
        "k long, payload long, v double")
    out = {r["k"]: r["sum_value"]
           for r in salted_sum(df, "k", "v", salt_mod=8).collect()}
    assert out == {1: 400.0, 2: 2.0}
    # the hub key's rows occupy several salt buckets
    from pyspark.sql import functions as F
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns], F.col("v")),
                  F.lit(8))
    n_buckets = df.where(F.col("k") == 1).select(
        salt.alias("s")).distinct().count()
    assert n_buckets >= 4


def test_hits_edgeless_graph_no_nan_spin(spark):
    """All-zero hub round (edgeless graph) must converge immediately
    instead of NaN-burning max_round iterations (ADVICE r2)."""
    from graphscope_spark import LinkGraph

    v = spark.createDataFrame([(i,) for i in range(3)], "id long")
    e = spark.createDataFrame([], "src long, dst long")
    g = LinkGraph(vertices=v, edges=e, directed=True)
    out = hits(g, max_round=50)
    rows = {r["id"]: (r["hub"], r["auth"]) for r in out.collect()}
    assert set(rows) == {0, 1, 2}
    for h, a in rows.values():
        assert h == h and a == a  # not NaN
