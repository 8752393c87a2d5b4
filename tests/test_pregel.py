"""Pregel UDF surface (SURVEY.md §2.6) — the user-program API must
reproduce builtin results (the reference validates its Pregel SSSP
against the builtin, test_udf_app.py:100-123)."""

from __future__ import annotations

from graphscope_spark.algorithms import bfs
from graphscope_spark.pregel import degree_program, run_pregel, sssp_program

INF = float("inf")


def test_pregel_sssp_matches_bfs(toy_graph):
    out = run_pregel(toy_graph, sssp_program(src=3), max_iter=50)
    got = {r["id"]: r["value"] for r in out.collect()}
    exp = {r["id"]: r["depth"] for r in bfs(toy_graph, src=3).collect()}
    for v, d in exp.items():
        assert got[v] == (INF if d == -1 else float(d)), v


def test_pregel_sssp_undirected_matches_builtin(spark):
    """On a LinkGraph(directed=False) holding canonical one-direction
    edges, run_pregel must symmetrize like the builtin sssp does
    (ADVICE r1): a chain stored 0→1→2 must be walkable from 2."""
    from graphscope_spark import LinkGraph
    from graphscope_spark.algorithms import sssp

    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    g = LinkGraph.from_edges(e, directed=False).build(4)
    got = {
        r["id"]: r["value"]
        for r in run_pregel(g, sssp_program(src=3), max_iter=10).collect()
    }
    exp = {r["id"]: r["distance"] for r in sssp(g, src=3).collect()}
    assert got == exp == {0: 3.0, 1: 2.0, 2: 1.0, 3: 0.0}


def test_pregel_degree(toy_graph):
    from collections import Counter

    from tests.conftest import TOY_EDGES

    out = run_pregel(toy_graph, degree_program(), max_iter=5)
    got = {r["id"]: r["value"] for r in out.collect()}
    exp = Counter(d for _, d in TOY_EDGES)
    for v, val in got.items():
        assert val == float(exp.get(v, 0)), v


def test_pie_sssp_matches_builtin(toy_graph):
    """PIE surface (decorators.py:39-114): SSSP expressed as
    Init/PEval/IncEval must equal the builtin (the reference validates
    its SSSP_PIE the same way, test_udf_app.py:34-76)."""
    from graphscope_spark.algorithms import sssp
    from graphscope_spark.pie import run_pie, sssp_pie

    info: dict = {}
    out = run_pie(toy_graph, sssp_pie(src=3), max_iter=50, info_out=info)
    got = {r["id"]: r["distance"] for r in out.select("id", "distance").collect()}
    exp = {r["id"]: r["distance"] for r in sssp(toy_graph, src=3).collect()}
    assert got == exp
    assert info["converged"]


def test_pie_weighted_undirected(spark):
    from graphscope_spark import LinkGraph
    from graphscope_spark.algorithms import sssp
    from graphscope_spark.pie import run_pie, sssp_pie

    e = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 3.0), (0, 2, 10.0)], "src long, dst long, w double"
    )
    g = LinkGraph.from_edges(e, directed=False).build(4)
    got = {r["id"]: r["distance"] for r in
           run_pie(g, sssp_pie(src=2, weight_col="w"), max_iter=20)
           .select("id", "distance").collect()}
    exp = {r["id"]: r["distance"] for r in sssp(g, src=2, weight_col="w").collect()}
    assert got == exp == {0: 5.0, 1: 3.0, 2: 0.0}
