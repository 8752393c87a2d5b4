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
