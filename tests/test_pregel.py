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


def test_pregel_degree(toy_graph):
    from collections import Counter

    from tests.conftest import TOY_EDGES

    out = run_pregel(toy_graph, degree_program(), max_iter=5)
    got = {r["id"]: r["value"] for r in out.collect()}
    exp = Counter(d for _, d in TOY_EDGES)
    for v, val in got.items():
        assert val == float(exp.get(v, 0)), v
