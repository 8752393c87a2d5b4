"""`import graphscope` facade (graphscope_spark/compat.py) vs the
reference's documented usage (docs/getting_started.rst, python/
graphscope/__init__.py:19-32): session → load_from → app(graph) →
Context.to_dataframe(selector) with reference signatures."""

from __future__ import annotations

import numpy as np
import pytest

import graphscope_spark.compat as graphscope
from graphscope_spark.graph import LinkGraph
from tests.conftest import TOY_EDGES


@pytest.fixture(scope="module")
def sess(spark):
    s = graphscope.session()
    s.spark = spark  # reuse the shared test session
    return s


@pytest.fixture(scope="module")
def gg(sess, toy_graph):
    return sess.g(toy_graph)


def test_session_g_builders(sess, spark):
    # empty graph
    empty = sess.g()
    assert empty.edges.count() == 0
    # from tuple list (module-level g() on the default session)
    lg = graphscope.g([(1, 2), (2, 3)])
    assert isinstance(lg, LinkGraph)
    assert lg.edges.count() == 2
    # load_from with explicit vertices keeps isolated vertices
    lg2 = graphscope.load_from(edges=[(1, 2)], vertices=[(1,), (2,), (9,)])
    assert lg2.vertices.count() == 3


def test_pagerank_fixed_vs_nx(gg):
    # reference pagerank = fixed max_round; pagerank_nx = converged.
    ctx = graphscope.pagerank(gg, delta=0.85, max_round=10)
    pdf = ctx.to_dataframe({"id": "v.id", "rank": "r"})
    assert set(pdf.columns) == {"id", "rank"}
    assert len(pdf) == 12
    assert abs(pdf["rank"].sum() - 1.0) < 1e-6
    nx_ranks = graphscope.pagerank_nx(gg, tol=1e-10).to_dataframe(
        {"id": "v.id", "rank": "r"})
    assert abs(nx_ranks["rank"].sum() - 1.0) < 1e-6


def test_apps_run_with_reference_signatures(gg):
    assert len(graphscope.wcc(gg).to_dataframe()) == 12
    assert len(graphscope.cdlp(gg, max_round=5).to_dataframe()) == 12
    d = graphscope.sssp(gg, src=3).to_dataframe({"id": "v.id", "dist": "r"})
    assert dict(zip(d["id"], d["dist"]))[4] == 1.0
    b = graphscope.bfs(gg, src=3).to_dataframe({"id": "v.id", "depth": "r"})
    assert dict(zip(b["id"], b["depth"]))[2] == 1
    # multi-column result needs r.<col>
    h = graphscope.hits(gg, max_round=5).to_dataframe(
        {"id": "v.id", "hub": "r.hub", "auth": "r.auth"})
    assert {"id", "hub", "auth"} == set(h.columns)
    with pytest.raises(ValueError):
        graphscope.hits(gg, max_round=2).to_dataframe({"x": "r"})
    assert isinstance(
        graphscope.degree_assortativity_coefficient(gg), float)
    tc = graphscope.triangles(gg).to_dataframe({"id": "v.id", "t": "r"})
    assert len(tc) == 12


def test_context_numpy_output_vertex_range(gg, tmp_path):
    ctx = graphscope.wcc(gg)
    arr = ctx.to_numpy("v.id")
    assert sorted(arr.tolist()) == list(range(12))
    # vertex_range is [lo, hi)
    sub = ctx.to_dataframe({"id": "v.id"}, vertex_range=(0, 5))
    assert sorted(sub["id"]) == [0, 1, 2, 3, 4]
    out = tmp_path / "res.csv"
    ctx.output(str(out), {"id": "v.id", "comp": "r"})
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "id,comp" and len(lines) == 13
    assert isinstance(np.asarray(ctx.to_numpy("r")), np.ndarray)


def test_vertex_property_selector(sess, spark, toy_graph):
    v = spark.createDataFrame(
        [(i, float(i * i)) for i in range(12)], "id long, score double")
    lg = LinkGraph(vertices=v, edges=toy_graph.edges, directed=True)
    ctx = graphscope.wcc(lg)
    pdf = ctx.to_dataframe({"id": "v.id", "score": "v.score", "comp": "r"})
    assert dict(zip(pdf["id"], pdf["score"]))[3] == 9.0


def test_add_column_reference_form(gg):
    # docs/getting_started.rst:219-220: g.add_column(ctx, {'col': 'r'})
    ctx = graphscope.wcc(gg)
    g2 = gg.add_column(ctx, {"component": "r"})
    assert "component" in g2.vertices.columns
    assert g2.vertices.where("component IS NULL").count() == 0
    h = graphscope.hits(gg, max_round=3)
    g3 = gg.add_column(h, {"hub": "r.hub"})
    assert "hub" in g3.vertices.columns
    with pytest.raises(ValueError):
        gg.add_column(h, {"x": "r"})


def test_session_gremlin(sess, gg):
    # sess.gremlin(g) -> traversal source, like the reference's
    # interactive handle
    t = sess.gremlin(gg)
    assert sorted(t.V().toList()) == list(range(12))


def test_repeated_vertex_property_selector(sess, spark, toy_graph):
    """Two selectors referencing the same vertex property must not
    produce an ambiguous duplicate join column."""
    v = spark.createDataFrame(
        [(i, float(i * i)) for i in range(12)], "id long, score double")
    lg = LinkGraph(vertices=v, edges=toy_graph.edges, directed=True)
    ctx = graphscope.wcc(lg)
    pdf = ctx.to_dataframe({"a": "v.score", "b": "v.score", "id": "v.id"})
    assert (pdf["a"] == pdf["b"]).all()
    assert dict(zip(pdf["id"], pdf["a"]))[3] == 9.0
