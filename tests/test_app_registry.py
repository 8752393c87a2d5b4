"""load_app-style plugin registry (reference framework/app.py:426-466
+ builtin .gs_conf.yaml registry) — register a custom pregel program,
run it by name, and check builtins dispatch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.app import App, load_app, register_app
from graphscope_spark.algorithms import sssp
from graphscope_spark.pregel import sssp_program


def test_builtin_dispatch(toy_graph):
    app = load_app("pagerank")
    out = app(toy_graph, fixed_rounds=3)
    assert out.count() == 12
    assert "graphscope_spark.app.App" in repr(app)


def test_unknown_raises():
    with pytest.raises(KeyError, match="register_app"):
        load_app("definitely_not_registered")


def test_register_custom_pregel_matches_builtin(toy_graph):
    register_app("my_sssp", sssp_program(src=3))
    got = load_app("my_sssp")(toy_graph)
    want = sssp(toy_graph, src=3)
    g = {(r["id"], r["value"]) for r in got.collect()
         if r["value"] != float("inf")}
    w = {(r["id"], float(r["distance"])) for r in want.collect()
         if r["distance"] != float("inf")}
    assert g == w


def test_register_decorator_and_dotted_path(toy_graph):
    @register_app("vertex_count")
    def vertex_count(graph):
        return graph.vertices.agg(F.count("*").alias("n"))

    assert load_app("vertex_count")(toy_graph).collect()[0]["n"] == 12
    # dotted-path loading, the .gar-outside-the-engine analogue
    app = load_app("graphscope_spark.algorithms:degree_centrality")
    assert app(toy_graph).count() == 12


def test_register_zero_arg_factory(toy_graph):
    """The documented 'zero/param factory returning a program' form:
    the registered callable takes no graph and returns the program."""
    register_app("my_sssp_factory", lambda: sssp_program(src=3))
    got = load_app("my_sssp_factory")(toy_graph)
    want = sssp(toy_graph, src=3)
    g = {(r["id"], r["value"]) for r in got.collect()
         if r["value"] != float("inf")}
    w = {(r["id"], float(r["distance"])) for r in want.collect()
         if r["distance"] != float("inf")}
    assert g == w
    # param-factory form: program built from the call's kwargs
    register_app("my_sssp_param", sssp_program)
    got2 = load_app("my_sssp_param")(toy_graph, src=3)
    assert {(r["id"], r["value"]) for r in got2.collect()
            if r["value"] != float("inf")} == w
