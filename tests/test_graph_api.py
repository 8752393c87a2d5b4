"""Graph-API surface not covered elsewhere: add_column (join algorithm
results back as vertex properties, reference framework/graph.py:573-596)
and graph_to_dataframe/numpy (Arrow toPandas)."""

from __future__ import annotations

import numpy as np

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import pagerank


def test_add_column_full_and_partial(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")  # 3 isolated
    g = LinkGraph.from_edges(e, vertices=v)

    # full result: every vertex gets the property
    pr = pagerank(g, fixed_rounds=2)
    g2 = g.add_column(pr)
    rows = {r["id"]: r["rank"] for r in g2.vertices.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert all(val is not None for val in rows.values())

    # partial result: missing ids get NULL (left-join semantics)
    part = spark.createDataFrame([(0, 7.0), (2, 9.0)], "id long, score double")
    g3 = g.add_column(part)
    rows = {r["id"]: r["score"] for r in g3.vertices.collect()}
    assert rows == {0: 7.0, 2: 9.0, 1: None, 3: None}

    # original graph untouched (immutability contract)
    assert g.vertices.columns == ["id"]


def test_graph_to_dataframe_numpy(spark):
    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    g = LinkGraph.from_edges(e)
    pdf = g.add_column(pagerank(g, fixed_rounds=1)).vertices.toPandas()
    assert sorted(pdf.columns) == ["id", "rank"]
    arr = pdf.sort_values("id")["rank"].to_numpy()
    assert arr.shape == (2,) and np.allclose(arr.sum(), 1.0)


def test_to_undirected_preserves_properties(spark):
    from graphscope_spark.graph import LinkGraph
    from pyspark.sql import functions as F
    e = spark.createDataFrame(
        [(1, 2, 5.0, "a"), (3, 1, 2.0, "b"), (2, 1, 7.0, "c")],
        "src long, dst long, w double, label string")
    g = LinkGraph.from_edges(e.select("src", "dst")).cache()
    lg = LinkGraph(
        vertices=g.vertices, edges=e, directed=True).to_undirected()
    assert set(lg.edges.columns) == {"src", "dst", "w", "label"}
    rows = {(r["src"], r["dst"]): (r["w"], r["label"])
            for r in lg.edges.collect()}
    # both directions present; conflicting values merge to the min
    assert rows[(1, 2)] == (5.0, "a")
    assert rows[(2, 1)] == (5.0, "a")  # min(7.0 reverse-of-(1,2)=5.0...)
    assert rows[(3, 1)] == (2.0, "b") and rows[(1, 3)] == (2.0, "b")


def test_save_load_roundtrips_directed_flag(spark, tmp_path):
    from graphscope_spark.graph import LinkGraph
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    g = LinkGraph.from_edges(e, directed=False)
    p = str(tmp_path / "lgu")
    g.save(p)
    h = LinkGraph.load(spark, p)
    assert h.directed is False
    # explicit override still wins
    assert LinkGraph.load(spark, p, directed=True).directed is True
