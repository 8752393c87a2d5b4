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
