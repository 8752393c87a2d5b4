"""Simple-path predicate — reference parity:
apps/simple_path/is_simple_path.h (registered .gs_conf.yaml:212, NX
wrapper nx/algorithms/builtin.py:1049).

is_simple_path(G, nodes): True iff `nodes` are pairwise-distinct
vertices of G and every consecutive pair is an edge. Expressed as a
lag-window over the node list + an edge semi-join (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphscope_spark.graph import DST, ID, SRC, LinkGraph


def is_simple_path(graph: LinkGraph, nodes: list[int]) -> bool:
    if len(nodes) == 0:
        return False
    if len(set(nodes)) != len(nodes):
        return False
    spark = graph.vertices.sparkSession
    path = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(nodes)], "pos int, id long"
    )
    # every node must exist
    present = path.join(graph.vertices.select(ID), ID, "left_semi").count()
    if present != len(nodes):
        return False
    if len(nodes) == 1:
        return True
    w = Window.orderBy("pos")
    hops = (
        path.withColumn("nxt", F.lead(ID).over(w))
        .where(F.col("nxt").isNotNull())
        .select(F.col(ID).alias(SRC), F.col("nxt").alias(DST))
    )
    edges = graph.edges.select(SRC, DST)
    if not graph.directed:
        edges = edges.unionAll(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        )
    matched = hops.join(edges, [SRC, DST], "left_semi").count()
    return matched == len(nodes) - 1
