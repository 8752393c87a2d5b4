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


def diameter_double_sweep(graph: LinkGraph, start: int | None = None):
    """Double-sweep diameter lower bound (Magnien, Latapy & Habib,
    JEA 2009 — the standard exact-BFS probe run on web graphs before
    committing to iFUB/ANF): BFS from ``start`` (default: minimum
    vertex id — deterministic), hop to the farthest vertex (min-id
    tiebreak), BFS again; the second eccentricity lower-bounds the
    true diameter and is exact on trees.

    One row: (start, ecc_start, far, diameter_lb) — over the
    symmetrized graph, unreachable vertices ignored. Cost: exactly
    two BFS runs (each one frontier shuffle per level) plus two
    1-row TakeOrdered reads; no pair-state blowup, unlike APSP.
    """
    from graphscope_spark.algorithms.sssp import bfs

    spark = graph.vertices.sparkSession
    if graph.directed:
        graph = graph.to_undirected()  # the bound is an undirected notion
    if start is None:
        start = graph.vertices.agg(F.min(ID)).collect()[0][0]
    d1 = bfs(graph, int(start)).where(F.col("depth") >= 0)
    r1 = (
        d1.orderBy(F.desc("depth"), F.asc(ID)).limit(1).collect()[0]
    )
    far, ecc1 = int(r1[ID]), int(r1["depth"])
    d2 = bfs(graph, far).where(F.col("depth") >= 0)
    lb = d2.agg(F.max("depth")).collect()[0][0]
    return spark.createDataFrame(
        [(int(start), ecc1, far, int(lb))],
        "start long, ecc_start long, far long, diameter_lb long",
    )
