"""Local clustering coefficient, graph average, transitivity —
reference parity: apps/clustering/clustering.h:28-228,
avg_clustering.h:28-243, transitivity.h (undirected semantics: the NX
wrappers nx/algorithms/builtin.py:725-834 expose the undirected
definitions; directed-aware refinements are a v1 item).

clustering(v)   = 2·tri(v) / (deg(v)·(deg(v)−1))   over the simple graph
avg_clustering  = mean_v clustering(v)  (vertices with deg<2 count as 0)
transitivity    = 3·triangles / open+closed triads
                = Σ 2·tri(v) / Σ deg(v)·(deg(v)−1)

All derived from the triangles + degree tables — one pass of the
oriented-intersection plan plus a broadcast-sized degree join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.algorithms.triangles import triangles
from graphscope_spark.graph import ID, LinkGraph


def _tri_deg(graph: LinkGraph, mode: str = "array") -> DataFrame:
    tri = triangles(graph, mode=mode)
    deg = graph.degrees()
    return tri.join(deg, ID)


def clustering(graph: LinkGraph, mode: str = "array") -> DataFrame:
    """DataFrame(id long, clustering double)."""
    td = _tri_deg(graph, mode)
    return td.select(
        ID,
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("tricnt") / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def avg_clustering(graph: LinkGraph, mode: str = "array") -> float:
    row = clustering(graph, mode).agg(F.avg("clustering").alias("a")).collect()[0]
    return float(row["a"] or 0.0)


def transitivity(graph: LinkGraph, mode: str = "array") -> float:
    td = _tri_deg(graph, mode)
    row = td.agg(
        F.sum(2.0 * F.col("tricnt")).alias("closed"),
        F.sum(F.col("degree") * (F.col("degree") - 1)).alias("triads"),
    ).collect()[0]
    triads = float(row["triads"] or 0.0)
    return float(row["closed"] or 0.0) / triads if triads else 0.0
