"""k-core / k-shell — reference parity: apps/kcore/kcore.h:27-129
(iterative peel :79-90) and apps/kshell/kshell.h; python wrappers
analytical/app/k_core.py:29-55, k_shell.py:29-56.

k-core: maximal subgraph in which every vertex has (undirected simple)
degree ≥ k. Spark plan: peel loop — compute degrees, drop vertices
below k, semi-join edges, repeat until no vertex is dropped. Each round
is one groupBy + two semi-joins; rounds bounded by peel depth (small on
web graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import _CKPT_LEVEL


def k_core(graph: LinkGraph, k: int, max_iter: int = 1000) -> DataFrame:
    """Vertices of the k-core: DataFrame(id long)."""
    edges = graph.simple_edges().localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    for _ in range(max_iter):
        deg = (
            edges.select(F.col(SRC).alias(ID))
            .unionAll(edges.select(F.col(DST).alias(ID)))
            .groupBy(ID)
            .agg(F.count("*").alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select(ID)
        new_edges = (
            edges.join(keep.withColumnRenamed(ID, SRC), SRC, "left_semi")
            .join(keep.withColumnRenamed(ID, DST), DST, "left_semi")
            .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        )
        before, after = edges.count(), new_edges.count()
        edges = new_edges
        if after == before:
            break
    return (
        edges.select(F.col(SRC).alias(ID))
        .unionAll(edges.select(F.col(DST).alias(ID)))
        .distinct()
    )


def k_shell(graph: LinkGraph, k: int) -> DataFrame:
    """Vertices in the k-shell = k-core minus (k+1)-core (kshell.h)."""
    core_k = k_core(graph, k)
    core_k1 = k_core(graph, k + 1)
    return core_k.join(core_k1, ID, "left_anti")
