"""Degree centrality & degree assortativity — reference parity:
apps/centrality/degree/degree_centrality.h:25-77 (deg/(n−1), type
in/out/both per analytical/app/degree_centrality.py:29-56) and
apps/assortativity/degree/degree_assortativity_coefficient.h:36-259
(Pearson correlation of endpoint degrees over edges,
analytical/app/degree_assortativity_coefficient.py:31-85).

Pure DataFrame aggregates — no iteration, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph


def degree_centrality(graph: LinkGraph, centrality_type: str = "both") -> DataFrame:
    """DataFrame(id long, centrality double) = degree/(n−1)."""
    n = graph.num_vertices()
    denom = float(max(n - 1, 1))
    e = graph.edges
    if centrality_type == "out":
        deg = e.groupBy(F.col(SRC).alias(ID)).agg(F.count("*").alias("d"))
    elif centrality_type == "in":
        deg = e.groupBy(F.col(DST).alias(ID)).agg(F.count("*").alias("d"))
    elif centrality_type == "both":
        both = e.select(F.col(SRC).alias(ID)).unionAll(e.select(F.col(DST).alias(ID)))
        deg = both.groupBy(ID).agg(F.count("*").alias("d"))
    else:
        raise ValueError(f"centrality_type must be in/out/both, got {centrality_type}")
    return (
        graph.vertices.select(ID)
        .join(deg, ID, "left")
        .select(ID, (F.coalesce("d", F.lit(0)) / F.lit(denom)).alias("centrality"))
    )


def degree_assortativity_coefficient(
    graph: LinkGraph, x: str = "out", y: str = "in", weight: str | None = None
) -> float:
    """Pearson correlation of (x-degree(src), y-degree(dst)) over edges —
    a single corr() aggregate after two broadcast-sized degree joins.

    With ``weight``, degree means weighted degree (strength = Σ edge
    weight) while every edge still contributes once to the correlation
    (reference degree_assortativity_coefficient.h:155-196
    computeWeightedDegree + unit degreeMixingCount; same as NetworkX)."""

    def deg_of(kind: str) -> DataFrame:
        agg = (
            F.sum(F.col(weight).cast("double")) if weight is not None else F.count("*")
        ).alias("d")
        if kind == "out":
            return graph.edges.groupBy(F.col(SRC).alias(ID)).agg(agg)
        if kind == "in":
            return graph.edges.groupBy(F.col(DST).alias(ID)).agg(agg)
        cols = [SRC, DST] + ([weight] if weight is not None else [])
        both = graph.edges.select(F.col(SRC).alias(ID), *cols[2:]).unionAll(
            graph.edges.select(F.col(DST).alias(ID), *cols[2:])
        )
        return both.groupBy(ID).agg(agg)

    dx = deg_of(x).select(F.col(ID).alias(SRC), F.col("d").alias("deg_x"))
    dy = deg_of(y).select(F.col(ID).alias(DST), F.col("d").alias("deg_y"))
    row = (
        graph.edges.select(SRC, DST)
        .join(dx, SRC)
        .join(dy, DST)
        .agg(F.corr("deg_x", "deg_y").alias("r"))
        .collect()[0]
    )
    return float(row["r"]) if row["r"] is not None else float("nan")
