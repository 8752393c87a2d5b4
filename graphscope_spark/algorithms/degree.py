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


def _degrees(graph: LinkGraph, mode: str) -> DataFrame:
    """(id, degree long) — every vertex present, isolated-in-mode
    vertices carry 0."""
    if mode == "in":
        ends = graph.edges.select(F.col(DST).alias(ID))
    elif mode == "out":
        ends = graph.edges.select(F.col(SRC).alias(ID))
    elif mode == "both":
        ends = graph.edges.select(F.col(SRC).alias(ID)).unionAll(
            graph.edges.select(F.col(DST).alias(ID))
        )
    else:
        raise ValueError(f"mode must be in/out/both, got {mode!r}")
    d = ends.groupBy(ID).agg(F.count("*").alias("degree"))
    return (
        graph.vertices.select(ID)
        .join(d, ID, "left")
        .select(ID, F.coalesce("degree", F.lit(0)).cast("long").alias("degree"))
    )


def degree_histogram(graph: LinkGraph, mode: str = "in") -> DataFrame:
    """(degree long, cnt long) — the degree distribution, the first
    report run on any crawled link graph (Broder WWW'00 fig. 2/3).
    Two hash aggregates, no window, no collect — the histogram is
    |distinct degrees| rows regardless of graph size."""
    return (
        _degrees(graph, mode)
        .groupBy("degree")
        .agg(F.count("*").alias("cnt"))
    )


def powerlaw_alpha(
    graph: LinkGraph, d_min: int = 2, mode: str = "in"
) -> DataFrame:
    """One row (alpha double, n_tail long, d_min long) — the
    Clauset–Shalizi–Newman discrete-data MLE for the power-law
    exponent of the ``mode``-degree tail:

        α̂ = 1 + n_tail / Σ_{d_i ≥ d_min} ln(d_i / (d_min − 0.5))

    (SIAM Rev. 51(4) 2009 eq. 3.7 — the continuous approximation
    recommended there for discrete degrees). Web link graphs are the
    canonical subject (in-degree α ≈ 2.1, Broder WWW'00 §3). One
    aggregate over the degree table; α is 6-dp rounded, NULL when the
    tail is empty or d_min ≤ 1."""
    if d_min <= 1:
        raise ValueError("d_min must be ≥ 2 (ln(d/(d_min-0.5)) > 0)")
    tail = _degrees(graph, mode).where(F.col("degree") >= int(d_min))
    return tail.agg(
        F.round(
            1.0
            + F.count("*")
            / F.sum(F.log(F.col("degree") / (d_min - 0.5))),
            6,
        ).alias("alpha"),
        F.count("*").alias("n_tail"),
        F.lit(int(d_min)).cast("long").alias("d_min"),
    )
