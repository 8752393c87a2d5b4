"""Reciprocity and SCC condensation — directed-graph structure
reports (upstream NetworkX semantics: algorithms/reciprocity.py and
algorithms/components/strongly_connected.py::condensation; the
reference's nx layer re-exports the same signatures).

reciprocity(v) = 2 * |pred(v) ∩ succ(v)| / (|pred(v)| + |succ(v)|) —
the fraction of v's incident edge slots that are reciprocated;
overall_reciprocity = |{(u,v) : (v,u) ∈ E}| / |E|.

Plans: the reciprocated-pair set is ONE self-join of the distinct edge
table with its transpose on (src,dst)=(dst,src) — co-partitioned on the
join key, no driver loop; degrees are two hash aggregates. Condensation
maps every edge endpoint through the scc() labeling (two hash joins)
and dedups inter-component pairs — the SCC DAG an incremental crawler
schedules over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.algorithms.scc import scc


def _recip_pairs(edges: DataFrame) -> DataFrame:
    """Distinct (src, dst) edges that have a reverse twin."""
    rev = edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    return edges.join(rev, [SRC, DST], "leftsemi")


def reciprocity(graph: LinkGraph, nodes: DataFrame | list | None = None) -> DataFrame:
    """(id, reciprocity) per vertex — NX per-node semantics (vertices
    with no incident edges are excluded, mirroring NX's undefined-
    reciprocity error for isolates)."""
    if not graph.directed:
        raise ValueError("reciprocity is defined on directed graphs")
    edges = graph.edges.select(SRC, DST).distinct()
    outs = edges.groupBy(F.col(SRC).alias(ID)).agg(F.count("*").alias("o"))
    ins = edges.groupBy(F.col(DST).alias(ID)).agg(F.count("*").alias("i"))
    ov = _recip_pairs(edges).groupBy(F.col(SRC).alias(ID)).agg(
        F.count("*").alias("ov")
    )
    out = (
        outs.join(ins, ID, "outer")
        .join(ov, ID, "left")
        .select(
            ID,
            (
                2.0 * F.coalesce("ov", F.lit(0))
                / (F.coalesce("o", F.lit(0)) + F.coalesce("i", F.lit(0)))
            ).alias("reciprocity"),
        )
    )
    if nodes is not None:
        if not isinstance(nodes, DataFrame):
            spark = graph.vertices.sparkSession
            nodes = spark.createDataFrame([(int(n),) for n in nodes], "id long")
        out = out.join(nodes.select(ID), ID, "leftsemi")
    return out


def overall_reciprocity(graph: LinkGraph) -> DataFrame:
    """1-row (reciprocity double): reciprocated edges / all edges."""
    if not graph.directed:
        raise ValueError("reciprocity is defined on directed graphs")
    edges = graph.edges.select(SRC, DST).distinct()
    return (
        edges.select(
            F.count("*").alias("m"),
        )
        .crossJoin(
            F.broadcast(_recip_pairs(edges).agg(F.count("*").alias("r")))
        )
        .select((F.col("r") / F.col("m")).alias("reciprocity"))
    )


def condensation_edges(graph: LinkGraph, comps: DataFrame | None = None,
                       **scc_kw) -> DataFrame:
    """(scc_src, scc_dst) — distinct inter-component edges of the SCC
    DAG, components named by their min member id (scc()'s convention;
    NX's condensation integer relabeling is DFS-order-dependent, so the
    stable min-id naming is used instead). Pass ``comps`` to reuse an
    existing scc() result."""
    if comps is None:
        comps = scc(graph, **scc_kw)
    e = graph.edges.select(SRC, DST)
    return (
        e.join(comps.select(F.col(ID).alias(SRC),
                            F.col("scc").alias("scc_src")), SRC)
        .join(comps.select(F.col(ID).alias(DST),
                           F.col("scc").alias("scc_dst")), DST)
        .where(F.col("scc_src") != F.col("scc_dst"))
        .select("scc_src", "scc_dst")
        .distinct()
    )
