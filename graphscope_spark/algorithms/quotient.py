"""Generic quotient (contraction) graph — collapse any vertex
partition into a super-graph.

The reference exposes this shape twice: condensation (SCC DAG,
reciprocity.py here) and the per-level community contraction inside
louvain's phase 2 (louvain.py). This is the generic user-facing
operator: given ANY (id, label) assignment — wcc components, cdlp
communities, hosts, shards — produce the graph OF the labels:

  super-vertices: one per distinct label, with member count;
  super-edges:    (label(src), label(dst)) with n_edges multiplicity
                  (and summed weight when ``weight_col`` given),
                  self-loops optionally dropped.

Plan: two co-partitioned label joins (src then dst) + one hash
aggregate — the exact shape of louvain's contraction step, linear in
|E|, no windows, no driver data. The label side joins on the vertex
id (the same key the edge table is already bucketed by after
``build()``), so at cluster scale both joins are shuffle-free
sort-merge joins against the vertex layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph


def quotient_graph(
    graph: LinkGraph,
    assign: DataFrame,
    self_loops: bool = False,
    weight_col: str | None = None,
) -> LinkGraph:
    """LinkGraph of the label partition: vertices (id=label, size),
    edges (src=label(u), dst=label(v), n_edges[, weight])."""
    cols = assign.columns
    lab = assign.select(
        F.col(cols[0]).cast("long").alias(ID),
        F.col(cols[1]).cast("long").alias("_lab"),
    )
    ecols = [SRC, DST] + ([weight_col] if weight_col else [])
    tagged = (
        graph.edges.select(*ecols)
        .join(lab.select(F.col(ID).alias(SRC), F.col("_lab").alias("_ls")), SRC)
        .join(lab.select(F.col(ID).alias(DST), F.col("_lab").alias("_ld")), DST)
    )
    if not self_loops:
        tagged = tagged.where(F.col("_ls") != F.col("_ld"))
    aggs = [F.count("*").alias("n_edges")]
    if weight_col:
        aggs.append(F.sum(weight_col).alias(weight_col))
    edges = (
        tagged.groupBy(F.col("_ls").alias(SRC), F.col("_ld").alias(DST))
        .agg(*aggs)
    )
    verts = lab.groupBy(F.col("_lab").alias(ID)).agg(
        F.count("*").alias("size")
    )
    return LinkGraph(vertices=verts, edges=edges, directed=graph.directed)
