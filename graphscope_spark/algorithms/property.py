"""Label-aware (property-graph) algorithm variants — reference parity:
apps/property/property_sssp.h (PropertySSSPContext keeps a per-vertex-
label dist column, :75-100) and the property BFS/WCC family registered
in coordinator .gs_conf.yaml:69,158.

The reference's LabeledVertexPropertyContext materializes one result
column per vertex label; the DataFrame-native equivalent is a single
result table carrying the `label` discriminator column (graph.py
add_vertices), which pivots to per-label columns trivially. The
traversal itself runs over ALL edge labels at once, exactly like the
reference (PropertySSSP IncEval iterates every (v_label, e_label)
pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.algorithms.sssp import INF, bfs, sssp
from graphscope_spark.graph import ID, LinkGraph


def _labels(graph: LinkGraph) -> DataFrame:
    v = graph.vertices
    if "label" not in v.columns:
        v = v.withColumn("label", F.lit("_"))
    return v.select(ID, "label")


def property_sssp(
    graph: LinkGraph, src: int, weight_col: str | None = None, **kw
) -> DataFrame:
    """DataFrame(label string, id long, distance double); unreachable
    = +inf (property_sssp.h ctx init = limits::max). One row per
    (vertex label, vertex) — the flat form of the reference's
    per-label dist_<label> columns."""
    d = sssp(graph, src, weight_col=weight_col, **kw)
    return _labels(graph).join(d, ID).select("label", ID, "distance")


def property_bfs(graph: LinkGraph, src: int, **kw) -> DataFrame:
    """DataFrame(label string, id long, depth long); unreachable = -1
    (property BFS family, .gs_conf.yaml:158)."""
    d = bfs(graph, src, **kw)
    return _labels(graph).join(d, ID).select("label", ID, "depth")
