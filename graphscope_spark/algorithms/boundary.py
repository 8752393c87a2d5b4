"""Node / edge boundary — reference parity:
apps/boundary/node_boundary.h:30-114, edge_boundary.h:30-119
(NX wrappers nx/algorithms/builtin.py:954-1047).

node_boundary(G, S, T=None): vertices NOT in S with at least one
in-neighbor in S (restricted to T if given).
edge_boundary(G, S, T=None): edges from S to outside-S (or to T).

Pure semi/anti-joins — no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph


def node_boundary(
    graph: LinkGraph, s: DataFrame, t: DataFrame | None = None
) -> DataFrame:
    """s, t: DataFrames with column `id`. Returns DataFrame(id)."""
    s_ids = s.select(ID).distinct()
    out = (
        graph.edges.join(s_ids.withColumnRenamed(ID, SRC), SRC, "left_semi")
        .select(F.col(DST).alias(ID))
        .distinct()
        .join(s_ids, ID, "left_anti")
    )
    if t is not None:
        out = out.join(t.select(ID).distinct(), ID, "left_semi")
    return out


def edge_boundary(
    graph: LinkGraph, s: DataFrame, t: DataFrame | None = None
) -> DataFrame:
    """Returns DataFrame(src, dst) of boundary edges."""
    s_ids = s.select(ID).distinct()
    e = graph.edges.select(SRC, DST).join(
        s_ids.withColumnRenamed(ID, SRC), SRC, "left_semi"
    )
    if t is not None:
        e = e.join(t.select(ID).distinct().withColumnRenamed(ID, DST), DST, "left_semi")
    else:
        e = e.join(s_ids.withColumnRenamed(ID, DST), DST, "left_anti")
    return e
