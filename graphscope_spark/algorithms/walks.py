"""Path sampling (random walks) — reference parity: the `sampling_path`
app (coordinator/gscoordinator/builtin/app/.gs_conf.yaml sampling_path
entry; used by the learning engine's walk-based samplers).

The reference samples uniformly at random, which is irreproducible
across runs and engines. Here the "random" choice is a DETERMINISTIC
hash draw: at step t, walk w moving from vertex u picks

    argmin_{(u,v) ∈ E} md5(seed | w | t | v)

i.e. a fixed pseudo-random priority per (walk, step, candidate). This
keeps the walk distribution uniform-ish over neighbors (md5 is a
uniform hash) while making every path a pure function of
(graph, seed) — reproducible across restarts, cluster sizes, and
engines (the DuckDB oracle replays the identical draws; md5 for
engine portability, same trick as the MinHash family in dedup.py).

Scale: one superstep per hop = join frontier→E on the vertex key +
min_by per walk (map-side partial agg). Walk state is O(#walks) rows;
E never replicates per walk beyond the frontier join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph


def sampling_path(
    graph: LinkGraph,
    srcs: list[int] | DataFrame,
    path_len: int,
    seed: int = 42,
) -> DataFrame:
    """One walk per source vertex; returns (walk long, pos int,
    id long) rows — pos 0 is the source, walks stop early at
    out-degree-0 vertices (the reference's dead-end behavior).

    path_len = number of HOPS attempted (so ≤ path_len+1 rows/walk).
    """
    spark = graph.vertices.sparkSession
    if isinstance(srcs, DataFrame):
        start = srcs.select(F.col(ID).cast("long"))
    else:
        start = spark.createDataFrame([(int(s),) for s in srcs], f"{ID} long")
    start = start.join(graph.vertices.select(ID), ID, "left_semi")

    edges = graph.edges.select(SRC, DST)
    if not graph.directed:
        edges = edges.unionAll(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        )

    # walk id = source vertex id (one walk per source — matches the
    # reference's per-source sampling; for k walks/vertex call with a
    # salted seed per repetition)
    out = start.select(
        F.col(ID).alias("walk"), F.lit(0).alias("pos"), F.col(ID)
    )
    frontier = out
    for t in range(1, int(path_len) + 1):
        draw = F.md5(
            F.concat_ws("|", F.lit(int(seed)), F.col("walk"), F.lit(t), F.col(DST))
        )
        nxt = (
            frontier.join(edges, frontier[ID] == edges[SRC])
            .groupBy("walk")
            .agg(F.min_by(DST, draw).alias(ID))
            .select("walk", F.lit(t).alias("pos"), ID)
        )
        out = out.unionByName(nxt)
        frontier = nxt
    return out
