"""SSSP / BFS and derived path stats — reference parity:
apps/projected/sssp_projected.h:76-129 (per-fragment Dijkstra +
boundary relaxation; we use distributed Bellman-Ford relaxation —
identical fixpoint), grape::BFSAuto (.gs_conf.yaml:18),
apps/sssp/sssp_average_length.h:35, sssp_has_path.h; python wrappers
analytical/app/{sssp,bfs}.py.

Per superstep: dist' = min(dist, min_{u→v}(dist[u] + w(u,v))) — an
agg-join relax; stop when no distance improves. BFS = SSSP with unit
weights (dist = hop count = the superstep at which v was reached).
Frontier optimization: only vertices improved last round send messages
(the reference's modified-set, sssp_projected.h:118-125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner

INF = float("inf")


def sssp(
    graph: LinkGraph,
    src: int,
    weight_col: str | None = None,
    max_iter: int = 10_000,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """DataFrame(id long, distance double); unreachable = +inf
    (matches the reference context default,
    sssp_projected.h ctx init = limits::max)."""
    if weight_col is None:
        edges = graph.edges.select(SRC, DST, F.lit(1.0).alias("w"))
    else:
        edges = graph.edges.select(SRC, DST, F.col(weight_col).cast("double").alias("w"))
    if not graph.directed:
        edges = edges.unionAll(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w")
        )
    edges = edges.cache()
    edges.count()

    init = graph.vertices.select(
        ID,
        F.when(F.col(ID) == src, F.lit(0.0)).otherwise(F.lit(INF)).alias("distance"),
        F.when(F.col(ID) == src, F.lit(True)).otherwise(F.lit(False)).alias("active"),
    )

    def step(state: DataFrame, it: int) -> DataFrame:
        frontier = state.where(F.col("active")).select(
            F.col(ID).alias(SRC), F.col("distance").alias("dsrc")
        )
        relax = (
            edges.join(frontier, SRC)
            .groupBy(DST)
            .agg(F.min(F.col("dsrc") + F.col("w")).alias("cand"))
            .withColumnRenamed(DST, ID)
        )
        return state.join(relax, ID, "left").select(
            ID,
            F.least(F.col("distance"), F.coalesce("cand", F.lit(INF))).alias("distance"),
            (F.coalesce("cand", F.lit(INF)) < F.col("distance")).alias("active"),
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        improved = new.where(F.col("active")).count()
        return improved == 0, {"improved": improved}

    runner = SuperstepRunner(
        max_iter=max_iter, checkpoint_every=checkpoint_every, checkpoint_dir=checkpoint_dir
    )
    result = runner.run(init, step, until)
    edges.unpersist()
    return result.state.select(ID, "distance")


def bfs(graph: LinkGraph, src: int, max_iter: int = 10_000, **kw) -> DataFrame:
    """BFS levels: DataFrame(id long, depth long); unreachable = -1
    (matches grape::BFS output convention in app_tests golden files)."""
    d = sssp(graph, src, weight_col=None, max_iter=max_iter, **kw)
    return d.select(
        ID,
        F.when(F.col("distance") == INF, F.lit(-1))
        .otherwise(F.col("distance").cast("long"))
        .alias("depth"),
    )


def sssp_has_path(graph: LinkGraph, src: int, dst: int, **kw) -> bool:
    """apps/sssp/sssp_has_path.h — reachability."""
    d = sssp(graph, src, **kw)
    row = d.where(F.col(ID) == dst).collect()
    return bool(row) and row[0]["distance"] != INF


def sssp_average_length(graph: LinkGraph, src: int, weight_col: str | None = None, **kw) -> float:
    """apps/sssp/sssp_average_length.h — mean finite distance from src."""
    d = sssp(graph, src, weight_col=weight_col, **kw)
    row = d.where(F.col("distance") != INF).agg(F.avg("distance").alias("a")).collect()[0]
    return float(row["a"] or 0.0)
