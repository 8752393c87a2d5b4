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


def _fabric(graph: LinkGraph, weight_col: str | None) -> DataFrame:
    """Weighted message fabric (src, dst, w), symmetrized when the
    graph is undirected — shared by sssp/bfs/path variants."""
    if weight_col is None:
        edges = graph.edges.select(SRC, DST, F.lit(1.0).alias("w"))
    else:
        edges = graph.edges.select(SRC, DST, F.col(weight_col).cast("double").alias("w"))
    if not graph.directed:
        edges = edges.unionAll(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w")
        )
    return edges


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
    edges = _fabric(graph, weight_col).cache()
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


def sssp_path(
    graph: LinkGraph, src: int, weight_col: str | None = None, **kw
) -> DataFrame:
    """Shortest-path tree — apps/sssp/sssp_path.h:32-176: one row
    (pred, id, distance) per REACHED vertex ≠ src (the reference emits
    [predecessor, node] pairs, sssp_path.h:130-138; we add the
    distance column its docstring describes).

    The reference's predecessor is relaxation-order-dependent (its own
    tests ignore the column for exactly that reason,
    app_tests.sh:320-325); here ties are pinned DETERMINISTICALLY to
    the min-id optimal predecessor: pred(v) = min{u : dist(u) + w(u,v)
    = dist(v)}. One post-fixpoint join instead of carrying a pred
    column through every superstep — the tree falls out of the final
    distances for free (no extra per-round shuffle)."""
    edges = _fabric(graph, weight_col).cache()
    d = sssp(graph, src, weight_col=weight_col, **kw)
    ds = d.select(F.col(ID).alias(SRC), F.col("distance").alias("d_src"))
    dd = d.where((F.col("distance") != INF) & (F.col(ID) != src)).select(
        F.col(ID).alias(DST), F.col("distance").alias("d_dst")
    )
    out = (
        edges.join(ds, SRC)
        .join(dd, DST)
        .where(F.abs(F.col("d_src") + F.col("w") - F.col("d_dst")) <= 1e-12)
        .groupBy(DST)
        .agg(F.min(SRC).alias("pred"), F.first("d_dst").alias("distance"))
        .select("pred", F.col(DST).alias(ID), "distance")
    )
    edges.unpersist()
    return out


def bfs_generic(
    graph: LinkGraph,
    src: int,
    depth_limit: int | None = None,
    output_format: str = "edges",
    **kw,
) -> DataFrame:
    """BFS with predecessor tracking — apps/bfs/bfs_generic.h:30-199
    (NX wrappers nx/algorithms/builtin.py:500-693). Vertices within
    `depth_limit` hops are visited; the BFS tree edge set is emitted in
    the requested format (bfs_generic.h writeToCtx :131-168):

    - 'edges':        (src, dst) tree edges, parent first
    - 'predecessors': (id, predecessor) per visited vertex ≠ src
    - 'successors':   (id, successor) per tree edge, parent in `id`
    - 'tree':         (id, depth, pred) full visited state (pred of
                      the source = itself, bfs_generic.h:59)

    The reference's predecessor is first-visitor-nondeterministic;
    pinned here to the min-id parent at depth(v)−1."""
    limit = depth_limit if depth_limit is not None else 10_000
    d = sssp(graph, src, weight_col=None, max_iter=limit, **kw)
    depth = d.where(F.col("distance") != INF).select(
        ID, F.col("distance").cast("long").alias("depth")
    )
    edges = _fabric(graph, None)
    du = depth.select(F.col(ID).alias(SRC), F.col("depth").alias("d_src"))
    dv = depth.where(F.col(ID) != src).select(
        F.col(ID).alias(DST), F.col("depth").alias("d_dst")
    )
    tree = (
        edges.join(du, SRC)
        .join(dv, DST)
        .where(F.col("d_src") + 1 == F.col("d_dst"))
        .groupBy(DST)
        .agg(F.min(SRC).alias("pred"))
    )
    if output_format == "edges":
        return tree.select(F.col("pred").alias(SRC), F.col(DST))
    if output_format == "predecessors":
        return tree.select(F.col(DST).alias(ID), F.col("pred").alias("predecessor"))
    if output_format == "successors":
        return tree.select(F.col("pred").alias(ID), F.col(DST).alias("successor"))
    if output_format == "tree":
        return (
            depth.join(tree.withColumnRenamed(DST, ID), ID, "left")
            .select(
                ID,
                "depth",
                F.coalesce("pred", F.lit(src)).alias("pred"),
            )
        )
    raise ValueError(f"unknown output_format: {output_format}")
