"""Closeness centrality & all-pairs shortest path length — reference
parity: apps/centrality/closeness/closeness_centrality.h:34-143
(per-vertex reversed Dijkstra + WF-improved normalization
:121-139) and apps/apsp/all_pairs_shortest_path_length.h:36-144
(per-vertex forward Dijkstra, lengths matrix).

The reference runs one sequential Dijkstra per vertex inside each
fragment (closeness_centrality.h:78-117). The Spark-native equivalent
is a **multi-source Bellman-Ford over a pair-state table
(s, id, dist)** — every superstep relaxes all sources at once through
one edges⋈frontier join + groupBy(s, dst).agg(min), so the shuffle key
carries the source id and the work distributes across the cluster
instead of across threads of one node.

Scale note: the dense pair state is |sources|·V rows. All-pairs
(V² state) is only ever run BELOW `landmark_threshold` vertices;
above it the default AUTO-SAMPLES `auto_landmarks` deterministic
landmark sources (min-xxhash64 order — restart- and cluster-size-
stable), so the scale-killer path is unreachable by default. Passing
an explicit `sources` DataFrame overrides both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner

INF = float("inf")

# Above this vertex count the all-pairs default switches to landmarks.
LANDMARK_THRESHOLD = 4096
AUTO_LANDMARKS = 64


def _effective_sources(
    graph: LinkGraph,
    sources: DataFrame | None,
    auto_landmarks: int,
    landmark_threshold: int,
) -> DataFrame | None:
    """Explicit sources win; otherwise all-pairs below the threshold,
    else `auto_landmarks` deterministic min-xxhash64 landmarks."""
    if sources is not None:
        return sources
    if graph.num_vertices() <= landmark_threshold:
        return None
    import warnings

    warnings.warn(
        f"graph has > {landmark_threshold} vertices: closeness/APSP "
        f"auto-switches to {auto_landmarks} sampled landmark sources — "
        "results cover landmarks only and are approximations of the "
        "all-pairs values. Pass `sources=` explicitly (or all vertex "
        "ids) to override.",
        RuntimeWarning,
        stacklevel=3,
    )
    return (
        graph.vertices.select(ID)
        .orderBy(F.xxhash64(ID), F.asc(ID))
        .limit(auto_landmarks)
    )


def _pair_distances(
    graph: LinkGraph,
    weight_col: str | None = None,
    sources: DataFrame | None = None,
    reverse: bool = False,
    max_iter: int = 10_000,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source shortest-path lengths: DataFrame(s, id, distance)
    with distance = +inf for unreachable pairs.

    reverse=True relaxes along reversed edges (distance *to* s) — the
    reference's reversedDijkstraLength (closeness_centrality.h:78).
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = graph.edges.select(SRC, DST, w.alias("w"))
    if not graph.directed:
        e = e.unionAll(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w"))
    elif reverse:
        e = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w")
    e = e.cache()
    e.count()

    verts = graph.vertices.select(ID)
    srcs = (sources or verts).select(F.col(ID).alias("s")).distinct()

    init = srcs.crossJoin(verts).select(
        "s",
        ID,
        F.when(F.col("s") == F.col(ID), F.lit(0.0)).otherwise(F.lit(INF)).alias(
            "distance"
        ),
        (F.col("s") == F.col(ID)).alias("active"),
    )

    def step(state: DataFrame, it: int) -> DataFrame:
        frontier = state.where(F.col("active")).select(
            "s", F.col(ID).alias(SRC), F.col("distance").alias("dsrc")
        )
        relax = (
            e.join(frontier, SRC)
            .groupBy("s", DST)
            .agg(F.min(F.col("dsrc") + F.col("w")).alias("cand"))
            .withColumnRenamed(DST, ID)
        )
        return state.join(relax, ["s", ID], "left").select(
            "s",
            ID,
            F.least(F.col("distance"), F.coalesce("cand", F.lit(INF))).alias(
                "distance"
            ),
            (F.coalesce("cand", F.lit(INF)) < F.col("distance")).alias("active"),
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        improved = new.where(F.col("active")).count()
        return improved == 0, {"improved": improved}

    runner = SuperstepRunner(
        max_iter=max_iter,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, until)
    e.unpersist()
    return result.state.select("s", ID, "distance")


def closeness_centrality(
    graph: LinkGraph,
    weight_col: str | None = None,
    wf_improve: bool = True,
    sources: DataFrame | None = None,
    auto_landmarks: int = AUTO_LANDMARKS,
    landmark_threshold: int = LANDMARK_THRESHOLD,
    **kw,
) -> DataFrame:
    """DataFrame(id long, centrality double) — for every vertex when
    |V| ≤ landmark_threshold, else for the (sampled or explicit)
    landmark sources only.

    centrality(u) = (reachable(u)−1) / Σ dist(v→u), WF-improved scales
    by (reachable(u)−1)/(n−1) — closeness_centrality.h:121-139 exactly
    (reachable counts u itself; unreachable u ⇒ 0).
    """
    n = graph.num_vertices()
    sources = _effective_sources(graph, sources, auto_landmarks, landmark_threshold)
    pairs = _pair_distances(graph, weight_col, sources, reverse=True, **kw)
    stats = (
        pairs.where(F.col("distance") != INF)
        .groupBy("s")
        .agg(F.sum("distance").alias("tot"), F.count("*").alias("cnt"))
    )
    wf = ((F.col("cnt") - 1.0) / (n - 1.0)) if (wf_improve and n > 1) else F.lit(1.0)
    cent = stats.select(
        F.col("s").alias(ID),
        F.when(
            (F.col("tot") > 0) & F.lit(n > 1),
            (F.col("cnt") - 1.0) / F.col("tot") * wf,
        )
        .otherwise(F.lit(0.0))
        .alias("centrality"),
    )
    base = (sources or graph.vertices).select(ID).distinct()
    return base.join(cent, ID, "left").select(
        ID, F.coalesce("centrality", F.lit(0.0)).alias("centrality")
    )


def all_pairs_shortest_path_length(
    graph: LinkGraph,
    weight_col: str | None = None,
    sources: DataFrame | None = None,
    auto_landmarks: int = AUTO_LANDMARKS,
    landmark_threshold: int = LANDMARK_THRESHOLD,
    **kw,
) -> DataFrame:
    """DataFrame(source long, id long, distance double), finite pairs
    only (all_pairs_shortest_path_length.h emits per-source length
    maps; unreachable pairs are absent from the result selector).
    True all-pairs only below landmark_threshold; landmark-bounded
    above (see module docstring)."""
    sources = _effective_sources(graph, sources, auto_landmarks, landmark_threshold)
    pairs = _pair_distances(graph, weight_col, sources, reverse=False, **kw)
    return pairs.where(F.col("distance") != INF).select(
        F.col("s").alias("source"), ID, "distance"
    )
