"""Betweenness and harmonic centrality — reference parity: the
reference's NX layer forwards networkx's own betweenness/harmonic test
suites (python/graphscope/nx/tests/algorithms/forward/centrality/
test_betweenness_centrality.py:1-7, test_harmonic_centrality.py:1-6),
so the semantics target is exactly networkx's
betweenness_centrality / harmonic_centrality.

Spark-native shape (NOT a port of Brandes' sequential algorithm —
the textbook algorithm runs one source at a time with a stack; here
ALL sources advance together, one superstep per BFS level):

* forward sweep — level-synchronous multi-source BFS over pair state
  (s, id): level L+1's vertices are the frontier-join's targets not
  yet settled, and sigma (shortest-path counts) is the map-side-
  combinable SUM of predecessor sigmas, because every shortest-path
  predecessor of a level-(L+1) vertex sits exactly at level L.
* backward sweep — Brandes' dependency accumulation, one superstep
  per level from the deepest up: delta(v) = sigma_v * SUM over DAG
  successors w of (1 + delta_w)/sigma_w. The DAG-edge condition
  (dist_w == dist_v + 1) is enforced structurally by joining level
  L's frontier against level L+1's deltas through the edge table —
  no per-row distance comparison needed.

Each frontier/delta level is localCheckpoint'ed so lineage stays O(1)
per superstep; total supersteps = 2 * eccentricity bound.

Scale: pair state is |sources| * V. Exact (all-sources) betweenness
is quadratic state and is only the default below `landmark_threshold`
vertices; above it the NX-sanctioned `k`-sample estimator kicks in
(deterministic min-xxhash64 draw, rescaled by n/k exactly as
networkx's _rescale does) with the same RuntimeWarning convention as
closeness.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.algorithms.closeness import (
    AUTO_LANDMARKS,
    INF,
    LANDMARK_THRESHOLD,
    _pair_distances,
)


def _sample_sources(graph: LinkGraph, k: int) -> DataFrame:
    """Deterministic min-xxhash64 draw of k source vertices —
    restart- and cluster-size-stable (same convention as
    closeness._effective_sources)."""
    return (
        graph.vertices.select(ID)
        .orderBy(F.xxhash64(ID), F.asc(ID))
        .limit(k)
    )


def _bfs_fabric(graph: LinkGraph) -> DataFrame:
    """Distinct directed arcs for path counting: parallel edges must
    collapse (a multi-edge does not multiply shortest paths in the
    networkx semantics target); undirected graphs symmetrize."""
    e = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    if not graph.directed:
        e = e.unionAll(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    return e.distinct()


def _forward_levels(
    edges: DataFrame, sources: DataFrame, max_depth: int
) -> list[DataFrame]:
    """Level-synchronous multi-source BFS with path counting.

    Returns one DataFrame(s, id, sigma) per BFS level (level index =
    list position); every returned frame is localCheckpoint'ed (eager)
    so the backward sweep can re-scan them without lineage growth.
    """
    f0 = sources.select(
        F.col(ID).alias("s"), F.col(ID), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    levels = [f0]
    settled = f0.select("s", ID)
    depth = 0
    while depth < max_depth:
        frontier = levels[-1]
        cand = (
            edges.join(
                frontier.select("s", F.col(ID).alias(SRC), "sigma"), SRC
            )
            .groupBy("s", DST)
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed(DST, ID)
        )
        new = cand.join(settled, ["s", ID], "left_anti").localCheckpoint(
            eager=True
        )
        if new.isEmpty():
            break
        levels.append(new)
        settled = settled.unionAll(new.select("s", ID))
        depth += 1
    return levels


def betweenness_centrality(
    graph: LinkGraph,
    k: int | None = None,
    normalized: bool = True,
    endpoints: bool = False,
    sources: DataFrame | None = None,
    landmark_threshold: int = LANDMARK_THRESHOLD,
    auto_k: int = AUTO_LANDMARKS,
    max_depth: int = 10_000,
) -> DataFrame:
    """DataFrame(id long, centrality double), networkx
    betweenness_centrality semantics (unweighted shortest paths).

    k=None runs every vertex as a source when |V| <=
    landmark_threshold; above it a deterministic `auto_k`-source
    sample is drawn (with a RuntimeWarning) and rescaled by n/k —
    the estimator networkx itself ships for large graphs. An explicit
    `sources` DataFrame(id) overrides both and is rescaled the same
    way (n / |sources|) unless it covers every vertex.
    """
    n = graph.num_vertices()
    if sources is not None:
        n_sources = sources.select(ID).distinct().count()
        edges = _bfs_fabric(graph).cache()
        edges.count()
        levels = _forward_levels(
            edges, sources.select(ID).distinct(), max_depth
        )
        return _finish(
            graph, edges, levels, n, n_sources,
            normalized, endpoints, k_sampled=(n_sources < n),
        )
    if k is None and n > landmark_threshold:
        import warnings

        warnings.warn(
            f"graph has > {landmark_threshold} vertices: exact "
            f"betweenness is |V|^2 pair state — auto-switching to the "
            f"k={auto_k} sampled-source estimator (networkx k= "
            "semantics). Pass k= explicitly to control the sample.",
            RuntimeWarning,
            stacklevel=2,
        )
        k = auto_k
    sources = _sample_sources(graph, k) if k is not None else graph.vertices
    n_sources = k if k is not None else n

    edges = _bfs_fabric(graph).cache()
    edges.count()
    levels = _forward_levels(edges, sources, max_depth)
    return _finish(
        graph, edges, levels, n, n_sources, normalized, endpoints,
        k_sampled=(k is not None),
    )


def _finish(
    graph: LinkGraph,
    edges: DataFrame,
    levels: list[DataFrame],
    n: int,
    n_sources: int,
    normalized: bool,
    endpoints: bool,
    k_sampled: bool,
) -> DataFrame:
    # Backward dependency accumulation, deepest level first.
    # delta tables carry (s, id, sigma, delta); level len(levels)-1
    # starts at delta=0 (no successors).
    acc: DataFrame | None = None
    delta_next: DataFrame | None = None
    for lvl in range(len(levels) - 1, 0, -1):
        if delta_next is None:
            delta_cur = levels[lvl].withColumn("delta", F.lit(0.0))
        else:
            contrib = (
                edges.join(
                    delta_next.select(
                        "s",
                        F.col(ID).alias(DST),
                        ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias(
                            "m"
                        ),
                    ),
                    DST,
                )
                .groupBy("s", SRC)
                .agg(F.sum("m").alias("m"))
                .withColumnRenamed(SRC, ID)
            )
            delta_cur = (
                levels[lvl]
                .join(contrib, ["s", ID], "left")
                .select(
                    "s",
                    ID,
                    "sigma",
                    (F.col("sigma") * F.coalesce("m", F.lit(0.0))).alias(
                        "delta"
                    ),
                )
            )
        delta_cur = delta_cur.localCheckpoint(eager=True)
        part = delta_cur.select("s", ID, "delta")
        acc = part if acc is None else acc.unionAll(part)
        delta_next = delta_cur
    # level 0 (v == s) contributes delta to PREDECESSOR levels only
    # and is itself excluded from the centrality sum (Brandes: w != s);
    # but its delta must still flow upward — there is nothing above
    # level 0, so nothing to do. endpoints=True adds, per source s,
    # (reachable(s) - 1) to s itself and +1 to every reached vertex.
    if acc is None:
        base = graph.vertices.select(ID)
        bc = base.withColumn("centrality", F.lit(0.0))
        edges.unpersist()
        return bc

    bc = acc.groupBy(ID).agg(F.sum("delta").alias("centrality"))
    if endpoints:
        reached = None
        for lvl in range(1, len(levels)):
            part = levels[lvl].select("s", ID)
            reached = part if reached is None else reached.unionAll(part)
        # +1 to every non-source endpoint per (s, t) pair it appears
        # in as t; + (reachable(s)-1) to s itself
        t_side = reached.groupBy(ID).agg(
            F.count("*").cast("double").alias("cnt")
        )
        s_side = reached.groupBy("s").agg(
            F.count("*").cast("double").alias("cnt")
        ).withColumnRenamed("s", ID)
        extra = t_side.unionAll(s_side).groupBy(ID).agg(
            F.sum("cnt").alias("extra")
        )
        bc = (
            bc.join(extra, ID, "outer")
            .select(
                ID,
                (
                    F.coalesce("centrality", F.lit(0.0))
                    + F.coalesce("extra", F.lit(0.0))
                ).alias("centrality"),
            )
        )

    # networkx _rescale
    scale: float | None
    if normalized:
        if endpoints:
            scale = 1.0 / (n * (n - 1)) if n >= 2 else None
        elif n > 2:
            scale = 1.0 / ((n - 1) * (n - 2))
        else:
            scale = None
    else:
        scale = None if graph.directed else 0.5
    if scale is not None:
        if k_sampled:
            scale = scale * n / n_sources
        bc = bc.select(ID, (F.col("centrality") * F.lit(scale)).alias("centrality"))

    out = graph.vertices.select(ID).join(bc, ID, "left").select(
        ID, F.coalesce("centrality", F.lit(0.0)).alias("centrality")
    )
    edges.unpersist()
    return out


def harmonic_centrality(
    graph: LinkGraph,
    weight_col: str | None = None,
    sources: DataFrame | None = None,
    landmark_threshold: int = LANDMARK_THRESHOLD,
    auto_landmarks: int = AUTO_LANDMARKS,
    **kw,
) -> DataFrame:
    """DataFrame(id long, centrality double), networkx
    harmonic_centrality semantics: centrality(u) = sum over v != u of
    1 / d(v -> u) (INCOMING shortest-path distances; unreachable pairs
    contribute 0 — no normalization).

    Reuses the multi-source reversed relaxation from closeness.py;
    above landmark_threshold vertices the same deterministic landmark
    sampling (and warning) applies — results then cover landmarks
    only.
    """
    from graphscope_spark.algorithms.closeness import _effective_sources

    sources = _effective_sources(graph, sources, auto_landmarks, landmark_threshold)
    pairs = _pair_distances(graph, weight_col, sources, reverse=True, **kw)
    cent = (
        pairs.where((F.col("distance") != INF) & (F.col("distance") > 0))
        .groupBy("s")
        .agg(F.sum(F.lit(1.0) / F.col("distance")).alias("centrality"))
        .withColumnRenamed("s", ID)
    )
    base = (sources or graph.vertices).select(ID).distinct()
    return base.join(cent, ID, "left").select(
        ID, F.coalesce("centrality", F.lit(0.0)).alias("centrality")
    )
