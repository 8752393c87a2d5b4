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


def _weighted_dag_levels(
    graph: LinkGraph,
    weight_col: str,
    sources: DataFrame,
    max_depth: int,
) -> tuple[list[DataFrame], DataFrame]:
    """Weighted forward sweep. Four superstep families, each one
    edges⋈frontier join per round (no per-row Python anywhere):

    1. distances — the multi-source Bellman-Ford from closeness.py
       (the Spark-native stand-in for per-source Dijkstra: all sources
       relax together, shuffle key carries the source id);
    2. shortest-path DAG — edges (s, v, w) with
       dist(s,v) + weight(v,w) == dist(s,w), one 3-way join. Float
       equality here mirrors networkx's own Dijkstra path counting
       (`vu_dist == seen[u]`), so equal-cost-path semantics match;
    3. hop levels — longest-path depth L per (s, v) via monotone
       max-propagation over the DAG (frontier = rows whose L rose).
       Every DAG edge satisfies L(dst) >= L(src)+1, never equal-level,
       so L is a valid parallel schedule for both remaining sweeps;
    4. sigma — ascending-level path counting: all DAG predecessors of
       a level-L vertex sit strictly below L and are already settled.

    Returns (levels, dag): levels[L] = DataFrame(s, id, sigma), and
    dag = cached DataFrame(s, src, dst, src_lvl, dst_lvl).
    Caller must unpersist `dag`.
    """
    from graphscope_spark.algorithms.closeness import _pair_distances

    w = F.col(weight_col).cast("double")
    e = (
        graph.edges.where(F.col(SRC) != F.col(DST))
        .select(SRC, DST, w.alias("w"))
    )
    if not graph.directed:
        e = e.unionAll(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w"))
    # parallel edges: min weight (a simple-graph view, the networkx
    # Graph semantics target has one weight per endpoint pair)
    e = e.groupBy(SRC, DST).agg(F.min("w").alias("w"))

    dist = _pair_distances(graph, weight_col, sources, reverse=False)
    fin = dist.where(F.col("distance") != INF).localCheckpoint(eager=True)

    dag = (
        e.join(
            fin.select("s", F.col(ID).alias(SRC), F.col("distance").alias("du")),
            SRC,
        )
        .join(
            fin.select("s", F.col(ID).alias(DST), F.col("distance").alias("dv")),
            ["s", DST],
        )
        .where(F.col("du") + F.col("w") == F.col("dv"))
        .select("s", SRC, DST)
        .localCheckpoint(eager=True)
    )

    # hop levels: monotone longest-path fixpoint, changed-rows frontier
    state = sources.select(
        F.col(ID).alias("s"), F.col(ID), F.lit(0).alias("lvl")
    ).localCheckpoint(eager=True)
    frontier = state
    depth = 0
    while depth < max_depth:
        cand = (
            dag.join(
                frontier.select("s", F.col(ID).alias(SRC), "lvl"), ["s", SRC]
            )
            .groupBy("s", DST)
            .agg((F.max("lvl") + F.lit(1)).alias("cand"))
            .withColumnRenamed(DST, ID)
        )
        merged = (
            state.join(cand, ["s", ID], "full")
            .select(
                "s",
                ID,
                F.greatest(
                    F.coalesce("lvl", F.lit(-1)), F.coalesce("cand", F.lit(-1))
                ).alias("lvl"),
                (
                    F.coalesce("cand", F.lit(-1))
                    > F.coalesce("lvl", F.lit(-1))
                ).alias("rose"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = merged.where("rose").select("s", ID, "lvl")
        state = merged.select("s", ID, "lvl")
        if frontier.isEmpty():
            break
        depth += 1

    dag = (
        dag.join(
            state.select("s", F.col(ID).alias(SRC), F.col("lvl").alias("src_lvl")),
            ["s", SRC],
        )
        .join(
            state.select("s", F.col(ID).alias(DST), F.col("lvl").alias("dst_lvl")),
            ["s", DST],
        )
        .cache()
    )
    dag.count()

    d_max = state.agg(F.max("lvl")).first()[0] or 0

    # sigma: ascending levels; preds of level L sit strictly below L
    sig0 = state.where("lvl = 0").select(
        "s", ID, F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    levels = [sig0]
    settled = sig0
    for lvl in range(1, d_max + 1):
        sig = (
            dag.where(F.col("dst_lvl") == lvl)
            .join(settled.select("s", F.col(ID).alias(SRC), "sigma"), ["s", SRC])
            .groupBy("s", DST)
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed(DST, ID)
            .localCheckpoint(eager=True)
        )
        levels.append(sig)
        settled = settled.unionAll(sig)
    return levels, dag


def _finish_dag(
    graph: LinkGraph,
    dag: DataFrame,
    levels: list[DataFrame],
    n: int,
    n_sources: int,
    normalized: bool,
    endpoints: bool,
    k_sampled: bool,
) -> DataFrame:
    """Backward Brandes accumulation over a weighted shortest-path
    DAG. Unlike the unweighted sweep (where every DAG successor sits
    exactly one level deeper), a weighted DAG edge can skip levels —
    so finalized multipliers m = (1+delta)/sigma accumulate in a
    running table, and level L's contribution joins the (small)
    src_lvl == L edge slice against everything already finalized
    (which is exactly the set of all possible successors)."""
    acc: DataFrame | None = None
    m_table: DataFrame | None = None
    for lvl in range(len(levels) - 1, 0, -1):
        if m_table is None:
            delta_cur = levels[lvl].withColumn("delta", F.lit(0.0))
        else:
            contrib = (
                dag.where(F.col("src_lvl") == lvl)
                .join(m_table.select("s", F.col(ID).alias(DST), "m"), ["s", DST])
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
        m_row = delta_cur.select(
            "s",
            ID,
            ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("m"),
        )
        m_table = m_row if m_table is None else m_table.unionAll(m_row)
    return _tail(
        graph, acc, levels, n, n_sources, normalized, endpoints, k_sampled
    )


def betweenness_centrality(
    graph: LinkGraph,
    k: int | None = None,
    normalized: bool = True,
    endpoints: bool = False,
    weight_col: str | None = None,
    sources: DataFrame | None = None,
    landmark_threshold: int = LANDMARK_THRESHOLD,
    auto_k: int = AUTO_LANDMARKS,
    max_depth: int = 10_000,
) -> DataFrame:
    """DataFrame(id long, centrality double), networkx
    betweenness_centrality semantics. weight_col=None counts hops
    (level-synchronous Brandes); a weight column switches to the
    weighted shortest-path DAG sweep (positive weights, networkx
    `weight=` semantics including float-equality equal-cost paths).

    k=None runs every vertex as a source when |V| <=
    landmark_threshold; above it a deterministic `auto_k`-source
    sample is drawn (with a RuntimeWarning) and rescaled by n/k —
    the estimator networkx itself ships for large graphs. An explicit
    `sources` DataFrame(id) overrides both and is rescaled the same
    way (n / |sources|) unless it covers every vertex.
    """
    n = graph.num_vertices()
    srcs, n_sources, k_sampled = _resolve_sources(
        graph, k, sources, landmark_threshold, auto_k, n)

    if weight_col is not None:
        levels, dag = _weighted_dag_levels(graph, weight_col, srcs, max_depth)
        try:
            return _finish_dag(
                graph, dag, levels, n, n_sources, normalized, endpoints,
                k_sampled,
            )
        finally:
            dag.unpersist()

    edges = _bfs_fabric(graph).cache()
    edges.count()
    levels = _forward_levels(edges, srcs, max_depth)
    return _finish(
        graph, edges, levels, n, n_sources, normalized, endpoints, k_sampled
    )


def _resolve_sources(
    graph: LinkGraph,
    k: int | None,
    sources: DataFrame | None,
    landmark_threshold: int,
    auto_k: int,
    n: int,
) -> tuple[DataFrame, int, bool]:
    """Shared source resolution for vertex/edge betweenness: explicit
    sources win; k draws the deterministic sample; k=None above the
    landmark threshold auto-samples with a RuntimeWarning. Returns
    (sources_df, n_sources, k_sampled)."""
    if sources is not None:
        srcs = sources.select(ID).distinct()
        n_sources = srcs.count()
        return srcs, n_sources, n_sources < n
    if k is None and n > landmark_threshold:
        import warnings

        warnings.warn(
            f"graph has > {landmark_threshold} vertices: exact "
            f"betweenness is |V|^2 pair state — auto-switching to the "
            f"k={auto_k} sampled-source estimator (networkx k= "
            "semantics). Pass k= explicitly to control the sample.",
            RuntimeWarning,
            stacklevel=3,
        )
        k = auto_k
    srcs = (
        _sample_sources(graph, k) if k is not None else graph.vertices
    ).select(ID)
    return srcs, (k if k is not None else n), k is not None


def _edge_acc(edges: DataFrame, levels: list[DataFrame]) -> DataFrame | None:
    """Backward sweep accumulating per-DAG-EDGE dependencies for the
    unweighted (level-adjacent) case: rows (src, dst, delta) with
    delta_e(v,w) = sigma_v * (1+delta_w)/sigma_w, summed over sources
    later. Runs down to level 0 so source-out edges accumulate too."""
    eacc: DataFrame | None = None
    delta_next: DataFrame | None = None
    for lvl in range(len(levels) - 1, -1, -1):
        if delta_next is None:
            delta_cur = levels[lvl].withColumn("delta", F.lit(0.0))
            delta_cur = delta_cur.localCheckpoint(eager=True)
        else:
            m_next = delta_next.select(
                "s",
                F.col(ID).alias(DST),
                ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("m"),
            )
            m_rows = edges.join(m_next, DST).select("s", SRC, DST, "m")
            contrib = (
                m_rows.groupBy("s", SRC)
                .agg(F.sum("m").alias("m"))
                .withColumnRenamed(SRC, ID)
            )
            delta_cur = (
                levels[lvl]
                .join(contrib, ["s", ID], "left")
                .select(
                    "s", ID, "sigma",
                    (F.col("sigma") * F.coalesce("m", F.lit(0.0))).alias(
                        "delta"),
                )
            ).localCheckpoint(eager=True)
            # the sigma join enforces DAG-ness (SRC must sit at level
            # lvl); rows into level lvl+1 from elsewhere drop out
            epart = (
                m_rows.join(
                    delta_cur.select(
                        "s", F.col(ID).alias(SRC), "sigma"), ["s", SRC]
                )
                .select(
                    SRC, DST, (F.col("sigma") * F.col("m")).alias("delta")
                )
            )
            eacc = epart if eacc is None else eacc.unionAll(epart)
        delta_next = delta_cur
    return eacc


def _edge_acc_dag(dag: DataFrame, levels: list[DataFrame]) -> DataFrame | None:
    """Weighted sibling of _edge_acc over an explicit shortest-path
    DAG (src_lvl/dst_lvl-tagged): finalized multipliers accumulate in
    a running table since weighted DAG edges can skip levels."""
    eacc: DataFrame | None = None
    m_table: DataFrame | None = None
    for lvl in range(len(levels) - 1, -1, -1):
        if m_table is None:
            delta_cur = levels[lvl].withColumn("delta", F.lit(0.0))
            delta_cur = delta_cur.localCheckpoint(eager=True)
        else:
            m_rows = (
                dag.where(F.col("src_lvl") == lvl)
                .join(m_table.select("s", F.col(ID).alias(DST), "m"),
                      ["s", DST])
                .select("s", SRC, DST, "m")
            )
            contrib = (
                m_rows.groupBy("s", SRC)
                .agg(F.sum("m").alias("m"))
                .withColumnRenamed(SRC, ID)
            )
            delta_cur = (
                levels[lvl]
                .join(contrib, ["s", ID], "left")
                .select(
                    "s", ID, "sigma",
                    (F.col("sigma") * F.coalesce("m", F.lit(0.0))).alias(
                        "delta"),
                )
            ).localCheckpoint(eager=True)
            epart = (
                m_rows.join(
                    delta_cur.select(
                        "s", F.col(ID).alias(SRC), "sigma"), ["s", SRC]
                )
                .select(
                    SRC, DST, (F.col("sigma") * F.col("m")).alias("delta")
                )
            )
            eacc = epart if eacc is None else eacc.unionAll(epart)
        m_row = delta_cur.select(
            "s", ID,
            ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("m"),
        )
        m_table = m_row if m_table is None else m_table.unionAll(m_row)
    return eacc


def edge_betweenness_centrality(
    graph: LinkGraph,
    k: int | None = None,
    normalized: bool = True,
    weight_col: str | None = None,
    sources: DataFrame | None = None,
    landmark_threshold: int = LANDMARK_THRESHOLD,
    auto_k: int = AUTO_LANDMARKS,
    max_depth: int = 10_000,
) -> DataFrame:
    """DataFrame(src long, dst long, centrality double) — networkx
    edge_betweenness_centrality semantics (unweighted or weighted).
    Same forward sweeps as the vertex version; the backward sweep
    accumulates per-DAG-edge dependencies sigma_v·(1+delta_w)/sigma_w
    instead of folding them into the vertex. Undirected edges are
    reported once, canonicalized src < dst, with both orientations'
    per-source contributions summed (the NX single-dict-entry view).
    Edges never on a shortest path report 0.0."""
    n = graph.num_vertices()
    srcs, n_sources, k_sampled = _resolve_sources(
        graph, k, sources, landmark_threshold, auto_k, n)

    if weight_col is not None:
        levels, dag = _weighted_dag_levels(graph, weight_col, srcs, max_depth)
        try:
            eacc = _edge_acc_dag(dag, levels)
        finally:
            dag.unpersist()
    else:
        edges = _bfs_fabric(graph).cache()
        edges.count()
        levels = _forward_levels(edges, srcs, max_depth)
        eacc = _edge_acc(edges, levels)
        edges.unpersist()

    # base edge set (all edges appear, 0.0 when never on a path)
    base = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    if not graph.directed:
        base = base.select(
            F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST))
    base = base.distinct()

    if eacc is None:
        return base.withColumn("centrality", F.lit(0.0))

    if not graph.directed:
        eacc = eacc.select(
            F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST),
            "delta")
    ebc = eacc.groupBy(SRC, DST).agg(F.sum("delta").alias("centrality"))

    # networkx _rescale_e
    scale: float | None
    if normalized:
        scale = 1.0 / (n * (n - 1)) if n > 1 else None
    else:
        scale = None if graph.directed else 0.5
    if scale is not None:
        if k_sampled:
            scale = scale * n / n_sources
        ebc = ebc.select(
            SRC, DST, (F.col("centrality") * F.lit(scale)).alias("centrality"))

    return base.join(ebc, [SRC, DST], "left").select(
        SRC, DST, F.coalesce("centrality", F.lit(0.0)).alias("centrality"))


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
    out = _tail(
        graph, acc, levels, n, n_sources, normalized, endpoints, k_sampled
    )
    edges.unpersist()
    return out


def _tail(
    graph: LinkGraph,
    acc: DataFrame | None,
    levels: list[DataFrame],
    n: int,
    n_sources: int,
    normalized: bool,
    endpoints: bool,
    k_sampled: bool,
) -> DataFrame:
    """Shared finish: sum per-source deltas, apply endpoints=True
    credit and networkx's _rescale, left-join onto the vertex base."""
    if acc is None:
        return graph.vertices.select(ID).withColumn("centrality", F.lit(0.0))

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

    return graph.vertices.select(ID).join(bc, ID, "left").select(
        ID, F.coalesce("centrality", F.lit(0.0)).alias("centrality")
    )


def harmonic_centrality(
    graph: LinkGraph,
    weight_col: str | None = None,
    sources: DataFrame | None = None,
    from_sources: DataFrame | None = None,
    landmark_threshold: int = LANDMARK_THRESHOLD,
    auto_landmarks: int = AUTO_LANDMARKS,
    **kw,
) -> DataFrame:
    """DataFrame(id long, centrality double), networkx
    harmonic_centrality semantics: centrality(u) = sum over v != u of
    1 / d(v -> u) (INCOMING shortest-path distances; unreachable pairs
    contribute 0 — no normalization). `sources` restricts the OUTPUT
    nodes u (NX nbunch); `from_sources` restricts the v-side the
    reciprocal distances are summed over (NX sources=) — a left-semi
    filter on the pair table, no extra relaxation.

    Reuses the multi-source reversed relaxation from closeness.py;
    above landmark_threshold vertices the same deterministic landmark
    sampling (and warning) applies — results then cover landmarks
    only.
    """
    from graphscope_spark.algorithms.closeness import _effective_sources

    sources = _effective_sources(graph, sources, auto_landmarks, landmark_threshold)
    pairs = _pair_distances(graph, weight_col, sources, reverse=True, **kw)
    if from_sources is not None:
        pairs = pairs.join(
            from_sources.select(ID).distinct(), ID, "left_semi")
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
