"""Degree-correlation & rich-club structure reports, plus the
eccentricity family — the remaining "shape of the web graph" metrics
(Pastor-Satorras & Vespignani PRL'01 degree correlations; Colizza et
al. Nature Physics'06 rich club; NX eccentricity/radius/center).

Reference parity: the reference exposes eccentricity-family results
through its NX shim's distance_measures passthrough
(python/graphscope/nx/); average_degree_connectivity and
rich_club_coefficient mirror the upstream NX functions the shim
forwards. All are defined over the symmetrized simple graph.

The 100 TB shapes:
- average_neighbor_degree: one degree join onto the edge fabric +
  one hash aggregate.
- average_degree_connectivity: the same plus one more tiny aggregate
  keyed by degree (rows = |distinct degrees|, thousands at most).
- rich_club_coefficient: two histograms (vertex degrees, per-edge
  min endpoint degree) + suffix-sum windows over those HISTOGRAM
  tables — windows over |distinct degrees| rows, never over vertices
  or edges.
- eccentricity/graph_extremes: per-source max over the same
  pair-distance fabric as all_pairs_shortest_path_length — true
  all-pairs below the landmark threshold, landmark-bounded above
  (inherits closeness.py's guard semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import _CKPT_LEVEL


def _sym_simple(graph: LinkGraph) -> DataFrame:
    """Symmetrized distinct self-loop-free rows (each undirected edge
    twice), materialized once — every function below reads it in ≥ 2
    branches (pairs + degrees), and without the checkpoint Catalyst
    re-derives the whole fabric subtree per branch (the dsir/robots
    audit finding, BENCH/PLANS.md)."""
    return (
        graph.undirected_edges()
        .where(F.col(SRC) != F.col(DST))
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )


def average_neighbor_degree(graph: LinkGraph) -> DataFrame:
    """(id, avg_nbr_deg double) — NX average_neighbor_degree over the
    undirected simple graph; vertices with no simple-graph neighbor
    carry 0.0 (the NX convention for isolates)."""
    e = _sym_simple(graph)
    deg = e.groupBy(F.col(SRC).alias(ID)).agg(F.count("*").alias("d"))
    annd = (
        e.join(deg.select(F.col(ID).alias(DST), F.col("d").alias("nd")), DST)
        .groupBy(F.col(SRC).alias(ID))
        # integer sum / integer count: order-independent, bit-exact
        .agg((F.sum("nd") / F.count("*")).alias("avg_nbr_deg"))
    )
    return (
        graph.vertices.select(ID)
        .join(annd, ID, "left")
        .select(ID, F.coalesce("avg_nbr_deg", F.lit(0.0)).alias("avg_nbr_deg"))
    )


_DEG_KINDS = ("in", "out", "in+out")


def average_degree_connectivity(
    graph: LinkGraph,
    source: str = "in+out",
    target: str = "in+out",
    weight_col: str | None = None,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(degree long, knn double) — the FULL NX
    average_degree_connectivity surface (Barrat et al. 2004 weighted
    nearest-neighbor degree): per node i, s_i = Σ_{j∈N(i)} w_ij·k_j
    with N(i) the source-kind neighborhood (out→successors,
    in→predecessors with reversed weight lookup, in+out→successors —
    NX's own quirk for DiGraphs), stratified by the source-kind degree
    and normalized by Σ weighted source degrees per stratum; strata
    whose normalizer is 0 report 0. Directed graphs accept
    source/target in {in, out, in+out}; undirected only the default
    (ValueError — the nx layer maps it to NetworkXError). `nodes`
    restricts the SOURCE nodes (NX nodes=). Expects a simple edge
    table (the NX Graph semantics target).

    Plan shape: two degree aggregates + one edges⋈target-degree join +
    one per-node aggregate + one per-stratum aggregate — all
    map-side-combinable; integer inputs divide bit-exactly."""
    if source not in _DEG_KINDS:
        raise ValueError('source must be one of "in", "out", or "in+out"')
    if target not in _DEG_KINDS:
        raise ValueError('target must be one of "in", "out", or "in+out"')
    if not graph.directed and (source != "in+out" or target != "in+out"):
        raise ValueError(
            "source and target arguments are only supported for "
            "directed graphs")
    w = (F.col(weight_col).cast("double") if weight_col else F.lit(1.0))
    e = graph.edges.select(SRC, DST, w.alias("w"))
    if not graph.directed:
        # normalize BOTH undirected storage conventions (single
        # canonical row per edge, or full symmetric closure) to one
        # weighted row per direction: symmetrize then collapse exact
        # pairs (min w — the simple-graph one-weight-per-pair view)
        e = (
            e.unionAll(
                e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w"))
            .groupBy(SRC, DST)
            .agg(F.min("w").alias("w"))
        )
    e = e.localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)

    outd = e.groupBy(F.col(SRC).alias(ID)).agg(
        F.count("*").alias("c"), F.sum("w").alias("ws"))
    ind = e.groupBy(F.col(DST).alias(ID)).agg(
        F.count("*").alias("c"), F.sum("w").alias("ws"))

    def _deg(kind: str) -> DataFrame:
        """(id, c long, ws double) for the requested degree kind.
        Undirected graphs use the symmetrized table, where out == the
        NX degree."""
        if not graph.directed or kind == "out":
            return outd
        if kind == "in":
            return ind
        both = outd.unionAll(ind)
        return both.groupBy(ID).agg(
            F.sum("c").alias("c"), F.sum("ws").alias("ws"))

    srcdeg = _deg(source).localCheckpoint(
        eager=True, storageLevel=_CKPT_LEVEL)
    tgtdeg = _deg(target)

    # source-kind neighborhood rows (u, nbr, w): NX iterates successors
    # for out and in+out, predecessors (reversed weight lookup) for in
    if graph.directed and source == "in":
        nbrs = e.select(F.col(DST).alias("u"), F.col(SRC).alias("nbr"), "w")
    else:
        nbrs = e.select(F.col(SRC).alias("u"), F.col(DST).alias("nbr"), "w")
    s_u = (
        nbrs.join(
            tgtdeg.select(F.col(ID).alias("nbr"),
                          F.col("c").cast("double").alias("t")),
            "nbr",
        )
        .groupBy("u")
        .agg(F.sum(F.col("w") * F.col("t")).alias("s"))
    )

    base = (nodes or graph.vertices).select(ID).distinct()
    per_node = (
        base.join(srcdeg, ID, "left")
        .join(s_u.withColumnRenamed("u", ID), ID, "left")
        .select(
            F.coalesce("c", F.lit(0)).cast("long").alias("k"),
            F.coalesce("s", F.lit(0.0)).alias("s"),
            (F.coalesce("ws", F.lit(0.0)) if weight_col
             else F.coalesce("c", F.lit(0)).cast("double")).alias("dn"),
        )
    )
    return per_node.groupBy(F.col("k").alias("degree")).agg(
        F.when(F.sum("dn") > 0, F.sum("s") / F.sum("dn"))
        .otherwise(F.lit(0.0))
        .alias("knn")
    )


def rich_club_coefficient(graph: LinkGraph) -> DataFrame:
    """(k long, phi double) — non-normalized rich-club coefficient
    φ(k) = 2·E_k / (N_k·(N_k−1)) for k = 0..maxdeg−1 where N_k
    vertices have degree > k and E_k edges join two of them (NX
    rich_club_coefficient(G, normalized=False)); rows with N_k < 2
    are omitted (φ undefined). Windows run over degree HISTOGRAMS
    (|distinct degrees| rows), never the vertex or edge tables."""
    e = _sym_simple(graph)
    deg = (
        e.groupBy(F.col(SRC).alias(ID))
        .agg(F.count("*").alias("d"))
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )
    # undirected edge once: src < dst rows of the symmetric fabric
    once = e.where(F.col(SRC) < F.col(DST))
    emin = (
        once.join(deg.select(F.col(ID).alias(SRC), F.col("d").alias("ds")), SRC)
        .join(deg.select(F.col(ID).alias(DST), F.col("d").alias("dt")), DST)
        .select(F.least("ds", "dt").alias("md"))
        .groupBy("md")
        .agg(F.count("*").alias("me"))
    )
    dh = deg.groupBy("d").agg(F.count("*").alias("nd"))
    maxd = deg.agg(F.max("d").alias("mx"))
    ks = maxd.select(
        F.explode(F.sequence(F.lit(0), F.col("mx") - 1)).alias("k")
    )
    wk = Window.orderBy(F.desc("d")).rowsBetween(Window.unboundedPreceding, 0)
    n_gt = dh.select(
        (F.col("d") - 1).alias("k"),  # N_k for k = d-1 is the cum count ≥ d
        F.sum("nd").over(wk).alias("n_k"),
    )
    we = Window.orderBy(F.desc("md")).rowsBetween(Window.unboundedPreceding, 0)
    e_gt = emin.select(
        (F.col("md") - 1).alias("k"),
        F.sum("me").over(we).alias("e_k"),
    )
    # as-of join: for each k, the stats at the smallest threshold ≥ k
    wfill_n = Window.orderBy("k").rowsBetween(0, Window.unboundedFollowing)
    joined = (
        ks.join(n_gt, "k", "left")
        .join(e_gt, "k", "left")
        .select(
            "k",
            F.first("n_k", ignorenulls=True).over(wfill_n).alias("n_k"),
            F.first("e_k", ignorenulls=True).over(wfill_n).alias("e_k"),
        )
    )
    return (
        joined.where(F.coalesce("n_k", F.lit(0)) >= 2)
        .select(
            F.col("k").cast("long").alias("k"),
            (
                2.0 * F.coalesce("e_k", F.lit(0))
                / (F.col("n_k") * (F.col("n_k") - 1))
            ).alias("phi"),
        )
    )


def eccentricity(graph: LinkGraph, **kw) -> DataFrame:
    """(id, eccentricity double) — max finite shortest-path length
    from each vertex over the undirected simple graph (NX
    eccentricity; computed per component, so disconnected inputs get
    within-component eccentricities instead of NX's raise). Inherits
    the landmark guard of all_pairs_shortest_path_length above the
    threshold (sources become landmarks — documented approximation)."""
    from graphscope_spark.algorithms.closeness import (
        all_pairs_shortest_path_length,
    )

    if graph.directed:
        graph = graph.to_undirected()  # NX eccentricity is undirected
    pairs = all_pairs_shortest_path_length(graph, **kw)
    return pairs.groupBy(F.col("source").alias(ID)).agg(
        F.max("distance").alias("eccentricity")
    )


def graph_extremes(graph: LinkGraph, **kw) -> DataFrame:
    """One row (radius double, diameter double, n_center long,
    n_periphery long) — NX radius/diameter/center/periphery sizes
    from the eccentricity table (largest-component semantics when
    disconnected: extremes are taken over all per-component
    eccentricities)."""
    ecc = eccentricity(graph, **kw)
    r = ecc.agg(
        F.min("eccentricity").alias("radius"),
        F.max("eccentricity").alias("diameter"),
    )
    return (
        ecc.crossJoin(F.broadcast(r))
        .agg(
            F.first("radius").alias("radius"),
            F.first("diameter").alias("diameter"),
            F.sum(
                F.when(F.col("eccentricity") == F.col("radius"), 1).otherwise(0)
            ).cast("long").alias("n_center"),
            F.sum(
                F.when(F.col("eccentricity") == F.col("diameter"), 1).otherwise(0)
            ).cast("long").alias("n_periphery"),
        )
    )


def topological_indices(graph: LinkGraph, **kw) -> DataFrame:
    """Wiener-family chemical-graph indices (upstream
    networkx/algorithms/wiener.py::wiener_index / schultz_index /
    gutman_index / hyper_wiener_index semantics) in ONE pass over the
    pair-distance fabric:

      wiener       = Σ_{u<v} d(u,v)
      hyper_wiener = ½ Σ_{ordered u≠v} (d + d²)   (= Σ_{u<v} (d + d²))
      schultz      = Σ_{u<v} (deg u + deg v)·d
      gutman       = Σ_{u<v} (deg u · deg v)·d

    1-row DataFrame(connected boolean, wiener, hyper_wiener, schultz,
    gutman — doubles, +inf when the graph is disconnected, the NX
    contract). Undirected simple-graph semantics; inherits the
    landmark guard of all_pairs_shortest_path_length (exact below the
    threshold).

    Scale plan: the fabric is the quadratic object (|V|² pair rows at
    full exactness — the same cost class as exact APSP, retired to
    landmarks/ANF sketches above the guard); everything else is one
    broadcast degree join + ONE scalar aggregate with map-side
    partial sums."""
    from graphscope_spark.algorithms.closeness import (
        all_pairs_shortest_path_length,
    )

    und = graph.to_undirected() if graph.directed else graph
    pairs = all_pairs_shortest_path_length(und, **kw).where(
        F.col("source") != F.col(ID))
    deg = (
        _sym_simple(graph)
        .groupBy(F.col(SRC).alias(ID))
        .agg(F.count("*").cast("double").alias("deg"))
    )
    ds = F.broadcast(deg.select(F.col(ID).alias("source"),
                                F.col("deg").alias("ds")))
    dd = F.broadcast(deg.select(ID, F.col("deg").alias("dd")))
    tot = (
        pairs.join(ds, "source").join(dd, ID)
        .agg(
            F.count("*").alias("cnt"),
            F.sum("distance").alias("sd"),
            F.sum(F.col("distance") + F.col("distance") * F.col("distance"))
            .alias("sdd"),
            F.sum((F.col("ds") + F.col("dd")) * F.col("distance")).alias("ssch"),
            F.sum(F.col("ds") * F.col("dd") * F.col("distance")).alias("sgut"),
        )
    )
    n = graph.vertices.select(ID).distinct().agg(F.count("*").alias("n"))
    inf = F.lit(float("inf"))
    conn = F.col("cnt") == F.col("n") * (F.col("n") - 1)
    return (
        tot.crossJoin(F.broadcast(n))
        .select(
            conn.alias("connected"),
            F.when(conn, F.col("sd") / 2.0).otherwise(inf).alias("wiener"),
            F.when(conn, F.col("sdd") / 2.0).otherwise(inf).alias("hyper_wiener"),
            F.when(conn, F.col("ssch") / 2.0).otherwise(inf).alias("schultz"),
            F.when(conn, F.col("sgut") / 2.0).otherwise(inf).alias("gutman"),
        )
    )


def global_efficiency(graph: LinkGraph, **kw) -> DataFrame:
    """Global efficiency (upstream networkx/algorithms/efficiency_measures.py):
    mean over ordered node pairs of 1/d(u,v), unreachable pairs
    contributing 0. 1-row DataFrame(efficiency double). Same fabric +
    one scalar aggregate as topological_indices."""
    from graphscope_spark.algorithms.closeness import (
        all_pairs_shortest_path_length,
    )

    und = graph.to_undirected() if graph.directed else graph
    pairs = all_pairs_shortest_path_length(und, **kw).where(
        F.col("source") != F.col(ID))
    s = pairs.agg(F.sum(F.lit(1.0) / F.col("distance")).alias("sinv"))
    n = graph.vertices.select(ID).distinct().agg(F.count("*").alias("n"))
    return s.crossJoin(F.broadcast(n)).select(
        F.when(F.col("n") > 1,
               F.coalesce(F.col("sinv"), F.lit(0.0))
               / (F.col("n") * (F.col("n") - 1)))
        .otherwise(F.lit(0.0))
        .alias("efficiency")
    )
