"""Local clustering coefficient, graph average, transitivity —
reference parity: apps/clustering/clustering.h:28-228,
avg_clustering.h:28-243, transitivity.h (undirected semantics: the NX
wrappers nx/algorithms/builtin.py:725-834 expose the undirected
definitions; directed-aware refinements are a v1 item).

clustering(v)   = 2·tri(v) / (deg(v)·(deg(v)−1))   over the simple graph
avg_clustering  = mean_v clustering(v)  (vertices with deg<2 count as 0)
transitivity    = 3·triangles / open+closed triads
                = Σ 2·tri(v) / Σ deg(v)·(deg(v)−1)

All derived from the triangles + degree tables — one pass of the
oriented-intersection plan plus a broadcast-sized degree join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.algorithms.triangles import triangles
from graphscope_spark.graph import ID, LinkGraph


def _tri_deg(graph: LinkGraph, mode: str = "array") -> DataFrame:
    tri = triangles(graph, mode=mode)
    deg = graph.degrees()
    return tri.join(deg, ID)


def clustering(graph: LinkGraph, mode: str = "array") -> DataFrame:
    """DataFrame(id long, clustering double)."""
    td = _tri_deg(graph, mode)
    return td.select(
        ID,
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("tricnt") / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def avg_clustering(graph: LinkGraph, mode: str = "array") -> float:
    row = clustering(graph, mode).agg(F.avg("clustering").alias("a")).collect()[0]
    return float(row["a"] or 0.0)


def transitivity(graph: LinkGraph, mode: str = "array") -> float:
    td = _tri_deg(graph, mode)
    row = td.agg(
        F.sum(2.0 * F.col("tricnt")).alias("closed"),
        F.sum(F.col("degree") * (F.col("degree") - 1)).alias("triads"),
    ).collect()[0]
    triads = float(row["triads"] or 0.0)
    return float(row["closed"] or 0.0) / triads if triads else 0.0


# ----------------------------------------------------------------------
# Round-4 additions: the full NX clustering family (weighted Onnela,
# directed/directed-weighted Fagiolo, square clustering, generalized
# degree) — networkx's own test_cluster module runs against these via
# tests/test_nx_upstream.py.
# ----------------------------------------------------------------------

from graphscope_spark.graph import DST, SRC  # noqa: E402


def _canon_weighted(graph: LinkGraph, weight_col: str | None) -> DataFrame:
    """One canonical (src < dst) row per undirected simple edge with a
    weight column (missing weight_col → 1.0; parallel rows → min, the
    simple-graph one-weight-per-pair view; both storage conventions —
    single canonical row or symmetric closure — normalize the same)."""
    w = (F.col(weight_col).cast("double") if weight_col else F.lit(1.0))
    e = graph.edges.where(F.col(SRC) != F.col(DST)).select(
        F.least(SRC, DST).alias(SRC),
        F.greatest(SRC, DST).alias(DST),
        w.alias("w"),
    )
    return e.groupBy(SRC, DST).agg(F.min("w").alias("w"))


def _triangle_rows(edges_w: DataFrame) -> DataFrame:
    """Enumerate undirected triangles from canonical weighted edges:
    rows (a, b, c, wab, wbc, wac) with a < b < c — the standard sorted
    3-join (e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c)), each join on the vertex
    key. One row per triangle, weights riding along."""
    e1 = edges_w.select(
        F.col(SRC).alias("a"), F.col(DST).alias("b"), F.col("w").alias("wab"))
    e2 = edges_w.select(
        F.col(SRC).alias("b"), F.col(DST).alias("c"), F.col("w").alias("wbc"))
    e3 = edges_w.select(
        F.col(SRC).alias("a"), F.col(DST).alias("c"), F.col("w").alias("wac"))
    return e1.join(e2, "b").join(e3, ["a", "c"])


def _per_vertex_tri_sum(tri: DataFrame, value: F.Column) -> DataFrame:
    """Explode each triangle row to its 3 corners, summing `value`:
    (id, tsum double)."""
    t = tri.select(
        F.explode(F.array("a", "b", "c")).alias(ID), value.alias("tval"))
    return t.groupBy(ID).agg(F.sum("tval").alias("tsum"))


def clustering_weighted(
    graph: LinkGraph, weight_col: str | None = None
) -> DataFrame:
    """DataFrame(id, clustering double) — NX clustering(G, weight=)
    (Onnela et al. 2005): c_u = 2/(d(d−1)) Σ_{triangles at u}
    (ŵ_uv·ŵ_vw·ŵ_wu)^{1/3}, ŵ = w / max edge weight (global scalar,
    broadcast). Full triangle enumeration (one sorted 3-join) + a
    3-corner explode-sum."""
    ew = _canon_weighted(graph, weight_col).localCheckpoint(eager=True)
    row = ew.agg(F.max("w").alias("mx")).first()
    mx = float(row["mx"]) if row["mx"] is not None else 1.0
    mx = mx if mx != 0 else 1.0
    tri = _triangle_rows(ew)
    val = F.cbrt(F.col("wab") / mx * (F.col("wbc") / mx)
                 * (F.col("wac") / mx))
    sums = _per_vertex_tri_sum(tri, val)
    deg = graph.degrees()
    return deg.join(sums, ID, "left").select(
        ID,
        F.when(
            (F.col("degree") >= 2) & F.col("tsum").isNotNull(),
            2.0 * F.col("tsum") / (F.col("degree") * (F.col("degree") - 1)),
        ).otherwise(F.lit(0.0)).alias("clustering"),
    )


def clustering_directed(
    graph: LinkGraph, weight_col: str | None = None
) -> DataFrame:
    """DataFrame(id, clustering double) — NX clustering on a DiGraph
    (Fagiolo 2007): c_i = T_i / (2·(d_tot(d_tot−1) − 2·d_bidir)),
    where T_i = (S³)_ii with S = Ŵ^{1/3} + (Ŵᵀ)^{1/3} (unweighted:
    S = A + Aᵀ). Since S is symmetric, (S³)_ii = 2·Σ over undirected
    support triangles at i of s_ij·s_jk·s_ki — so ONE undirected
    triangle enumeration over the support graph with per-pair s
    weights replaces the 8-orientation case analysis."""
    w = (F.col(weight_col).cast("double") if weight_col else F.lit(1.0))
    e = graph.edges.where(F.col(SRC) != F.col(DST)).select(
        SRC, DST, w.alias("w"))
    e = e.groupBy(SRC, DST).agg(F.min("w").alias("w"))
    e = e.localCheckpoint(eager=True)
    if weight_col:
        row = e.agg(F.max("w").alias("mx")).first()
        mx = float(row["mx"]) if row["mx"] is not None else 1.0
        mx = mx if mx != 0 else 1.0
    else:
        mx = 1.0
    # s_{uv} = cbrt(ŵ_uv) + cbrt(ŵ_vu), canonical u < v
    s = (
        e.select(
            F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST),
            F.when(F.col(SRC) < F.col(DST), F.cbrt(F.col("w") / mx))
            .otherwise(F.lit(0.0)).alias("fwd"),
            F.when(F.col(SRC) > F.col(DST), F.cbrt(F.col("w") / mx))
            .otherwise(F.lit(0.0)).alias("rev"),
        )
        .groupBy(SRC, DST)
        .agg((F.sum("fwd") + F.sum("rev")).alias("w"))
    )
    tri = _triangle_rows(s)
    sums = _per_vertex_tri_sum(
        tri, F.col("wab") * F.col("wbc") * F.col("wac"))
    # d_tot = in+out simple degree; d_bidir = reciprocated neighbors
    dout = e.groupBy(F.col(SRC).alias(ID)).agg(F.count("*").alias("o"))
    din = e.groupBy(F.col(DST).alias(ID)).agg(F.count("*").alias("i"))
    rec = (
        e.alias("x")
        .join(
            e.alias("y"),
            (F.col("x.src") == F.col("y.dst"))
            & (F.col("x.dst") == F.col("y.src")),
        )
        .groupBy(F.col("x.src").alias(ID))
        .agg(F.count("*").alias("b"))
    )
    base = (
        graph.vertices.select(ID)
        .join(dout, ID, "left").join(din, ID, "left").join(rec, ID, "left")
        .select(
            ID,
            (F.coalesce("o", F.lit(0)) + F.coalesce("i", F.lit(0))).alias("dt"),
            F.coalesce("b", F.lit(0)).alias("db"),
        )
    )
    return base.join(sums, ID, "left").select(
        ID,
        F.when(
            F.col("tsum").isNotNull()
            & ((F.col("dt") * (F.col("dt") - 1) - 2 * F.col("db")) > 0),
            # T_i = 2*tsum; c = T_i / (2*(dt(dt-1)-2db)) = tsum/(...)
            F.col("tsum")
            / (F.col("dt") * (F.col("dt") - 1) - 2 * F.col("db")),
        ).otherwise(F.lit(0.0)).alias("clustering"),
    )


def square_clustering(graph: LinkGraph) -> DataFrame:
    """DataFrame(id, clustering double) — NX square_clustering
    (Lind et al. 2005 C4 coefficient): per center v and neighbor pair
    {u, w}, squares = |N(u)∩N(w)∖{v}|; C4(v) = Σ squares / Σ
    [squares + (k_u − degm) + (k_w − degm)] with degm = squares + 1 +
    a_uw. The pair table IS the wedge table (u−v−w), so common-
    neighbor counts come from the same wedge enumeration grouped by
    endpoints — Σ deg² rows, the measure's intrinsic cost."""
    e = graph.simple_edges().localCheckpoint(eager=True)
    sym = e.unionAll(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    # wedges: center x, endpoints u < w
    wedges = (
        sym.alias("l")
        .join(sym.alias("r"),
              (F.col("l.src") == F.col("r.src"))
              & (F.col("l.dst") < F.col("r.dst")))
        .select(
            F.col("l.src").alias("v"),
            F.col("l.dst").alias("u"),
            F.col("r.dst").alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    # common-neighbor counts per endpoint pair
    cn = wedges.groupBy("u", "w").agg(F.count("*").alias("cn"))
    deg = graph.degrees()
    adj = e.select(
        F.col(SRC).alias("u"), F.col(DST).alias("w"), F.lit(1).alias("auw"))
    per_pair = (
        wedges.join(cn, ["u", "w"])
        .join(adj, ["u", "w"], "left")
        .join(deg.select(F.col(ID).alias("u"), F.col("degree").alias("ku")),
              "u")
        .join(deg.select(F.col(ID).alias("w"), F.col("degree").alias("kw")),
              "w")
        .select(
            "v",
            (F.col("cn") - 1).alias("sq"),
            (F.col("cn") - 1 + 1 + F.coalesce("auw", F.lit(0))).alias("degm"),
            "ku", "kw",
        )
    )
    stats = per_pair.groupBy(F.col("v").alias(ID)).agg(
        F.sum("sq").alias("squares"),
        F.sum(
            F.col("sq") + (F.col("ku") - F.col("degm"))
            + (F.col("kw") - F.col("degm"))
        ).alias("potential"),
    )
    return graph.vertices.select(ID).join(stats, ID, "left").select(
        ID,
        F.when(F.col("potential") > 0,
               F.col("squares") / F.col("potential"))
        .otherwise(F.lit(0.0)).alias("clustering"),
    )


def generalized_degree(graph: LinkGraph) -> DataFrame:
    """DataFrame(id, t long, cnt long) — NX generalized_degree
    (Saramäki et al.): for each vertex, how many incident simple-graph
    edges participate in exactly t triangles. Triangle enumeration →
    per-edge triangle counts → per-(vertex, t) histogram; 0-triangle
    edges enter via a left join."""
    ew = _canon_weighted(graph, None).localCheckpoint(eager=True)
    tri = _triangle_rows(ew)
    edge_tri = (
        tri.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias(SRC), F.col("b").alias(DST)),
                    F.struct(F.col("b").alias(SRC), F.col("c").alias(DST)),
                    F.struct(F.col("a").alias(SRC), F.col("c").alias(DST)),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .groupBy(SRC, DST)
        .agg(F.count("*").alias("t"))
    )
    et = ew.join(edge_tri, [SRC, DST], "left").select(
        SRC, DST, F.coalesce("t", F.lit(0)).alias("t"))
    both = et.select(F.col(SRC).alias(ID), "t").unionAll(
        et.select(F.col(DST).alias(ID), "t"))
    return both.groupBy(ID, "t").agg(F.count("*").cast("long").alias("cnt"))
