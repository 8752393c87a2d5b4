"""Approximate Neighborhood Function (ANF) — sketch-based distance
statistics for graphs where exact APSP is impossible.

The reference ships exact all-pairs/closeness only
(apps/apsp/all_pairs_shortest_path_length.h:25-100,
apps/centrality/closeness/closeness_centrality.h:28-94), which is
O(V·(V+E)) and dies at web scale. ANF (Palmer/Gibbons/Faloutsos,
"ANF: A Fast and Scalable Tool for Data Mining in Massive Graphs",
KDD'02; HyperANF of Boldi/Rosa/Vigna, WWW'11, is the same superstep
with HyperLogLog registers) estimates the neighborhood function
NF(t) = |{(u,v) : d(u,v) <= t}| in O(effective-diameter) supersteps
over fixed-width per-vertex sketches, giving effective diameter and
average distance of a 10^12-page link graph for the cost of a few
PageRank rounds.

Sketch: K independent Flajolet-Martin bitmasks per vertex, each one
BIGINT. Ball union is bitwise OR — associative + commutative, so each
superstep is ONE edge join + ONE (id, k) bit_or hash-aggregate with
map-side partial combine: exactly the PageRank plan shape with `|`
instead of `+`, and the mask width never grows (message volume is
K·|E| longs per round at any scale). Estimate per vertex:
n̂(v) = 2^(mean_k R_k) / 0.77351 with R_k = index of the lowest zero
bit of mask k (FM'85 bias correction).

Engine-portable determinism (same family as the MinHash/walks
oracles): the bit draw for (k, v) is the lowest set bit of the 60-bit
integer parsed from the first 15 hex chars of md5('anf'|k|id), and R
is recovered with pure integer ops — bit_count(((mask+1) & ~mask) - 1)
— no log2/floor float hazard, so the DuckDB twin replays the
identical sketches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner

# Flajolet-Martin correction: E[R] ~ log2(phi * n), phi = 0.77351.
_PHI = 0.77351


def _prop_edges(graph: LinkGraph, directed: bool) -> DataFrame:
    """Message fabric. Undirected: symmetric closure (balls = undirected
    distance). Directed: out-reachability — mask(v) |= mask(w) for every
    edge v→w, i.e. masks flow AGAINST edge direction, so we flip (src,
    dst) and keep the one push-src-to-dst step shape."""
    if directed:
        return graph.edges.select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST)
        ).distinct()
    return graph.undirected_edges()


def _init_state(graph: LinkGraph, num_trials: int, r_max: int) -> DataFrame:
    spark = graph.vertices.sparkSession
    trials = spark.range(num_trials).select(F.col("id").cast("int").alias("k"))
    st = graph.vertices.select(ID).crossJoin(F.broadcast(trials))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit("anf"),
                    F.col("k").cast("string"),
                    F.col(ID).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    cap = F.lit(1 << r_max).cast("long")
    # lowest set bit of h = h & -h (a power of two); LEAST caps the bit
    # index at r_max; h == 0 (p = 2^-60) pins to the cap so both engines
    # agree on the degenerate draw.
    mask = F.when(h == 0, cap).otherwise(F.least(h.bitwiseAND(-h), cap))
    return st.select(ID, "k", mask.alias("mask"))


def _r_col() -> F.Column:
    """R = index of the lowest ZERO bit of mask, via integer ops only:
    (mask+1) & ~mask isolates that bit as a power of two; bit_count of
    (that - 1) is its index. Exact in Spark and DuckDB alike."""
    low_zero = (F.col("mask") + F.lit(1)).bitwiseAND(F.bitwise_not(F.col("mask")))
    return F.bit_count(low_zero - F.lit(1))


def _est_col(num_trials: int) -> F.Column:
    return F.pow(F.lit(2.0), F.col("sumr") / F.lit(float(num_trials))) / F.lit(_PHI)


def ball_estimates(state: DataFrame, num_trials: int) -> DataFrame:
    """(id, est): estimated |ball(v)| from the (id, k, mask) sketch
    state — one hash-aggregate, no shuffle beyond the id grouping."""
    per = (
        state.select(ID, _r_col().alias("r"))
        .groupBy(ID)
        .agg(F.sum("r").alias("sumr"))
    )
    return per.select(ID, _est_col(num_trials).alias("est"))


def anf_balls(
    graph: LinkGraph,
    radius: int,
    num_trials: int = 8,
    r_max: int = 59,
    directed: bool = False,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Per-vertex ball-size estimates |{u : d(v,u) <= radius}| after a
    FIXED number of supersteps. Returns DataFrame(id long, est double)."""
    edges = _prop_edges(graph, directed).cache()
    edges.count()
    init = _init_state(graph, num_trials, r_max)

    def step(state: DataFrame, it: int) -> DataFrame:
        msgs = edges.join(
            state.select(F.col(ID).alias(SRC), "k", "mask"), SRC
        ).select(F.col(DST).alias(ID), "k", "mask")
        ors = msgs.groupBy(ID, "k").agg(F.bit_or("mask").alias("nm"))
        return state.join(ors, [ID, "k"], "left").select(
            ID,
            "k",
            F.col("mask").bitwiseOR(F.coalesce("nm", F.lit(0))).alias("mask"),
        )

    runner = SuperstepRunner(
        max_iter=radius,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step)
    out = ball_estimates(result.state, num_trials).localCheckpoint(eager=True)
    edges.unpersist()
    return out


def _nf_curve(
    graph: LinkGraph,
    max_radius: int,
    num_trials: int = 8,
    r_max: int = 59,
    directed: bool = False,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> list[tuple[float, int]]:
    """(NF(t), total_r(t)) for t = 0..max_radius (padded with the
    saturated value once every mask is stable — extra rounds are
    bitwise no-ops, so padding is exact, and we skip running them).
    total_r = sum over vertices of sum_k R_k: an integer-exact twin of
    the float estimate (the oracle's hash currency). ONE driver action
    per round computes the estimate, total_r, and changed-mask count."""
    edges = _prop_edges(graph, directed).cache()
    edges.count()
    init = _init_state(graph, num_trials, r_max)

    def _snapshot(per: DataFrame) -> tuple[float, int]:
        row = per.select(
            F.sum(_est_col(num_trials)).alias("nf"), F.sum("sumr").alias("tr")
        ).first()
        return float(row["nf"] or 0.0), int(row["tr"] or 0)

    per0 = (
        init.select(ID, _r_col().alias("r")).groupBy(ID).agg(F.sum("r").alias("sumr"))
    )
    nfs: list[tuple[float, int]] = [_snapshot(per0)]

    def step(state: DataFrame, it: int) -> DataFrame:
        msgs = edges.join(
            state.select(F.col(ID).alias(SRC), "k", "mask"), SRC
        ).select(F.col(DST).alias(ID), "k", "mask")
        ors = msgs.groupBy(ID, "k").agg(F.bit_or("mask").alias("nm"))
        return state.join(ors, [ID, "k"], "left").select(
            ID,
            "k",
            F.col("mask").bitwiseOR(F.coalesce("nm", F.lit(0))).alias("mask"),
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        j = new.join(old.select(ID, "k", F.col("mask").alias("pm")), [ID, "k"])
        per = j.groupBy(ID).agg(
            F.sum(_r_col()).alias("sumr"),
            F.sum((F.col("mask") != F.col("pm")).cast("int")).alias("chg"),
        )
        row = per.select(
            F.sum(_est_col(num_trials)).alias("nf"),
            F.sum("sumr").alias("tr"),
            F.sum("chg").alias("chg"),
        ).first()
        nfs.append((float(row["nf"] or 0.0), int(row["tr"] or 0)))
        changed = int(row["chg"] or 0)
        return changed == 0, {"nf": nfs[-1][0], "changed": changed}

    runner = SuperstepRunner(
        max_iter=max_radius,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    runner.run(init, step, until)
    edges.unpersist()
    while len(nfs) < max_radius + 1:
        nfs.append(nfs[-1])
    return nfs


def neighborhood_function(
    graph: LinkGraph,
    max_radius: int,
    num_trials: int = 8,
    r_max: int = 59,
    directed: bool = False,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """DataFrame(radius long, total_r long, nf double): estimated number
    of vertex pairs within distance t, for t = 0..max_radius (monotone
    non-decreasing; NF(0) = FM estimate of V). total_r is the
    integer-exact sketch statistic the estimate derives from."""
    curve = _nf_curve(
        graph, max_radius, num_trials, r_max, directed,
        checkpoint_every, checkpoint_dir,
    )
    spark = graph.vertices.sparkSession
    return spark.createDataFrame(
        [(t, tr, nf) for t, (nf, tr) in enumerate(curve)],
        "radius LONG, total_r LONG, nf DOUBLE",
    )


def _interp_quantile(curve: list[float], q: float) -> float:
    """Smallest (linearly interpolated) t with NF(t) >= q * NF(last) —
    the standard HyperANF effective-diameter definition."""
    if not curve or curve[-1] <= 0:
        return 0.0
    tgt = q * curve[-1]
    for t, v in enumerate(curve):
        if v >= tgt:
            if t == 0:
                return 0.0
            prev = curve[t - 1]
            if v == prev:
                return float(t)
            return (t - 1) + (tgt - prev) / (v - prev)
    return float(len(curve) - 1)


def _avg_distance(curve: list[float]) -> float:
    """Mean distance over reachable pairs with d >= 1:
    sum_t t * (NF(t) - NF(t-1)) / (NF(last) - NF(0))."""
    if len(curve) < 2:
        return 0.0
    denom = curve[-1] - curve[0]
    if denom <= 0:
        return 0.0
    num = sum(t * (curve[t] - curve[t - 1]) for t in range(1, len(curve)))
    return num / denom


def effective_diameter(
    graph: LinkGraph,
    q: float = 0.9,
    max_radius: int = 64,
    num_trials: int = 8,
    r_max: int = 59,
    directed: bool = False,
) -> float:
    curve = [nf for nf, _ in _nf_curve(graph, max_radius, num_trials, r_max, directed)]
    return _interp_quantile(curve, q)


def average_distance(
    graph: LinkGraph,
    max_radius: int = 64,
    num_trials: int = 8,
    r_max: int = 59,
    directed: bool = False,
) -> float:
    curve = [nf for nf, _ in _nf_curve(graph, max_radius, num_trials, r_max, directed)]
    return _avg_distance(curve)


def distance_stats(
    graph: LinkGraph,
    q: float = 0.9,
    max_radius: int = 64,
    num_trials: int = 8,
    r_max: int = 59,
    directed: bool = False,
) -> DataFrame:
    """One-row DataFrame(eff_diam double, avg_dist double) sharing a
    single sketch run (one NF curve, both statistics)."""
    curve = [nf for nf, _ in _nf_curve(graph, max_radius, num_trials, r_max, directed)]
    spark = graph.vertices.sparkSession
    return spark.createDataFrame(
        [(_interp_quantile(curve, q), _avg_distance(curve))],
        "eff_diam DOUBLE, avg_dist DOUBLE",
    )
