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

Sketch: K independent Flajolet-Martin bitmasks per vertex, PACKED as
one array<long>(K) column — state is V rows (not V·K), messages are
|E| rows per round, and the ball union is K bit_or aggregate
expressions inside ONE (id) hash-aggregate with map-side partial
combine: the PageRank plan shape with `|` for `+`, carrying 8 longs
per row instead of 1 double. Mask width never grows with ball size.
Estimate per vertex: n̂(v) = 2^(mean_k R_k) / 0.77351 with R_k = index
of the lowest zero bit of mask k (FM'85 bias correction) — a pure
projection over the packed array, no per-k grouping.

Supersteps use FRONTIER (delta) propagation — exact for a monotone OR
exchange: a vertex whose mask did not change last round has nothing
new to offer its neighbors (each already absorbed it the round after
it last changed), so only changed rows enter the message join. The
per-row `chg` flag doubles as the join-free convergence signal
(sum(chg) == 0), folded into the same one-action-per-round aggregate
as the NF estimate. On a web graph most vertices saturate rounds
before the periphery, so late-round message volume tracks the
shrinking frontier, not |E|.

Engine-portable determinism (same family as the MinHash/walks
oracles): the bit draw for (k, v) is the lowest set bit of the 60-bit
integer parsed from the first 15 hex chars of md5('anf'|k|id), and R
is recovered with pure integer ops — bit_count(((mask+1) & ~mask) - 1)
— no log2/floor float hazard, so the DuckDB twin (row-form, an
independent formulation of the same sketches) replays the masks
bit-exactly.
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
    """(id, masks array<long>[num_trials]): one row per vertex, the K
    md5 bit draws folded into a single codegen projection."""
    cap = F.lit(1 << r_max).cast("long")

    def draw(k: int) -> F.Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit("anf"), F.lit(str(k)), F.col(ID).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        # lowest set bit of h = h & -h (a power of two); LEAST caps the
        # bit index at r_max; h == 0 (p = 2^-60) pins to the cap so both
        # engines agree on the degenerate draw.
        return F.when(h == 0, cap).otherwise(F.least(h.bitwiseAND(-h), cap))

    return graph.vertices.select(
        ID,
        F.array(*[draw(k) for k in range(num_trials)]).alias("masks"),
        F.lit(True).alias("chg"),
    )


def _or_merge(num_trials: int) -> F.Column:
    """masks | coalesce(nm, 0) elementwise, unrolled (K is small)."""
    return F.array(
        *[
            F.col("masks")[i].bitwiseOR(
                F.coalesce(F.col("nm")[i], F.lit(0).cast("long"))
            )
            for i in range(num_trials)
        ]
    ).alias("m2")


def _gather(edges: DataFrame, state: DataFrame, num_trials: int) -> DataFrame:
    """(id, nm): per-receiver OR of the FRONTIER's masks — only rows
    whose mask changed last round enter the message join (exact for a
    monotone OR exchange: after round t every vertex holds a superset
    of each neighbor's round-(t-1) mask, so an unchanged vertex has
    nothing new to offer). One edge join + one hash-aggregate with K
    bit_or expressions, map-side combined."""
    frontier = state.where("chg").select(F.col(ID).alias(SRC), "masks")
    msgs = edges.join(frontier, SRC).select(F.col(DST).alias(ID), "masks")
    return msgs.groupBy(ID).agg(
        F.array(
            *[F.bit_or(F.col("masks")[i]) for i in range(num_trials)]
        ).alias("nm")
    )


def _step_fn(edges: DataFrame, num_trials: int):
    """One superstep with frontier (delta) propagation; `chg` tracks
    whether this round changed the row's mask, so the convergence check
    is sum(chg) == 0 — join-free."""

    def step(state: DataFrame, it: int) -> DataFrame:
        return (
            state.join(_gather(edges, state, num_trials), ID, "left")
            .select(ID, "masks", _or_merge(num_trials))
            .select(
                ID,
                F.col("m2").alias("masks"),
                (F.col("m2") != F.col("masks")).alias("chg"),
            )
        )

    return step


def _sumr_col(num_trials: int, col: str = "masks") -> F.Column:
    """sum_k R_k: R = index of the lowest ZERO bit of each mask, via
    integer ops only — (m+1) & ~m isolates that bit as a power of two;
    bit_count of (that - 1) is its index. Exact in Spark and DuckDB."""
    def r(i: int) -> F.Column:
        m = F.col(col)[i]
        low_zero = (m + F.lit(1)).bitwiseAND(F.bitwise_not(m))
        return F.bit_count(low_zero - F.lit(1))

    total = r(0)
    for i in range(1, num_trials):
        total = total + r(i)
    return total


def _est_from_sumr(num_trials: int) -> F.Column:
    return F.pow(F.lit(2.0), F.col("sumr") / F.lit(float(num_trials))) / F.lit(_PHI)


def ball_estimates(state: DataFrame, num_trials: int) -> DataFrame:
    """(id, est): estimated |ball(v)| from the packed sketch state — a
    pure projection, no shuffle."""
    return state.select(ID, _sumr_col(num_trials).alias("sumr")).select(
        ID, _est_from_sumr(num_trials).alias("est")
    )


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
    runner = SuperstepRunner(
        max_iter=radius,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, _step_fn(edges, num_trials))
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
    per round computes the estimate, total_r, and the changed-row count
    (the frontier size — also the convergence signal)."""
    edges = _prop_edges(graph, directed).cache()
    edges.count()
    init = _init_state(graph, num_trials, r_max)

    def _snapshot(state: DataFrame) -> tuple[float, int, int]:
        row = (
            state.select(_sumr_col(num_trials).alias("sumr"), "chg")
            .select(
                F.sum(_est_from_sumr(num_trials)).alias("nf"),
                F.sum("sumr").alias("tr"),
                F.sum(F.col("chg").cast("int")).alias("chg"),
            )
            .first()
        )
        return float(row["nf"] or 0.0), int(row["tr"] or 0), int(row["chg"] or 0)

    nf0, tr0, _ = _snapshot(init)
    nfs: list[tuple[float, int]] = [(nf0, tr0)]

    def until(new: DataFrame, old: DataFrame, it: int):
        nf, tr, chg = _snapshot(new)
        nfs.append((nf, tr))
        return chg == 0, {"nf": nf, "frontier": chg}

    runner = SuperstepRunner(
        max_iter=max_radius,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    runner.run(init, _step_fn(edges, num_trials), until)
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


def hyperball_harmonic(
    graph: LinkGraph,
    max_radius: int = 32,
    num_trials: int = 8,
    r_max: int = 59,
    directed: bool = False,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """HyperBall approximate harmonic centrality (Boldi/Vigna, "In-Core
    Computation of Geometric Centralities with HyperBall", ICDMW'13):
    C_H(v) = sum_u 1/d(u,v) ~= sum_t (|B(v,t)| - |B(v,t-1)|) / t,
    accumulated from the same FM ball sketches as the neighborhood
    function. The web-scale replacement for exact harmonic_centrality
    (algorithms/betweenness.py harmonic, reference NX semantics): one
    PageRank-shaped superstep per radius instead of a per-source BFS.

    Directed graphs use INCOMING distances (masks flow src->dst, so
    B(v,t) counts vertices that can reach v) — matching the exact
    harmonic_centrality's NX convention. The accumulator rides the
    state row (pest = previous ball estimate, acc = running sum), so
    each round is still one edge join + one hash-aggregate; once the
    frontier empties every later term is 0 and the early stop is exact.

    Returns DataFrame(id long, centrality double).
    """
    if directed:
        edges = graph.edges.select(SRC, DST).distinct().cache()
    else:
        edges = graph.undirected_edges().cache()
    edges.count()

    est0 = _est_from_sumr(num_trials)
    init = (
        _init_state(graph, num_trials, r_max)
        .withColumn("sumr", _sumr_col(num_trials))
        .select(
            ID, "masks", "chg",
            est0.alias("pest"),
            F.lit(0.0).alias("acc"),
        )
    )

    def step(state: DataFrame, it: int) -> DataFrame:
        merged = state.join(_gather(edges, state, num_trials), ID, "left").select(
            ID, "masks", "pest", "acc", _or_merge(num_trials)
        )
        est_t = F.pow(
            F.lit(2.0), _sumr_col(num_trials, "m2") / F.lit(float(num_trials))
        ) / F.lit(_PHI)
        return merged.select(
            ID,
            F.col("m2").alias("masks"),
            (F.col("m2") != F.col("masks")).alias("chg"),
            est_t.alias("pest"),
            (F.col("acc") + (est_t - F.col("pest")) / F.lit(float(it + 1))).alias(
                "acc"
            ),
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        chg = int(
            new.select(F.sum(F.col("chg").cast("int")).alias("c")).first()["c"] or 0
        )
        return chg == 0, {"frontier": chg}

    runner = SuperstepRunner(
        max_iter=max_radius,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, until)
    out = result.state.select(ID, F.col("acc").alias("centrality")).localCheckpoint(
        eager=True
    )
    edges.unpersist()
    return out
