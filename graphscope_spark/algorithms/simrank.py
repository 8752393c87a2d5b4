"""SimRank structural similarity (Jeh & Widom, KDD 2002; upstream
networkx/algorithms/similarity.py::simrank_similarity semantics, which
the reference's nx layer forwards).

S(u,u) = 1;  S(u,v) = C / (|I(u)||I(v)|) · Σ_{a∈I(u), b∈I(v)} S(a,b)

where I(x) are in-neighbors (all neighbors for undirected graphs) and
C the importance factor. Fixpoint via the standard iterative update,
converged when max |S_k+1 − S_k| ≤ tol·(1 + |S_k|) everywhere
(upstream's relative tolerance).

Spark plan: the pair state S(u, v, s) is the quadratic object (|V|²
rows — the same cost class as the exact APSP fabric, and guarded the
same way: `max_pairs` raises before materializing an infeasible
state). Each iteration is TWO shuffle joins of S against the in-edge
table (a→u then b→v) + ONE (u, v) hash aggregate with map-side
partial sums, then a broadcast join of the in-degree table for the
normalization — no Python, no driver loops. Real 10^12-edge use is
per-seed-pair or top-k-candidate SimRank over a restricted pair set;
the full-matrix form exists for NX parity and small-graph exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import _CKPT_LEVEL


def simrank(
    graph: LinkGraph,
    importance_factor: float = 0.9,
    max_iter: int = 100,
    tol: float | None = 1e-4,
    fixed_rounds: int | None = None,
    max_pairs: int = 2_000_000,
    deterministic_sum: bool = False,
) -> DataFrame:
    """DataFrame(u long, v long, score double) for ALL ordered vertex
    pairs. ``fixed_rounds`` runs exactly that many updates with no
    convergence actions (the oracle-friendly form, like the
    fixed-round pagerank); otherwise iterate to the upstream relative
    tolerance and raise RuntimeError at max_iter (the NX wrapper maps
    it to ExceededMaxIterations)."""
    verts = graph.vertices.select(ID).distinct()
    n = verts.count()
    if n * n > max_pairs:
        raise ValueError(
            f"simrank pair state is |V|^2 = {n * n} rows > max_pairs="
            f"{max_pairs}; restrict the graph (induce_subgraph) or "
            "raise max_pairs explicitly — full-matrix SimRank is "
            "quadratic by definition")
    # in-edges (dedup, self-loops dropped); undirected storage is the
    # symmetric closure, which makes I(x) the neighbor set — upstream
    # G.adj semantics
    if graph.directed:
        ine = graph.edges.select(SRC, DST).where(
            F.col(SRC) != F.col(DST)).distinct()
    else:
        ine = graph.undirected_edges().where(F.col(SRC) != F.col(DST))
    ine = ine.localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    indeg = ine.groupBy(F.col(DST).alias(ID)).agg(F.count("*").alias("ind"))

    diag = verts.select(F.col(ID).alias("u"), F.col(ID).alias("v"),
                        F.lit(1.0).alias("s"))
    state = diag.localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)

    c = float(importance_factor)
    du = F.broadcast(indeg.select(F.col(ID).alias("u"), F.col("ind").alias("iu")))
    dv = F.broadcast(indeg.select(F.col(ID).alias("v"), F.col("ind").alias("iv")))
    ea = ine.select(F.col(SRC).alias("a"), F.col(DST).alias("nu"))
    eb = ine.select(F.col(SRC).alias("b"), F.col(DST).alias("nv"))
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for it in range(rounds):
        # Σ_{a∈I(u), b∈I(v)} S(a,b): expand pair scores along both
        # in-edge roles, fold with ONE (u,v) aggregate
        expanded = (
            state.where(F.col("s") != 0.0)
            .join(ea, state["u"] == ea["a"])
            .join(eb, state["v"] == eb["b"])
            .groupBy(F.col("nu").alias("u"), F.col("nv").alias("v"))
        )
        if deterministic_sum:
            # ascending-value fold — bit-identical across engines and
            # partitionings (the oracle-twin discipline); costs a
            # per-group array, so it is opt-in for small fixed-round
            # runs only
            summed = expanded.agg(
                F.aggregate(
                    F.sort_array(F.collect_list("s")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("tot"))
        else:
            summed = expanded.agg(F.sum("s").alias("tot"))
        new = (
            verts.select(F.col(ID).alias("u"))
            .crossJoin(verts.select(F.col(ID).alias("v")))
            .join(summed, ["u", "v"], "left")
            .join(du, "u", "left")
            .join(dv, "v", "left")
            .select(
                "u", "v",
                F.when(F.col("u") == F.col("v"), F.lit(1.0))
                .otherwise(
                    F.lit(c) * F.coalesce("tot", F.lit(0.0))
                    / (F.coalesce("iu", F.lit(1)) * F.coalesce("iv", F.lit(1))))
                .alias("s"),
            )
            .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        )
        if fixed_rounds is None and tol is not None:
            worst = (
                # LEFT join: the round-0 state is diagonal-sparse
                # (absent pair = 0), later states are the full matrix
                new.join(state.withColumnRenamed("s", "old"), ["u", "v"],
                         "left")
                .select((F.abs(F.col("s") - F.coalesce("old", F.lit(0.0)))
                         - tol * (1.0 + F.abs(F.coalesce("old", F.lit(0.0)))))
                        .alias("x"))
                .agg(F.max("x").alias("m")).collect()[0]["m"]
            )
            state = new
            if worst is not None and worst <= 0:
                return state
        else:
            state = new
    if fixed_rounds is None:
        raise RuntimeError(
            f"simrank did not converge after {rounds} iterations.")
    return state
