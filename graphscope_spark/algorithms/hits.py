"""HITS hubs & authorities — reference parity: apps/hits/hits.h:31-204
(+ hits_context.h:42 hub init = 1/N), python wrapper
analytical/app/hits.py:29-61.

Per round (hits.h IncEval stages):
  auth[v] = Σ_{u→v} hub_last[u]         (AuthIteration)
  hub[u]  = Σ_{u→v} auth[v]             (HubIteration)
  hub /= max(hub);  auth /= max(auth)   (Normalize, :128-151)
  stop when Σ|hub − hub_last| ≤ tol or step ≥ max_round (:160-163)
  if normalized: final hub /= Σhub, auth /= Σauth (:168-196)

Spark plan: two agg-joins per round + ONE driver round-trip per round
— the global Max/Sum communicator calls (:135-151) are piggybacked on
the convergence aggregate: the state carries RAW (unnormalized) sums
and the scalar maxes travel driver-side in `carry`, applied lazily in
the NEXT round (rank normalization is a scalar divide, so deferring it
one round is algebraically identity). A cluster superstep then pays a
single barrier, not two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def hits(
    graph: LinkGraph,
    tolerance: float = 0.01,
    max_round: int = 100,
    normalized: bool = True,
    fixed_rounds: int | None = None,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Returns DataFrame(id long, hub double, auth double).

    fixed_rounds: run exactly that many rounds with no convergence test
    (oracle-comparable runs — the driver's DuckDB SQL unrolls the same
    supersteps as a CTE chain)."""
    n = graph.num_vertices()
    edges = graph.edges.select(SRC, DST).cache()
    edges.count()
    verts = graph.vertices.select(ID).cache()

    # State carries RAW per-round sums plus `hub_norm` = the normalized
    # hub of the round that produced them (for the L1 delta). The maxes
    # live in `carry` (driver scalars from the previous until) — init
    # maxes of 1.0 make round 0 read hub = 1/n, the reference init.
    init = verts.select(
        ID,
        F.lit(1.0 / n).alias("hub"),
        F.lit(0.0).alias("auth"),
        F.lit(1.0 / n).alias("hub_norm"),
    )
    carry = {"mh": 1.0, "ma": 1.0}

    def step(state: DataFrame, it: int) -> DataFrame:
        mh = carry["mh"]
        # hub_last (normalized) = raw hub / mh — scalar divide, fused
        # into the projection feeding the first agg-join.
        auth_new = (
            edges.join(
                state.select(F.col(ID).alias(SRC), (F.col("hub") / mh).alias("h")), SRC
            )
            .groupBy(DST)
            .agg(F.sum("h").alias("auth"))
            .withColumnRenamed(DST, ID)
        )
        auth_full = verts.join(auth_new, ID, "left").select(
            ID, F.coalesce("auth", F.lit(0.0)).alias("auth")
        )
        hub_new = (
            edges.join(auth_full.select(F.col(ID).alias(DST), "auth"), DST)
            .groupBy(SRC)
            .agg(F.sum("auth").alias("hub"))
            .withColumnRenamed(SRC, ID)
        )
        return (
            state.select(ID, (F.col("hub") / mh).alias("hub_norm"))
            .join(hub_new, ID, "left")
            .join(auth_full, ID, "left")
            .select(
                ID,
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("auth", F.lit(0.0)).alias("auth"),
                "hub_norm",
            )
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        # ONE driver round-trip: next-round maxes + L1 delta of the
        # normalized hub vector. max(hub) is needed inside the delta, so
        # it is computed as a broadcast scalar subquery — two stages,
        # one action, one barrier.
        m = new.agg(
            F.max("hub").alias("__mh"), F.max("auth").alias("__ma")
        )
        row = (
            new.crossJoin(F.broadcast(m))
            .agg(
                F.first("__mh").alias("mh"),
                F.first("__ma").alias("ma"),
                # greatest(·, 1e-300) keeps an all-zero round (edgeless
                # graph) from producing NaN eps, which would never
                # compare <= tolerance and burn max_round iterations
                F.sum(
                    F.abs(F.col("hub") / F.greatest(F.col("__mh"), F.lit(1e-300))
                          - F.col("hub_norm"))
                ).alias("eps"),
            )
            .collect()[0]
        )
        carry["mh"] = float(row["mh"] or 0.0) or 1.0
        carry["ma"] = float(row["ma"] or 0.0) or 1.0
        eps = float(row["eps"] or 0.0)
        stop = (fixed_rounds is None) and eps <= tolerance
        return stop, {"l1_delta_hub": eps}

    runner = SuperstepRunner(
        max_iter=fixed_rounds if fixed_rounds is not None else max_round,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, until)
    out = result.state.select(
        ID, (F.col("hub") / carry["mh"]).alias("hub"),
        (F.col("auth") / carry["ma"]).alias("auth"),
    )
    if normalized:
        sums = out.agg(F.sum("hub").alias("sh"), F.sum("auth").alias("sa")).collect()[0]
        sh = float(sums["sh"]) or 1.0
        sa = float(sums["sa"]) or 1.0
        out = out.select(
            ID, (F.col("hub") / sh).alias("hub"), (F.col("auth") / sa).alias("auth")
        )
    edges.unpersist()
    verts.unpersist()
    return out
