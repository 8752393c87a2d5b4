"""HITS hubs & authorities — reference parity: apps/hits/hits.h:31-204
(+ hits_context.h:42 hub init = 1/N), python wrapper
analytical/app/hits.py:29-61.

Per round (hits.h IncEval stages):
  auth[v] = Σ_{u→v} hub_last[u]         (AuthIteration)
  hub[u]  = Σ_{u→v} auth[v]             (HubIteration)
  hub /= max(hub);  auth /= max(auth)   (Normalize, :128-151)
  stop when Σ|hub − hub_last| ≤ tol or step ≥ max_round (:160-163)
  if normalized: final hub /= Σhub, auth /= Σauth (:168-196)

Spark plan: two agg-joins + two scalar max aggregates per round —
the global Max/Sum communicator calls (:135-151) become driver-side
`.agg(...).collect()`.
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

    init = verts.select(
        ID, F.lit(1.0 / n).alias("hub"), F.lit(0.0).alias("auth")
    )

    def step(state: DataFrame, it: int) -> DataFrame:
        auth_new = (
            edges.join(state.select(F.col(ID).alias(SRC), "hub"), SRC)
            .groupBy(DST)
            .agg(F.sum("hub").alias("auth"))
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
        combined = (
            verts.join(hub_new, ID, "left")
            .join(auth_full, ID, "left")
            .select(
                ID,
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("auth", F.lit(0.0)).alias("auth"),
            )
        )
        maxes = combined.agg(
            F.max("hub").alias("mh"), F.max("auth").alias("ma")
        ).collect()[0]
        mh = float(maxes["mh"]) or 1.0
        ma = float(maxes["ma"]) or 1.0
        return combined.select(
            ID, (F.col("hub") / mh).alias("hub"), (F.col("auth") / ma).alias("auth")
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        eps = (
            new.select(ID, "hub")
            .join(old.select(ID, F.col("hub").alias("prev")), ID)
            .agg(F.sum(F.abs(F.col("hub") - F.col("prev"))))
            .collect()[0][0]
        )
        eps = float(eps or 0.0)
        return eps <= tolerance, {"l1_delta_hub": eps}

    runner = SuperstepRunner(
        max_iter=fixed_rounds if fixed_rounds is not None else max_round,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, None if fixed_rounds is not None else until)
    out = result.state
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
