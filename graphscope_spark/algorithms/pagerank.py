"""PageRank, NetworkX semantics — reference parity:
apps/pagerank/pagerank_networkx.h:54-151 (the north-rule variant;
python wrapper analytical/app/pagerank_nx.py:29-56).

Semantics (pagerank_networkx.h):
- init rank[v] = 1/N                                (:66)
- dangling vertex = outdeg(v) == 0                  (:74-78)
- per round:
    dangling_sum = alpha * Σ_{outdeg(u)=0} rank(u)  (:80-83,:147-148)
    base = (1-alpha)/N + dangling_sum/N             (:114)
    rank'[v] = base + alpha * Σ_{u→v} rank(u)/outdeg(u)   (:115-122)
- stop when Σ_v |rank'(v) − rank(v)| < tol · N, or max_iter (:134-136)

Spark plan per superstep (all JVM-side, whole-stage codegen):
  contribs = edges ⋈ ranks ON src  →  groupBy(dst).sum(rank/outdeg)
  two scalar aggregates (dangling mass, L1 delta) collected driver-side
  — the reference's global Communicator Sum (pagerank_networkx.h:83,135).
Hub skew on the shuffle: partial hash-aggregation combines map-side;
AQE skew-join splits the edges⋈ranks join; `salt_mod>1` adds the static
two-stage salted aggregate for clusters without AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def pagerank(
    graph: LinkGraph,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-06,
    fixed_rounds: int | None = None,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    salt_mod: int = 1,
) -> DataFrame:
    """Returns DataFrame(id long, rank double).

    fixed_rounds: run exactly that many supersteps with no convergence
    test (used for oracle-comparable fixed-round runs; the reference's
    plain `pagerank` app is likewise fixed-round, pagerank.py:28-54).
    """
    spark = graph.vertices.sparkSession
    n = graph.num_vertices()
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")

    # Vertex table with out-degrees, cached once: the static side of
    # every superstep join (reference: degree exchange in PEval :67).
    outdeg = graph.edges.groupBy(F.col(SRC).alias(ID)).agg(
        F.count("*").alias("outdeg")
    )
    verts = (
        graph.vertices.select(ID)
        .join(outdeg, ID, "left")
        .select(ID, F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
        .cache()
    )
    verts.count()  # materialize

    edges = graph.edges.select(SRC, DST)

    init = verts.select(ID, "outdeg", F.lit(1.0 / n).alias("rank"))

    def step(state: DataFrame, it: int) -> DataFrame:
        dangling = state.where(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0))
        ).collect()[0][0]
        dangling_sum = alpha * float(dangling)
        base = (1.0 - alpha) / n + dangling_sum / n

        contrib_src = state.where(F.col("outdeg") > 0).select(
            F.col(ID).alias(SRC), (F.col("rank") / F.col("outdeg")).alias("contrib")
        )
        joined = edges.join(contrib_src, SRC)
        if salt_mod > 1:
            partial = (
                joined.withColumn("__salt", F.pmod(F.xxhash64(SRC), F.lit(salt_mod)))
                .groupBy(DST, "__salt")
                .agg(F.sum("contrib").alias("__p"))
            )
            contribs = partial.groupBy(DST).agg(F.sum("__p").alias("contrib_sum"))
        else:
            contribs = joined.groupBy(DST).agg(F.sum("contrib").alias("contrib_sum"))

        return (
            verts.join(contribs.withColumnRenamed(DST, ID), ID, "left")
            .select(
                ID,
                "outdeg",
                (
                    F.lit(base)
                    + F.lit(alpha) * F.coalesce("contrib_sum", F.lit(0.0))
                ).alias("rank"),
            )
        )

    if fixed_rounds is not None:
        until = None
        max_rounds = fixed_rounds
    else:
        max_rounds = max_iter

        def until(new: DataFrame, old: DataFrame, it: int):
            eps = (
                new.select(ID, "rank")
                .join(old.select(ID, F.col("rank").alias("prev")), ID)
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))))
                .collect()[0][0]
            )
            eps = float(eps or 0.0)
            return eps < tol * n, {"l1_delta": eps, "edges": None}

    runner = SuperstepRunner(
        max_iter=max_rounds,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, until)
    out = result.state.select(ID, "rank")
    verts.unpersist()
    return out
