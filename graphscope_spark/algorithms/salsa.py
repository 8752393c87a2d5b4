"""SALSA — Stochastic Approach for Link-Structure Analysis (Lempel &
Moran, WWW'00): HITS with degree-normalized (stochastic) walk steps,
the authority/hub model behind large-scale who-to-follow systems. No
reference counterpart (the registry's spectral apps are hits/eigen/
katz); completes the web-IR ranking family next to hits.py.

Power iteration on the bipartite walk:
    h_t(i)   = Σ_{i→j} a_t(j) / indeg(j)
    a_{t+1}(k) = Σ_{i→k} h_t(i) / outdeg(i)
Both steps are row-stochastic, so total authority mass is CONSERVED —
no per-round normalization scalar, hence no extra driver round-trip
(unlike hits.py's max-normalization): the unrolled SQL twin is exact
round for round. Init a_0 = 1/|{v : indeg(v) > 0}| on authority-side
vertices. At the fixpoint each component's authority converges to
indeg-proportional mass (the paper's Thm 2); the iterate is what
production systems actually compute.

Spark plan per superstep: two shuffles of E (a-side join + hash agg to
hubs, hub-side join + hash agg back) — exactly two wcc-shaped rounds;
degrees ride the cached vertex table; skew handled by partial
aggregation + AQE as in pagerank.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def salsa(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-08,
    fixed_rounds: int | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """DataFrame(id long, authority double, hub double). Vertices with
    indeg 0 hold authority 0; outdeg 0 hold hub 0."""
    if not graph.directed:
        raise ValueError("salsa() is defined on directed graphs")
    spark = graph.vertices.sparkSession
    edges = graph.edges.select(SRC, DST).distinct().cache()
    edges.count()

    indeg = edges.groupBy(F.col(DST).alias(ID)).agg(
        F.count("*").cast("double").alias("indeg")
    )
    outdeg = edges.groupBy(F.col(SRC).alias(ID)).agg(
        F.count("*").cast("double").alias("outdeg")
    )
    verts = (
        graph.vertices.select(ID)
        .join(indeg, ID, "left")
        .join(outdeg, ID, "left")
        .select(
            ID,
            F.coalesce("indeg", F.lit(0.0)).alias("indeg"),
            F.coalesce("outdeg", F.lit(0.0)).alias("outdeg"),
        )
        .cache()
    )
    n_auth = verts.where(F.col("indeg") > 0).count()
    if n_auth == 0:
        return graph.vertices.select(
            ID, F.lit(0.0).alias("authority"), F.lit(0.0).alias("hub")
        )

    init = verts.select(
        ID, "indeg", "outdeg",
        F.when(F.col("indeg") > 0, F.lit(1.0 / n_auth))
        .otherwise(F.lit(0.0)).alias("a"),
        F.lit(0.0).alias("hub"),
        F.lit(0.0).alias("prev"),
    )

    def step(state: DataFrame, it: int) -> DataFrame:
        # h(i) = sum over out-neighbors j of a(j)/indeg(j)
        hubs = (
            edges.join(
                state.where(F.col("indeg") > 0).select(
                    F.col(ID).alias(DST), (F.col("a") / F.col("indeg")).alias("c")
                ),
                DST,
            )
            .groupBy(F.col(SRC).alias(ID))
            .agg(F.sum("c").alias("h"))
        )
        with_h = state.join(hubs, ID, "left").select(
            ID, "indeg", "outdeg", "a",
            F.coalesce("h", F.lit(0.0)).alias("hub"),
        )
        # a'(k) = sum over in-neighbors i of h(i)/outdeg(i)
        auths = (
            edges.join(
                with_h.where(F.col("outdeg") > 0).select(
                    F.col(ID).alias(SRC),
                    (F.col("hub") / F.col("outdeg")).alias("c"),
                ),
                SRC,
            )
            .groupBy(F.col(DST).alias(ID))
            .agg(F.sum("c").alias("na"))
        )
        return with_h.join(auths, ID, "left").select(
            ID, "indeg", "outdeg",
            F.coalesce("na", F.lit(0.0)).alias("a"),
            "hub",
            F.col("a").alias("prev"),
        )

    if fixed_rounds is not None:
        until = None
        max_rounds = fixed_rounds
    else:
        max_rounds = max_iter

        def until(new: DataFrame, old: DataFrame, it: int):
            eps = new.agg(
                F.coalesce(F.sum(F.abs(F.col("a") - F.col("prev"))), F.lit(0.0))
            ).collect()[0][0]
            return float(eps) < tol, {"l1_delta": float(eps)}

    runner = SuperstepRunner(max_iter=max_rounds,
                             checkpoint_every=checkpoint_every)
    result = runner.run(init, step, until)
    out = result.state.select(
        ID, F.col("a").alias("authority"), F.col("hub").alias("hub")
    )
    verts.unpersist()
    edges.unpersist()
    return out
