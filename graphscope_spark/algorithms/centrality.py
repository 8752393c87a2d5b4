"""Eigenvector & Katz centrality — reference parity:
apps/centrality/eigenvector/eigenvector_centrality.h:29-177 (power
iteration over in-edges + global L2 normalization per round) and
apps/centrality/katz/katz_centrality.h:29-171
(x' = alpha·Σ_{u→v} x[u] + beta per round, L1 convergence, optional
final L2 normalization); python wrappers
analytical/app/{eigenvector_centrality,katz_centrality}.py.

Spark plan per round: one agg-join + one scalar aggregate — identical
superstep shape to PageRank (the reference uses the same Communicator
Sum/Sqrt pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def _power_loop(
    graph: LinkGraph,
    update,  # (state, edges, verts) -> new unnormalized state with col "x"
    init_val: float,
    tolerance: float,
    max_round: int,
    l2_normalize_each: bool,
    checkpoint_every: int,
    checkpoint_dir: str | None,
    fixed_rounds: int | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    n = graph.num_vertices()
    if weight_col is not None:
        edges = graph.edges.select(
            SRC, DST, F.col(weight_col).cast("double").alias("w")
        ).cache()
    else:
        edges = graph.edges.select(SRC, DST).cache()
    edges.count()
    verts = graph.vertices.select(ID).cache()
    init = verts.select(ID, F.lit(init_val).alias("x"))

    def step(state: DataFrame, it: int) -> DataFrame:
        new = update(state, edges, verts)
        if l2_normalize_each:
            norm = new.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("n")).collect()[0]["n"]
            norm = float(norm) or 1.0
            new = new.select(ID, (F.col("x") / norm).alias("x"))
        return new

    def until(new: DataFrame, old: DataFrame, it: int):
        eps = (
            new.join(old.select(ID, F.col("x").alias("prev")), ID)
            .agg(F.sum(F.abs(F.col("x") - F.col("prev"))))
            .collect()[0][0]
        )
        eps = float(eps or 0.0)
        return eps < n * tolerance, {"l1_delta": eps}

    runner = SuperstepRunner(
        max_iter=fixed_rounds if fixed_rounds is not None else max_round,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, None if fixed_rounds is not None else until)
    edges.unpersist()
    verts.unpersist()
    return result.state.select(ID, "x")


def eigenvector_centrality(
    graph: LinkGraph,
    tolerance: float = 1e-06,
    max_round: int = 100,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    fixed_rounds: int | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """DataFrame(id long, centrality double), L2-normalized.

    With weight_col, the incoming sum is Σ w(u,v)·x[u] (NetworkX's
    weighted semantics; the reference app projects weights away)."""
    n = graph.num_vertices()
    xw = (F.col("x") * F.col("w")) if weight_col is not None else F.col("x")

    def update(state: DataFrame, edges: DataFrame, verts: DataFrame) -> DataFrame:
        inc = (
            edges.join(state.select(F.col(ID).alias(SRC), "x"), SRC)
            .groupBy(DST)
            .agg(F.sum(xw).alias("inc"))
            .withColumnRenamed(DST, ID)
        )
        # x' = x + Σ_in x (the reference keeps the self term,
        # eigenvector_centrality.h:100-111)
        return (
            state.join(inc, ID, "left")
            .select(ID, (F.col("x") + F.coalesce("inc", F.lit(0.0))).alias("x"))
        )

    out = _power_loop(
        graph, update, 1.0 / n, tolerance, max_round, True, checkpoint_every,
        checkpoint_dir, fixed_rounds, weight_col,
    )
    return out.withColumnRenamed("x", "centrality")


def katz_centrality(
    graph: LinkGraph,
    alpha: float = 0.1,
    beta: float = 1.0,
    tolerance: float = 1e-06,
    max_round: int = 100,
    normalized: bool = True,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    fixed_rounds: int | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """DataFrame(id long, centrality double).

    With weight_col, x' = alpha·Σ w(u,v)·x[u] + beta (NetworkX's
    weighted semantics; the reference app projects weights away)."""
    xw = (F.col("x") * F.col("w")) if weight_col is not None else F.col("x")

    def update(state: DataFrame, edges: DataFrame, verts: DataFrame) -> DataFrame:
        inc = (
            edges.join(state.select(F.col(ID).alias(SRC), "x"), SRC)
            .groupBy(DST)
            .agg(F.sum(xw).alias("inc"))
            .withColumnRenamed(DST, ID)
        )
        return verts.join(inc, ID, "left").select(
            ID,
            (F.lit(alpha) * F.coalesce("inc", F.lit(0.0)) + F.lit(beta)).alias("x"),
        )

    out = _power_loop(
        graph, update, 1.0, tolerance, max_round, False, checkpoint_every,
        checkpoint_dir, fixed_rounds, weight_col,
    )
    if normalized:
        norm = out.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("n")).collect()[0]["n"]
        norm = float(norm) or 1.0
        out = out.select(ID, (F.col("x") / norm).alias("x"))
    return out.withColumnRenamed("x", "centrality")
