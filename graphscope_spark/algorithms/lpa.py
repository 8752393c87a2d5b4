"""Weighted label propagation (LPA u2i) — reference parity:
apps/lpa/lpa_u2i.h:30-246 (registered .gs_conf.yaml:144, python wrapper
analytical/app/lpa.py:26-50): labels diffuse across a weighted
(bipartite u2i) graph; each round a vertex adopts the label with the
largest incoming edge-weight mass, smallest label breaking ties — the
weighted generalization of CDLP (weight 1 ⇒ CDLP semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def lpa_u2i(
    graph: LinkGraph,
    max_round: int = 10,
    weight_col: str | None = None,
    label_col: str | None = None,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Returns DataFrame(id long, label long).

    label_col: initial labels on graph.vertices (default: vertex id).
    weight_col: edge weight (default 1.0 ⇒ CDLP).
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = graph.edges.select(SRC, DST, w.alias("w"))
    if graph.directed:
        e = e.unionAll(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w"))
    e = e.cache()
    e.count()

    lab = F.col(label_col).cast("long") if label_col else F.col(ID)
    init = graph.vertices.select(ID, lab.alias("label"))

    def step(state: DataFrame, it: int) -> DataFrame:
        mass = (
            e.join(state.select(F.col(ID).alias(SRC), "label"), SRC)
            .groupBy(DST, "label")
            .agg(F.sum("w").alias("mass"))
        )
        winner = mass.groupBy(DST).agg(
            F.max(F.struct(F.col("mass"), (-F.col("label")).alias("neg"))).alias("m")
        ).select(F.col(DST).alias(ID), (-F.col("m.neg")).alias("new_label"))
        return state.join(winner, ID, "left").select(
            ID, F.coalesce("new_label", "label").alias("label")
        )

    runner = SuperstepRunner(
        max_iter=max_round, checkpoint_every=checkpoint_every, checkpoint_dir=checkpoint_dir
    )
    result = runner.run(init, step, until=None)
    e.unpersist()
    return result.state.select(ID, "label")
