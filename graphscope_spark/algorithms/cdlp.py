"""Community detection by label propagation (CDLP), LDBC Graphalytics
semantics — reference parity: grape::CDLP registered at
coordinator/gscoordinator/builtin/app/.gs_conf.yaml:41-48, semantics
pinned by the LDBC golden file usage in python/tests/unittest/
test_app.py:310-320 and python wrapper analytical/app/cdlp.py:26-51:

- label init = vertex id
- synchronous rounds, fixed max_round (default 10)
- new label = MODE of neighbor labels; smallest label wins ties
- directed graphs: both in- and out-neighbors count (an edge present in
  both directions contributes twice), per LDBC Graphalytics spec §2.3.3.

Spark plan per round:
  freq   = nbrs ⋈ labels ON src → groupBy(dst, label).count()
  winner = freq.groupBy(dst).max(struct(cnt, -label))   ← no window:
           a single hash-aggregate picks (max count, min label); cheaper
           than row_number() over a per-dst window at web scale because
           partial aggregation combines map-side before the shuffle.
Exact integer semantics → exact-match testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def neighbor_fabric(graph: LinkGraph) -> DataFrame:
    """Message fabric (src, dst): for directed graphs, each edge yields
    both directions WITHOUT dedup (LDBC counts an edge existing both
    ways twice); undirected graphs are assumed already symmetric."""
    e = graph.edges.select(SRC, DST)
    if not graph.directed:
        return e
    return e.unionAll(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))


def cdlp(
    graph: LinkGraph,
    max_round: int = 10,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Returns DataFrame(id long, label long)."""
    nbrs = neighbor_fabric(graph).cache()
    nbrs.count()

    init = graph.vertices.select(ID, F.col(ID).alias("label"))

    def step(state: DataFrame, it: int) -> DataFrame:
        freq = (
            nbrs.join(state.select(F.col(ID).alias(SRC), "label"), SRC)
            .groupBy(DST, "label")
            .agg(F.count("*").alias("cnt"))
        )
        # (max cnt, then min label): max over struct(cnt, -label).
        winner = freq.groupBy(DST).agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("w")
        ).select(F.col(DST).alias(ID), (-F.col("w.neg")).alias("new_label"))
        # isolated vertices keep their label (no neighbors → no message)
        return state.join(winner, ID, "left").select(
            ID, F.coalesce("new_label", "label").alias("label")
        )

    runner = SuperstepRunner(
        max_iter=max_round,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, until=None)
    nbrs.unpersist()
    return result.state.select(ID, "label")
