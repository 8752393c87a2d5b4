"""Bipartiteness — distributed 2-coloring check per weakly-connected
component (upstream NetworkX algorithms/bipartite/basic.py semantics:
a graph is bipartite iff its underlying undirected graph has no odd
cycle; directed edge orientation is ignored).

Two-phase plan, both phases the proven hash-min shapes:
1. wcc() labels every vertex with its component (min member id).
2. Parity spread: from each component root, propagate BFS parity along
   the symmetrized edges as TWO monotone booleans per vertex — "seen
   at even distance" / "seen at odd distance". Each round is one
   shuffle of E + hash agg with boolean OR (map-side combinable);
   both flags only ever flip false→true, so the fixpoint arrives in
   <= 2·diameter rounds. A vertex holding BOTH parities witnesses an
   odd closed walk through the root ⇒ an odd cycle ⇒ that component
   is not bipartite (and conversely BFS parity labeling is a proper
   2-coloring when no vertex doubles up).

Outputs are component-level: (comp, n_vertices, is_bipartite). The
per-vertex coloring (id, comp, color) is available from colors() for
callers that need the sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.algorithms.wcc import wcc
from graphscope_spark.superstep import SuperstepRunner


def _parity_state(graph: LinkGraph, max_iter: int,
                  checkpoint_every: int) -> DataFrame:
    """(id, comp, p0, p1) at fixpoint: p0/p1 = reachable from the
    component root at even/odd distance over the undirected fabric."""
    comps = wcc(graph, max_iter=max_iter, checkpoint_every=checkpoint_every)
    edges = graph.undirected_edges().cache()
    edges.count()
    init = comps.select(
        ID, "comp",
        (F.col(ID) == F.col("comp")).alias("p0"),
        F.lit(False).alias("p1"),
        F.lit(0).cast("long").alias("prev"),
    )

    def step(state: DataFrame, it: int) -> DataFrame:
        msgs = (
            edges.join(
                state.select(F.col(ID).alias(SRC), "p0", "p1"), SRC
            )
            .groupBy(F.col(DST).alias(ID))
            .agg(
                F.max("p1").alias("n0"),   # odd-neighbor ⇒ even here
                F.max("p0").alias("n1"),
            )
        )
        return state.join(msgs, ID, "left").select(
            ID, "comp",
            (F.col("p0") | F.coalesce("n0", F.lit(False))).alias("p0"),
            (F.col("p1") | F.coalesce("n1", F.lit(False))).alias("p1"),
            (F.col("p0").cast("long") + F.col("p1").cast("long")).alias("prev"),
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        grown = new.where(
            (F.col("p0").cast("long") + F.col("p1").cast("long"))
            > F.col("prev")
        ).count()
        return grown == 0, {"grown": grown}

    out = (
        SuperstepRunner(max_iter=max_iter, checkpoint_every=checkpoint_every)
        .run(init, step, until)
        .state.select(ID, "comp", "p0", "p1")
    )
    edges.unpersist()
    return out


def bipartite_components(graph: LinkGraph, max_iter: int = 200,
                         checkpoint_every: int = 5) -> DataFrame:
    """(comp long, n_vertices long, is_bipartite boolean) per weakly-
    connected component."""
    st = _parity_state(graph, max_iter, checkpoint_every)
    return st.groupBy("comp").agg(
        F.count("*").alias("n_vertices"),
        (~F.max(F.col("p0") & F.col("p1"))).alias("is_bipartite"),
    )


def two_coloring(graph: LinkGraph, max_iter: int = 200,
                 checkpoint_every: int = 5) -> DataFrame:
    """(id, comp, color int) — BFS-parity 2-coloring (color 0 = root
    side). Only meaningful for bipartite components; vertices holding
    both parities get color NULL."""
    st = _parity_state(graph, max_iter, checkpoint_every)
    return st.select(
        ID, "comp",
        F.when(F.col("p0") & F.col("p1"), F.lit(None).cast("int"))
        .when(F.col("p0"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("color"),
    )


def is_bipartite(graph: LinkGraph, **kw) -> bool:
    """True iff every component is bipartite (NX is_bipartite on the
    undirected fabric). Empty graph: True (vacuous, NX convention)."""
    bad = bipartite_components(graph, **kw).where(~F.col("is_bipartite"))
    return bad.count() == 0
