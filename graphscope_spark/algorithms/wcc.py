"""Weakly connected components, hash-min label exchange — reference
parity: apps/projected/wcc_projected.h:63-180 (comp[v] init = gid(v)
:76-81; push cid along out- AND in-edges :88-104; keep min; stop when no
vertex changed :116-120). Result: component id = min vertex id in the
component — deterministic, exact-match comparable.

Spark plan per superstep:
  msgs  = edges_sym ⋈ labels ON src          (state joins the CSR side)
  mins  = msgs.groupBy(dst).min(label)        (map-side combined)
  next  = labels ⟕ mins → least(label, min)   (monotone decrease)
stop when count(next.label < labels.label) == 0.

Rounds needed = graph diameter (hash-min); for web graphs (~20-30
effective diameter) this is fine. `two_phase=True` adds a pointer-style
shortcut every round (label ← label of label), the moral of
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) halving round count on long chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def wcc(
    graph: LinkGraph,
    max_iter: int = 200,
    fixed_rounds: int | None = None,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    two_phase: bool = True,
    warm_labels: DataFrame | None = None,
) -> DataFrame:
    """Returns DataFrame(id long, comp long) with comp = min id in the
    weakly-connected component.

    ``warm_labels``: optional (id, comp) from a PRIOR run over a
    SUBGRAPH of this graph (edges/vertices added since, none removed —
    the append-only crawl contract, streaming.py): the incremental
    path. Hash-min converges to the min INITIAL label in each
    component; with prior labels = min-id of an old sub-component,
    that min is exactly the new component's min id, and rounds now
    scale with how far the new edge batch moved labels, not with the
    full graph diameter. After deletions, run cold (a removed bridge
    can leave a stale smaller label with no member backing it)."""
    edges_sym = graph.undirected_edges().cache()
    edges_sym.count()

    init = graph.vertices.select(ID, F.col(ID).alias("comp"))
    if warm_labels is not None:
        wcols = warm_labels.columns
        warm = warm_labels.select(
            F.col(wcols[0]).cast("long").alias(ID),
            F.col(wcols[1]).cast("long").alias("_warm"),
        )
        init = (
            init.join(warm, ID, "left")
            .select(ID, F.least("comp", F.coalesce("_warm", "comp")).alias("comp"))
        )

    def step(state: DataFrame, it: int) -> DataFrame:
        msgs = edges_sym.join(
            state.select(F.col(ID).alias(SRC), "comp"), SRC
        ).select(F.col(DST).alias(ID), "comp")
        mins = msgs.groupBy(ID).agg(F.min("comp").alias("nbr_min"))
        new = state.join(mins, ID, "left").select(
            ID, F.least("comp", F.coalesce("nbr_min", "comp")).alias("comp")
        )
        if two_phase:
            # pointer shortcut: comp ← comp[comp] (label of my label).
            lbl = new.select(F.col(ID).alias("comp"), F.col("comp").alias("comp2"))
            new = (
                new.join(lbl, "comp", "left")
                .select(ID, F.least("comp", F.coalesce("comp2", "comp")).alias("comp"))
            )
        return new

    if fixed_rounds is not None:
        until = None
        max_rounds = fixed_rounds
    else:
        max_rounds = max_iter

        def until(new: DataFrame, old: DataFrame, it: int):
            changed = (
                new.join(old.select(ID, F.col("comp").alias("prev")), ID)
                .where(F.col("comp") < F.col("prev"))
                .count()
            )
            return changed == 0, {"changed": changed}

    runner = SuperstepRunner(
        max_iter=max_rounds,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, until)
    edges_sym.unpersist()
    return result.state.select(ID, "comp")
