"""Butterfly counting — the bipartite-graph motif family.

A butterfly is the complete 2×2 biclique u–x–v–y–u (u, v on one side,
x, y on the other): the bipartite analogue of the triangle, the unit
of cohesion for user–item / customer–supplier / page–host graphs
(Sanei-Mehri, Sariyüce & Tirthapura, "Butterfly Counting in Bipartite
Networks", KDD'18). The Robins–Alexander bipartite clustering
coefficient is 4·B / L3 where L3 counts paths of length 3.

No reference counterpart app; this completes the motif row next to
triangles/k-truss for the bipartite fixtures (G1 customer→supplier,
u2i event graphs).

Plan (the 100 TB shape): identical skeleton to cocitation — ONE
self-join of the edge table on the shared side with u < v, one hash
aggregate per endpoint pair (w = common neighbors), then per-pair
C(w,2) folds into per-vertex butterfly counts with one more hash
aggregate. All integer arithmetic, no Python. The self-join fans out
quadratically in shared-endpoint degree, so ``max_fanout`` drops
hub endpoints above a degree cap BEFORE pairing (same bounding
argument as cocitation.py / LSH candidate caps); OFF by default, the
driver query runs uncapped. L3 is one degree join over the edge
table — linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, LinkGraph
from graphscope_spark.superstep import _CKPT_LEVEL


def _distinct_edges(graph: LinkGraph) -> DataFrame:
    """Distinct (src, dst), materialized once — read by the pair join
    AND the vertex/degree branches (re-derived per branch otherwise,
    the dsir/robots audit finding)."""
    return (
        graph.edges.select(SRC, DST)
        .distinct()
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )


def _pairs(edges: DataFrame, side: str, max_fanout: int | None) -> DataFrame:
    """(u, v, w) — same-``side`` endpoint pairs with w ≥ 2 shared
    neighbors on the other side; u < v."""
    join_col = DST if side == SRC else SRC
    if max_fanout is not None:
        keep = (
            edges.groupBy(join_col).agg(F.count("*").alias("__f"))
            .where(F.col("__f") <= int(max_fanout))
            .select(join_col)
        )
        edges = edges.join(keep, join_col, "leftsemi")
    a = edges.select(F.col(join_col).alias("k"), F.col(side).alias("u"))
    b = edges.select(F.col(join_col).alias("k"), F.col(side).alias("v"))
    return (
        a.join(b, "k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= 2)
    )


def butterflies(
    graph: LinkGraph,
    side: str = SRC,
    max_fanout: int | None = None,
) -> DataFrame:
    """Per-vertex butterfly counts for the ``side`` partition:
    DataFrame(id, butterflies long) — b(u) = Σ_v C(w_uv, 2), every
    ``side`` vertex present (0 when in no butterfly). Each butterfly
    is counted once per endpoint, i.e. twice per side across the
    column's sum (global B = Σ b(u) / 2)."""
    edges = _distinct_edges(graph)
    pairs = _pairs(edges, side, max_fanout)
    per_pair = pairs.select(
        "u", "v",
        (F.col("w") * (F.col("w") - 1) / 2).cast("long").alias("b"),
    )
    contrib = per_pair.select(F.col("u").alias("id"), "b").unionAll(
        per_pair.select(F.col("v").alias("id"), "b")
    )
    verts = edges.select(F.col(side).alias("id")).distinct()
    return (
        verts.join(contrib.groupBy("id").agg(F.sum("b").alias("b")), "id", "left")
        .select("id", F.coalesce("b", F.lit(0)).cast("long").alias("butterflies"))
    )


def butterfly_stats(
    graph: LinkGraph,
    side: str = SRC,
    max_fanout: int | None = None,
) -> DataFrame:
    """One row: (n_butterflies long, n_paths3 long, bipartite_cc
    double) — B counted over ``side`` endpoint pairs, L3 = paths of
    length 3 counted once each at their middle edge
    (Σ_(u,x)∈E (d(u)−1)(d(x)−1)), Robins–Alexander cc = 4B/L3
    (rounded to 6 dp; 0 when L3 = 0)."""
    edges = _distinct_edges(graph)
    pairs = _pairs(edges, side, max_fanout)
    b = (
        pairs.agg(
            F.coalesce(
                F.sum((F.col("w") * (F.col("w") - 1) / 2).cast("long")),
                F.lit(0),
            ).alias("n_butterflies")
        )
    )
    dsrc = edges.groupBy(SRC).agg(F.count("*").alias("du"))
    ddst = edges.groupBy(DST).agg(F.count("*").alias("dx"))
    l3 = (
        edges.join(dsrc, SRC).join(ddst, DST)
        .agg(
            F.coalesce(
                F.sum(((F.col("du") - 1) * (F.col("dx") - 1)).cast("long")),
                F.lit(0),
            ).alias("n_paths3")
        )
    )
    return b.crossJoin(l3).select(
        "n_butterflies",
        "n_paths3",
        F.round(
            F.when(F.col("n_paths3") > 0,
                   4.0 * F.col("n_butterflies") / F.col("n_paths3"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("bipartite_cc"),
    )
