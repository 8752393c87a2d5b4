"""Minimum spanning forest — deterministic distributed Borůvka (1926;
the component-merge formulation is THE canonical bulk-synchronous MST
algorithm, e.g. GRAPE/Giraph/Pregel tutorials).

Reference parity: no MSF app in the reference registry; this
completes the weighted-graph row next to sssp/louvain — the forest is
the standard backbone/clustering primitive for weighted link graphs
(single-linkage clustering = MSF + cut).

Determinism / engine portability: each component picks its minimum
incident crossing edge by the total order (w, u, v) — a unique key
per edge, so ties in w break identically everywhere; merged
components relabel to the MIN member id. No RNG, no floats beyond
the weights themselves: restart-, retry- and cluster-size-stable,
and a fixed-round run has a bit-exact unrolled SQL twin
(harness.boruvka_sql — struct MIN + recursive-CTE closure per round).

Per round (the 100 TB shape): one edge↔label join pair (two hash
joins over E), ONE min-struct hash aggregate keyed by component, a
distinct over the chosen set (≤ #components rows), then a hash-min
WCC on the CONTRACTED component graph (≤ #components vertices —
shrinks ≥ 2× per round, so O(log n) rounds and the contracted work
vanishes geometrically). MSF edges accumulate via checkpointed
union, same discipline as pagerank/wcc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import _CKPT_LEVEL


def _canonical_edges(graph: LinkGraph, weight_col: str) -> DataFrame:
    """(u, v, w): u < v, self-loops dropped, parallel/symmetric
    duplicates merged to the MIN weight (the cheapest representative
    is the only one an MSF can use)."""
    e = graph.edges.select(SRC, DST, F.col(weight_col).cast("double").alias("w"))
    return (
        e.where(F.col(SRC) != F.col(DST))
        .select(
            F.least(SRC, DST).alias("u"),
            F.greatest(SRC, DST).alias("v"),
            "w",
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )


def boruvka_msf(
    graph: LinkGraph,
    weight_col: str = "w",
    max_rounds: int = 64,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """DataFrame(src, dst, w) — the minimum spanning forest under the
    deterministic (w, u, v) total order (src < dst rows). With
    ``fixed_rounds`` exactly that many Borůvka rounds run (the
    oracle-twin mode — the partial forest is still a subset of the
    full MSF); otherwise rounds continue until no component has a
    crossing edge, at which point the result spans every connected
    component with |C|−1 edges of minimum total weight."""
    from graphscope_spark.algorithms.wcc import wcc

    edges = _canonical_edges(graph, weight_col).localCheckpoint(
        eager=True, storageLevel=_CKPT_LEVEL
    )
    comp = graph.vertices.select(ID, F.col(ID).alias("comp")).localCheckpoint(
        eager=True, storageLevel=_CKPT_LEVEL
    )
    spark = comp.sparkSession
    msf: DataFrame = spark.createDataFrame([], "src long, dst long, w double")
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for _ in range(rounds):
        cross = (
            edges.join(
                comp.select(F.col(ID).alias("u"), F.col("comp").alias("cu")),
                "u",
            )
            .join(
                comp.select(F.col(ID).alias("v"), F.col("comp").alias("cv")),
                "v",
            )
            .where(F.col("cu") != F.col("cv"))
        )
        # field ORDER is the comparison order: (w, u, v) decides,
        # cu/cv just ride along for the contracted graph
        s = F.struct("w", "u", "v", "cu", "cv").alias("s")
        cand = cross.select(F.col("cu").alias("c"), s).unionAll(
            cross.select(F.col("cv").alias("c"), s)
        )
        chosen = (
            cand.groupBy("c")
            .agg(F.min("s").alias("s"))
            .select("s.u", "s.v", "s.w", "s.cu", "s.cv")
            .distinct()
            .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        )
        if chosen.isEmpty():
            break
        msf = msf.unionByName(
            chosen.select(
                F.col("u").alias(SRC), F.col("v").alias(DST), "w"
            )
        ).localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        # contract: hash-min WCC over the component graph
        cg = LinkGraph.from_edges(
            chosen.select(F.col("cu").alias(SRC), F.col("cv").alias(DST)),
            directed=True,
        )
        relab = wcc(cg, two_phase=False).select(
            F.col(ID).alias("comp"), F.col("comp").alias("newc")
        )
        comp = (
            comp.join(relab, "comp", "left")
            .select(ID, F.coalesce("newc", F.col("comp")).alias("comp"))
            .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        )
    return msf


def msf_weight(graph: LinkGraph, weight_col: str = "w", **kw) -> DataFrame:
    """One row (n_edges long, total_weight double) of the full forest
    — the scalar single-linkage/backbone summary."""
    m = boruvka_msf(graph, weight_col, **kw)
    return m.agg(
        F.count("*").alias("n_edges"),
        F.round(F.coalesce(F.sum("w"), F.lit(0.0)), 6).alias("total_weight"),
    )


def single_linkage(
    graph: LinkGraph,
    threshold: float,
    weight_col: str = "w",
    **kw,
) -> DataFrame:
    """Single-linkage clustering at distance ``threshold`` —
    (id, cluster long), cluster = MIN member id: the components of
    the MSF after cutting edges with w > threshold (the classic
    equivalence: single-linkage dendrogram = MSF; Gower & Ross 1969).
    The at-scale sibling of fuzzy_dedup's verified-pair WCC — but
    over a WEIGHTED similarity/distance graph, with the forest (≤
    |V|−1 edges) as the only pair state ever materialized.

    Plan: boruvka_msf (O(log n) rounds), a codegen filter, then
    hash-min WCC over forest edges only.
    """
    from graphscope_spark.algorithms.wcc import wcc

    forest = boruvka_msf(graph, weight_col, **kw)
    kept = forest.where(F.col("w") <= float(threshold)).select(SRC, DST)
    lg = LinkGraph(
        vertices=graph.vertices.select(ID),
        edges=kept,
        directed=False,
    )
    return wcc(lg, two_phase=False).select(
        ID, F.col("comp").alias("cluster")
    )
