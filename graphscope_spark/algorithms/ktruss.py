"""k-truss — triangle-cohesion edge decomposition (Cohen, NSA TR'08
"Trusses: cohesive subgraphs for social network analysis"): the
maximal subgraph whose every edge closes >= k-2 triangles within it.
The edge-level sibling of k_core (kcore.py) — no single-app reference
counterpart, but the standard next step in the cohesion family the
registry's kcore/kshell start.

Peel loop (upstream NetworkX k_truss semantics — self-loops dropped,
undirected canonical edges, iterate until stable):
    support(u,v) = |N(u) ∩ N(v)| within the surviving edge set
    drop every edge with support < k-2; repeat until none drops.

Spark plan per peel round: support is the triangle join — the
symmetric edge view joined with itself on the shared endpoint
(common-neighbor w), hash-aggregated per canonical edge, then one
co-partitioned join back to filter. Rounds = peel depth (small for
web-ish graphs; each round's survivor set is localCheckpoint-ed).
At extreme scale the same support computation can ride triangles.py's
degree-ordered sorted-adjacency mode; the join form is kept here
because the peel loop re-derives support on a SHRINKING edge set
where Catalyst's AQE right-sizes each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, LinkGraph
from graphscope_spark.algorithms.scc import _ckpt


def k_truss(graph: LinkGraph, k: int, max_iter: int = 200) -> DataFrame:
    """DataFrame(src long, dst long): the canonical (src < dst)
    undirected edges of the k-truss. k < 3 returns the simple edge set
    unchanged (every edge is trivially in a 2-truss, NX convention)."""
    edges = _ckpt(graph.simple_edges())
    if k < 3:
        return edges
    thresh = int(k) - 2
    n = edges.count()
    for _ in range(max_iter):
        if n == 0:
            break
        sym = edges.unionAll(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        )
        # support restricted to EXISTING edges (never the all-pairs
        # co-neighbor blowup): wedge (src,dst,w) with w ∈ N(src),
        # closed by requiring (dst,w) adjacency too
        wedges = edges.join(
            sym.select(SRC, F.col(DST).alias("w")), SRC
        )
        support = (
            wedges.join(
                sym.select(F.col(SRC).alias(DST), F.col(DST).alias("w")),
                [DST, "w"],
                "leftsemi",
            )
            .groupBy(SRC, DST)
            .agg(F.count("*").alias("sup"))
        )
        survivors = _ckpt(
            edges.join(support, [SRC, DST], "left")
            .where(F.coalesce("sup", F.lit(0)) >= thresh)
            .select(SRC, DST)
        )
        n_new = survivors.count()
        edges = survivors
        if n_new == n:
            break
        n = n_new
    return edges
