"""DAG operators — topological generations (Kahn layers), DAG longest
path, and reachability (ancestors/descendants).

Reference scope: the reference's analytical engine has no dedicated
DAG apps (its condensation consumers walk SCC DAGs driver-side); the
semantics here follow upstream networkx/algorithms/dag.py, which the
reference's nx layer forwards. The NX-compat wrappers in nx.py carry
the exact upstream iteration-order/mutation contracts; these
DataFrame versions are the bulk path.

Spark plans:

- topological_generations: Kahn peel — per round, vertices with
  in-degree 0 among the remainder form one generation; ONE hash
  aggregate + two anti-joins per round on a strictly shrinking edge
  set (the same peel shape as k_core/onion). Rounds = DAG depth.
- dag_longest_path: dynamic program over the generations — process
  generations in order, relaxing out-edges with max(dist + w) (one
  join + one map-side-combinable max aggregate per generation);
  parent pointers let the driver walk the ≤depth-long path back.
  Negative best predecessors restart at 0 (upstream semantics).
- descendants/ancestors: frontier BFS over forward/reversed arcs.

At 10^12 edges the depth of real link-graph DAGs (condensations,
hierarchies) is small; every round touches only the remaining/frontier
slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import _CKPT_LEVEL


class GraphContainsCycle(ValueError):
    """Raised when a cycle makes the DAG operator infeasible (the NX
    wrapper converts this to NetworkXUnfeasible)."""


def topological_generations(graph: LinkGraph, max_iter: int = 100_000) -> DataFrame:
    """DataFrame(id long, generation long) — generation 0 is the
    zero-in-degree set, generation g the vertices whose in-edges all
    come from generations < g. Raises GraphContainsCycle when vertices
    remain with positive in-degree after the peel."""
    edges = (graph.edges.select(SRC, DST)
             .where(F.col(SRC) != F.col(DST)).distinct()
             .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL))
    remaining = graph.vertices.select(ID).distinct().localCheckpoint(
        eager=True, storageLevel=_CKPT_LEVEL)
    result = None
    for g in range(max_iter):
        n_rem = remaining.count()
        if n_rem == 0:
            break
        indeg = edges.groupBy(F.col(DST).alias(ID)).agg(F.count("*").alias("d"))
        zero = remaining.join(indeg, ID, "left_anti")
        gen = zero.withColumn("generation", F.lit(g).cast("long"))
        n_zero = zero.count()
        if n_zero == 0:
            raise GraphContainsCycle(
                f"Graph contains a cycle ({n_rem} vertices with positive "
                "in-degree remain)")
        result = gen if result is None else result.unionAll(gen)
        remaining = remaining.join(zero, ID, "left_anti").localCheckpoint(
            eager=True, storageLevel=_CKPT_LEVEL)
        edges = edges.join(zero.withColumnRenamed(ID, SRC), SRC, "left_anti") \
            .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    if result is None:
        spark = graph.vertices.sparkSession
        return spark.createDataFrame([], f"{ID} long, generation long")
    return result


def dag_longest_path(graph: LinkGraph, weight_col: str | None = None,
                     default_weight: float = 1.0) -> list[int]:
    """The longest path of a DAG as a vertex-id list (upstream
    dag.py::dag_longest_path semantics: per vertex the best
    predecessor, restarting at 0 when the best incoming total is
    negative; ties broken by max (dist, pred-id) for determinism —
    upstream's tie order is dict-iteration-dependent).

    Distributed DP: one relax join + one max-struct aggregate per
    generation; only the final ≤depth-long walk happens driver-side.
    """
    gens = topological_generations(graph).localCheckpoint(
        eager=True, storageLevel=_CKPT_LEVEL)
    n_gen_row = gens.agg(F.max("generation").alias("m")).collect()
    if not n_gen_row or n_gen_row[0]["m"] is None:
        return []
    n_gen = int(n_gen_row[0]["m"])
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(float(default_weight)))
    edges = (
        graph.edges.select(SRC, DST, w.alias("w"))
        .where(F.col(SRC) != F.col(DST))
        # every DAG arc crosses to a strictly higher generation, so
        # tagging dst generations slices the edge set into disjoint
        # per-round pieces — O(E) relax work TOTAL, not per round
        .join(gens.select(F.col(ID).alias(DST),
                          F.col("generation").alias("dgen")), DST)
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )
    # dist(v) starts 0 with parent = self; process generations 1..D
    state = gens.select(ID, F.lit(0.0).alias("dist"),
                        F.col(ID).alias("parent"), "generation") \
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    for g in range(1, n_gen + 1):
        cur = state.where(F.col("generation") < g).select(
            F.col(ID).alias(SRC), F.col("dist").alias("dsrc"))
        best = (
            edges.where(F.col("dgen") == g).join(cur, SRC)
            .select(F.col(DST).alias(ID),
                    F.struct((F.col("dsrc") + F.col("w")).alias("cand"),
                             F.col(SRC).alias("parent")).alias("s"))
            .groupBy(ID)
            .agg(F.max("s").alias("s"))
            .select(ID, F.col("s.cand").alias("cand"),
                    F.col("s.parent").alias("bparent"))
        )
        state = (
            state.join(best, ID, "left")
            .select(
                ID,
                F.when((F.col("generation") == g)
                       & (F.coalesce("cand", F.lit(-1.0)) >= 0),
                       F.col("cand")).otherwise(F.col("dist")).alias("dist"),
                F.when((F.col("generation") == g)
                       & (F.coalesce("cand", F.lit(-1.0)) >= 0),
                       F.col("bparent")).otherwise(F.col("parent"))
                .alias("parent"),
                "generation",
            )
            .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        )
    # walk back from the max-dist vertex (<= depth hops, driver-side)
    parents = {r[ID]: (r["dist"], r["parent"])
               for r in state.select(ID, "dist", "parent").collect()}
    if not parents:
        return []
    v = max(parents, key=lambda x: (parents[x][0], x))
    path = [v]
    while parents[v][1] != v:
        v = parents[v][1]
        path.append(v)
    path.reverse()
    return path


def descendants(graph: LinkGraph, source: int) -> DataFrame:
    """DataFrame(id) — vertices reachable from source (excluded),
    frontier BFS over forward arcs."""
    return _reach(graph.edges.select(SRC, DST), int(source))


def ancestors(graph: LinkGraph, source: int) -> DataFrame:
    """DataFrame(id) — vertices that reach source (excluded), frontier
    BFS over reversed arcs."""
    rev = graph.edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    return _reach(rev, int(source))


def _reach(edges: DataFrame, source: int) -> DataFrame:
    edges = edges.localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    spark = edges.sparkSession
    seen = spark.createDataFrame([(source,)], f"{ID} long") \
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    frontier = seen
    while True:
        nxt = (
            edges.join(frontier.withColumnRenamed(ID, SRC), SRC, "left_semi")
            .select(F.col(DST).alias(ID)).distinct()
            .join(seen, ID, "left_anti")
            .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        )
        if nxt.count() == 0:
            break
        seen = seen.unionAll(nxt).localCheckpoint(
            eager=True, storageLevel=_CKPT_LEVEL)
        frontier = nxt
    return seen.where(F.col(ID) != source)
