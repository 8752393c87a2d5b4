"""Strongly connected components — trim + forward-min-label coloring +
backward reach-to-root peeling (the FW-BW-Trim family: Fleischer,
Hendrickson & Pinar IPDPS'00; min-label Pregel variant per Salihoglu &
Widom VLDB'14 "Optimizing Graph Algorithms on Pregel-like Systems").
No single-app reference counterpart (the reference registry has wcc
only); completes the components family next to wcc.py, and NetworkX's
strongly_connected_components surfaces through nx.py.

Result: DataFrame(id long, scc long), scc = min vertex id in the
component — deterministic, exact-match comparable (same convention as
wcc's comp).

Outer peel iteration (driver loop), each stage pure DataFrame ops:
1. TRIM to fixpoint: vertices with no in- or no out-edges among the
   remaining graph are singleton SCCs — settle and drop them. Two
   semi-joins per trim round; peels tendrils/chains at one depth level
   per round (the known linear worst case on a pure path graph —
   documented, not hidden; web graphs' bow-tie tendrils are shallow).
2. COLOR: forward hash-min fixpoint c(v) = min{u : u ->* v} along edge
   direction (exactly wcc's msgs/mins plan shape, one shuffle of E per
   round, rounds <= remaining diameter). Every min-label path stays
   inside its color class, so classes are vertex-disjoint "forward
   balls" rooted at their minima.
3. BACKWARD REACH: restrict edges to same-color pairs ONCE (two hash
   joins, cached), then propagate "reaches own color root" along
   reversed colored edges to fixpoint (one semi-join + distinct per
   round — a frontier-free boolean BFS). SCC(root) = reached set of
   each class; settle all of them simultaneously (one peel settles
   every color root's SCC, not just the global min's).
4. Drop settled vertices and their edges; repeat. Outer rounds are
   bounded by the depth of the SCC-condensation "onion", with trim
   absorbing the acyclic mass between layers.

Scale: every stage is the proven hash-min/semi-join shape over (src,
dst) — partial aggregates map-side-combine hub skew, AQE splits the
E ⋈ state joins, and each outer round's state is localCheckpoint-ed
(lineage cut) exactly like superstep.py does for the linear loops.
Undirected graphs: SCC == WCC by definition — refused here with a
pointer to wcc() rather than silently computing the wrong notion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def _ckpt(df: DataFrame) -> DataFrame:
    """Materialize + cut lineage (eager localCheckpoint)."""
    return df.localCheckpoint(eager=True)


def scc(
    graph: LinkGraph,
    max_outer: int = 64,
    max_inner: int = 500,
    checkpoint_every: int = 5,
    trim: bool = True,
) -> DataFrame:
    """Exact SCCs of a directed LinkGraph: (id long, scc long) with
    scc = min member id. max_outer bounds peel rounds (a warning-level
    safety net — raises if the graph is not fully settled), max_inner
    bounds each coloring/reach fixpoint."""
    if not graph.directed:
        raise ValueError(
            "scc() is defined on directed graphs; for undirected graphs "
            "strong and weak connectivity coincide — use wcc()"
        )
    spark = graph.vertices.sparkSession
    remaining_v = _ckpt(graph.vertices.select(ID))
    remaining_e = _ckpt(graph.edges.select(SRC, DST))
    n_rem = remaining_v.count()
    settled_parts: list[DataFrame] = []

    def _restrict_edges(edges: DataFrame, keep: DataFrame) -> DataFrame:
        return edges.join(
            keep.select(F.col(ID).alias(SRC)), SRC, "leftsemi"
        ).join(keep.select(F.col(ID).alias(DST)), DST, "leftsemi")

    for _outer in range(max_outer):
        if n_rem == 0:
            break

        if trim:
            while n_rem > 0:
                has_in = remaining_e.select(F.col(DST).alias(ID)).distinct()
                has_out = remaining_e.select(F.col(SRC).alias(ID)).distinct()
                core = _ckpt(
                    remaining_v.join(has_in, ID, "leftsemi")
                    .join(has_out, ID, "leftsemi")
                )
                n_core = core.count()
                if n_core == n_rem:
                    break
                settled_parts.append(
                    _ckpt(
                        remaining_v.join(core, ID, "left_anti")
                        .select(ID, F.col(ID).alias("scc"))
                    )
                )
                remaining_v = core
                remaining_e = _ckpt(_restrict_edges(remaining_e, core))
                n_rem = n_core
            if n_rem == 0:
                break

        # ---- forward min-label coloring (wcc's plan, directed) ----
        edges = remaining_e
        color_init = remaining_v.select(
            ID, F.col(ID).alias("c"), F.lit(None).cast("long").alias("prev")
        )

        def color_step(state: DataFrame, it: int) -> DataFrame:
            mins = (
                edges.join(state.select(F.col(ID).alias(SRC), "c"), SRC)
                .groupBy(F.col(DST).alias(ID))
                .agg(F.min("c").alias("mc"))
            )
            return state.join(mins, ID, "left").select(
                ID,
                F.least("c", F.coalesce("mc", "c")).alias("c"),
                F.col("c").alias("prev"),
            )

        def color_until(new: DataFrame, old: DataFrame, it: int):
            changed = new.where(F.col("c") < F.col("prev")).count()
            return changed == 0, {"changed": changed}

        colors = (
            SuperstepRunner(max_iter=max_inner, checkpoint_every=checkpoint_every)
            .run(color_init, color_step, color_until)
            .state.select(ID, "c")
        )
        colors = _ckpt(colors)

        # ---- same-color edge restriction, computed once ----
        colored_edges = _ckpt(
            remaining_e.join(
                colors.select(F.col(ID).alias(SRC), F.col("c").alias("cs")), SRC
            )
            .join(colors.select(F.col(ID).alias(DST), F.col("c").alias("cd")), DST)
            .where(F.col("cs") == F.col("cd"))
            .select(SRC, DST)
        )

        # ---- backward reach to the color root ----
        reach_init = colors.select(
            ID, "c", (F.col(ID) == F.col("c")).alias("r"),
            F.lit(False).alias("prev"),
        )

        def reach_step(state: DataFrame, it: int) -> DataFrame:
            flips = (
                colored_edges.join(
                    state.where("r").select(F.col(ID).alias(DST)), DST, "leftsemi"
                )
                .select(F.col(SRC).alias(ID))
                .distinct()
                .withColumn("hit", F.lit(True))
            )
            return state.join(flips, ID, "left").select(
                ID, "c",
                (F.col("r") | F.coalesce("hit", F.lit(False))).alias("r"),
                F.col("r").alias("prev"),
            )

        def reach_until(new: DataFrame, old: DataFrame, it: int):
            changed = new.where(F.col("r") & ~F.col("prev")).count()
            return changed == 0, {"changed": changed}

        reached = (
            SuperstepRunner(max_iter=max_inner, checkpoint_every=checkpoint_every)
            .run(reach_init, reach_step, reach_until)
            .state
        )
        settled = _ckpt(reached.where("r").select(ID, F.col("c").alias("scc")))
        settled_parts.append(settled)

        remaining_v = _ckpt(remaining_v.join(settled, ID, "left_anti"))
        remaining_e = _ckpt(_restrict_edges(remaining_e, remaining_v))
        n_rem = remaining_v.count()
    else:
        if n_rem > 0:
            raise RuntimeError(
                f"scc(): {n_rem} vertices unsettled after max_outer="
                f"{max_outer} peel rounds; raise max_outer"
            )

    if not settled_parts:
        return spark.createDataFrame([], "id long, scc long")
    out = settled_parts[0]
    for part in settled_parts[1:]:
        out = out.unionAll(part)
    return out


def number_strongly_connected_components(graph: LinkGraph, **kw) -> int:
    return scc(graph, **kw).select("scc").distinct().count()


def is_strongly_connected(graph: LinkGraph, **kw) -> bool:
    n = graph.num_vertices()
    if n == 0:
        raise ValueError("is_strongly_connected undefined for empty graph")
    return number_strongly_connected_components(graph, **kw) == 1
