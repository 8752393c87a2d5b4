"""PIE programming model (PEval + IncEval) — reference parity:
python/graphscope/analytical/udf/decorators.py:39-114 (`@pie(vd_type,
md_type)` classes with Init/PEval/IncEval), engine side
core/app/pregel/... and the GRAPE worker loop
core/worker/default_property_worker.h:84-124 (PEval once, then
IncEval until ToTerminate). Example programs:
python/tests/unittest/test_udf_app.py (SSSP_PIE :34-76).

The reference transpiles the user's Python class to Cython against a
per-fragment C++ API. Here, as with the Pregel surface (pregel.py),
the user expresses each hook as a DataFrame transformation — Catalyst
compiles it to JVM bytecode, and the *sequential-algorithm-in-PEval,
incremental-fixup-in-IncEval* structure of PIE (GRAPE, SIGMOD'17) maps
onto Spark as: PEval = the first (bulk) transformation of the state,
IncEval = the per-superstep refinement driven by SuperstepRunner.

Hooks (all DataFrame-level — a whole fragment at a time, which is
exactly PIE's granularity, vs Pregel's per-vertex hooks):

- init(graph) -> state DataFrame (must contain `id`)
- peval(state, graph) -> state'              (run once)
- inceval(state, graph, superstep) -> state' (run per superstep)
- terminate(new_state, old_state, superstep) -> bool | (bool, dict)
  (the reference's ToTerminate / empty-message check); None = run
  max_iter rounds.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


@dataclass
class PIEProgram:
    init: Callable[[LinkGraph], DataFrame]
    peval: Callable[[DataFrame, LinkGraph], DataFrame]
    inceval: Callable[[DataFrame, LinkGraph, int], DataFrame]
    terminate: Callable[[DataFrame, DataFrame, int], bool | tuple] | None = None


def run_pie(
    graph: LinkGraph,
    program: PIEProgram,
    max_iter: int = 100,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    info_out: dict | None = None,
) -> DataFrame:
    """Drive a PIEProgram: PEval once, IncEval until terminate /
    max_iter. Returns the final state DataFrame."""
    state = program.init(graph)
    state = program.peval(state, graph)

    runner = SuperstepRunner(
        max_iter=max_iter,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(
        state,
        step=lambda s, it: program.inceval(s, graph, it),
        until=program.terminate,
    )
    if info_out is not None:
        info_out["iterations"] = result.iterations
        info_out["converged"] = result.converged
    return result.state


# ----------------------------------------------------------------------
# Example program: SSSP in PIE form (test_udf_app.py SSSP_PIE) — used
# by tests to validate the surface against the builtin sssp().
# ----------------------------------------------------------------------
def sssp_pie(src: int, weight_col: str | None = None) -> PIEProgram:
    inf = float("inf")

    def fabric(graph: LinkGraph) -> DataFrame:
        w = (
            F.col(weight_col).cast("double")
            if weight_col
            else F.lit(1.0)
        )
        e = graph.edges.select(SRC, DST, w.alias("w"))
        if not graph.directed:
            e = e.unionAll(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w"))
        return e

    def init(graph: LinkGraph) -> DataFrame:
        return graph.vertices.select(
            ID,
            F.when(F.col(ID) == src, F.lit(0.0)).otherwise(F.lit(inf)).alias("distance"),
            (F.col(ID) == src).alias("active"),
        )

    def relax(state: DataFrame, graph: LinkGraph) -> DataFrame:
        frontier = state.where(F.col("active")).select(
            F.col(ID).alias(SRC), F.col("distance").alias("dsrc")
        )
        cand = (
            fabric(graph)
            .join(frontier, SRC)
            .groupBy(DST)
            .agg(F.min(F.col("dsrc") + F.col("w")).alias("cand"))
            .withColumnRenamed(DST, ID)
        )
        return state.join(cand, ID, "left").select(
            ID,
            F.least(F.col("distance"), F.coalesce("cand", F.lit(inf))).alias("distance"),
            (F.coalesce("cand", F.lit(inf)) < F.col("distance")).alias("active"),
        )

    def terminate(new: DataFrame, old: DataFrame, it: int):
        active = new.where(F.col("active")).count()
        return active == 0, {"active": active}

    return PIEProgram(
        init=init,
        peval=relax,  # PEval: the bulk first relaxation from the source
        inceval=lambda s, g, it: relax(s, g),  # IncEval: incremental fixup
        terminate=terminate,
    )
