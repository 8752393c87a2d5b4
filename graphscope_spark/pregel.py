"""Pregel-style vertex-centric UDF surface — reference parity:
python/graphscope/analytical/udf/decorators.py:116-150 (@pregel
classes with Init/Compute[/Combine]), engine core/app/pregel/*
(pregel_compute_context.h, aggregators), examples
python/tests/unittest/test_udf_app.py:100-460.

The reference transpiles user Python to Cython and compiles a .so per
(algo × graph type) (udf/compile.py; coordinator/gscoordinator/
utils.py:169-270). On Spark none of that machinery is needed: a user
program declares its superstep as **Column expressions**, which
Catalyst compiles into whole-stage-codegen'd JVM bytecode — the same
"user logic → native code" pipeline with zero custom tooling.

Programming model (mirrors Pregel):
- vertex state: one value column per vertex (`value`);
- `gen_message(value, edge) -> Column`: the message sent along each
  out-edge (reference Compute's send_messages);
- `combine`: an associative aggregate over incoming messages —
  'sum' | 'min' | 'max' | 'count' | custom Column-factory. This is the
  reference's Combine() and becomes Spark's map-side partial
  aggregation (ENABLE_PREGEL_COMBINE, utils.py:220-222) for free;
- `compute(old_value, combined) -> Column`: the new vertex value;
- `vote_to_halt(new_value, old_value) -> Column[bool]`: per-vertex
  halt predicate; the run stops when every vertex halts (the
  reference's empty-message-set termination).

All hooks are Column expressions ⇒ the whole superstep stays JVM-side
(no per-row Python). Programs needing imperative logic can return a
pandas_udf-built Column from the same hooks — still Arrow-vectorized.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner

_COMBINERS: dict[str, Callable[[Column], Column]] = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


@dataclass
class PregelProgram:
    """A vertex program. All callables receive/return Columns.

    init: (vertices DataFrame) -> Column for the initial `value`
    gen_message: (value Column, edge columns resolver) -> Column
    combine: name in {'sum','min','max','count'} or Column-factory
    compute: (old_value Column, combined Column [null if no msgs]) -> Column
    vote_to_halt: (new_value, old_value) -> boolean Column (default:
        halt when value unchanged)
    """

    init: Callable[[DataFrame], Column]
    gen_message: Callable[[Column, Callable[[str], Column]], Column]
    combine: str | Callable[[Column], Column]
    compute: Callable[[Column, Column], Column]
    vote_to_halt: Callable[[Column, Column], Column] | None = None


def run_pregel(
    graph: LinkGraph,
    program: PregelProgram,
    max_iter: int = 100,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    info_out: dict | None = None,
) -> DataFrame:
    """Drive a PregelProgram to halt/max_iter.

    Returns DataFrame(id long, value). Superstep shape is identical to
    the builtin algorithms: edges ⋈ state on src → groupBy(dst).agg
    (combine) → join back on id — one shuffle of E + two of V."""
    edges = graph.edges
    if not graph.directed:
        # undirected graph stored as canonical one-direction edges:
        # messages must flow both ways (same symmetrization as the
        # builtin sssp/lpa fabric) — edge property columns are kept.
        edges = edges.unionAll(
            edges.select(
                F.col(DST).alias(SRC),
                F.col(SRC).alias(DST),
                *[c for c in edges.columns if c not in (SRC, DST)],
            )
        )
    edges = edges.cache()
    edges.count()

    comb = (
        _COMBINERS[program.combine]
        if isinstance(program.combine, str)
        else program.combine
    )

    init = graph.vertices.select(
        ID, program.init(graph.vertices).alias("value"), F.lit(False).alias("halted")
    )

    def step(state: DataFrame, it: int) -> DataFrame:
        # halted vertices still receive messages (Pregel reactivation),
        # but send none (vote_to_halt semantics).
        senders = state.where(~F.col("halted")).select(
            F.col(ID).alias(SRC), F.col("value").alias("__v")
        )
        joined = edges.join(senders, SRC)

        def edge_col(name: str) -> Column:
            return joined[name]

        msgs = joined.select(
            F.col(DST).alias(ID),
            program.gen_message(F.col("__v"), edge_col).alias("__m"),
        )
        combined = msgs.groupBy(ID).agg(comb(F.col("__m")).alias("__c"))

        new = state.join(combined, ID, "left").select(
            ID,
            F.col("value").alias("__old"),
            program.compute(F.col("value"), F.col("__c")).alias("value"),
            F.col("__c").isNotNull().alias("__got_msg"),
        )
        halt = (
            program.vote_to_halt(F.col("value"), F.col("__old"))
            if program.vote_to_halt is not None
            else (F.col("value") == F.col("__old"))
        )
        # Pregel: a vertex halts when it votes to halt AND is not
        # reactivated by an incoming message next round; with sync
        # barriers, "halted" here = voted halt this round.
        return new.select(ID, "value", F.coalesce(halt, F.lit(False)).alias("halted"))

    def until(new: DataFrame, old: DataFrame, it: int):
        active = new.where(~F.col("halted")).count()
        return active == 0, {"active": active}

    runner = SuperstepRunner(
        max_iter=max_iter,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, until)
    if info_out is not None:
        info_out["iterations"] = result.iterations
        info_out["converged"] = result.converged
    edges.unpersist()
    return result.state.select(ID, "value")


# ----------------------------------------------------------------------
# Example programs (the reference ships SSSP/Pagerank/TC as Pregel UDF
# demos, test_udf_app.py:100-460) — used by tests as API validation.
# ----------------------------------------------------------------------
def sssp_program(src: int, weight_col: str | None = None) -> PregelProgram:
    """Pregel SSSP (test_udf_app.py SSSP_Pregel semantics)."""
    inf = float("inf")

    def init(vertices: DataFrame) -> Column:
        return F.when(F.col(ID) == src, F.lit(0.0)).otherwise(F.lit(inf))

    def gen_message(value: Column, edge) -> Column:
        w = edge(weight_col).cast("double") if weight_col else F.lit(1.0)
        return value + w

    def compute(old: Column, combined: Column) -> Column:
        return F.least(old, F.coalesce(combined, F.lit(inf)))

    return PregelProgram(
        init=init, gen_message=gen_message, combine="min", compute=compute
    )


def degree_program() -> PregelProgram:
    """One-superstep in-degree (trivial smoke program)."""
    return PregelProgram(
        init=lambda v: F.lit(0.0),
        gen_message=lambda value, edge: F.lit(1.0),
        combine="sum",
        compute=lambda old, combined: F.greatest(
            F.col("value"), F.coalesce(combined, F.lit(0.0))
        ),
    )
