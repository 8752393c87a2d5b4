"""Maximal independent set — deterministic Luby (1986) rounds.

Reference parity: the reference's analytical registry has no MIS app,
but MIS is the canonical symmetry-breaking primitive of the
parallel-graph-algorithm family its GRAPE engine targets (Luby,
"A Simple Parallel Algorithm for the Maximal Independent Set
Problem"); it completes the components/kcore/ktruss decomposition row.

Determinism / engine portability: each round's priority is the md5
hex of ``id || ':' || round`` with the zero-padded id appended — a
unique string per (vertex, round) that DuckDB reproduces verbatim, so
a fixed-round run has a bit-exact unrolled SQL twin
(harness.mis_sql). No RNG, no floats: restart-, retry- and
cluster-size-stable.

Per round (the 100 TB shape): one codegen projection for priorities,
ONE shuffle (edge join + min-key aggregate — partial agg applies), an
anti-join to shrink the frontier. Luby removes a constant expected
fraction of edges per round, so rounds are O(log n); state carried
between rounds is only the ACTIVE vertex set, checkpointed through
the same SuperstepRunner discipline as pagerank/wcc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import _CKPT_LEVEL


def _round_key(r: int):
    """Unique, engine-portable priority string for round r."""
    return F.concat(
        F.md5(F.concat(F.col(ID).cast("string"), F.lit(f":{r}"))),
        F.lpad(F.col(ID).cast("string"), 20, "0"),
    )


def maximal_independent_set(
    graph: LinkGraph,
    max_iter: int = 200,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """DataFrame(id, in_mis boolean, round int).

    A vertex enters the MIS in round r iff its round-r key is
    strictly smaller than every ACTIVE neighbor's; its active
    neighbors leave as non-members the same round. Self-loops are
    ignored (MIS is defined on the simple graph); directed edges are
    symmetrized. With ``fixed_rounds`` the loop stops after exactly
    that many rounds and still-undecided vertices carry NULL
    in_mis/round (the oracle-twin mode); otherwise it runs to an
    empty frontier, at which point in_mis is total, the set is
    independent, and maximality holds by construction.
    """
    edges = (
        graph.undirected_edges()
        .where(F.col(SRC) != F.col(DST))
        .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    )
    active = graph.vertices.select(ID).localCheckpoint(
        eager=True, storageLevel=_CKPT_LEVEL
    )
    spark = active.sparkSession
    decided: DataFrame = spark.createDataFrame(
        [], "id long, in_mis boolean, round int"
    )
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for r in range(1, rounds + 1):
        pri = active.select(ID, _round_key(r).alias("k"))
        msgs = edges.join(
            pri.select(F.col(ID).alias(SRC), F.col("k").alias("nk")), SRC
        ).select(F.col(DST).alias(ID), "nk")
        nmin = msgs.groupBy(ID).agg(F.min("nk").alias("nk"))
        winners = (
            pri.join(nmin, ID, "left")
            .where(F.col("nk").isNull() | (F.col("k") < F.col("nk")))
            .select(ID)
        )
        removed = (
            edges.join(
                winners.withColumnRenamed(ID, SRC), SRC, "left_semi"
            )
            .select(F.col(DST).alias(ID))
            .join(active, ID, "left_semi")
            .distinct()
        )
        decided = decided.unionByName(
            winners.select(
                ID, F.lit(True).alias("in_mis"), F.lit(r).alias("round")
            )
        ).unionByName(
            removed.select(
                ID, F.lit(False).alias("in_mis"), F.lit(r).alias("round")
            )
        )
        new_active = (
            active.join(winners, ID, "left_anti")
            .join(removed, ID, "left_anti")
            .localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        )
        decided = decided.localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
        n_left = new_active.count()
        active.unpersist()
        active = new_active
        if n_left == 0:
            break
    return graph.vertices.select(ID).join(decided, ID, "left").select(
        ID, "in_mis", "round"
    )
