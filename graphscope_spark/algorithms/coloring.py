"""Distributed greedy graph coloring — Jones–Plassmann (1993) with
deterministic md5 priorities.

Reference parity: the reference's analytical registry has no coloring
app, but coloring is the scheduling/symmetry-breaking sibling of MIS
in the parallel-graph family its GRAPE engine targets (Jones &
Plassmann, "A Parallel Graph Coloring Heuristic", SIAM JSC 1993); it
completes the mis/kcore/ktruss decomposition row and is the standard
conflict-free-batch primitive for parallel updates over a link graph.

Determinism / engine portability: the priority is STATIC per vertex —
``md5(id) || lpad(id, 20, '0')`` — a unique string DuckDB reproduces
verbatim, so a fixed-round run has a bit-exact unrolled SQL twin
(harness.coloring_sql). No RNG, no floats: restart-, retry- and
cluster-size-stable, and identical at every parallelism level.

Semantics: a vertex colors itself in round r iff every UNCOLORED
neighbor has a larger key; its color is the mex (minimum excluded
value) of its already-colored neighbors' colors. Two adjacent
uncolored vertices are never both ready (one has the smaller key), so
rounds never conflict and the result is a proper coloring with at
most Δ+1 colors. Rounds = length of the longest key-decreasing path,
O(log n / log log n) w.h.p. for hash priorities.

Per round (the 100 TB shape): one codegen key projection, TWO
edge-join shuffles (min-active-neighbor-key to find ready vertices;
colored-neighbor color sets for the mex — both partial-agg friendly),
an anti-join to shrink the frontier. The mex itself is a codegen
``aggregate`` fold over the sorted color set — no Python. State
carried between rounds is only the shrinking ACTIVE set plus the
decided table, checkpointed through the same discipline as
pagerank/wcc (superstep.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import _CKPT_LEVEL


def _static_key():
    """Unique, engine-portable static priority string per vertex."""
    return F.concat(
        F.md5(F.col(ID).cast("string")),
        F.lpad(F.col(ID).cast("string"), 20, "0"),
    )


def _mex(sorted_colors):
    """Minimum excluded value of a SORTED distinct int array —
    fold: acc starts at 0 and increments exactly when it meets
    itself; any larger color leaves it fixed."""
    return F.aggregate(
        sorted_colors,
        F.lit(0),
        lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
    )


def greedy_color(
    graph: LinkGraph,
    max_iter: int = 500,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """DataFrame(id, color int, round int) — Jones–Plassmann greedy
    coloring over the symmetrized simple graph (self-loops ignored,
    as coloring is defined on the simple graph).

    With ``fixed_rounds`` the loop stops after exactly that many
    rounds and still-uncolored vertices carry NULL color/round (the
    oracle-twin mode); otherwise it runs to an empty frontier, at
    which point every vertex holds a color, no edge is monochrome,
    and at most Δ+1 colors are used.
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
        [], "id long, color int, round int"
    )
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for r in range(1, rounds + 1):
        pri = active.select(ID, _static_key().alias("k"))
        # min key among ACTIVE neighbors — ready iff strictly smaller
        msgs = edges.join(
            pri.select(F.col(ID).alias(SRC), F.col("k").alias("nk")), SRC
        ).select(F.col(DST).alias(ID), "nk")
        nmin = msgs.groupBy(ID).agg(F.min("nk").alias("nk"))
        ready = (
            pri.join(nmin, ID, "left")
            .where(F.col("nk").isNull() | (F.col("k") < F.col("nk")))
            .select(ID)
        )
        # mex over already-colored neighbors (same-round neighbors
        # cannot both be ready, so prior rounds suffice)
        nbc = (
            edges.join(
                decided.select(
                    F.col(ID).alias(SRC), F.col("color").alias("nc")
                ),
                SRC,
            )
            .groupBy(F.col(DST).alias(ID))
            .agg(F.array_sort(F.collect_set("nc")).alias("cs"))
        )
        colored = ready.join(nbc, ID, "left").select(
            ID,
            _mex(
                F.coalesce(F.col("cs"), F.array().cast("array<int>"))
            ).cast("int").alias("color"),
            F.lit(r).alias("round"),
        )
        decided = decided.unionByName(colored).localCheckpoint(
            eager=True, storageLevel=_CKPT_LEVEL
        )
        new_active = active.join(ready, ID, "left_anti").localCheckpoint(
            eager=True, storageLevel=_CKPT_LEVEL
        )
        n_left = new_active.count()
        active.unpersist()
        active = new_active
        if n_left == 0:
            break
    return graph.vertices.select(ID).join(decided, ID, "left").select(
        ID, "color", "round"
    )
