"""Louvain community detection — reference parity:
apps/pregel/louvain/louvain.h:74-329 (distributed Sotera Louvain as a
Pregel program), louvain_app_base.h:200-248 (halt / level pipeline),
auxiliary.h:165-181 (decide_to_halt), python wrapper
analytical/app/louvain.py; reference test
python/tests/unittest/test_app.py:342.

Semantics reproduced exactly (one Spark superstep = one full
local-move cycle = the reference's 3 minor steps fused):

- init: community(v) = v, sigma_total(C) = Σ_{v∈C} (node_weight(v) +
  internal_weight(v)) (louvain.h:74-86);
- candidate score for moving v to community C (louvain.h:285-309):
      k_i_in = W(v→C) (+ internal_weight(v) if C is v's community)
      σ'     = sigma_total(C) (− k_i(v) if C is v's community)
      ΔQ     = k_i_in − k_i(v)·σ' / m2     (0 if own C and σ' = 0)
  where k_i(v) = node_weight + internal_weight and m2 = Σ_v k_i(v);
- winner = max ΔQ, ties by MIN community id, staying scores ΔQ = 0
  (the std::map ascending scan of louvain.h:248-259 reduces to
  argmax(ΔQ desc, community asc) over candidates ∪ {(own, 0)});
- anti-cycle parity rule (louvain.h:261-265): on even iterations a
  move to a SMALLER community id is ignored, on odd iterations a move
  to a LARGER one is;
- phase-1 halt (auxiliary.h:165-181): stop when an iteration moves 0
  vertices, or when the improvement in moved-count is ≤ min_progress
  more than progress_tries times (the reference evaluates this every
  2nd cycle; we evaluate every cycle — strictly more conservative,
  same rule);
- phase 2 (louvain.h:363-418): compress each community to one node;
  new internal_weight(C) = Σ member internal + Σ intra-community edge
  weight (both directions), new edges = community-to-community sums;
  repeat phase 1 on the compressed graph;
- outer stop (louvain_app_base.h:220-247): when a level yields no
  moves or modularity stops improving, or `max_levels`.

Spark plan per local-move cycle: one shuffle of E (groupBy(src,
community of dst)), one V-sized groupBy for sigma, one window over the
candidate set (≤ E rows, partitioned by vertex — hub skew bounded by
map-side partial aggregation of the E-shuffle). The superstep state is
V rows; levels shrink geometrically, so the level-0 cycle dominates —
the same cost profile as one PageRank superstep plus a window.

Determinism: all tie-breaks are total orders on (ΔQ, community id);
with integer-valued weights every aggregate is exact in doubles, so
results are reproducible across engines (the DuckDB oracle unrolls
the identical cycles) and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def _decide_to_halt(history: list[int], min_progress: int, progress_tries: int) -> bool:
    """auxiliary.h:165-181 verbatim."""
    if not history:
        return False
    if history[-1] == 0:
        return True
    previous = history[0]
    count = 0
    for cur in history:
        if previous - cur <= min_progress:
            count += 1
        previous = cur
    return count > progress_tries


def _one_level(
    nodes: DataFrame,  # (node long, internal double)
    edges: DataFrame,  # symmetric (src, dst, w), no self-loops
    min_progress: int,
    progress_tries: int,
    max_iters: int,
    fixed_iters: int | None,
    checkpoint_every: int,
) -> tuple[DataFrame, list[int]]:
    """Run phase-1 local moves; returns ((node, community), history)."""
    deg = edges.groupBy(F.col(SRC).alias("node")).agg(F.sum("w").alias("nw"))
    base = (
        nodes.join(deg, "node", "left")
        .select(
            "node",
            "internal",
            (F.coalesce("nw", F.lit(0.0)) + F.col("internal")).alias("k"),
        )
        .cache()
    )
    m2 = base.agg(F.sum("k")).collect()[0][0] or 1.0

    init = base.select(
        "node", "internal", "k", F.col("node").alias("community")
    )
    history: list[int] = []

    def step(state: DataFrame, it: int) -> DataFrame:
        sigma = state.groupBy("community").agg(F.sum("k").alias("sigma"))
        nbrc = (
            edges.join(
                state.select(
                    F.col("node").alias(DST), F.col("community").alias("c")
                ),
                DST,
            )
            .groupBy(F.col(SRC).alias("node"), "c")
            .agg(F.sum("w").alias("kvc"))
        )
        cand = (
            nbrc.join(sigma.withColumnRenamed("community", "c"), "c")
            .join(state, "node")
        )
        is_cur = F.col("c") == F.col("community")
        sig_adj = F.col("sigma") - F.when(is_cur, F.col("k")).otherwise(F.lit(0.0))
        k_i_in = F.col("kvc") + F.when(is_cur, F.col("internal")).otherwise(F.lit(0.0))
        dq = F.when(is_cur & (sig_adj == 0.0), F.lit(0.0)).otherwise(
            k_i_in - F.col("k") * sig_adj / F.lit(float(m2))
        )
        allc = cand.select("node", "c", dq.alias("dq")).unionAll(
            state.select("node", F.col("community").alias("c"), F.lit(0.0).alias("dq"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("dq"), F.asc("c"))
        best = (
            allc.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("node", F.col("c").alias("best"))
        )
        cur, b = F.col("community"), F.col("best")
        parity_keep = ((cur > b) & F.lit(it % 2 == 0)) | ((cur < b) & F.lit(it % 2 == 1))
        return (
            state.join(best, "node")
            .select(
                "node",
                "internal",
                "k",
                F.when(parity_keep, cur).otherwise(b).alias("community"),
                (~parity_keep & (cur != b)).alias("__changed"),
            )
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        moved = new.where(F.col("__changed")).count()
        history.append(int(moved))
        if fixed_iters is not None:
            return False, {"moved": moved}
        return (
            _decide_to_halt(history, min_progress, progress_tries),
            {"moved": moved},
        )

    runner = SuperstepRunner(
        max_iter=fixed_iters if fixed_iters is not None else max_iters,
        checkpoint_every=checkpoint_every,
    )
    result = runner.run(init, step, until)
    base.unpersist()
    return result.state.select("node", "community"), history


def louvain(
    graph: LinkGraph,
    weight_col: str | None = None,
    min_progress: int = 1,
    progress_tries: int = 1,
    max_iters_per_level: int = 50,
    max_levels: int = 10,
    fixed_iters: int | None = None,
    fixed_levels: int | None = None,
    checkpoint_every: int = 5,
    info_out: dict | None = None,
) -> DataFrame:
    """DataFrame(id long, community long): final community per vertex
    (community ids are vertex ids of community hubs, like the
    reference's gid-valued communities).

    fixed_levels/fixed_iters: run exactly that many levels × local-move
    cycles with no halt checks — deterministic oracle-comparable runs
    (the driver's DuckDB SQL unrolls the same cycles)."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e0 = graph.edges.where(F.col(SRC) != F.col(DST)).select(SRC, DST, w.alias("w"))
    # symmetric fabric with per-pair weights summed (multi-edges merge)
    sym = (
        e0.unionAll(e0.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w"))
        .groupBy(SRC, DST)
        .agg(F.sum("w").alias("w"))
    )
    edges = sym.cache()
    edges.count()

    membership = graph.vertices.select(ID, F.col(ID).alias("node"))
    nodes = graph.vertices.select(
        F.col(ID).alias("node"), F.lit(0.0).alias("internal")
    )

    levels = fixed_levels if fixed_levels is not None else max_levels
    prev_q: float | None = None
    level_info: list[dict] = []
    for level in range(levels):
        comm, history = _one_level(
            nodes,
            edges,
            min_progress,
            progress_tries,
            max_iters_per_level,
            fixed_iters,
            checkpoint_every,
        )
        comm = comm.localCheckpoint(eager=True)
        membership = (
            membership.join(comm, "node")
            .select(ID, F.col("community").alias("node"))
            .localCheckpoint(eager=True)
        )

        # compress (louvain.h:363-418): community graph for next level
        csrc = comm.select(F.col("node").alias(SRC), F.col("community").alias("cs"))
        cdst = comm.select(F.col("node").alias(DST), F.col("community").alias("cd"))
        e2 = edges.join(csrc, SRC).join(cdst, DST).select("cs", "cd", "w")
        intra = e2.where(F.col("cs") == F.col("cd")).groupBy(
            F.col("cs").alias("community")
        ).agg(F.sum("w").alias("iw"))
        prev_internal = (
            nodes.join(comm, "node")
            .groupBy("community")
            .agg(F.sum("internal").alias("pw"))
        )
        new_nodes = (
            comm.select("community")
            .distinct()
            .join(intra, "community", "left")
            .join(prev_internal, "community", "left")
            .select(
                F.col("community").alias("node"),
                (
                    F.coalesce("iw", F.lit(0.0)) + F.coalesce("pw", F.lit(0.0))
                ).alias("internal"),
            )
        )
        new_edges = (
            e2.where(F.col("cs") != F.col("cd"))
            .groupBy(F.col("cs").alias(SRC), F.col("cd").alias(DST))
            .agg(F.sum("w").alias("w"))
        )

        moved_total = sum(history)
        # modularity of the current assignment (for the outer stop):
        # Q = Σ_C (intra+internal)/m2 − (σ_C/m2)²  — the standard form
        # of the reference's aggregated per-vertex actual quality.
        k_df = edges.groupBy(F.col(SRC).alias("node")).agg(F.sum("w").alias("nw"))
        ktab = (
            nodes.join(k_df, "node", "left")
            .select(
                "node",
                (F.coalesce("nw", F.lit(0.0)) + F.col("internal")).alias("k"),
            )
            .join(comm, "node")
        )
        m2 = ktab.agg(F.sum("k")).collect()[0][0] or 1.0
        sig = ktab.groupBy("community").agg(F.sum("k").alias("sigma"))
        q_row = (
            new_nodes.withColumnRenamed("node", "community")
            .join(sig, "community", "left")
            .agg(
                F.sum(
                    F.col("internal") / m2
                    - (F.coalesce("sigma", F.lit(0.0)) / m2) ** 2
                ).alias("q")
            )
            .collect()[0]
        )
        q = float(q_row["q"] or 0.0)
        level_info.append(
            {"level": level, "iterations": len(history), "moved": moved_total,
             "modularity": round(q, 6)}
        )

        stop_outer = fixed_levels is None and (
            moved_total == 0 or (prev_q is not None and q <= prev_q)
        )
        prev_q = q
        if stop_outer:
            break

        edges.unpersist()
        edges = new_edges.localCheckpoint(eager=True)
        nodes = new_nodes.localCheckpoint(eager=True)

    edges.unpersist()
    if info_out is not None:
        info_out["levels"] = level_info
    return membership.select(ID, F.col("node").alias("community"))


def modularity(
    graph: LinkGraph,
    communities: DataFrame,
    label_col: str = "label",
    weight: str | None = None,
) -> DataFrame:
    """Newman modularity of a given assignment — one row
    (n_communities long, modularity double, 6 dp).

    Q = Σ_C ( intra_C / m2 − (d_C / m2)² ) over the symmetrized
    simple graph (self-loops excluded; each undirected edge counted
    in both directions, so m2 = 2m and intra_C counts both rows) —
    the same aggregated form the reference's Louvain halt evaluates
    (louvain_app_base.h:220-247); exposed standalone so cdlp / LPA /
    external assignments can be scored without running Louvain.

    ``communities`` is DataFrame(id, <label_col>); vertices absent
    from it contribute nothing. With ``weight`` the per-row edge
    weight replaces the unit count (reversed rows merge per
    to_undirected's deterministic min convention).

    Plan: two broadcast-size label joins onto the edge fabric, three
    hash aggregates, m2 rides a 1-row cross join — no collect, no
    window.
    """
    lab = communities.select(ID, F.col(label_col).alias("__c"))
    if weight is None:
        e = (
            graph.undirected_edges()
            .where(F.col(SRC) != F.col(DST))
            .withColumn("__w", F.lit(1.0))
        )
    else:
        ew = graph.edges.select(SRC, DST, F.col(weight).alias("__w")).where(
            F.col(SRC) != F.col(DST)
        )
        e = (
            ew.unionByName(
                ew.select(
                    F.col(DST).alias(SRC), F.col(SRC).alias(DST), "__w"
                )
            )
            .groupBy(SRC, DST)
            .agg(F.min("__w").alias("__w"))
        )
    deg = e.groupBy(F.col(SRC).alias(ID)).agg(F.sum("__w").alias("__d"))
    m2 = e.agg(F.sum("__w").alias("__m2"))
    dc = (
        lab.join(deg, ID, "left")
        .groupBy("__c")
        .agg(F.sum(F.coalesce("__d", F.lit(0.0))).alias("__dc"))
    )
    intra = (
        e.join(lab.withColumnRenamed(ID, SRC), SRC)
        .join(
            lab.select(F.col(ID).alias(DST), F.col("__c").alias("__c2")),
            DST,
        )
        .where(F.col("__c") == F.col("__c2"))
        .groupBy("__c")
        .agg(F.sum("__w").alias("__ir"))
    )
    q = (
        dc.join(intra, "__c", "left")
        .crossJoin(F.broadcast(m2))
        .agg(
            F.coalesce(
                F.sum(
                    F.coalesce("__ir", F.lit(0.0)) / F.col("__m2")
                    - (F.col("__dc") / F.col("__m2")) ** 2
                ),
                F.lit(0.0),
            ).alias("__q")
        )
    )
    n = lab.agg(F.countDistinct("__c").alias("n_communities"))
    return n.crossJoin(q).select(
        "n_communities", F.round("__q", 6).alias("modularity")
    )
