"""PageRank, NetworkX semantics — reference parity:
apps/pagerank/pagerank_networkx.h:54-151 (the north-rule variant;
python wrapper analytical/app/pagerank_nx.py:29-56).

Semantics (pagerank_networkx.h):
- init rank[v] = 1/N                                (:66)
- dangling vertex = outdeg(v) == 0                  (:74-78)
- per round:
    dangling_sum = alpha * Σ_{outdeg(u)=0} rank(u)  (:80-83,:147-148)
    base = (1-alpha)/N + dangling_sum/N             (:114)
    rank'[v] = base + alpha * Σ_{u→v} rank(u)/outdeg(u)   (:115-122)
- stop when Σ_v |rank'(v) − rank(v)| < tol · N, or max_iter (:134-136)

Spark plan per superstep (all JVM-side, whole-stage codegen):
  contribs = edges ⋈ ranks ON src  →  groupBy(dst).sum(rank/outdeg)
  then ONE scalar aggregate per superstep collects BOTH global values —
  the L1 delta (each state row carries `prev`) and the next round's
  dangling mass — in a single driver round-trip: the Spark analogue of
  the reference's global Communicator Sum (pagerank_networkx.h:83,135),
  which likewise piggybacks both sums on one barrier.
Hub skew on the shuffle: partial hash-aggregation combines map-side;
AQE skew-join splits the edges⋈ranks join; `salt_mod>1` adds the static
two-stage salted aggregate for clusters without AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.skew import salted_sum
from graphscope_spark.superstep import SuperstepRunner


def _norm_vec_df(spark, d, name: str):
    """(id, name) DataFrame of a vector normalized to sum 1 —
    personalization / dangling / nstart vectors (NX semantics: missing
    vertices get 0). Tiny: always broadcast into the vertex table.

    Accepts a ``{id: weight}`` dict or a DataFrame whose first column
    is the vertex id and whose optional second column is the weight
    (default 1.0 each — a plain seed set). The DataFrame path stays
    distributed up to one scalar normalization aggregate (a one-off
    driver action, same cost class as pagerank's dangling-mass init);
    by contract these vectors are small (seed/reset sets), so the
    subsequent join is broadcast either way."""
    if isinstance(d, DataFrame):
        cols = d.columns
        w = (
            F.col(cols[1]).cast("double")
            if len(cols) > 1
            else F.lit(1.0)
        )
        vec = d.select(F.col(cols[0]).cast("long").alias(ID), w.alias(name))
        total = vec.agg(F.coalesce(F.sum(name), F.lit(0.0))).collect()[0][0]
        if total <= 0:
            raise ValueError(f"{name} vector must have positive sum")
        return vec.select(ID, (F.col(name) / F.lit(float(total))).alias(name))
    total = float(sum(d.values()))
    if total <= 0:
        raise ValueError(f"{name} vector must have positive sum")
    rows = [(int(k), float(v) / total) for k, v in d.items()]
    return spark.createDataFrame(rows, f"id long, {name} double")


def pagerank(
    graph: LinkGraph,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-06,
    fixed_rounds: int | None = None,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    salt_mod: int = 1,
    info_out: dict | None = None,
    personalization: dict | DataFrame | None = None,
    dangling: dict | DataFrame | None = None,
    nstart: dict | DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Returns DataFrame(id long, rank double).

    fixed_rounds: run exactly that many supersteps with no convergence
    test (used for oracle-comparable fixed-round runs; the reference's
    plain `pagerank` app is likewise fixed-round, pagerank.py:28-54).

    NetworkX-parity options (the reference's NX wrapper surface,
    nx/algorithms/builtin.py pagerank(alpha, personalization, max_iter,
    tol, nstart, weight, dangling)):
    - personalization: {id: weight} dict or (id[, weight]) DataFrame —
      reset vector p (normalized; missing vertices 0). Default uniform
      1/N.
    - dangling: {id: weight} redistribution vector d for dangling mass.
      Default = p (NX default).
    - nstart: {id: weight} initial ranks (normalized; missing 0).
    - weight_col: edge weight column; contributions become
      rank·w/Σw(out) and dangling means zero total out-weight.
    Update: rank'[v] = (1−α)·p_v + α·(Σ_{u→v} contrib_u + ds·d_v),
    ds = Σ_{dangling u} rank_u — reduces exactly to
    pagerank_networkx.h:114-122 when p = d = 1/N.
    On an undirected graph the stored canonical edges are symmetrized
    (same fabric rule as sssp.py).
    """
    spark = graph.vertices.sparkSession
    n = graph.num_vertices()
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")

    ecols = [SRC, DST] + ([weight_col] if weight_col else [])
    edges = graph.edges.select(*ecols)
    sym_cached = False
    if not graph.directed:
        # cache the symmetrized fabric: the union discards build()'s
        # src-partitioned layout, and without the cache every superstep
        # would recompute it (wcc.py caches its edges_sym for the same
        # reason)
        edges = edges.unionAll(
            edges.select(
                F.col(DST).alias(SRC), F.col(SRC).alias(DST),
                *([weight_col] if weight_col else []),
            )
        ).cache()
        sym_cached = True

    # Vertex table with out-degrees (weighted: total out-weight), cached
    # once: the static side of every superstep join (reference: degree
    # exchange in PEval :67).
    wexpr = F.sum(weight_col) if weight_col else F.count("*")
    outdeg = edges.groupBy(F.col(SRC).alias(ID)).agg(
        wexpr.cast("double").alias("outdeg")
    )
    verts = (
        graph.vertices.select(ID)
        .join(outdeg, ID, "left")
        .select(ID, F.coalesce("outdeg", F.lit(0.0)).alias("outdeg"))
    )

    # Reset vector p and dangling vector d: scalar 1/N fast path (the
    # default plan is unchanged), per-vertex columns otherwise.
    vec_path = personalization is not None or dangling is not None
    if vec_path:
        if personalization is not None:
            pdf = _norm_vec_df(spark, personalization, "p")
            verts = verts.join(F.broadcast(pdf), ID, "left").withColumn(
                "p", F.coalesce("p", F.lit(0.0))
            )
        else:
            verts = verts.withColumn("p", F.lit(1.0 / n))
        if dangling is not None:
            ddf = _norm_vec_df(spark, dangling, "d")
            verts = verts.join(F.broadcast(ddf), ID, "left").withColumn(
                "d", F.coalesce("d", F.lit(0.0))
            )
        else:
            verts = verts.withColumn("d", F.col("p"))
    verts = verts.cache()
    verts.count()  # materialize

    # State carries `prev` (last round's rank) so the L1 delta needs no
    # extra self-join; `carry` holds the dangling mass for the NEXT
    # round, refreshed by the same single aggregate that tests
    # convergence (pagerank_networkx.h:125-132 accumulates next-round
    # dangling during the current round the same way).
    state_cols = [ID, "outdeg"] + (["p", "d"] if vec_path else [])
    if nstart is not None:
        ndf = _norm_vec_df(spark, nstart, "rank")
        init = (
            verts.join(F.broadcast(ndf), ID, "left")
            .select(
                *state_cols,
                F.coalesce("rank", F.lit(0.0)).alias("rank"),
                F.lit(0.0).alias("prev"),
            )
        )
    else:
        init = verts.select(
            *state_cols, F.lit(1.0 / n).alias("rank"), F.lit(0.0).alias("prev")
        )
    d0 = init.where(F.col("outdeg") == 0).agg(
        F.coalesce(F.sum("rank"), F.lit(0.0))
    ).collect()[0][0]
    carry = {"dangling": alpha * float(d0)}

    def step(state: DataFrame, it: int) -> DataFrame:
        contrib_src = state.where(F.col("outdeg") > 0).select(
            F.col(ID).alias(SRC), (F.col("rank") / F.col("outdeg")).alias("contrib")
        )
        joined = edges.join(contrib_src, SRC)
        cexpr = (
            (F.col("contrib") * F.col(weight_col)) if weight_col else F.col("contrib")
        )
        if salt_mod > 1:
            # two-stage hub-skew spread — the one salted-sum
            # implementation lives in skew.py (row-content salt:
            # deterministic under retry, spreads hubs even when the
            # contribution value is constant, because src differs)
            contribs = salted_sum(
                joined.select(SRC, DST, cexpr.alias("__c")),
                key=DST, value="__c", salt_mod=salt_mod,
                out="contrib_sum",
            )
        else:
            contribs = joined.groupBy(DST).agg(F.sum(cexpr).alias("contrib_sum"))

        if vec_path:
            base_expr = (
                F.lit(1.0 - alpha) * F.col("p")
                + F.lit(carry["dangling"]) * F.col("d")
            )
        else:
            base_expr = F.lit((1.0 - alpha) / n + carry["dangling"] / n)
        return (
            state.select(*state_cols, F.col("rank").alias("prev"))
            .join(contribs.withColumnRenamed(DST, ID), ID, "left")
            .select(
                *state_cols,
                (
                    base_expr
                    + F.lit(alpha) * F.coalesce("contrib_sum", F.lit(0.0))
                ).alias("rank"),
                "prev",
            )
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        # ONE driver round-trip per superstep: L1 delta + next dangling.
        row = new.agg(
            F.coalesce(F.sum(F.abs(F.col("rank") - F.col("prev"))), F.lit(0.0)).alias(
                "eps"
            ),
            F.coalesce(
                F.sum(F.when(F.col("outdeg") == 0, F.col("rank"))), F.lit(0.0)
            ).alias("dangling"),
        ).collect()[0]
        carry["dangling"] = alpha * float(row["dangling"])
        eps = float(row["eps"])
        stop = (fixed_rounds is None) and eps < tol * n
        return stop, {"l1_delta": eps}

    max_rounds = fixed_rounds if fixed_rounds is not None else max_iter
    runner = SuperstepRunner(
        max_iter=max_rounds,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, until)
    if info_out is not None:
        info_out["iterations"] = result.iterations
        info_out["converged"] = result.converged
        info_out["history"] = result.history
    out = result.state.select(ID, "rank")
    verts.unpersist()
    if sym_cached:
        edges.unpersist()
    return out
