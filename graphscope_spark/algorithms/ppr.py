"""Batched multi-source personalized PageRank (random walk with
restart) — K seed vertices solved in ONE iterative DataFrame job.

Reference parity: the reference exposes single-vector personalized
PageRank through its NX wrapper (nx/algorithms/builtin.py pagerank
(personalization=...), backed by apps/pagerank/pagerank_networkx.h);
batch-of-seeds PPR is what a link-graph deployment actually runs —
TrustRank-style seed studies, related-page scoring, per-portal
authority — and running K separate jobs costs K full passes over the
edge table.

Design (the ANF trick, anf.py: pack per-source state as columns and
ship ONE message per edge per superstep):
- state: (id, outdeg, r0..r{K-1}) — one rank column per seed;
- superstep: ONE edges ⋈ state join + ONE groupBy(dst) with K
  map-side-combined SUM aggregates (the shuffle payload is K doubles
  per edge — K=16 costs 128 bytes, far below the per-row overhead of
  K separate jobs);
- per-seed dangling mass and L1 delta ride ONE driver aggregate per
  round (2K scalars), exactly like pagerank.py's combined
  eps+dangling collect;
- per-seed update (NX personalized semantics with p = d = e_seed):
      r_k'[v] = ((1-α) + α·ds_k)·1[v = seed_k] + α·Σ_{u→v} r_k[u]/outdeg(u)

Output is WIDE — (id, r0..r{K-1}) — the layout downstream joins want
(one row per vertex); `melt=True` returns the tall
(seed, id, rank) form instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def ppr_batch(
    graph: LinkGraph,
    seeds: list[int],
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-06,
    fixed_rounds: int | None = None,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    melt: bool = False,
) -> DataFrame:
    """K-seed personalized PageRank in one job.

    Returns DataFrame(id long, r0..r{K-1} double) — r{k} is the PPR
    score with restart at seeds[k] — or (seed long, id long,
    rank double) when ``melt=True``. Convergence: max over seeds of
    the per-seed L1 delta < tol·N (each column is a probability
    vector, same normalization as pagerank's tol·N test).
    """
    if not seeds:
        raise ValueError("ppr_batch needs at least one seed vertex")
    seeds = [int(s) for s in seeds]
    K = len(seeds)
    rcols = [f"r{k}" for k in range(K)]
    spark = graph.vertices.sparkSession
    n = graph.num_vertices()
    if n == 0:
        schema = "id long, " + ", ".join(f"{c} double" for c in rcols)
        out = spark.createDataFrame([], schema)
        return _melt(out, seeds) if melt else out

    edges = graph.edges.select(SRC, DST)
    sym_cached = False
    if not graph.directed:
        edges = edges.unionAll(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        ).cache()
        sym_cached = True

    outdeg = edges.groupBy(F.col(SRC).alias(ID)).agg(
        F.count("*").cast("double").alias("outdeg")
    )
    verts = (
        graph.vertices.select(ID)
        .join(outdeg, ID, "left")
        .select(ID, F.coalesce("outdeg", F.lit(0.0)).alias("outdeg"))
        .cache()
    )
    verts.count()

    # init = uniform 1/N per column — the same nstart default as
    # pagerank(personalization=...), so fixed-round runs of the two
    # entry points are bit-comparable.
    init = verts.select(
        ID, "outdeg", *[F.lit(1.0 / n).alias(c) for c in rcols]
    )
    # initial dangling mass (uniform init ⇒ identical per column)
    d0 = init.where(F.col("outdeg") == 0).agg(
        *[F.coalesce(F.sum(c), F.lit(0.0)).alias(c) for c in rcols]
    ).collect()[0]
    carry = {c: alpha * float(d0[c]) for c in rcols}

    def step(state: DataFrame, it: int) -> DataFrame:
        contrib_src = state.where(F.col("outdeg") > 0).select(
            F.col(ID).alias(SRC),
            *[(F.col(c) / F.col("outdeg")).alias(c) for c in rcols],
        )
        contribs = (
            edges.join(contrib_src, SRC)
            .groupBy(DST)
            .agg(*[F.sum(c).alias(c) for c in rcols])
            .withColumnRenamed(DST, ID)
        )
        prev = state.select(
            ID, "outdeg", *[F.col(c).alias(f"p{k}") for k, c in enumerate(rcols)]
        )
        return prev.join(contribs, ID, "left").select(
            ID,
            "outdeg",
            *[
                (
                    F.when(
                        F.col(ID) == seeds[k],
                        F.lit((1.0 - alpha) + carry[c]),
                    ).otherwise(F.lit(0.0))
                    + F.lit(alpha) * F.coalesce(F.col(c), F.lit(0.0))
                ).alias(c)
                for k, c in enumerate(rcols)
            ],
            *[F.col(f"p{k}").alias(f"p{k}") for k in range(K)],
        )

    def until(new: DataFrame, old: DataFrame, it: int):
        aggs = [
            F.coalesce(
                F.sum(F.when(F.col("outdeg") == 0, F.col(c))), F.lit(0.0)
            ).alias(f"d_{c}")
            for c in rcols
        ] + [
            F.coalesce(
                F.sum(F.abs(F.col(c) - F.col(f"p{k}"))), F.lit(0.0)
            ).alias(f"e_{c}")
            for k, c in enumerate(rcols)
        ]
        row = new.agg(*aggs).collect()[0]
        for c in rcols:
            carry[c] = alpha * float(row[f"d_{c}"])
        eps = max(float(row[f"e_{c}"]) for c in rcols)
        stop = (fixed_rounds is None) and eps < tol * n
        return stop, {"l1_max": eps}

    # first step has no p{k} columns yet — give init zero prevs
    init = init.select(
        ID, "outdeg", *rcols, *[F.lit(0.0).alias(f"p{k}") for k in range(K)]
    )

    max_rounds = fixed_rounds if fixed_rounds is not None else max_iter
    runner = SuperstepRunner(
        max_iter=max_rounds,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, until)
    out = result.state.select(ID, *rcols)
    verts.unpersist()
    if sym_cached:
        edges.unpersist()
    return _melt(out, seeds) if melt else out


def _melt(wide: DataFrame, seeds: list[int]) -> DataFrame:
    """(id, r0..r{K-1}) → (seed, id, rank)."""
    pairs = []
    for k, s in enumerate(seeds):
        pairs += [f"CAST({s} AS BIGINT)", f"r{k}"]
    return wide.selectExpr(
        "id", f"stack({len(seeds)}, {', '.join(pairs)}) AS (seed, rank)"
    ).select("seed", "id", "rank")
