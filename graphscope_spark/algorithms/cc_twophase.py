"""Connected components by alternating large-star / small-star edge
rewriting (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC'14).

This is the second, independently-formulated CC algorithm next to
``algorithms/wcc.py`` — same contract as the reference's wcc app
(apps/projected/wcc_projected.h:63-180: component id = min vertex id),
but where hash-min propagates LABELS over a fixed edge set for
diameter-many rounds, large/small-star rewrites the EDGE SET itself
into stars rooted at each component's minimum, converging in
O(log^2 n) rounds *independent of the diameter* — the property that
makes it the canonical choice for 10^12-edge web crawls whose
long-chain components starve label propagation.

One round, in DataFrame terms (state = distinct undirected edge set,
self-loops dropped; Γ+(u) = neighbors of u plus u itself):

  large-star: for every u, connect each neighbor v > u to
              m = min(Γ+(u));  emitted edges (v, m)
  small-star: for every u, connect each neighbor v < u AND u itself to
              m = min(Γ+(u));  emitted edges (v, m)

Each operation is one groupBy(u).min + one join back to the pair list
+ one distinct — three hash shuffles on the same key space, all
map-side combinable, no windows, no driver data. Edges only ever
point "downhill" after the first round (dst = a running minimum), so
the state monotonically approaches the star fixpoint
{(v, root(v)) : v not a root}; convergence is detected by an
edge-set-equality anti-join (count == 0), one scalar per round.

At convergence comp(v) = its star root (v itself for roots/isolated
vertices) — identical output to wcc(), verified against it in tests
and against a recursive-closure DuckDB twin in the driver harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph
from graphscope_spark.superstep import SuperstepRunner


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large- or small-star operation over a distinct canonical
    edge set. ``edges``: (src, dst) distinct, no self-loops."""
    # symmetric pair list (u, v): each undirected edge in both
    # directions — the per-u neighborhood view.
    pairs = edges.select(
        F.col(SRC).alias("u"), F.col(DST).alias("v")
    ).unionAll(edges.select(F.col(DST).alias("u"), F.col(SRC).alias("v")))
    # m(u) = min(Γ(u) ∪ {u}) — one map-side-combined hash agg.
    mins = pairs.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    joined = pairs.join(mins, "u")
    if large:
        # (v, m) for every strictly-larger neighbor of u.
        out = joined.where(F.col("v") > F.col("u")).select(
            F.col("v").alias(SRC), F.col("m").alias(DST)
        )
    else:
        # (v, m) for every smaller neighbor of u, plus (u, m).
        smaller = joined.where(F.col("v") < F.col("u")).select(
            F.col("v").alias(SRC), F.col("m").alias(DST)
        )
        self_edge = mins.select(
            F.col("u").alias(SRC), F.col("m").alias(DST)
        )
        out = smaller.unionAll(self_edge)
    # canonicalize (min, max) order, drop self-loops, dedup.
    return (
        out.where(F.col(SRC) != F.col(DST))
        .select(
            F.least(SRC, DST).alias("_a"), F.greatest(SRC, DST).alias("_b")
        )
        .distinct()
        .select(F.col("_b").alias(SRC), F.col("_a").alias(DST))
    )


def component_stats(labels: DataFrame) -> DataFrame:
    """Component size distribution from any (id, comp) labeling (wcc,
    cc_two_phase, scc): one row per distinct component SIZE with
    (size, n_components, n_vertices, frac_vertices) — the
    Broder-style giant-component report, aggregated over sizes so the
    result stays tiny at any graph scale (two hash aggs + one scalar
    broadcast; never a per-component materialization wider than the
    size histogram)."""
    cols = labels.columns
    lab = labels.select(F.col(cols[0]).alias(ID), F.col(cols[1]).alias("comp"))
    sizes = lab.groupBy("comp").agg(F.count("*").alias("size"))
    hist = sizes.groupBy("size").agg(F.count("*").alias("n_components"))
    total = lab.select(F.count("*").alias("_n"))
    return (
        hist.crossJoin(total)
        .select(
            "size",
            "n_components",
            (F.col("size") * F.col("n_components")).alias("n_vertices"),
            F.round(
                (F.col("size") * F.col("n_components")) / F.col("_n"), 6
            ).alias("frac_vertices"),
        )
    )


def cc_two_phase(
    graph: LinkGraph,
    max_iter: int = 50,
    fixed_rounds: int | None = None,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components via alternating large-star/small-star.

    Returns DataFrame(id long, comp long), comp = min id in the
    component — byte-identical to ``wcc()``'s converged output.

    A "round" here is one large-star followed by one small-star (the
    paper's alternating schedule). With ``fixed_rounds`` the loop runs
    exactly that many rounds with no convergence action (the
    driver-harness mode); otherwise it stops when the edge set is
    unchanged by a full round.
    """
    verts = graph.vertices.select(ID)
    init = (
        graph.edges.where(F.col(SRC) != F.col(DST))
        .select(
            F.least(SRC, DST).alias("_a"), F.greatest(SRC, DST).alias("_b")
        )
        .distinct()
        .select(F.col("_b").alias(SRC), F.col("_a").alias(DST))
    )

    # ONE star op per runner round (even = large, odd = small): the
    # runner localCheckpoints every round, so the large-star result is
    # materialized before the small-star references it — chaining both
    # ops in one step would re-execute the large-star subtree at every
    # one of the small-star's 3 reads (measured 30 Exchanges/round vs
    # ~8 split, BENCH/PLANS.md round-5 section).
    def step(state: DataFrame, it: int) -> DataFrame:
        return _star_round(state, large=(it % 2 == 0))

    if fixed_rounds is not None:
        until = None
        max_rounds = 2 * fixed_rounds
    else:
        max_rounds = 2 * max_iter

        quiet = {"ops": 0}  # consecutive no-change star ops

        def until(new: DataFrame, old: DataFrame, it: int):
            # stop only when BOTH ops of an alternation are no-ops
            # (set equality: same cardinality and new ⊆ old).
            n_new = new.count()
            n_old = old.count()
            changed = (
                n_new != n_old
                or new.join(old, [SRC, DST], "left_anti").count() > 0
            )
            quiet["ops"] = 0 if changed else quiet["ops"] + 1
            return quiet["ops"] >= 2, {"edges": n_new}

    runner = SuperstepRunner(
        max_iter=max_rounds,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
    )
    result = runner.run(init, step, until)
    stars = result.state  # (src=child, dst=root) star edges
    # comp(v) = min incident root (the unique root at convergence;
    # min() also gives the right answer mid-stream for fixed_rounds
    # runs that already reached stars), else v itself.
    roots = stars.groupBy(F.col(SRC).alias(ID)).agg(
        F.min(DST).alias("_root")
    )
    return verts.join(roots, ID, "left").select(
        ID, F.coalesce("_root", F.col(ID)).alias("comp")
    )
