"""TrustRank and spam mass — link-spam estimation over the web graph.

Public-literature semantics (no reference counterpart — GraphScope's
builtin registry stops at plain/personalized PageRank; these are the
standard link-spam operators a Common-Crawl-scale ranking pipeline
runs next to it):

- TrustRank (Gyongyi, Garcia-Molina, Pedersen, VLDB'04 "Combating Web
  Spam with TrustRank"): personalized PageRank whose reset vector is
  uniform over a small curated seed set of trusted pages/hosts —
  t = alpha * T * t + (1 - alpha) * d, d uniform over seeds.
- Spam mass (Gyongyi et al., "Link Spam Detection Based on Mass
  Estimation"): relative spam mass m(v) = (PR(v) - TR(v)) / PR(v) —
  the fraction of v's PageRank that does NOT flow from the trusted
  core. Near 1 for spam-boosted nodes, near (or below) 0 for nodes
  ranked by trusted links. PR(v) > 0 always ((1-alpha)/N floor), so
  the ratio is total.

Both reuse the PageRank superstep engine unchanged (one shuffle of E
per round, single-aggregate convergence/dangling round-trip, salting /
AQE skew handling — see pagerank.py's module docstring), so the scale
story is identical. Seeds are by contract a SMALL curated set: the
reset vector rides a broadcast join; the only extra cost of spam_mass
over two pageranks is one co-partitioned id-equi-join of the two rank
vectors. Dangling mass redistributes onto the seed vector (d = p),
matching NetworkX's personalized-PageRank default; the TrustRank paper
leaves dangling handling unspecified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import ID, LinkGraph
from graphscope_spark.algorithms.pagerank import pagerank


def _seed_df(graph: LinkGraph, seeds) -> DataFrame:
    if isinstance(seeds, DataFrame):
        return seeds
    spark = graph.vertices.sparkSession
    return spark.createDataFrame([(int(s),) for s in seeds], "id long")


def trustrank(
    graph: LinkGraph,
    seeds,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-06,
    fixed_rounds: int | None = None,
    salt_mod: int = 1,
    info_out: dict | None = None,
) -> DataFrame:
    """DataFrame(id long, trust double): personalized PageRank with the
    reset vector uniform over ``seeds`` (a list[int] or a DataFrame
    whose first column is the vertex id). Vertices unreachable from the
    seed set score exactly 0."""
    p = _seed_df(graph, seeds)
    out = pagerank(
        graph,
        alpha=alpha,
        max_iter=max_iter,
        tol=tol,
        fixed_rounds=fixed_rounds,
        salt_mod=salt_mod,
        info_out=info_out,
        personalization=p,
    )
    return out.select(ID, F.col("rank").alias("trust"))


def spam_mass(
    graph: LinkGraph,
    seeds,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-06,
    fixed_rounds: int | None = None,
    salt_mod: int = 1,
) -> DataFrame:
    """DataFrame(id, rank, trust, spam_mass): uniform PageRank, seeded
    TrustRank, and relative spam mass (PR - TR)/PR per vertex. Negative
    values mean the node holds MORE trust than rank (inside/near the
    trusted core) — kept as-is per the paper; callers threshold."""
    pr = pagerank(
        graph,
        alpha=alpha,
        max_iter=max_iter,
        tol=tol,
        fixed_rounds=fixed_rounds,
        salt_mod=salt_mod,
    )
    tr = trustrank(
        graph,
        seeds,
        alpha=alpha,
        max_iter=max_iter,
        tol=tol,
        fixed_rounds=fixed_rounds,
        salt_mod=salt_mod,
    )
    return pr.join(tr, ID).select(
        ID,
        "rank",
        "trust",
        ((F.col("rank") - F.col("trust")) / F.col("rank")).alias("spam_mass"),
    )
