"""Deterministic Lloyd k-means over an embedding column — the
clustering primitive behind semantic dedup / diversity curation of
training corpora (e.g. SemDeDup-style cluster-then-prune) and the
IVF coarse quantizer in similarity.py.

Determinism contract (what makes it oracle-checkable and
restart-stable, same philosophy as sampling.py's md5 draws):
- init centroids = the vectors of the k SMALLEST ids (no RNG);
- assignment argmin over (round(dist², 6), centroid_id) — rounding
  before the argmin makes the comparison engine-portable (raw float
  sums differ in the last ulp between engines), ids break ties;
- fixed iteration count (`iters`), no convergence float test.

Scale shape per iteration:
- ASSIGN: centroids are k rows — a broadcast cross join; the squared
  distance folds into one higher-order-function projection
  (zip_with + aggregate, whole-stage codegen, no Python); argmin via
  min(struct(dist, cid)) — one hash aggregate by id... in fact a
  plain projection since each row meets each centroid exactly once
  and min(struct) groups by the row id.
- UPDATE: element-wise mean via posexplode to (cid, dim, value) +
  one hash aggregate on (cid, dim) + re-assembly with sort_array
  (collect_list of (dim, avg) structs per cid) — rows × dim explode,
  the standard SQL k-means trade; k·dim result rows are tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmeans_assign", "semantic_dedup"]


def _dist2(vec, cen):
    return F.aggregate(
        F.zip_with(vec, cen, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(embs: DataFrame, cents: DataFrame, id_col: str,
            vec_col: str) -> DataFrame:
    """(id_col, cluster, dist2) — nearest centroid per vector."""
    joined = embs.crossJoin(F.broadcast(cents))
    d = F.round(_dist2(F.col(vec_col), F.col("__cvec")), 6)
    return (
        joined.select(
            id_col,
            F.struct(d.alias("d"), F.col("__cid").alias("c")).alias("s"),
        )
        .groupBy(id_col)
        .agg(F.min("s").alias("m"))
        .select(id_col, F.col("m.c").alias("cluster"),
                F.col("m.d").alias("dist2"))
    )


def kmeans_assign(
    embeddings: DataFrame,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, cluster, dist2): Lloyd assignment after `iters`
    update rounds from the k-smallest-id init. `cluster` is the index
    (0-based) of the centroid in smallest-id init order. Empty
    clusters keep their previous centroid (no re-seeding — determinism
    over quality, documented)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    embs = embeddings.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    )
    # unpartitioned window is fine here: it runs AFTER limit(k), over
    # exactly k rows (Spark still logs its single-partition warning)
    w = Window.orderBy(id_col)
    cents = (
        embs.orderBy(id_col).limit(int(k))
        .withColumn("__cid", F.row_number().over(w) - 1)
        .select("__cid", F.col(vec_col).alias("__cvec"))
    )
    cents = cents.cache()
    cents.count()
    for _ in range(int(iters)):
        assign = _assign(embs, cents, id_col, vec_col)
        exploded = (
            embs.join(assign, id_col)
            .select("cluster", F.posexplode(vec_col).alias("dim", "val"))
        )
        means = (
            exploded.groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("sm")
            )
            .select(
                F.col("cluster").alias("__cid"),
                F.transform("sm", lambda s: s["m"]).alias("__cvec"),
            )
        )
        # empty clusters keep their previous centroid
        new_cents = cents.select("__cid").join(means, "__cid", "left") \
            .join(cents.select("__cid", F.col("__cvec").alias("__old")),
                  "__cid") \
            .select("__cid", F.coalesce("__cvec", "__old").alias("__cvec"))
        new_cents = new_cents.cache()
        new_cents.count()
        cents.unpersist()
        cents = new_cents
    out = _assign(embs, cents, id_col, vec_col)
    cents.unpersist()
    return out


def semantic_dedup(
    embeddings: DataFrame,
    k: int,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023: "SemDeDup — data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embeddings, then prune near-duplicates WITHIN clusters only — the
    move that turns all-pairs O(n²) cosine dedup into per-cluster
    quadratic work bounded by cluster size.

    Keep rule (deterministic keep-first): drop u iff some SMALLER-id v
    in u's cluster has cosine(u, v) >= threshold. Returns
    (id_col, cluster, max_sim_smaller, keep) — max_sim_smaller is -1.0
    for the smallest id of each cluster (nothing to compare against).

    Plan: kmeans_assign's plan, then ONE self-join of the assignment
    keyed by cluster (co-partitioned; the quadratic blowup is bounded
    by the largest cluster — choose k to cap it), the cosine folded
    into a codegen projection, one hash agg for the per-vector max.
    """
    embs = embeddings.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    )
    assign = kmeans_assign(embs, k=k, iters=iters,
                           id_col=id_col, vec_col=vec_col)
    withv = assign.join(embs, id_col).select(id_col, "cluster", vec_col)
    a = withv.select(
        F.col(id_col).alias("__u"), "cluster", F.col(vec_col).alias("__va")
    )
    b = withv.select(
        F.col(id_col).alias("__v"), "cluster", F.col(vec_col).alias("__vb")
    )
    dot = F.aggregate(
        F.zip_with("__va", "__vb", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))
    sims = (
        a.join(b, "cluster")
        .where(F.col("__v") < F.col("__u"))
        .select(
            F.col("__u").alias(id_col),
            F.round(dot / (nrm("__va") * nrm("__vb")), 6).alias("cos"),
        )
        .groupBy(id_col)
        .agg(F.max("cos").alias("max_sim"))
    )
    return (
        assign.join(sims, id_col, "left")
        .select(
            id_col, "cluster",
            F.round(F.coalesce("max_sim", F.lit(-1.0)), 6)
            .alias("max_sim_smaller"),
            (F.coalesce("max_sim", F.lit(-1.0)) < float(threshold))
            .alias("keep"),
        )
    )
