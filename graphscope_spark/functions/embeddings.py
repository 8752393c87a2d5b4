"""Distributed PCA / whitening for embedding columns — the
preprocessing step in front of the similarity stack (SemDeDup and
embedding near-dup both behave better on decorrelated vectors; IVF
cells get rounder).

Two-phase, the classic shape for tall-skinny data (N rows >> d dims):

1. covariance: ONE pass computing the d·(d+1)/2 upper-triangle sums
   Σ v_i·v_j plus the d means — posexplode pair expansion into a
   map-side-combined hash aggregate. The shuffle carries only
   O(d² · partitions) partial sums, never N·d² rows; the d² blowup
   happens inside whole-stage codegen before the partial agg. (At
   very large d the same sums come from an Arrow mapInPandas einsum
   per partition; at embedding-table d — 64..4096 — the SQL form is
   exact, engine-portable, and DuckDB-twin-checkable, so it is the
   default here.)
2. eigendecomposition of the d×d matrix on the DRIVER (numpy eigh —
   d² scalars collected, the same cost class as pagerank's dangling
   aggregate), then projection/whitening as ONE codegen projection:
   proj_k(v) = Σ_i (v_i − mean_i)·U_ik, optionally scaled by
   λ_k^{-1/2}. Component sign is fixed deterministically (the
   largest-|loading| coordinate is made positive) so results are
   restart- and partitioning-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding", upper_only: bool = True
) -> DataFrame:
    """(i, j, cov) sample-covariance entries (population normalization
    1/n, matching numpy.cov(bias=True)); i, j are 0-based dims,
    upper triangle (i <= j) by default."""
    v = F.col(vec_col)
    pairs = (
        df.where(v.isNotNull())
        .select(
            F.posexplode(v).alias("i", "x"),
            v.alias("_v"),
        )
        .select(
            "i",
            F.col("x").cast("double").alias("x"),
            F.posexplode("_v").alias("j", "y"),
        )
    )
    if upper_only:
        pairs = pairs.where(F.col("i") <= F.col("j"))
    sums = pairs.groupBy("i", "j").agg(
        F.sum(F.col("x") * F.col("y").cast("double")).alias("sxy"),
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y").cast("double")).alias("sy"),
    )
    return sums.select(
        "i",
        "j",
        (
            F.col("sxy") / F.col("n")
            - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))
        ).alias("cov"),
    )


def _fit(df: DataFrame, vec_col: str, k: int, whiten: bool):
    import numpy as np

    rows = embedding_covariance(df, vec_col, upper_only=True).collect()
    if not rows:
        raise ValueError("no vectors to fit PCA on")
    d = max(r["j"] for r in rows) + 1
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    means = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    mean = np.zeros(d)
    for r in means:
        mean[r["i"]] = r["m"]
    w, u = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps, lams = [], []
    for idx in order:
        c = u[:, idx]
        # deterministic sign: largest-|loading| coordinate positive
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        if whiten:
            c = c / max(float(w[idx]), 1e-12) ** 0.5
        comps.append([float(x) for x in c])
        lams.append(float(w[idx]))
    return [float(m) for m in mean], comps, lams


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    whiten: bool = False,
    out: str = "proj",
) -> DataFrame:
    """Fit PCA on ``df[vec_col]`` and append ``out``: the
    array<double>(k) projection onto the top-k components (variance-
    descending; whitened to unit variance when ``whiten``). NULL
    vectors project to NULL."""
    mean, comps, _ = _fit(df, vec_col, k, whiten)
    v = F.col(vec_col)
    centered = F.zip_with(
        v, F.lit(mean), lambda x, m: x.cast("double") - m
    )
    proj = F.array(
        *[
            F.aggregate(
                F.zip_with(centered, F.lit(c), lambda x, u: x * u),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            for c in comps
        ]
    )
    return df.withColumn(
        out, F.when(v.isNotNull(), proj).otherwise(F.lit(None))
    )
