"""Co-citation and bibliographic-coupling similarity — the classic
"related pages" signals (Small '73; Kessler '63; applied to the web by
Dean & Henzinger, WWW'99 "Finding related pages in the World Wide
Web"). No reference counterpart; these are the link-based
related-entity operators a web corpus runs next to SALSA/HITS.

co-citation(u, v)        = |In(u) ∩ In(v)|   (pages cited together)
bibliographic_coupling   = |Out(u) ∩ Out(v)| (pages citing the same)
each normalized two ways: cosine = c/sqrt(d(u)·d(v)) and
jaccard = c/(d(u)+d(v)-c) over the matching degree.

Plan: ONE self-join of the edge table on the shared endpoint (src for
co-citation, dst for coupling) with u < v, hash-aggregated per pair,
then two broadcast-size degree joins. The self-join fans out
quadratically in the shared endpoint's degree — the standard hub
hazard — so ``max_fanout`` drops shared endpoints above a degree cap
BEFORE pairing (hubs contribute near-zero discriminative signal and
O(d²) pairs; same bounding argument as LSH candidate caps in
similarity.py). The cap is OFF by default and the driver query runs
uncapped; at 100 TB you set it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, LinkGraph


def _pair_sim(edges: DataFrame, join_col: str, other_col: str,
              min_common: int, max_fanout: int | None) -> DataFrame:
    if max_fanout is not None:
        keep = (
            edges.groupBy(join_col).agg(F.count("*").alias("__f"))
            .where(F.col("__f") <= int(max_fanout))
            .select(join_col)
        )
        edges = edges.join(keep, join_col, "leftsemi")
    deg = edges.groupBy(F.col(other_col).alias("u")).agg(
        F.count("*").cast("double").alias("du")
    )
    a = edges.select(F.col(join_col).alias("k"), F.col(other_col).alias("u"))
    b = edges.select(F.col(join_col).alias("k"), F.col(other_col).alias("v"))
    pairs = (
        a.join(b, "k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("common"))
        .where(F.col("common") >= int(min_common))
    )
    return (
        pairs.join(deg, "u")
        .join(deg.select(F.col("u").alias("v"), F.col("du").alias("dv")), "v")
        .select(
            "u", "v", "common",
            (F.col("common") / F.sqrt(F.col("du") * F.col("dv"))).alias("cosine"),
            (
                F.col("common")
                / (F.col("du") + F.col("dv") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def cocitation(graph: LinkGraph, min_common: int = 1,
               max_fanout: int | None = None) -> DataFrame:
    """(u, v, common, cosine, jaccard) for u < v sharing >= min_common
    in-neighbors; degrees are in-degrees."""
    edges = graph.edges.select(SRC, DST).distinct()
    return _pair_sim(edges, SRC, DST, min_common, max_fanout)


def bibliographic_coupling(graph: LinkGraph, min_common: int = 1,
                           max_fanout: int | None = None) -> DataFrame:
    """(u, v, common, cosine, jaccard) for u < v sharing >= min_common
    out-neighbors; degrees are out-degrees."""
    edges = graph.edges.select(SRC, DST).distinct()
    return _pair_sim(edges, DST, SRC, min_common, max_fanout)
