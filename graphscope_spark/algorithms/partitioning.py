"""Partition-quality metrics — how good is a vertex→partition
assignment for a distributed graph job?

The reference hash-partitions vertices across fragments
(vineyard::HashPartitioner, arrow_fragment_loader.h:65) and every
superstep's network cost is governed by three classic quantities this
report computes (Karypis/Kumar METIS metrics; PowerGraph's
replication factor):

- edge_cut_frac: fraction of edges whose endpoints land on different
  partitions — each is one remote message per superstep;
- balance: max partition vertex-load / mean load — the straggler
  factor (BSP rounds finish at the slowest fragment);
- ghost_vertices: Σ_v |{p(u) : u ∈ out-nbrs(v)} \\ {p(v)}| — the
  number of (vertex, remote-partition) mirror pairs, i.e. the size of
  the combiner-deduped message surface (what map-side combine
  actually ships after merging per-destination-partition).

Use it to compare the default hash layout against a degree-aware or
community-aware assignment BEFORE paying for a re-partition of a
10^12-edge table.

Plan: two co-partitioned joins of edges against the assignment (src
then dst) + three hash aggregates; the per-(v, part) dedup is a
distinct on (src, dst_part) — map-side combinable, never a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph


def partition_quality(
    graph: LinkGraph,
    num_parts: int | None = None,
    assign: DataFrame | None = None,
) -> DataFrame:
    """One-row report (num_parts, num_edges, cut_edges, edge_cut_frac,
    balance, ghost_vertices) for an assignment.

    ``assign``: (id, part) DataFrame; default is the modulo layout
    part = id % num_parts (the portable stand-in for the hash
    partitioner — same shape, oracle-reproducible).
    """
    if assign is None:
        if not num_parts or num_parts <= 0:
            raise ValueError("need num_parts or an assign DataFrame")
        assign = graph.vertices.select(
            ID, F.pmod(ID, F.lit(int(num_parts))).alias("part")
        )
    else:
        cols = assign.columns
        assign = assign.select(
            F.col(cols[0]).cast("long").alias(ID),
            F.col(cols[1]).cast("long").alias("part"),
        )

    parts = assign.select("part").distinct()
    edges = graph.edges.select(SRC, DST)
    tagged = (
        edges.join(
            assign.select(F.col(ID).alias(SRC), F.col("part").alias("sp")),
            SRC,
        )
        .join(
            assign.select(F.col(ID).alias(DST), F.col("part").alias("dp")),
            DST,
        )
    )
    cut = tagged.agg(
        F.count("*").alias("num_edges"),
        F.sum((F.col("sp") != F.col("dp")).cast("long")).alias("cut_edges"),
    )
    loads = assign.groupBy("part").agg(F.count("*").alias("load"))
    bal = loads.agg(
        (F.max("load") / F.avg("load")).alias("balance")
    )
    ghosts = (
        tagged.where(F.col("sp") != F.col("dp"))
        .select(SRC, "dp")
        .distinct()
        .agg(F.count("*").alias("ghost_vertices"))
    )
    np_df = parts.agg(F.count("*").alias("num_parts"))
    return (
        np_df.crossJoin(cut)
        .crossJoin(bal)
        .crossJoin(ghosts)
        .select(
            "num_parts",
            "num_edges",
            F.coalesce("cut_edges", F.lit(0)).alias("cut_edges"),
            F.round(
                F.when(F.col("num_edges") > 0,
                       F.col("cut_edges") / F.col("num_edges"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("edge_cut_frac"),
            F.round("balance", 6).alias("balance"),
            "ghost_vertices",
        )
    )
