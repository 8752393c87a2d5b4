"""Distributed deterministic graph generators — RMAT (Chakrabarti,
Zhan, Faloutsos SDM'04; the Graph500 reference kernel's generator).

Why it's here: a 10^12-edge engine needs inputs at 10^12 edges to be
*benchmarkable*, and shipping data is the one thing you can't do —
the generator has to run WHERE the cluster is. RMAT is the standard:
recursively pick one of four adjacency-matrix quadrants with
probabilities (a, b, c, d) per bit-level, yielding the power-law,
community-structured edge distribution real web graphs show.

Scale shape: ONE `spark.range(m)` + one codegen projection — per
edge id, `scale` md5 draws folded into (src, dst) bit pairs with
`F.aggregate` over `F.sequence` (all JVM-side higher-order
functions). ZERO shuffles, ZERO Python, embarrassingly parallel,
restart-stable: edge i is a pure function of (seed, i), so any task
retry or different partitioning regenerates identical edges — the
property Graph500's skip-ahead PRNG buys, obtained here from keyed
hashing (the sampling.py md5-draw family; DuckDB replays it
bit-identically)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) DataFrame of 2^scale vertices and
    edge_factor·2^scale edges (Graph500 conventions; d = 1-a-b-c).
    Self-loops and duplicate edges are kept, as in the spec — wrap
    with ``LinkGraph.from_edges(...).build()`` to get the usual
    dedup/canonical layout downstream.

    Per edge e and bit level l: u_l = md5-draw('rmat|seed|e|l') in
    [0,1); quadrant thresholds fold one bit into src and one into
    dst. The whole generator is one whole-stage-codegen projection.
    """
    if scale < 1:
        raise ValueError("scale must be >= 1")
    if not (0 < a and 0 <= b and 0 <= c and a + b + c < 1):
        raise ValueError("need a>0, b,c>=0, a+b+c<1")
    m = edge_factor << scale
    rng = spark.range(m, numPartitions=num_partitions).select(
        F.col("id").alias("e")
    )
    ab = a + b
    abc = a + b + c
    # fold over levels: acc = struct(src, dst); one md5 draw per level
    draw = (
        "conv(substring(md5(concat_ws('|', 'rmat', "
        f"'{int(seed)}', cast(e as string), cast(l as string))), 1, 8), 16, 10)"
        f" / {_DENOM}"
    )
    fold = f"""
    aggregate(
      sequence(0, {scale - 1}),
      named_struct('s', 0L, 'd', 0L),
      (acc, l) -> named_struct(
        's', acc.s * 2L + CASE WHEN ({draw}) < {ab} THEN 0L ELSE 1L END,
        'd', acc.d * 2L + CASE
               WHEN ({draw}) < {a} THEN 0L
               WHEN ({draw}) < {ab} THEN 1L
               WHEN ({draw}) < {abc} THEN 0L
               ELSE 1L END)
    )"""
    return rng.select(
        F.expr(fold + ".s").alias("src"), F.expr(fold + ".d").alias("dst")
    )


def rmat_sql(
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 1,
) -> str:
    """DuckDB twin of rmat_edges: the same md5 draws unrolled as one
    chained projection per bit level (kept in lockstep with the Spark
    fold — same hash keys, same thresholds, same bit order)."""
    m = edge_factor << scale
    ab, abc = a + b, a + b + c
    ctes = [
        f"l0 AS MATERIALIZED (SELECT range AS e, 0::BIGINT AS s, 0::BIGINT AS d FROM range({m}))"
    ]
    for l in range(scale):
        draw = (
            f"(('0x' || substr(md5('rmat|{int(seed)}|' || e::VARCHAR || "
            f"'|{l}'), 1, 8))::BIGINT / {_DENOM})"
        )
        ctes.append(
            f"""l{l + 1} AS MATERIALIZED (
  SELECT e,
         s * 2 + CASE WHEN {draw} < {ab} THEN 0 ELSE 1 END AS s,
         d * 2 + CASE WHEN {draw} < {a} THEN 0
                      WHEN {draw} < {ab} THEN 1
                      WHEN {draw} < {abc} THEN 0
                      ELSE 1 END AS d
  FROM l{l})"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT s AS src, d AS dst FROM l{scale}"
    )
