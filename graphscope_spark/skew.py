"""Skew handling for power-law web graphs (SURVEY.md §4.2.1).

On a Common-Crawl-shaped link graph a few mega-hubs receive a large
fraction of all edges. Two distinct skew problems, two tools:

1. **groupBy-aggregate on dst** — Spark's hash aggregate already does a
   map-side partial pass (one row per distinct key per partition reaches
   the shuffle), so a *sum/min/count* over a hub key is naturally
   combined. The explicit two-stage salted aggregate below is for the
   cases where the per-key state is wide (collect_list, large structs)
   or the number of map partitions is huge (final reducer receives
   O(num_partitions) rows per hub — salting caps it at O(S)).

2. **join edges ⋈ state ON src** — a hub src key puts all its edges in
   one join partition. AQE skew-join splitting
   (spark.sql.adaptive.skewJoin.enabled, on in session.py) splits those
   at runtime; `salted_join_sum` is the static fallback that salts the
   *state* side S ways so each hub's edges spread over S partitions.

The reference has no analogue — its hub traffic is absorbed by
per-thread message channels + MPI all-to-all (ParallelAppBase,
pagerank_networkx.h:60-66); salting is the shuffle-native equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key: str,
    value: Column | str,
    salt_mod: int = 16,
    out: str = "sum_value",
) -> DataFrame:
    """Two-stage sum: groupBy(key, salt) partial → groupBy(key) final.

    Salt = hash of ALL the row's columns (deterministic per ROW
    CONTENT, so a recomputed/retried partition re-salts identically — a
    monotonically_increasing_id or rand salt would not, and a mid-agg
    retry could then double-count rows under a different salt).
    Hashing every column rather than just (value, key) matters for the
    typical skewed workload — unit weights / count-style sums, where
    the value is CONSTANT per key and a (value, key) salt would drop
    every hub row into one bucket, no-oping the spread. Rows that are
    bit-identical across all columns still share a bucket: no
    deterministic function can separate indistinguishable rows.
    """
    value_col = F.col(value) if isinstance(value, str) else value
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns], value_col),
        F.lit(salt_mod),
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.sum(value_col).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias(out))


def salted_join_sum(
    edges: DataFrame,
    state: DataFrame,
    edge_key: str,
    state_key: str,
    value: Column,
    group_key: str,
    salt_mod: int = 8,
    out: str = "sum_value",
) -> DataFrame:
    """edges ⋈ state on (edge_key = state_key) followed by
    groupBy(group_key).sum(value), with the state side replicated
    ``salt_mod`` ways and the edge side salted by a row hash — a static
    skew-join split for hub keys.

    Use when AQE is unavailable/insufficient; otherwise prefer the plain
    join (AQE splits skewed partitions at runtime with no replication
    cost).
    """
    salted_state = state.crossJoin(
        state.sparkSession.range(salt_mod).select(F.col("id").alias("__salt"))
    )
    salted_edges = edges.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(group_key)), F.lit(salt_mod))
    )
    joined = salted_edges.join(
        salted_state,
        (salted_edges[edge_key] == salted_state[state_key])
        & (salted_edges["__salt"] == salted_state["__salt"]),
    )
    return joined.groupBy(salted_edges[group_key].alias(group_key)).agg(
        F.sum(value).alias(out)
    )


def degree_histogram(edges: DataFrame, key: str = "dst", buckets: int = 20) -> list[dict]:
    """log2-bucketed in/out-degree histogram — computed once at graph
    build to pick salt factors (SURVEY.md §4.2.1)."""
    deg = edges.groupBy(key).agg(F.count("*").alias("degree"))
    hist = (
        deg.select(
            F.least(
                F.floor(F.log2(F.col("degree").cast("double"))), F.lit(buckets - 1)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("num_keys"))
        .orderBy("bucket")
    )
    return [r.asDict() for r in hist.collect()]


def pick_salt_mod(edges: DataFrame, key: str = "dst", target_per_reducer: int = 2_000_000) -> int:
    """Salt factor from the max degree: ceil(max_degree / target), capped
    at 64, 1 when no hub exceeds the target (no extra stage needed)."""
    row = edges.groupBy(key).agg(F.count("*").alias("d")).agg(F.max("d").alias("m")).collect()[0]
    max_deg = int(row["m"] or 0)
    if max_deg <= target_per_reducer:
        return 1
    return min(64, -(-max_deg // target_per_reducer))
