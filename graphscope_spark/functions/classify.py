"""Hashed-bag-of-words linear classifier scoring — the fastText-style
quality/domain filter stage of a web-text pipeline (Joulin et al.,
"Bag of Tricks for Efficient Text Classification"; CCNet and most
LLM-corpus pipelines run exactly this shape as the learned filter).
Training happens offline; the engine-side operator is SCORING a corpus
against a weights table, which is what has to scale.

Features: each token hashes to one of ``n_buckets`` via the repo's
engine-portable md5 60-bit rule (15 hex chars -> BIGINT, mod buckets —
identical arithmetic in Spark and DuckDB, no float hazard). A document
scores sigmoid(mean_t w[bucket(t)] + bias): the mean-of-weights form is
fastText's average-pooled linear layer for a binary head.

Scale shape: tokenize + hash is one codegen projection; the features
explode once; the weights join is broadcast by default (a hashed
linear model is n_buckets rows — millions at most, megabytes as a
(long, double) table) with a shuffle-join fallback for giant vocab
tables; then one hash aggregate back on doc_id. Unseen buckets score
0.0 (a zero-initialized weight slot, fastText's convention), so the
left join never drops a token.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.functions.ranking import terms

__all__ = ["token_buckets", "hashed_features", "linear_classifier_score"]


def token_buckets(text: Column | str, n_buckets: int) -> Column:
    """array<long> of hashed token buckets (order-preserving, one per
    token). DuckDB twin per element:
    ``('0x' || substr(md5(t), 1, 15))::BIGINT % n_buckets``."""
    return F.transform(
        terms(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
        .cast("long") % F.lit(int(n_buckets)),
    )


def hashed_features(docs: DataFrame, n_buckets: int = 1 << 18,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id_col, bucket, tf) hashed bag-of-words counts. One explode +
    one map-side-combined hash aggregate."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(token_buckets(text_col, n_buckets)).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("tf"))
    )


def linear_classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 1 << 18,
    bias: float = 0.0,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_weights: bool = True,
) -> DataFrame:
    """(id_col, n_tokens, score, prob, label): score = mean token
    weight + bias, prob = sigmoid(score), label = prob >= threshold.
    ``weights`` is a (bucket long, w double) table; buckets absent from
    it contribute weight 0. Token-less documents (empty/NULL text)
    score exactly ``bias``."""
    w = weights.select(F.col("bucket").cast("long").alias("bucket"),
                       F.col("w").cast("double").alias("w"))
    if broadcast_weights:
        w = F.broadcast(w)
    toks = docs.select(
        F.col(id_col),
        F.explode_outer(token_buckets(text_col, n_buckets)).alias("bucket"),
    )
    per_doc = (
        toks.join(w, "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_tokens"),
            F.coalesce(F.sum("w"), F.lit(0.0)).alias("sw"),
        )
    )
    score = (
        F.when(F.col("n_tokens") > 0, F.col("sw") / F.col("n_tokens"))
        .otherwise(F.lit(0.0)) + F.lit(float(bias))
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        score.alias("score"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-score))).alias("prob"),
    ).withColumn("label", (F.col("prob") >= float(threshold)).cast("boolean"))
