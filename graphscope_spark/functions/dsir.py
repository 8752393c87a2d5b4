"""DSIR-style importance resampling for pretraining-data selection
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — the hashed-n-gram variant the paper runs
at Pile scale). Given a RAW crawl corpus and a small TARGET corpus
(the domain you want more of), estimate bag-of-hashed-n-grams models
p_target and p_raw, weight every raw document by

    log w(d) = sum_b tf_b(d) * (log p_target(b) - log p_raw(b))

and resample with Gumbel-top-k on the log weights — the
without-replacement sampler the paper uses, made restart-stable here
by drawing the Gumbel noise from the repo's md5 uniform draw instead
of an RNG.

Features are unigram+bigram token buckets under the repo's
engine-portable md5 60-bit rule (identical arithmetic in Spark and
DuckDB — see functions/classify.py); both corpus models are
Laplace-smoothed over the SAME bucket space so unseen buckets stay
finite on either side.

Scale shape (the part that must survive 100 TB):
- each corpus model is ONE explode + one map-side-combined hash
  aggregate, capped at n_buckets rows (2^18 default) — megabytes, so
  the per-bucket log-ratio table rides a broadcast join no matter how
  big the corpora are;
- model totals ride broadcast 1-row aggregates (never a collect in
  the plan, no driver round-trip before the action);
- per-doc scoring is one explode + broadcast join + one hash
  aggregate back on doc_id;
- selection is Gumbel-key top-k = orderBy+limit, which Spark plans as
  TakeOrderedAndProject (per-partition heaps + a k-row driver merge),
  never a global sort.

No reference counterpart (the reference is a graph engine); this is
part of the graft's training-data-pipeline surface (SURVEY §2.10+)
next to the CCNet/Gopher/fastText stages it composes with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.functions.ranking import terms
from graphscope_spark.functions.sampling import uniform_draw

__all__ = [
    "ngram_buckets",
    "corpus_bucket_counts",
    "dsir_log_weights",
    "dsir_resample",
]


def ngram_buckets(text: Column | str, n_buckets: int) -> Column:
    """array<long> of hashed unigram + bigram buckets (bigram feature
    string is ``a || ' ' || b`` over adjacent tokens). DuckDB twin per
    doc, with t = the shared tokenizer array:

        list_transform(t, x -> bucket(x)) ||
        list_transform(range(1, len(t)), i -> bucket(t[i] || ' ' || t[i+1]))
    """
    def _bucket(s: Column) -> Column:
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % F.lit(
            int(n_buckets)
        )

    # NULL text ⇒ empty feature list (not NULL), matching the tokenizer
    # convention everywhere else in the pipeline
    tcol = text if isinstance(text, Column) else F.col(text)
    toks = terms(F.coalesce(tcol, F.lit("")))
    unis = F.transform(toks, _bucket)
    # zip adjacent tokens; slice(length) must be non-negative, so gate
    # the <2-token case to an empty bigram list
    bis = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: _bucket(F.concat(a, F.lit(" "), b)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return F.concat(unis, bis)


def corpus_bucket_counts(
    docs: DataFrame,
    n_buckets: int = 1 << 18,
    text_col: str = "text",
) -> DataFrame:
    """(bucket, cnt) hashed-n-gram counts over a corpus — the
    sufficient statistics of its bag-of-n-grams model. One explode +
    one map-side-combined hash aggregate; output ≤ n_buckets rows."""
    return (
        docs.select(F.explode(ngram_buckets(text_col, n_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _log_ratio_table(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int,
    alpha: float,
) -> DataFrame:
    """Per-bucket (bucket, lr) with lr = log p_target(b) - log p_raw(b),
    Laplace-smoothed: p(b) = (cnt_b + alpha) / (total + alpha*B).
    Totals ride broadcast 1-row aggregates. Buckets never seen by
    EITHER corpus are absent — but such a bucket cannot occur in a raw
    document being scored (raw docs' buckets are in raw_counts by
    construction when the model comes from the same corpus); callers
    scoring against a foreign raw model get the smoothed floor via the
    left-join coalesce in dsir_log_weights."""
    b = float(int(n_buckets))
    a = float(alpha)
    t = target_counts.select("bucket", F.col("cnt").alias("ct"))
    r = raw_counts.select("bucket", F.col("cnt").alias("cr"))
    tot_t = F.broadcast(t.agg(F.sum("ct").alias("tt")))
    tot_r = F.broadcast(r.agg(F.sum("cr").alias("tr")))
    merged = (
        t.join(r, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).cast("double").alias("ct"),
            F.coalesce("cr", F.lit(0)).cast("double").alias("cr"),
        )
        .crossJoin(tot_t)
        .crossJoin(tot_r)
    )
    lr = (
        F.log(F.col("ct") + F.lit(a))
        - F.log(F.col("tt").cast("double") + F.lit(a * b))
        - F.log(F.col("cr") + F.lit(a))
        + F.log(F.col("tr").cast("double") + F.lit(a * b))
    )
    return merged.select("bucket", lr.alias("lr"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 1 << 18,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_feats, logw) per RAW document: logw = Σ_features
    (log p_target(bucket) - log p_raw(bucket)), the hashed-n-gram DSIR
    importance log-weight. Feature-less documents (empty/NULL text)
    get logw = 0.0, n_feats = 0.

    The two models are estimated from `target` and `raw` themselves
    (the paper's setting). The per-bucket log-ratio table is ≤
    n_buckets rows; it is materialized ONCE here (eager local
    checkpoint — without it Spark re-derives the model subtrees in
    every branch that references them, re-scanning the corpora ~5×)
    and then broadcast, so each corpus is scanned exactly once for its
    model plus once more (raw) for scoring."""
    from graphscope_spark.superstep import _CKPT_LEVEL

    lrt = _log_ratio_table(
        corpus_bucket_counts(target, n_buckets, text_col),
        corpus_bucket_counts(raw, n_buckets, text_col),
        n_buckets,
        alpha,
    ).localCheckpoint(eager=True, storageLevel=_CKPT_LEVEL)
    lrt = F.broadcast(lrt)
    feats = raw.select(
        F.col(id_col),
        F.explode_outer(ngram_buckets(text_col, n_buckets)).alias("bucket"),
    )
    return (
        feats.join(lrt, "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_feats"),
            F.coalesce(F.sum("lr"), F.lit(0.0)).alias("logw"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    n_keep: int,
    n_buckets: int = 1 << 18,
    alpha: float = 1.0,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gumbel-top-k selection of `n_keep` raw documents ∝ exp(logw)
    without replacement (Xie et al. §2.2): key = logw + g, g =
    -ln(-ln(u)), u = deterministic md5 uniform per doc id (restart-
    stable, parallelism-independent — no RNG). Returns (id_col,
    n_feats, logw, key) for the kept docs, highest key first.

    orderBy+limit plans as TakeOrderedAndProject: per-partition
    heaps + one n_keep-row merge on the driver — never a full sort."""
    scored = dsir_log_weights(raw, target, n_buckets, alpha, id_col, text_col)
    # clamp u away from 0 so -ln(-ln(u)) stays finite (md5 draw can
    # produce exactly 0 once in 2^32 ids)
    u = F.greatest(uniform_draw(F.col(id_col), seed), F.lit(1e-12))
    key = F.col("logw") + (-F.log(-F.log(u)))
    return (
        scored.withColumn("key", key)
        .orderBy(F.col("key").desc(), F.col(id_col))
        .limit(int(n_keep))
    )
