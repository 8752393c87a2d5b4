"""N-gram language-model training and perplexity scoring — the
CCNet-style quality signal (Wenzek et al., LREC'20: score web text
with an LM trained on a trusted corpus; low perplexity ≈ fluent text)
re-expressed as pure DataFrame aggregates. No reference counterpart
(GraphScope is a graph engine); this completes the web-text pipeline
next to quality_score / corpus_filter (SURVEY §2.10's table).

Model: order-n word LM with add-one (Laplace) smoothing,
    logp(w | ctx) = ln((cnt(ctx, w) + 1) / (cnt(ctx) + V))
where V = |distinct predicted words in training| + 1 (one shared
UNK slot). Documents are padded with n-1 BOS markers and one EOS, so
a T-token document contributes exactly T+1 prediction events and the
probabilities normalize. Per-document perplexity = exp(-avg logp).

Tokenization is ranking.terms() (lower + split on non-alphanumeric
runs) — identical semantics in Java regex and RE2, so every stage has
a bit-matching DuckDB twin; integer columns (n_ngrams, n_oov, counts)
are engine-exact and floats are rounded at the query layer.

Scale shape (the 100 TB story):
- n-gram extraction is a per-row codegen projection + one explode
  (no shuffle until the aggregate);
- training is ONE partial+final hash aggregate on (ctx, w) — the
  map-side combine absorbs Zipf head n-grams before the shuffle;
- scoring shuffles the doc n-grams twice — once on (ctx, w) for the
  model join, once on ctx for the context-totals join (different key
  sets, so no exchange reuse; at sf-test scale AQE broadcasts both
  model sides and no shuffle survives — verified in BENCH/PLANS.md),
  then one hash aggregate back on doc_id;
- corpus scalars (V) ride a broadcast 1-row aggregate, never a
  driver round-trip inside the plan;
- `broadcast_lm=True` short-circuits both joins to broadcasts when
  the model is known-small (e.g. a char-level or pruned LM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.functions.ranking import terms

__all__ = ["doc_ngrams", "train_ngram_lm", "ngram_perplexity",
           "ccnet_buckets"]

BOS = "<s>"
EOS = "</s>"


def doc_ngrams(docs: DataFrame, n: int = 2, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id_col, ctx, w) — one row per prediction event: ctx is the
    space-joined (n-1)-token context, w the predicted token. Padded
    with n-1 BOS and one EOS, so empty/NULL text still yields the
    single event (ctx = BOS…, w = EOS) and no document drops out."""
    if n < 2:
        raise ValueError("n must be >= 2 (use token_stats for unigrams)")
    toks = terms(F.coalesce(F.col(text_col), F.lit("")))
    padded = F.concat(
        F.array(*[F.lit(BOS)] * (n - 1)), toks, F.array(F.lit(EOS))
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(padded) - F.lit(n - 1)),
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(padded, i, n - 1)).alias("ctx"),
            F.element_at(padded, (i + F.lit(n - 1)).cast("int")).alias("w"),
        ),
    )
    return (
        docs.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, F.col("g.ctx").alias("ctx"), F.col("g.w").alias("w"))
    )


def train_ngram_lm(docs: DataFrame, n: int = 2, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(ctx, w, cnt) n-gram counts — the model. One explode + one
    map-side-combined hash aggregate."""
    return (
        doc_ngrams(docs, n=n, id_col=id_col, text_col=text_col)
        .groupBy("ctx", "w")
        .agg(F.count("*").alias("cnt"))
    )


def ngram_perplexity(
    docs: DataFrame,
    lm: DataFrame | None = None,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = False,
) -> DataFrame:
    """Per-document LM score: (id_col, n_ngrams, n_oov, avg_logprob,
    ppl). ``lm`` is a (ctx, w, cnt) table from train_ngram_lm — held-out
    or external per CCNet; defaults to self-training on ``docs``.
    n_oov counts prediction events whose exact (ctx, w) n-gram is
    unseen in the model (each still scores via the smoothed
    probability, including fully-unseen contexts where cnt(ctx)=0)."""
    if lm is None:
        lm = train_ngram_lm(docs, n=n, id_col=id_col, text_col=text_col)
    ctx_tot = lm.groupBy("ctx").agg(F.sum("cnt").alias("ctx_cnt"))
    vocab = lm.select("w").distinct().agg(
        (F.count("*") + 1).cast("double").alias("v")
    )
    if broadcast_lm:
        lm, ctx_tot = F.broadcast(lm), F.broadcast(ctx_tot)
    grams = doc_ngrams(docs, n=n, id_col=id_col, text_col=text_col)
    scored = (
        grams.join(lm, ["ctx", "w"], "left")
        .join(ctx_tot, "ctx", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.col("cnt").isNull().cast("long").alias("oov"),
            F.log(
                (F.coalesce("cnt", F.lit(0)).cast("double") + 1.0)
                / (F.coalesce("ctx_cnt", F.lit(0)).cast("double") + F.col("v"))
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_ngrams"),
        F.sum("oov").alias("n_oov"),
        (F.sum("logp") / F.count("*")).alias("avg_logprob"),
    )
    return per_doc.select(
        id_col, "n_ngrams", "n_oov", "avg_logprob",
        F.exp(-F.col("avg_logprob")).alias("ppl"),
    )


def ccnet_buckets(
    docs: DataFrame,
    lm: DataFrame | None = None,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = False,
) -> DataFrame:
    """The CCNet head/middle/tail artifact (Wenzek et al. §4.4):
    language-ID each document, perplexity-score it, then split each
    language's documents into perplexity TERCILES — head = most fluent
    third. Returns (id_col, lang, ppl, bucket).

    Tercile assignment is rank-based (row_number over (ppl, id) within
    language; head iff 3·rn <= count, middle iff 3·rn <= 2·count) —
    exact integer arithmetic rather than approximate quantiles, so the
    split is deterministic, restart-stable, and engine-portable. ppl is
    rounded to 6 dp BEFORE ordering so the rank ordering itself is
    cross-engine stable (raw sums differ in the last ulp between
    engines; ties fall to id). Line-level dedup (CCNet's preceding
    stage) composes upstream via dedup.dedup_lines.

    Scale: lang-id is a broadcast lexicon join + argmax agg; scoring as
    in ngram_perplexity; the tercile window partitions by LANGUAGE —
    dozens of partitions each sorted locally, never a global sort.
    """
    from pyspark.sql import Window

    from graphscope_spark.functions.text import lang_id

    langs = lang_id(docs, text_col=text_col, id_col=id_col).select(
        id_col, F.col("predicted_lang").alias("lang")
    )
    ppl = ngram_perplexity(
        docs, lm=lm, n=n, id_col=id_col, text_col=text_col,
        broadcast_lm=broadcast_lm,
    ).select(id_col, F.round("ppl", 6).alias("ppl"))
    j = langs.join(ppl, id_col)
    w = Window.partitionBy("lang").orderBy("ppl", id_col)
    wc = Window.partitionBy("lang")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", F.count("*").over(wc))
        .select(
            id_col, "lang", "ppl",
            F.when(F.col("rn") * 3 <= F.col("cnt"), "head")
            .when(F.col("rn") * 3 <= 2 * F.col("cnt"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )
