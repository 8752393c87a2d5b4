"""Term-ranking operators over the documents table — TF-IDF top terms,
BM25 query scoring, inverted-index construction.

No reference counterpart (lixueclaire/GraphScope is a graph engine);
these are the corpus-ranking ops a web-text training pipeline needs
next to dedup/quality/lang-id (SURVEY §2.10's pipeline table), kept to
the same contract: pure Catalyst expressions, exact DuckDB SQL twins.

Tokenization here is `lower + split on non-alphanumeric runs`
(``[^a-z0-9]+``) with empties dropped — deliberately DIFFERENT from
text.py's whitespace `tokens()` (which preserves empty tokens to match
ANSI string_split): ranking wants terms, not whitespace fields. The
regex has identical semantics in Java regex (Spark codegen) and RE2
(DuckDB), so every operator has a bit-matching SQL twin.

Scale shape:
- terms() is a per-row codegen projection (zero shuffle);
- doc_term_freqs is one explode + one partial+final hash aggregate on
  (doc_id, term);
- document frequency is a second hash aggregate on term;
- corpus scalars (N, avgdl) ride a broadcast cross-join of a 1-row
  aggregate — no driver round-trip inside the plan;
- top-k per document is a window PARTITIONED by doc_id (never a global
  window), so each document's terms sort locally within its hash
  partition.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "terms",
    "doc_term_freqs",
    "tfidf_top_terms",
    "bm25_score",
    "inverted_index",
]

_TERM_SPLIT = "[^a-z0-9]+"


def terms(text: Column | str) -> Column:
    """array<string> of lowercase alphanumeric terms, empties dropped.
    DuckDB twin: ``list_filter(regexp_split_to_array(lower(t),
    '[^a-z0-9]+'), x -> x <> '')``."""
    arr = F.split(F.lower(text if isinstance(text, Column) else F.col(text)),
                  _TERM_SPLIT)
    return F.filter(arr, lambda t: t != F.lit(""))


def doc_term_freqs(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id_col, term, tf) — term frequency per document. One explode +
    one map-side-combined hash aggregate."""
    return (
        docs.select(F.col(id_col), F.explode(terms(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def _corpus_scalars(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """1-row (n_docs, avgdl) aggregate, for a broadcast cross-join."""
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(terms(text_col)).cast("double")).alias("avgdl"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF.

    score = tf * (ln((N + 1) / (df + 1)) + 1)   (sklearn-style smooth
    idf: never zero, never negative). Ties break by term ascending, so
    the selection is deterministic. Returns (id_col, term, tf, score)
    with score rounded to 6 dp.
    """
    dt = doc_term_freqs(docs, id_col, text_col)
    df_ = dt.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        dt.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.log((F.col("n_docs") + 1).cast("double")
                     / (F.col("df") + 1).cast("double")) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(k))
        .select(id_col, "term", "tf", F.round("score", 6).alias("score"),
                "rnk")
    )


def bm25_score(
    docs: DataFrame,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 of every matching document against a literal query.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)); per-term contribution
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)). Documents with no
    matching term are omitted (their score is 0). Returns
    (id_col, score) with score rounded to 6 dp.

    The query tokenizes with the same terms() rule, driver-side —
    query terms become literals folded into the scan filter.
    """
    q_terms = sorted({t for t in re.split(_TERM_SPLIT, query.lower()) if t})
    if not q_terms:
        raise ValueError("bm25_score: query has no terms")
    dt = doc_term_freqs(docs, id_col, text_col).where(
        F.col("term").isin(q_terms))
    df_ = dt.groupBy("term").agg(F.count("*").alias("df"))
    dl = docs.select(F.col(id_col),
                     F.size(terms(text_col)).cast("double").alias("dl"))
    scal = _corpus_scalars(docs, id_col, text_col)
    per_term = (
        dt.join(df_, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scal))
        .withColumn(
            "idf",
            F.log(F.lit(1.0)
                  + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                  / (F.col("df") + F.lit(0.5))),
        )
        .withColumn(
            "contrib",
            F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
            / (F.col("tf")
               + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        per_term.groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )


def inverted_index(
    docs: DataFrame,
    min_df: int = 1,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, df, postings) — sorted posting list per term, with a
    document-frequency band filter (min_df ≤ df ≤ max_df; max_df drops
    stop-word-like terms). One explode + distinct + hash aggregate on
    term.

    Scale note: with max_df set, the band is computed FIRST (a count
    aggregate) and the posting fold runs only over banded terms — a
    stop-word term at web scale would otherwise build a posting array
    spanning most of the corpus before being thrown away (executor OOM
    risk); the extra count pass shuffles only (term, doc_id) pairs and
    AQE reuses the exchange."""
    postings = (
        docs.select(F.col(id_col), F.explode(terms(text_col)).alias("term"))
        .select("term", id_col).distinct()
    )
    if max_df is not None:
        band = (
            postings.groupBy("term").agg(F.count("*").alias("df"))
            .where((F.col("df") >= int(min_df))
                   & (F.col("df") <= int(max_df)))
        )
        return (
            postings.join(band, "term")
            .groupBy("term", "df")
            .agg(F.sort_array(F.collect_list(id_col)).alias("postings"))
            .select("term", "df", "postings")
        )
    return (
        postings.groupBy("term")
        .agg(F.count("*").alias("df"),
             F.sort_array(F.collect_list(id_col)).alias("postings"))
        .where(F.col("df") >= int(min_df))
    )
