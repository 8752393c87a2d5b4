"""Text analysis over document tables (SURVEY.md graft additions):
token counting, quality scoring, language-ID heuristic, fingerprinting.

Everything here is built-in-expression only (no Python in the row
path): tokenization is `split(text, ' ')`, ratios are length
arithmetic, the language heuristic is a stopword-lexicon join. At
100 TB these all compile to whole-stage-codegen scans with no shuffle
except the lexicon join (broadcast) and explicit groupBys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lexicon for the n-gram/stopword heuristic.
LANG_LEXICON: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "para"],
}

STOPWORDS_EN = LANG_LEXICON["en"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization — single space, matching ANSI
    string_split semantics (empty tokens preserved) so SQL oracles
    reproduce it exactly."""
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token statistics: n_tokens, n_chars, avg_token_len."""
    t = tokens(text_col)
    return docs.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(
            (F.length(text_col) - F.size(t) + 1) / F.size(t), 6
        ).alias("avg_token_len"),
    )


def quality_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document quality: length, alpha ratio, stopword ratio,
    and a combined [0,1] score (C4/Gopher-style length+symbol filters).
    """
    length = F.length(text_col).cast("double")
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z ]", "")).cast("double")
    tok = tokens(text_col)
    stop_hits = F.size(
        F.filter(tok, lambda w: w.isin(STOPWORDS_EN))
    ).cast("double")
    n_tok = F.size(tok).cast("double")
    alpha_ratio = F.when(length > 0, alpha / length).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round((alpha_ratio + stop_ratio + len_ok) / 3.0, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-lexicon language ID: explode tokens, join the (token →
    lang) lexicon (broadcast), argmax hit count per doc; 'und' when no
    lexicon token appears. Deterministic ties: smallest lang code."""
    spark = docs.sparkSession
    lex_rows = [(w, lang) for lang, ws in LANG_LEXICON.items() for w in ws]
    lex = spark.createDataFrame(lex_rows, "tok string, cand string")
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    hits = (
        tok.join(F.broadcast(lex), "tok")
        .groupBy(id_col, "cand")
        .agg(F.count("*").alias("hits"))
    )
    # argmax hits with smallest-lang tie-break = min over (−hits, cand).
    best = hits.groupBy(id_col).agg(
        F.min(F.struct((-F.col("hits")).alias("neg"), F.col("cand").alias("c"))).alias("m")
    ).select(F.col(id_col), F.col("m.c").alias("predicted_lang"))
    return docs.select(id_col).join(best, id_col, "left").select(
        F.col(id_col), F.coalesce("predicted_lang", F.lit("und")).alias("predicted_lang")
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 of the text plus shape
    stats — the join key for cross-snapshot dedup at scale."""
    return docs.select(
        F.col(id_col),
        F.md5(text_col).alias("fp"),
        F.length(text_col).cast("long").alias("n_chars"),
        token_count(text_col).alias("n_tokens"),
    )
