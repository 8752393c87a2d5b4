"""FineWeb-style end-to-end corpus filtering — the published pipeline
shape (Penedo et al. 2024: language filter → Gopher quality rules →
C4 cleaning → deduplication), composed from this package's
individually-oracled stages into ONE DataFrame job.

Per document the result carries every stage verdict (auditable
filtering — corpus builders keep the rejection reason distribution,
not just the survivors) plus the final ``keep`` and the C4-cleaned
text the kept docs would ship with.

Scale shape: the two rule stages are zero-shuffle codegen
projections fused into the scan; the stage joins are on the doc id
(co-partitioned); dedup adds ONE md5-keyed hash aggregate + one
join-back — the same plan as functions/dedup.exact_dedup. Nothing
here is new machinery; the value is the composition contract and its
composed DuckDB twin (the stages stay bit-compatible when chained).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.functions.text import c4_rules, gopher_rules


def fineweb_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    keep_langs: tuple = ("en",),
) -> DataFrame:
    """(id, lang_ok, gopher_keep, c4_keep, is_dup, keep, clean_text) —
    dedup is exact keep-first (min id) on the C4-cleaned text,
    computed only among docs that passed the three filters (FineWeb
    dedups survivors, and so must the oracle); ``is_dup`` marks a
    passing doc that lost its duplicate group."""
    c4 = c4_rules(docs, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.col("keep").alias("c4_keep"), "clean_text"
    )
    gop = gopher_rules(docs, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.col("keep").alias("gopher_keep")
    )
    base = (
        docs.select(
            id_col, F.col(lang_col).isin(*keep_langs).alias("lang_ok")
        )
        .join(c4, id_col)
        .join(gop, id_col)
    )
    passed = F.col("lang_ok") & F.col("gopher_keep") & F.col("c4_keep")
    winners = (
        base.where(passed)
        .groupBy(F.md5("clean_text").alias("_h"))
        .agg(F.min(id_col).alias("_keep_id"))
    )
    # join on the text hash (co-partitioned with the winners agg);
    # winners is one row per distinct surviving text — never assume
    # it broadcasts at corpus scale
    return (
        base.withColumn("_h", F.md5("clean_text"))
        .join(winners, "_h", "left")
        .select(
            id_col,
            "lang_ok",
            "gopher_keep",
            "c4_keep",
            (passed & (F.col(id_col) != F.col("_keep_id"))).alias("is_dup"),
            (passed & (F.col(id_col) == F.col("_keep_id"))).alias("keep"),
            "clean_text",
        )
    )
