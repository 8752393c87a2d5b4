"""BPE tokenizer training + encoding (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — the byte-pair
tokenizer family every LLM data pipeline trains and applies).

Spark-first shape (the 100 TB story): training never iterates over
the corpus — ONE corpus-wide shuffle builds the (word, freq) table
(unique words ≪ corpus tokens), and every merge step is two small
hash aggregates over that table plus a one-row driver read of the
argmax pair (k merges = k scalar round-trips, same discipline as
pagerank's convergence aggregate). The pair-merge rewrite is a pure
higher-order ``aggregate`` fold inside whole-stage codegen — no
Python in any per-row path. Encoding applies the k learned merges as
k chained folds in ONE projection over the corpus.

Determinism / engine portability: symbols are substring(word, i, 1)
characters plus the classic '</w>' end marker; the argmax pair
tie-breaks (max count, then lexicographically smallest pair), so a
fixed-merge-count run has a bit-exact DuckDB twin
(__spark_entry__.BPE_TRAIN_SQL unrolls the merge steps with the
sentinel-join string encoding).

Greedy-left-to-right semantics of a single merge pass (the reference
algorithm's in-word scan) are reproduced exactly by the left fold:
a token merged this pass becomes ``a||b`` and can never re-match as
``a`` (strictly longer), which is precisely the scan-resumes-after-
the-replacement rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _chars(word: Column) -> Column:
    """word -> array of single characters + END (identical construction
    to the DuckDB twin: substring(word, i, 1) over 1..length)."""
    return F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: word.substr(i, F.lit(1)),
        ),
        F.array(F.lit(END)),
    )


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus shuffle."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"),
                         lambda w: w != F.lit(""))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """One greedy left-to-right merge pass of pair (a, b) over a
    symbol array, as a codegen fold."""
    ab = a + b
    return F.aggregate(
        syms,
        F.expr("array()").cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
                F.array(F.lit(ab)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """Adjacent (a, b) pairs of a symbol array (overlaps counted, per
    the reference get_stats)."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<a:string,b:string>>"))


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, merges_df) where
    merges = [(lhs, rhs, pair_count), ...] in rank order and
    merges_df = DataFrame(rank int, lhs string, rhs string,
    cnt long). Stops early if the word table runs out of pairs."""
    spark = docs.sparkSession
    wf = word_frequencies(docs, text_col).select(
        "freq", _chars(F.col("word")).alias("syms")
    )
    wf = wf.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        best = (
            wf.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        new_wf = wf.select(
            "freq", _merge_fold(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
        wf.unpersist()
        wf = new_wf
    wf.unpersist()
    merges_df = spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "rank int, lhs string, rhs string, cnt long",
    )
    return merges, merges_df


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str] | tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned merges to a corpus: (id, n_words, n_tokens,
    tokens array<string>) — the real learned-tokenizer token count.
    All k folds chain inside ONE codegen projection; no shuffle."""
    words = F.filter(F.split(F.col(text_col), r"\s+"),
                     lambda w: w != F.lit(""))

    def encode_word(w: Column) -> Column:
        syms = _chars(w)
        for m in merges:
            syms = _merge_fold(syms, m[0], m[1])
        return syms

    toks = F.flatten(F.transform(words, encode_word))
    return docs.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.size(toks).cast("long").alias("n_tokens"),
        toks.alias("tokens"),
    )
