"""Text-pipeline operators (functions/text.py) on hand-built corpora —
edge cases the uniform driver testdata cannot hit: exact duplicates
(keep-first), single-token docs, fully-repeated docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.functions.text import (
    corpus_filter,
    fingerprint,
    quality_score,
    repetition_ratio,
)

DOCS = [
    # (doc_id, text)
    (1, "the cat and the dog and the cat"),          # heavy repetition
    (2, "alpha beta gamma delta epsilon zeta"),      # all distinct
    (3, "word"),                                     # single token → 0 bigrams
    (4, "x x x x x x"),                              # one distinct token
    (10, "the quick brown fox jumps over the lazy dog again today"),
    (11, "the quick brown fox jumps over the lazy dog again today"),  # dup of 10
    (12, "the quick brown fox jumps over the lazy dog again today"),  # dup of 10
    (13, "zz zz"),                                   # short + low quality
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_repetition_ratio_values(docs):
    r = {x["doc_id"]: x for x in repetition_ratio(docs).collect()}
    # doc 1: 8 tokens {the×3, cat×2, and×2, dog} → 4 distinct → 1-4/8
    assert r[1]["n_tokens"] == 8 and r[1]["dup_token_ratio"] == pytest.approx(0.5)
    # 7 bigrams, "and the"×2 + "the cat"×2 → 5 distinct → 1-5/7
    assert r[1]["dup_bigram_ratio"] == pytest.approx(round(1 - 5 / 7, 6))
    # all-distinct doc → both ratios 0
    assert r[2]["dup_token_ratio"] == 0.0 and r[2]["dup_bigram_ratio"] == 0.0
    # single token → no bigrams, ratio 0 (not NaN/NULL)
    assert r[3]["n_tokens"] == 1 and r[3]["dup_bigram_ratio"] == 0.0
    # x×6 → 1-1/6 tokens, bigrams all "x x" → 1-1/5
    assert r[4]["dup_token_ratio"] == pytest.approx(round(1 - 1 / 6, 6))
    assert r[4]["dup_bigram_ratio"] == pytest.approx(0.8)


def test_corpus_filter_keep_first_dedup(docs):
    kept = corpus_filter(docs, min_tokens=2, max_tokens=100, min_quality=0.0)
    ids = {r["doc_id"] for r in kept.collect()}
    # exact-dup trio 10/11/12 → only min doc_id 10 survives
    assert 10 in ids and 11 not in ids and 12 not in ids
    # single-token doc 3 fails min_tokens=2
    assert 3 not in ids
    assert 1 in ids and 2 in ids


def test_corpus_filter_quality_threshold(docs):
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    thresh = q[13] + 1e-9  # just above the junk doc
    ids = {r["doc_id"] for r in
           corpus_filter(docs, min_tokens=1, min_quality=thresh).collect()}
    assert 13 not in ids and 10 in ids


def test_corpus_filter_schema_and_fp(docs):
    kept = corpus_filter(docs, min_tokens=1, min_quality=0.0)
    assert kept.columns == ["doc_id", "fp", "n_tokens", "quality"]
    fp10 = (
        fingerprint(docs).where(F.col("doc_id") == 10).collect()[0]["fp"]
    )
    assert kept.where(F.col("doc_id") == 10).collect()[0]["fp"] == fp10


def test_pack_shards_matches_global_cumsum(docs):
    """The two-phase distributed prefix sum must equal the exact global
    window formulation: order by (md5(id), id), shard = exclusive
    running token sum // budget."""
    import hashlib

    from graphscope_spark.functions.text import pack_shards

    got = {r["doc_id"]: (r["n_tokens"], r["shard"])
           for r in pack_shards(docs, budget_tokens=15, num_partitions=4).collect()}
    rows = sorted(DOCS, key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0]))
    run, exp = 0, {}
    for did, text in rows:
        nt = len(text.split(" "))
        exp[did] = (nt, run // 15)
        run += nt
    assert got == exp


def test_pack_shards_budget_and_determinism(docs):
    from graphscope_spark.functions.text import pack_shards

    a = sorted(pack_shards(docs, budget_tokens=15).collect())
    b = sorted(pack_shards(docs, budget_tokens=15, num_partitions=2).collect())
    assert a == b  # partition count must not change the assignment
    # shards are contiguous 0..max with every shard non-empty
    shards = sorted({r["shard"] for r in a})
    assert shards == list(range(len(shards)))


def test_pack_shards_empty(spark):
    from graphscope_spark.functions.text import pack_shards

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_shards(empty, budget_tokens=10).count() == 0


def test_decontaminate_overlap_and_short_docs(spark):
    from graphscope_spark.functions.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # shares 3-gram with bench
            (2, "one two three four five"),          # clean
            (3, "alpha beta"),                       # shorter than n -> survives
            (4, "zz alpha beta gamma yy"),           # contains bench 3-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma",), ("alpha beta",)], "text string")
    kept = {r["doc_id"] for r in decontaminate(docs, bench, n=3).collect()}
    assert kept == {2, 3}
    # empty benchmark: everything survives
    empty = spark.createDataFrame([], "text string")
    assert decontaminate(docs, empty, n=3).count() == 4


def test_normalize_text(spark):
    from graphscope_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "  Hello, WORLD!!  multiple   spaces\tand $ymbols… "),
         (2, "already clean"),
         (3, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["n"]
            for r in df.select("doc_id", normalize_text("text").alias("n")).collect()}
    assert rows[1] == "hello world multiple spaces and ymbols"
    assert rows[2] == "already clean"
    assert rows[3] == ""
    # flags off = passthrough of that rule
    keep = df.select(normalize_text("text", strip_punct=False,
                                    collapse_ws=False, lower=False).alias("n"))
    assert keep.collect()[1]["n"] == "already clean"


def test_pack_shards_null_text(spark):
    """NULL text counts 0 tokens instead of poisoning the cumsum."""
    from graphscope_spark.functions.text import pack_shards
    rows = [(i, None if i % 3 == 0 else "a b c d e") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["shard"])
           for r in pack_shards(docs, budget_tokens=10,
                                num_partitions=3).collect()}
    assert len(got) == 12
    assert all(got[i][0] == 0 for i in range(0, 12, 3))
    assert all(got[i][0] == 5 for i in range(12) if i % 3)
    # all-null partition content also fine
    allnull = spark.createDataFrame([(i, None) for i in range(4)],
                                    "doc_id long, text string")
    out = pack_shards(allnull, budget_tokens=10, num_partitions=2).collect()
    assert {r["shard"] for r in out} == {0}


def test_quality_whitespace_and_digit_garbage(spark):
    g = spark.createDataFrame(
        [(0, "          "),            # all spaces
         (1, "1 2 3 4 5 6"),           # digits only
         (2, "the cat and the dog sat")],
        "doc_id long, text string")
    q = {r["doc_id"]: r for r in quality_score(g).collect()}
    # all-whitespace: zero letters, zero real tokens -> rock bottom
    assert q[0]["alpha_ratio"] == 0.0
    assert q[0]["quality"] == 0.0
    # digits-only: no letters counted as alpha
    assert q[1]["alpha_ratio"] == 0.0
    assert q[2]["quality"] > q[1]["quality"] > q[0]["quality"]


def test_pack_shards_string_ids(spark):
    from graphscope_spark.functions.text import pack_shards
    import pytest as _pt
    docs = spark.createDataFrame(
        [(f"doc-{i}", "a b c d e") for i in range(8)],
        "doc_id string, text string")
    out = pack_shards(docs, budget_tokens=10, num_partitions=2).collect()
    assert {r["doc_id"] for r in out} == {f"doc-{i}" for i in range(8)}
    assert all(r["n_tokens"] == 5 for r in out)
    with _pt.raises(ValueError):
        pack_shards(docs, budget_tokens=0)
