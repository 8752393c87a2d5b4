"""fuzzy_dedup (functions/dedup.py): end-to-end LSH → Jaccard → WCC
clustering vs a pure-Python twin of the exact same pipeline (md5
minhash family is engine-portable, so the twin is bit-identical),
including a transitivity case (A~B, B~C but A,C share no LSH band)."""

from __future__ import annotations

import hashlib

import pytest

from graphscope_spark.functions.dedup import fuzzy_dedup

BASE = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
DOCS = [
    (1, BASE),
    (2, BASE.replace("lazy", "sleepy")),                    # near-dup of 1
    (3, BASE.replace("lazy", "sleepy").replace("old", "new")),  # near-dup of 2
    (4, "completely different words about graph engines and spark plans"),
    (5, "another unrelated document mentioning embeddings and tokens"),
    (6, BASE),                                              # exact dup of 1
]


def _py_fuzzy(docs, num_hashes=8, band_size=2, n=3, threshold=0.2):
    """Pure-Python twin: shingles → md5 minhash → banded LSH → Jaccard
    verify → union-find components → keep_id = min id."""
    sh = {}
    for i, text in docs:
        toks = text.split(" ")
        sh[i] = {"|".join(toks[k: k + n]) for k in range(len(toks) - n + 1)}

    def mh(i, seed):
        return min(
            hashlib.md5(f"{seed}|{s}".encode()).hexdigest() for s in sh[i]
        )

    bands = {}
    for i, _ in docs:
        sig = [mh(i, seed) for seed in range(num_hashes)]
        for b in range(num_hashes // band_size):
            key = hashlib.md5(
                ",".join(sig[b * band_size:(b + 1) * band_size]).encode()
            ).hexdigest()
            bands.setdefault((b, key), []).append(i)
    cand = {
        (a, b)
        for ids in bands.values()
        for a in ids
        for b in ids
        if a < b
    }
    verified = [
        (a, b)
        for a, b in cand
        if round(len(sh[a] & sh[b]) / len(sh[a] | sh[b]), 6) >= threshold
    ]
    parent = {i: i for i, _ in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i, _ in docs}, verified


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_fuzzy_dedup_matches_python_twin(docs_df):
    got = {
        r["doc_id"]: r["keep_id"] for r in fuzzy_dedup(docs_df).collect()
    }
    exp, verified = _py_fuzzy(DOCS)
    assert got == exp
    # the fixture must actually exercise clustering: 1,2,6 (and likely 3)
    # collapse to keep_id 1; 4 and 5 stay singletons
    assert got[1] == got[2] == got[6] == 1
    assert got[4] == 4 and got[5] == 5
    assert len(verified) >= 2


def test_fuzzy_dedup_no_dups(spark):
    df = spark.createDataFrame(
        [(7, "entirely unique seven"), (8, "totally distinct eight words")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["keep_id"] for r in fuzzy_dedup(df).collect()}
    assert got == {7: 7, 8: 8}


def test_fuzzy_dedup_string_ids(spark):
    """String doc ids must dedup (a blind cast('long') used to null
    every vertex and silently dedup nothing)."""
    from graphscope_spark.functions.dedup import fuzzy_dedup
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [("url-a", base), ("url-b", base + "extra tail"),
            ("url-z", "completely different content about spark plans " * 4)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r["keep_id"]
           for r in fuzzy_dedup(docs, threshold=0.3).collect()}
    assert out["url-a"] == "url-a"
    assert out["url-b"] == "url-a"   # near-dup clusters to min id
    assert out["url-z"] == "url-z"   # singleton keeps itself
