"""TF-IDF / BM25 / inverted-index ranking operators vs hand-computed
truths on a 4-doc corpus (functions/ranking.py)."""

from __future__ import annotations

import math

import pytest

from graphscope_spark.functions import ranking as R


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta beta gamma"),
        (1, "alpha alpha delta"),
        (2, "Beta, GAMMA! gamma?"),
        (3, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_terms_tokenization(spark):
    df = spark.createDataFrame([("Hello, World 42  x!",), (None,), ("",)],
                               "t string")
    got = df.select(R.terms("t").alias("xs")).collect()
    assert got[0]["xs"] == ["hello", "world", "42", "x"]
    assert got[1]["xs"] is None
    assert got[2]["xs"] == []


def test_doc_term_freqs(docs):
    tf = {(r["doc_id"], r["term"]): r["tf"]
          for r in R.doc_term_freqs(docs).collect()}
    assert tf[(0, "beta")] == 2
    assert tf[(2, "gamma")] == 2
    assert (3, "alpha") not in tf  # NULL text contributes nothing


def test_tfidf_top_terms(docs):
    # N=4; df: alpha 2, beta 2, gamma 2, delta 1
    out = R.tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rnk"], r["term"],
                                                   r["tf"], r["score"]))
    idf2 = math.log(5 / 3) + 1
    idf1 = math.log(5 / 2) + 1
    # doc 0: beta tf2 wins, then alpha/gamma tie at tf1*idf2 -> alpha
    assert [t for _, t, _, _ in sorted(by_doc[0])] == ["beta", "alpha"]
    assert sorted(by_doc[0])[0][3] == pytest.approx(2 * idf2, abs=1e-6)
    # doc 1: alpha tf2, delta tf1 but rarer idf
    assert [t for _, t, _, _ in sorted(by_doc[1])] == ["alpha", "delta"]
    assert sorted(by_doc[1])[1][3] == pytest.approx(idf1, abs=1e-6)
    assert 3 not in by_doc


def test_bm25_score(docs):
    # query 'beta' only: df=2, N=4, dls 4,3,3; avgdl over ALL docs
    # (null text -> dl 0 is excluded from avg? size(null)= -1?).
    out = {r["doc_id"]: r["score"] for r in
           R.bm25_score(docs, query="beta").collect()}
    assert set(out) == {0, 2}
    avgdl = (4 + 3 + 3) / 3  # avg ignores the NULL row
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def bm(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[0] == pytest.approx(bm(2, 4), abs=1e-6)
    assert out[2] == pytest.approx(bm(1, 3), abs=1e-6)
    with pytest.raises(ValueError):
        R.bm25_score(docs, query="!!!")


def test_inverted_index(docs):
    idx = {r["term"]: (r["df"], r["postings"]) for r in
           R.inverted_index(docs).collect()}
    assert idx["beta"] == (2, [0, 2])
    assert idx["gamma"] == (2, [0, 2])
    assert idx["alpha"] == (2, [0, 1])
    assert idx["delta"] == (1, [1])
    # df band drops singletons
    banded = {r["term"] for r in R.inverted_index(docs, min_df=2).collect()}
    assert banded == {"alpha", "beta", "gamma"}
