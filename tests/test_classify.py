"""Hashed linear classifier (functions/classify.py) vs a hashlib
Python twin."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from graphscope_spark.functions import classify as C

NB = 64  # tiny bucket space → real collisions exercised

CORPUS = [
    (0, "good clean prose with many words"),
    (1, "spam spam spam buy now"),
    (2, ""),
    (3, None),
    (4, "singleton"),
]

WEIGHTS = {7: 0.9, 13: -1.2, 21: 0.4, 40: -0.3}


def _bucket(t):
    return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % NB


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _py_score(text, weights, bias=0.0):
    bs = [_bucket(t) for t in _toks(text)]
    if not bs:
        return 0, bias
    return len(bs), sum(weights.get(b, 0.0) for b in bs) / len(bs) + bias


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def wdf(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in WEIGHTS.items()], "bucket long, w double"
    )


def test_buckets_match_hashlib(docs):
    rows = docs.select(
        "doc_id", C.token_buckets("text", NB).alias("b")
    ).collect()
    for r in rows:
        text = dict(CORPUS)[r["doc_id"]]
        if text is None:
            # NULL in -> NULL out (column semantics); explode_outer in
            # the classifier path turns it into a zero-token doc
            assert r["b"] is None
        else:
            assert r["b"] == [_bucket(t) for t in _toks(text)], r["doc_id"]


def test_hashed_features_counts(docs):
    got = {(r["doc_id"], r["bucket"]): r["tf"]
           for r in C.hashed_features(docs, NB).collect()}
    from collections import Counter
    want = {}
    for d, t in CORPUS:
        for b, n in Counter(_bucket(x) for x in _toks(t)).items():
            want[(d, b)] = n
    assert got == want


@pytest.mark.parametrize("bias", [0.0, 0.25])
def test_scores_match_python(docs, wdf, bias):
    got = {r["doc_id"]: r for r in C.linear_classifier_score(
        docs, wdf, n_buckets=NB, bias=bias).collect()}
    assert set(got) == {d for d, _ in CORPUS}
    for d, t in CORPUS:
        n, s = _py_score(t, WEIGHTS, bias)
        assert got[d]["n_tokens"] == n, d
        assert got[d]["score"] == pytest.approx(s, abs=1e-12), d
        assert got[d]["prob"] == pytest.approx(
            1.0 / (1.0 + math.exp(-s)), abs=1e-12), d
        assert got[d]["label"] == (got[d]["prob"] >= 0.5), d


def test_empty_docs_score_bias(docs, wdf):
    got = {r["doc_id"]: r for r in C.linear_classifier_score(
        docs, wdf, n_buckets=NB, bias=-2.0).collect()}
    for d in (2, 3):
        assert got[d]["n_tokens"] == 0
        assert got[d]["score"] == pytest.approx(-2.0)
        assert got[d]["label"] is False


def test_shuffle_join_path_equivalent(docs, wdf):
    a = {r["doc_id"]: r["score"] for r in C.linear_classifier_score(
        docs, wdf, n_buckets=NB).collect()}
    b = {r["doc_id"]: r["score"] for r in C.linear_classifier_score(
        docs, wdf, n_buckets=NB, broadcast_weights=False).collect()}
    for d in a:
        assert b[d] == pytest.approx(a[d], abs=1e-12)
