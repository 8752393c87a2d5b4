"""DSIR importance resampling (functions/dsir.py) vs a hashlib/math
Python twin — exact feature hashing, Laplace model arithmetic, Gumbel
keys, and top-k membership."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from graphscope_spark.functions import dsir as D

NB = 64  # tiny bucket space → real collisions exercised

RAW = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "buy cheap pills now buy now buy now"),
    (2, "graph analytics at web scale with spark"),
    (3, "the dog sleeps while the fox runs"),
    (4, ""),
    (5, None),
    (6, "one"),
    (7, "spark spark spark spark"),
]

TARGET = [
    (100, "the fox and the dog are friends"),
    (101, "a lazy dog dreams of a quick fox"),
]


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _bucket(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % NB


def _feats(text):
    t = _toks(text)
    return [_bucket(x) for x in t] + [
        _bucket(f"{a} {b}") for a, b in zip(t, t[1:])
    ]


def _model(corpus):
    cnt: dict[int, int] = {}
    for _, text in corpus:
        for b in _feats(text):
            cnt[b] = cnt.get(b, 0) + 1
    return cnt, sum(cnt.values())


def _py_logw(text, alpha=1.0):
    ct, tt = _model(TARGET)
    cr, tr = _model(RAW)
    s = 0.0
    fs = _feats(text)
    for b in fs:
        s += math.log(ct.get(b, 0) + alpha) - math.log(tt + alpha * NB)
        s -= math.log(cr.get(b, 0) + alpha) - math.log(tr + alpha * NB)
    return len(fs), s


def _py_gumbel(doc_id, seed=42):
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    u = max(int(h[:8], 16) / 2.0**32, 1e-12)
    return -math.log(-math.log(u))


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(RAW, "doc_id long, text string")


@pytest.fixture(scope="module")
def target_df(spark):
    return spark.createDataFrame(TARGET, "doc_id long, text string")


def test_ngram_buckets_exact(spark):
    df = spark.createDataFrame(RAW, "doc_id long, text string")
    rows = df.select("doc_id", D.ngram_buckets("text", NB).alias("f")).collect()
    for r in rows:
        text = dict(RAW)[r["doc_id"]]
        assert list(r["f"]) == _feats(text), r["doc_id"]


def test_log_weights_match_python_twin(raw_df, target_df):
    out = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in D.dsir_log_weights(raw_df, target_df, n_buckets=NB).collect()
    }
    assert set(out) == {i for i, _ in RAW}
    for doc_id, text in RAW:
        n, w = _py_logw(text)
        assert out[doc_id][0] == n
        assert out[doc_id][1] == pytest.approx(w, abs=1e-9)


def test_target_like_docs_outweigh_spam(raw_df, target_df):
    out = {
        r["doc_id"]: r["logw"]
        for r in D.dsir_log_weights(raw_df, target_df, n_buckets=NB).collect()
    }
    # docs 0 and 3 share fox/dog/the vocabulary with the target; doc 1
    # (spam) and doc 7 (repetition) share nothing
    assert out[0] > out[1]
    assert out[3] > out[7]


def test_featureless_docs_score_zero(raw_df, target_df):
    out = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in D.dsir_log_weights(raw_df, target_df, n_buckets=NB).collect()
    }
    assert out[4] == (0, 0.0)
    assert out[5] == (0, 0.0)


def test_resample_is_gumbel_top_k(raw_df, target_df):
    k = 3
    kept = D.dsir_resample(raw_df, target_df, n_keep=k, n_buckets=NB).collect()
    assert len(kept) == k
    # twin: same keys, same top-k membership and order
    twin = sorted(
        (
            (_py_logw(text)[1] + _py_gumbel(doc_id), doc_id)
            for doc_id, text in RAW
        ),
        reverse=True,
    )
    assert [r["doc_id"] for r in kept] == [d for _, d in twin[:k]]
    for r in kept:
        want = dict((d, key) for key, d in twin)[r["doc_id"]]
        assert r["key"] == pytest.approx(want, abs=1e-9)


def test_resample_deterministic_across_runs(raw_df, target_df):
    a = [r["doc_id"] for r in D.dsir_resample(raw_df, target_df, 4, n_buckets=NB).collect()]
    b = [r["doc_id"] for r in D.dsir_resample(raw_df, target_df, 4, n_buckets=NB).collect()]
    assert a == b
