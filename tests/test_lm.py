"""N-gram LM training + perplexity (functions/lm.py) vs a pure-Python
twin: same tokenizer, padding, Laplace smoothing, vocab definition."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from graphscope_spark.functions import lm as LM

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the rat"),
    (2, "dogs chase cats, cats chase rats!"),
    (3, ""),          # empty doc: single (<s>, </s>) event
    (4, None),        # NULL text behaves like empty
    (5, "the the the"),
]


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _grams(text, n=2):
    p = ["<s>"] * (n - 1) + _toks(text) + ["</s>"]
    return [(" ".join(p[i:i + n - 1]), p[i + n - 1])
            for i in range(len(p) - n + 1)]


def _py_lm(corpus, n=2):
    c = Counter()
    for _, t in corpus:
        c.update(_grams(t, n))
    return c


def _py_ppl(corpus, model, n=2):
    ctx_tot = Counter()
    for (ctx, _), cnt in model.items():
        ctx_tot[ctx] += cnt
    v = len({w for (_, w) in model}) + 1
    out = {}
    for doc_id, t in corpus:
        gs = _grams(t, n)
        logps = [
            math.log((model.get(g, 0) + 1.0) / (ctx_tot[g[0]] + v))
            for g in gs
        ]
        oov = sum(1 for g in gs if g not in model)
        avg = sum(logps) / len(gs)
        out[doc_id] = (len(gs), oov, avg, math.exp(-avg))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_train_counts_match_python(docs):
    got = {(r["ctx"], r["w"]): r["cnt"]
           for r in LM.train_ngram_lm(docs, n=2).collect()}
    assert got == dict(_py_lm(CORPUS, 2))


def test_trigram_counts_match_python(docs):
    got = {(r["ctx"], r["w"]): r["cnt"]
           for r in LM.train_ngram_lm(docs, n=3).collect()}
    assert got == dict(_py_lm(CORPUS, 3))


def test_self_perplexity_matches_python(docs):
    want = _py_ppl(CORPUS, _py_lm(CORPUS, 2), 2)
    got = {r["doc_id"]: r for r in LM.ngram_perplexity(docs, n=2).collect()}
    assert set(got) == set(want)
    for d, (ng, oov, avg, ppl) in want.items():
        r = got[d]
        assert (r["n_ngrams"], r["n_oov"]) == (ng, oov)
        assert r["avg_logprob"] == pytest.approx(avg, abs=1e-12)
        assert r["ppl"] == pytest.approx(ppl, rel=1e-12)
    # self-trained model sees every gram: zero OOV anywhere
    assert all(r["n_oov"] == 0 for r in got.values())


def test_heldout_oov_and_broadcast(docs, spark):
    """Model trained on docs 0-1 only; scoring all docs yields real OOV
    on 2/5 and the broadcast_lm path is value-identical."""
    train = docs.where("doc_id <= 1")
    model = LM.train_ngram_lm(train, n=2)
    py_model = _py_lm(CORPUS[:2], 2)
    want = _py_ppl(CORPUS, py_model, 2)
    a = {r["doc_id"]: r for r in
         LM.ngram_perplexity(docs, lm=model, n=2).collect()}
    b = {r["doc_id"]: r for r in
         LM.ngram_perplexity(docs, lm=model, n=2, broadcast_lm=True).collect()}
    for d in want:
        ng, oov, avg, ppl = want[d]
        assert (a[d]["n_ngrams"], a[d]["n_oov"]) == (ng, oov)
        assert a[d]["avg_logprob"] == pytest.approx(avg, abs=1e-12)
        assert (b[d]["n_ngrams"], b[d]["n_oov"]) == (ng, oov)
        # broadcast changes the physical plan, hence the float sum
        # order — identical up to accumulation-order ulps only
        assert b[d]["avg_logprob"] == pytest.approx(a[d]["avg_logprob"],
                                                    abs=1e-12)
    assert a[2]["n_oov"] > 0  # held-out vocabulary
    # fluent-vs-junk ordering: doc 1 (in-domain) beats doc 2 (OOV-heavy)
    assert a[1]["ppl"] < a[2]["ppl"]


def test_empty_and_null_docs_survive(docs):
    got = {r["doc_id"]: r for r in LM.ngram_perplexity(docs, n=2).collect()}
    assert got[3]["n_ngrams"] == 1 and got[4]["n_ngrams"] == 1
    assert got[3]["avg_logprob"] == got[4]["avg_logprob"]


def test_unigram_order_rejected(docs):
    with pytest.raises(ValueError):
        LM.doc_ngrams(docs, n=1)


def test_ccnet_buckets_terciles(spark):
    """Per-language rank-exact terciles: 6 docs per forced language ->
    exactly 2 head / 2 middle / 2 tail each, head = lowest ppl."""
    rows = []
    for i in range(6):
        # 'the' forces en; repetition level varies fluency
        rows.append((i, "the cat sat " + "on the mat " * (i + 1)))
    for i in range(6):
        rows.append((10 + i, "der hund lief " + "und die katze " * (i + 1)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in LM.ccnet_buckets(docs, n=2).collect()}
    assert len(got) == 12
    for lang, ids in (("en", range(6)), ("de", range(10, 16))):
        sub = [got[i] for i in ids]
        assert all(r["lang"] == lang for r in sub), lang
        from collections import Counter
        assert Counter(r["bucket"] for r in sub) == Counter(
            {"head": 2, "middle": 2, "tail": 2})
        by_ppl = sorted(sub, key=lambda r: (r["ppl"], r["doc_id"]))
        assert [r["bucket"] for r in by_ppl] == [
            "head", "head", "middle", "middle", "tail", "tail"]
