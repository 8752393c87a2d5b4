"""BPE training/encoding (functions/bpe.py) vs a pure-Python
reference twin (Sennrich et al. 2016 learn_bpe semantics with
deterministic (count desc, pair asc) tie-break)."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from graphscope_spark.functions.bpe import bpe_encode, bpe_train

SENNRICH = ("low low low low low lower lower newest newest newest "
            "newest newest newest widest widest widest")

DOCS = [
    (0, SENNRICH),
    (1, "the quick brown fox and the slow red fox"),
    (2, ""),
]


def _twin_train(texts, n_merges):
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t):
            if w:
                vocab[tuple(w) + ("</w>",)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        new = Counter()
        for syms, f in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new[tuple(out)] += f
        vocab = new
    return merges


def _twin_encode(text, merges):
    toks = []
    for w in re.split(r"\s+", text):
        if not w:
            continue
        syms = list(w) + ["</w>"]
        for a, b, *_ in merges:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        toks.extend(syms)
    return toks


@pytest.fixture(scope="module")
def trained(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    merges, mdf = bpe_train(df, n_merges=10)
    return df, merges, mdf


def test_merges_match_reference_twin(trained):
    _, merges, mdf = trained
    want = _twin_train([t for _, t in DOCS], 10)
    assert merges == want
    rows = sorted(mdf.collect(), key=lambda r: r["rank"])
    assert [(r["lhs"], r["rhs"], r["cnt"]) for r in rows] == want


def test_sennrich_progression(trained):
    _, merges, _ = trained
    # the canonical worked example: es, est, est</w> lead
    assert merges[0][:2] == ("e", "s")
    assert merges[1][:2] == ("es", "t")
    assert merges[2][:2] == ("est", "</w>")


def test_encode_matches_twin(trained):
    df, merges, _ = trained
    got = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    for d, t in DOCS:
        want = _twin_encode(t, merges)
        assert list(got[d]["tokens"]) == want, d
        assert got[d]["n_tokens"] == len(want)
    assert got[2]["n_words"] == 0 and got[2]["n_tokens"] == 0


def test_overlapping_run_greedy(spark):
    # pair (a,a) over 'aaaa': greedy left-to-right -> aa + aa
    df = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    merges, _ = bpe_train(df, n_merges=1)
    assert merges[0][:2] == ("a", "a")
    enc = bpe_encode(df, merges).collect()[0]
    assert list(enc["tokens"]) == ["aa", "aa", "</w>"] * 3
