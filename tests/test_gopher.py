"""Gopher rule filter (functions/text.py::gopher_rules) vs a pure-
Python twin, with one crafted violator per published rule."""

from __future__ import annotations

import re

import pytest

from graphscope_spark.functions.text import gopher_rules

REQ = ["the", "be", "to", "of", "and", "that", "have", "with"]

GOOD = ("the quick brown fox jumps over the lazy dog and keeps running "
        "to the hills of green with steady joyful pace that never ends "
        * 4)  # >50 words, stopword-rich, clean

DOCS = [
    (0, GOOD),
    (1, "the short one of all"),                          # too few words
    (2, ("supercalifragilistic " * 60) + "the of"),       # mean word len > 10
    (3, GOOD + " " + "#" * 40),                           # symbol ratio
    (4, "\n".join(["- bullet line the of"] * 10)),        # all bullet lines
    (5, "\n".join([GOOD] + ["trailing thought..."] * 9)), # ellipsis lines
    (6, ("12345 " * 60) + "the of"),                      # non-alpha words
    (7, " ".join(["word"] * 60)),                         # no stopwords
    (8, ""),                                              # empty
]


def _twin(text, min_stop=2):
    words = [w for w in re.split(r"\s+", text) if w]
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    n, nl = len(words), len(lines)
    mean_wl = sum(map(len, words)) / n if n else None
    hashes = len(text) - len(text.replace("#", ""))
    ells = (len(text) - len(text.replace("...", ""))) / 3 + (
        len(text) - len(text.replace("…", "")))
    bullets = sum(1 for l in lines if l.startswith(("-", "*", "•")))
    ell_lines = sum(1 for l in lines if l.endswith(("...", "…")))
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    lw = [w.lower() for w in words]
    stops = sum(1 for s in REQ if s in lw)
    r = {
        "n_words": n,
        "ok_words": 50 <= n <= 100_000,
        "ok_mean_word_len": n > 0 and 3.0 <= mean_wl <= 10.0,
        "ok_symbols": n > 0 and (hashes + ells) / n <= 0.1,
        "ok_bullets": nl == 0 or bullets / nl <= 0.9,
        "ok_ellipsis": nl == 0 or ell_lines / nl <= 0.3,
        "ok_alpha": n > 0 and alpha / n >= 0.8,
        "ok_stopwords": stops >= min_stop,
    }
    r["keep"] = all(v for k, v in r.items() if k.startswith("ok_"))
    return r


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}


def test_matches_python_twin(scored):
    for d, t in DOCS:
        want = _twin(t)
        got = scored[d]
        for k, v in want.items():
            assert got[k] == v, (d, k, got[k], v)


def test_each_rule_fires(scored):
    assert scored[0]["keep"] is True
    fail_key = {
        1: "ok_words", 2: "ok_mean_word_len", 3: "ok_symbols",
        4: "ok_bullets", 5: "ok_ellipsis", 6: "ok_alpha",
        7: "ok_stopwords",
    }
    for d, k in fail_key.items():
        assert scored[d][k] is False, (d, k)
        assert scored[d]["keep"] is False, d
    # empty doc: word-dependent rules all fail, line rules vacuous
    assert scored[8]["ok_words"] is False
    assert scored[8]["ok_bullets"] is True
    assert scored[8]["keep"] is False


def test_threshold_overrides(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    relaxed = {
        r["doc_id"]: r["ok_stopwords"]
        for r in gopher_rules(df, min_stopword_hits=0).collect()
    }
    assert all(relaxed.values())
