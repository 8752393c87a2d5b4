"""C4 rule filter (functions/text.py::c4_rules) vs a pure-Python
twin, with one crafted violator per published rule (Raffel et al.
2020 §2.2)."""

from __future__ import annotations

import re

import pytest

from graphscope_spark.functions.text import c4_rules

GOOD = "\n".join(
    ["the quick brown fox jumps over the lazy dog."] * 4
)  # 4 terminal-punct lines of 9 words

DOCS = [
    (0, GOOD),
    (1, "the quick brown fox runs\nand never stops at all\nno punct here"),
    # ^ no line ends in terminal punctuation -> 0 kept lines
    (2, "short line.\ntiny one!\nnope?\nnah.\nfour lines all too short."),
    # ^ only the last line has >=5 words -> 1 kept < 3
    (3, GOOD + "\nplease enable javascript to continue reading now."),
    # ^ javascript line dropped, page still keepable
    (4, GOOD + "\nlorem ipsum dolor sit amet."),        # bad phrase
    (5, GOOD + '\nvar config = { "mode": 1 };'),        # curly brace
    (6, 'he said "stop right there old friend"\nplus more good lines here.\n'
        "and a third fine sentence follows今?"),         # quote/!/? terminals
    (7, ""),                                            # empty
]


def _twin(text, min_words=5, min_lines=3):
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    kept = [
        l for l in lines
        if l.endswith((".", "!", "?", '"'))
        and len([w for w in re.split(r"\s+", l) if w]) >= min_words
        and "javascript" not in l.lower()
    ]
    r = {
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "ok_lines": len(kept) >= min_lines,
        "ok_no_bad_phrase": "lorem ipsum" not in text.lower(),
        "ok_no_brace": "{" not in text,
        "clean_text": "\n".join(kept),
    }
    r["keep"] = r["ok_lines"] and r["ok_no_bad_phrase"] and r["ok_no_brace"]
    return r


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_rules(df).collect()}


def test_matches_python_twin(scored):
    for d, t in DOCS:
        want = _twin(t)
        got = scored[d]
        for k, v in want.items():
            assert got[k] == v, (d, k, got[k], v)


def test_each_rule_fires(scored):
    assert scored[0]["keep"] is True
    assert scored[1]["n_kept_lines"] == 0 and not scored[1]["keep"]
    assert scored[2]["n_kept_lines"] == 1 and not scored[2]["ok_lines"]
    # javascript: the line is removed but the page survives
    assert scored[3]["keep"] is True
    assert scored[3]["n_kept_lines"] == 4  # js line dropped
    assert "javascript" not in scored[3]["clean_text"]
    assert scored[4]["ok_no_bad_phrase"] is False and not scored[4]["keep"]
    assert scored[5]["ok_no_brace"] is False and not scored[5]["keep"]
    # quote / question-mark terminals count; unterminated lines don't
    assert scored[6]["n_kept_lines"] == 3 and scored[6]["keep"] is True
    assert scored[7]["n_lines"] == 0 and not scored[7]["keep"]


def test_overrides(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    relaxed = {
        r["doc_id"]: r.asDict()
        for r in c4_rules(df, min_words_per_line=3, min_lines=1).collect()
    }
    assert relaxed[2]["keep"] is True  # 4-word lines now pass
