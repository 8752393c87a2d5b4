"""ExactSubstr dedup (functions/dedup.py::dedup_substrings) vs a
pure-Python twin (Lee et al. 2022 semantics: every duplicated
>=L-token span removed from all but its first (doc_id, pos)
occurrence)."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest

from graphscope_spark.functions.dedup import dedup_substrings

DOCS = [
    (0, "a b c d e f g h i j unique0 tail0"),
    (1, "x y a b c d e f g h i j tail1"),          # cross-doc dup of a..j
    (2, "p q r s t u v w different doc two"),
    (3, "m m m a b c d e f g h i j a b c d e f g h i j"),  # internal repeat
    (4, "short doc"),                                # below window length
    (5, ""),                                         # empty
    (6, "p q r s t u v w different doc two"),        # exact dup of doc 2
]


def _twin(docs, L=8):
    occ = defaultdict(list)
    toks = {}
    for d, t in docs:
        w = [x for x in re.split(r"\s+", t) if x]
        toks[d] = w
        for i in range(len(w) - L + 1):
            occ[" ".join(w[i:i + L])].append((d, i))
    removed = defaultdict(set)
    ndw = defaultdict(int)
    for h, ps in occ.items():
        if len(ps) > 1:
            for d, i in sorted(ps)[1:]:
                removed[d].update(range(i, i + L))
                ndw[d] += 1
    out = {}
    for d, t in docs:
        w = toks[d]
        kept = [x for i, x in enumerate(w) if i not in removed[d]]
        out[d] = {
            "n_tokens": len(w),
            "n_dup_windows": ndw[d],
            "n_removed_tokens": len(w) - len(kept),
            "clean_text": " ".join(kept),
        }
    return out


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in dedup_substrings(df, min_len=8).collect()
    }


def test_matches_python_twin(result):
    want = _twin(DOCS)
    assert set(result) == set(want)
    for d in want:
        for k, v in want[d].items():
            assert result[d][k] == v, (d, k, result[d][k], v)


def test_first_occurrence_kept(result):
    # doc 0 is lexicographically first for the shared run — untouched
    assert result[0]["n_removed_tokens"] == 0
    assert result[1]["clean_text"] == "x y tail1"
    # both copies in doc 3 duplicate doc 0's run -> both removed
    assert result[3]["clean_text"] == "m m m"
    # exact duplicate doc: doc 2 keeps, doc 6 loses its full window span
    assert result[2]["n_removed_tokens"] == 0
    assert result[6]["n_removed_tokens"] == 11
    assert result[6]["clean_text"] == ""


def test_short_and_empty_docs(result):
    for d in (4, 5):
        assert result[d]["n_dup_windows"] == 0
        assert result[d]["n_removed_tokens"] == 0


def test_longer_min_len(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup_substrings(df, min_len=11).collect()
    }
    # the 10-token shared run is now below threshold; only the
    # 11-token exact-dup doc pair still fires
    assert out[1]["n_removed_tokens"] == 0
    assert out[6]["n_removed_tokens"] == 11
