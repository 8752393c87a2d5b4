"""dedup_lines (functions/dedup.py): C4-style global line-level exact
dedup + doc reassembly, vs a pure-Python twin (first occurrence by
(doc_id, pos) order wins), plus edge cases: doc fully consumed by an
earlier doc, intra-doc repeats, empty text, drop_empty."""

from __future__ import annotations

from graphscope_spark.functions.dedup import dedup_lines

DOCS = [
    (1, "alpha\nbeta\ngamma"),
    (2, "beta\ndelta\nalpha"),      # beta+alpha seen in doc 1 → keeps delta
    (3, "alpha\nbeta"),             # fully consumed → ''
    (4, "epsilon\nepsilon\nzeta"),  # intra-doc repeat: second epsilon dropped
    (5, ""),                        # '' is a line; first '' occurrence wins
    (6, ""),
]


def _py_dedup_lines(docs, delim="\n"):
    seen = set()
    out = {}
    for doc_id, text in sorted(docs):
        kept = []
        lines = text.split(delim)
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out[doc_id] = (delim.join(kept), len(kept), len(lines))
    return out


def test_dedup_lines_matches_twin(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["lines_kept"], r["lines_orig"])
        for r in dedup_lines(df).collect()
    }
    assert got == _py_dedup_lines(DOCS)
    # spot-check the semantics the twin encodes
    assert got[2][0] == "delta"
    assert got[3] == ("", 0, 2)
    assert got[4][0] == "epsilon\nzeta"
    # empty string counts as a line: doc 5 keeps it, doc 6 loses it
    assert got[5] == ("", 1, 1) and got[6] == ("", 0, 1)


def test_dedup_lines_drop_empty(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    ids = {r["doc_id"] for r in dedup_lines(df, drop_empty=True).collect()}
    assert ids == {1, 2, 4, 5}


def test_dedup_lines_custom_delim(spark):
    docs = [(1, "a b c"), (2, "b d")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["lines_kept"], r["lines_orig"])
        for r in dedup_lines(df, delim=" ").collect()
    }
    assert got == _py_dedup_lines(docs, delim=" ")
    assert got[2][0] == "d"


def test_dedup_lines_disjoint_is_identity(spark):
    docs = [(1, "p\nq"), (2, "r\ns")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r["text"] for r in dedup_lines(df).collect()}
    assert got == {1: "p\nq", 2: "r\ns"}
