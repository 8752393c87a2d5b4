"""pii_redact (functions/text.py) and remove_boilerplate
(functions/dedup.py): known-value redaction cases (order of the three
passes, counts per category) and a pure-Python twin for the
boilerplate document-frequency filter."""

from __future__ import annotations

from collections import Counter

from graphscope_spark.functions.dedup import remove_boilerplate
from graphscope_spark.functions.text import pii_redact

PII_DOCS = [
    (1, "write to bob.smith+x@mail.example.org or call 555-123-4567 now"),
    (2, "server at 10.0.42.7 and 192.168.1.255 as backup"),
    (3, "a@b.co mailed c_d%e@f-g.io twice"),
    (4, "no pii here at all"),
    (5, "dotted phone 123.456.7890 but 12-34-56 is not a phone"),
    (6, "version 1.2.3.4 looks like an ip and is redacted (known tradeoff)"),
]

PII_WANT = {
    1: ("write to <EMAIL> or call <PHONE> now", 1, 0, 1),
    2: ("server at <IP> and <IP> as backup", 0, 2, 0),
    3: ("<EMAIL> mailed <EMAIL> twice", 2, 0, 0),
    4: ("no pii here at all", 0, 0, 0),
    5: ("dotted phone <PHONE> but 12-34-56 is not a phone", 0, 0, 1),
    6: ("version <IP> looks like an ip and is redacted (known tradeoff)", 0, 1, 0),
}


def test_pii_redact_known_values(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_emails"], r["n_ips"], r["n_phones"])
        for r in pii_redact(df).collect()
    }
    assert got == PII_WANT


def test_pii_redact_idempotent(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    once = pii_redact(df)
    twice = pii_redact(once)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b
    # second pass finds nothing
    assert all(
        r["n_emails"] == r["n_ips"] == r["n_phones"] == 0 for r in twice.collect()
    )


BP_DOCS = [
    (1, "cookie banner\nreal content one\nfooter"),
    (2, "cookie banner\nreal content two\nfooter"),
    (3, "cookie banner\nreal content three\nfooter"),
    (4, "rare line\nrare line\nunique tail"),  # intra-doc repeat survives
    (5, "cookie banner"),                       # fully boilerplate → ''
]


def _py_boilerplate(docs, max_df=2, delim="\n"):
    df_count = Counter()
    for _, text in docs:
        for ln in set(text.split(delim)):
            df_count[ln] += 1
    out = {}
    for doc_id, text in docs:
        lines = text.split(delim)
        kept = [ln for ln in lines if df_count[ln] <= max_df]
        out[doc_id] = (delim.join(kept), len(kept), len(lines))
    return out


def test_remove_boilerplate_matches_twin(spark):
    df = spark.createDataFrame(BP_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["lines_kept"], r["lines_orig"])
        for r in remove_boilerplate(df, max_df=2).collect()
    }
    assert got == _py_boilerplate(BP_DOCS, max_df=2)
    # the df=3 lines are gone everywhere; doc 4 keeps both rare copies
    assert got[1][0] == "real content one"
    assert got[4] == ("rare line\nrare line\nunique tail", 3, 3)
    assert got[5] == ("", 0, 1)


def test_remove_boilerplate_high_max_df_is_identity(spark):
    df = spark.createDataFrame(BP_DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r["text"] for r in remove_boilerplate(df, max_df=99).collect()}
    assert got == {i: t for i, t in BP_DOCS}
