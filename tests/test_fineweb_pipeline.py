"""fineweb_filter (functions/pipeline.py): composition semantics —
lang gate, rule conjunction, keep-first dedup among survivors."""

from __future__ import annotations

GOOD = (
    "The quick brown fox jumps over the lazy dog and runs far away. "
    "It was a bright sunny day and all of the animals were out in force. "
    "The fox had many friends that would play with it every single day. "
    "They ran and jumped and played until the sun went down at night. "
    "Then all of the animals went back home to sleep with their family."
).replace(". ", ".\n")

SHORT = "Too short."


def _docs(spark):
    rows = [
        (1, GOOD, "en"),          # keeper
        (2, GOOD, "en"),          # exact dup of 1 -> is_dup
        (3, GOOD, "fr"),          # fails lang
        (4, SHORT, "en"),         # fails gopher (word count) + c4 lines
        (5, GOOD + "\nlorem ipsum dolor.", "en"),  # fails c4 bad phrase
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_composition_flags(spark):
    from graphscope_spark.functions.pipeline import fineweb_filter

    out = {
        r["doc_id"]: r
        for r in fineweb_filter(_docs(spark), keep_langs=("en",)).collect()
    }
    assert out[1]["keep"] is True and out[1]["is_dup"] is False
    # doc 2: identical clean text, higher id -> loses dedup
    assert out[2]["keep"] is False and out[2]["is_dup"] is True
    assert out[2]["lang_ok"] and out[2]["gopher_keep"] and out[2]["c4_keep"]
    # doc 3: only the lang gate fails
    assert out[3]["lang_ok"] is False and out[3]["keep"] is False
    assert out[3]["is_dup"] is False  # non-passers are never dups
    # doc 4: too short for gopher
    assert out[4]["gopher_keep"] is False and out[4]["keep"] is False
    # doc 5: bad phrase kills c4
    assert out[5]["c4_keep"] is False and out[5]["keep"] is False


def test_clean_text_carried(spark):
    from graphscope_spark.functions.pipeline import fineweb_filter

    out = {
        r["doc_id"]: r["clean_text"]
        for r in fineweb_filter(_docs(spark)).collect()
    }
    assert out[1] == GOOD  # every line terminal + >=5 words -> kept whole
