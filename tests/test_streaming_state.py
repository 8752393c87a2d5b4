"""Custom stateful streaming operator (applyInPandasWithState):
streaming SimHash near-dup filter vs its sequential batch twin —
including state carried across micro-batch boundaries."""

from __future__ import annotations

import os
import time

import pytest

from graphscope_spark.streaming import (
    simhash_dedup_batch,
    simhash_dedup_stream,
)

DOCS_SCHEMA = "doc_id long, text string"


def _docs_rows():
    """Deterministic corpus: exact dup pairs (hamming 0), unique texts,
    and token-tweaked near-variants (small but data-dependent hamming —
    the tests assert stream == batch twin, not specific distances)."""
    base = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
        "sphinx of black quartz judge my vow",
    ]
    rows = []
    did = 0
    for i, t in enumerate(base):
        rows.append((did, t)); did += 1
        rows.append((did, t)); did += 1            # exact dup
        rows.append((did, t + " extra")); did += 1  # near variant
        rows.append((did, f"unique filler text number {i} with words")); did += 1
    return rows


def _stream_result(spark, paths: list[str], name: str, max_files=None,
                   **op_kw):
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    docs = reader.parquet(paths[0])
    q = (
        simhash_dedup_stream(docs, **op_kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df):
    return sorted((r["bucket"], r["doc_id"], r["simhash"]) for r in df.collect())


def test_stream_equals_batch_single_batch(spark, tmp_path):
    rows = _docs_rows()
    batch = spark.createDataFrame(rows, DOCS_SCHEMA)
    d = tmp_path / "docs"; d.mkdir()
    batch.coalesce(1).write.parquet(str(d / "f0.parquet"))
    got = _stream_result(spark, [str(d / "*" )], "simhash_dedup_1",
                         max_hamming=3)
    want = simhash_dedup_batch(batch, max_hamming=3)
    assert _rows(got) == _rows(want)
    # exact dups (identical text => hamming 0 <= 3) must be dropped
    assert len(_rows(got)) < len(rows)


def test_state_survives_microbatch_boundary(spark, tmp_path):
    """Two files, one per trigger: docs in file 2 must be deduped
    against fingerprints KEPT from file 1 (per-bucket state)."""
    rows = _docs_rows()
    half = len(rows) // 2
    d = tmp_path / "docs2"; d.mkdir()
    spark.createDataFrame(rows[:half], DOCS_SCHEMA).coalesce(1) \
        .write.parquet(str(d / "f0.parquet"))
    spark.createDataFrame(
        # file 2 repeats file-1 texts under NEW doc_ids -> all near-dups
        [(1000 + i, t) for i, (_, t) in enumerate(rows[:half])]
        + [(2000, "a genuinely new document about streams")],
        DOCS_SCHEMA,
    ).coalesce(1).write.parquet(str(d / "f1.parquet"))
    # file-source ordering is by modification time: force f0 older
    now = time.time()
    for i, f in enumerate(sorted(d.glob("f*.parquet"))):
        for p in f.rglob("*"):
            os.utime(p, (now - 100 + i, now - 100 + i))
        os.utime(f, (now - 100 + i, now - 100 + i))

    got = _stream_result(spark, [str(d / "*")], "simhash_dedup_2",
                         max_files=1, max_hamming=0)
    # twin: sequential over file order = doc_id order here (file-1 ids
    # < 1000 <= file-2 ids), which the batch twin's doc_id sort gives
    all_rows = rows[:half] + [
        (1000 + i, t) for i, (_, t) in enumerate(rows[:half])
    ] + [(2000, "a genuinely new document about streams")]
    want = simhash_dedup_batch(
        spark.createDataFrame(all_rows, DOCS_SCHEMA), max_hamming=0)
    assert _rows(got) == _rows(want)
    # every exact-repeat in file 2 was dropped against file-1 state
    got_ids = {r[1] for r in _rows(got)}
    assert not any(1000 <= i < 2000 for i in got_ids)
    assert 2000 in got_ids


def test_max_state_cap_keeps_comparing(spark):
    """Past the cap, new docs are still compared against the RETAINED
    set but stop extending it — bounded state, no silent pass-through
    of dups of retained fingerprints."""
    rows = [(0, "aaa bbb ccc"), (1, "aaa bbb ccc"), (2, "ddd eee fff"),
            (3, "aaa bbb ccc"), (4, "ddd eee fff")]
    batch = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = {r["doc_id"] for r in
           simhash_dedup_batch(batch, max_hamming=0, max_state=1).collect()}
    # doc 0 kept + retained; doc 1,3 dup of retained -> dropped;
    # doc 2 kept (distinct) but NOT retained (cap=1, bucket may differ
    # -> its own bucket's cap still admits it); doc 4 dup of doc 2 —
    # dropped only if 2 was retained in ITS bucket (cap is per bucket,
    # doc 2 is first there, so retained)
    assert 0 in out and 2 in out
    assert 1 not in out and 3 not in out and 4 not in out


def test_simhash_bucket_prefix_bits_edges(spark):
    """prefix_bits=0 puts EVERY doc in one bucket (the JVM would mask a
    64-bit shift to a no-op); out-of-range values raise."""
    import pytest

    from graphscope_spark.streaming import _with_simhash
    docs = spark.createDataFrame(
        [(i, f"doc number {i} text") for i in range(6)],
        "doc_id long, text string")
    b0 = {r["bucket"] for r in _with_simhash(docs, 0, "text", "doc_id").collect()}
    assert b0 == {0}
    b16 = _with_simhash(docs, 16, "text", "doc_id").collect()
    assert all(0 <= r["bucket"] < 2 ** 16 for r in b16)
    with pytest.raises(ValueError):
        _with_simhash(docs, 65, "text", "doc_id")
