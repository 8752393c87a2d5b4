"""Bloom filter (functions/bloom.py) vs a pure-Python twin of the
same md5 hash family — bit-exact words, no false negatives, and the
exact same false-positive set."""

from __future__ import annotations

import hashlib

import pytest

from graphscope_spark.functions.bloom import (
    BloomFilter,
    bloom_build,
    bloom_filter_seen,
    bloom_probe,
)


def _py_positions(value: str, num_hashes: int, num_bits: int):
    for i in range(num_hashes):
        h = hashlib.md5(f"bloom|{i}|{value}".encode()).hexdigest()
        yield int(h[:15], 16) % num_bits


def _py_bloom(values, num_bits, num_hashes):
    words = [0] * (num_bits // 64)
    for v in values:
        for p in _py_positions(v, num_hashes, num_bits):
            words[p // 64] |= 1 << (p % 64)
    # normalize to signed int64 (Spark longs)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def _py_member(value, words, num_bits, num_hashes):
    for p in _py_positions(value, num_hashes, num_bits):
        if not (words[p // 64] >> (p % 64)) & 1:
            return False
    return True


SEEN = [f"url-{i}" for i in range(40)]
PROBE = SEEN[:10] + [f"other-{i}" for i in range(200)]


def test_words_bit_exact_vs_python(spark):
    df = spark.createDataFrame([(v,) for v in SEEN], ["k"])
    bf = bloom_build(df, "k", num_bits=512, num_hashes=3)
    assert list(bf.words) == _py_bloom(SEEN, 512, 3)
    assert bf.set_bits == sum(
        bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in bf.words
    )


def test_probe_matches_python_twin_including_fps(spark):
    # 512 bits + 40 keys => high fill; FPs among 200 probes are likely
    # and MUST match the python twin exactly.
    seen_df = spark.createDataFrame([(v,) for v in SEEN], ["k"])
    probe_df = spark.createDataFrame([(v,) for v in PROBE], ["k"])
    bf = bloom_build(seen_df, "k", num_bits=512, num_hashes=3)
    got = {
        r["k"]: r["maybe_member"]
        for r in bloom_probe(probe_df, "k", bf).collect()
    }
    words = _py_bloom(SEEN, 512, 3)
    want = {v: _py_member(v, words, 512, 3) for v in PROBE}
    assert got == want
    # no false negatives, and at this fill some false positive exists
    assert all(got[v] for v in SEEN[:10])


def test_end_to_end_helper_and_nulls(spark):
    seen_df = spark.createDataFrame([(v,) for v in SEEN], ["k"])
    probe_df = spark.createDataFrame(
        [("url-1",), (None,), ("definitely-new-x",)], ["k"]
    )
    out = {
        r["k"]: r["maybe_seen"]
        for r in bloom_filter_seen(
            probe_df, seen_df, "k", num_bits=1 << 16, num_hashes=4
        ).collect()
    }
    assert out["url-1"] is True
    assert out[None] is False
    # 2^16 bits / 40 keys: FP rate ~1e-10 — definitely-new must be new
    assert out["definitely-new-x"] is False


def test_bad_num_bits(spark):
    df = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(ValueError):
        bloom_build(df, "k", num_bits=100)


def test_fp_rate_estimate_sane(spark):
    df = spark.createDataFrame([(v,) for v in SEEN], ["k"])
    bf = bloom_build(df, "k", num_bits=512, num_hashes=3)
    est = bf.fp_rate_estimate()
    assert 0.0 < est < 1.0
    empty = BloomFilter((0,) * 8, 512, 3)
    assert empty.fp_rate_estimate() == 0.0
