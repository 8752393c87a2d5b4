"""Perceptual image near-dup (multimodal.py dHash + banded segment
join) vs a brute-force Python twin, with the pigeonhole recall
guarantee checked explicitly."""

from __future__ import annotations

import numpy as np
import pytest

from graphscope_spark.functions.multimodal import (
    decode_bmp,
    dhash64_py,
    encode_bmp,
    image_dhash,
    image_near_dup_pairs,
    synth_media,
)


def _perturb(payload: bytes, dr: int) -> bytearray:
    img = decode_bmp(bytes(payload)).copy()
    img[0, 0, 0] = (int(img[0, 0, 0]) + dr) % 256
    return bytearray(encode_bmp(img))


@pytest.fixture(scope="module")
def corpus(spark):
    media = synth_media(spark, n=60)
    rows = media.where("kind = 'image'").limit(8).collect()
    dups = [
        (r["media_id"] + 1000, "image", _perturb(r["payload"], 7),
         r["width"], r["height"], r["duration_ms"])
        for r in rows
    ]
    return media.unionByName(spark.createDataFrame(dups, media.schema))


def test_dhash_matches_python_twin(corpus):
    got = {r["media_id"]: r["dhash"] for r in image_dhash(corpus).collect()}
    rows = corpus.collect()
    want = {
        r["media_id"]: dhash64_py(bytes(r["payload"]))
        for r in rows
        if dhash64_py(bytes(r["payload"])) is not None
    }
    assert got == want
    # audio / video rows are undecodable as images -> absent
    kinds = {r["media_id"]: r["kind"] for r in rows}
    assert all(kinds[m] == "image" for m in got)


def test_banded_join_matches_bruteforce(corpus):
    hs = {r["media_id"]: r["dhash"] for r in image_dhash(corpus).collect()}
    brute = set()
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:  # < bands=4 -> pigeonhole guarantees a shared band
                brute.add((a, b, d))
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in image_near_dup_pairs(corpus, max_hamming=3, bands=4).collect()
    }
    assert brute <= got  # recall guarantee below `bands` bits
    assert all(h <= 3 for _, _, h in got)


def test_planted_dups_found(corpus):
    pairs = image_near_dup_pairs(corpus, max_hamming=10).collect()
    planted = {(p["a"], p["b"]) for p in pairs if p["b"] - p["a"] == 1000}
    assert len(planted) == 8


def test_identical_payload_hamming_zero(spark):
    media = synth_media(spark, n=9).where("kind = 'image'")
    r = media.limit(1).collect()[0]
    two = spark.createDataFrame(
        [(1, "image", bytearray(bytes(r["payload"])), r["width"],
          r["height"], 0),
         (2, "image", bytearray(bytes(r["payload"])), r["width"],
          r["height"], 0)],
        media.schema,
    )
    out = image_near_dup_pairs(two, max_hamming=0).collect()
    assert [(p["a"], p["b"], p["hamming"]) for p in out] == [(1, 2, 0)]
