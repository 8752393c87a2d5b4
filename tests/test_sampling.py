"""Deterministic sampling / split operators (functions/sampling.py)."""

from __future__ import annotations

import hashlib

import pytest

from graphscope_spark.functions.sampling import (
    assign_splits,
    stratified_sample,
    uniform_draw,
)


def _u(seed: int, did: int) -> float:
    h = hashlib.md5(f"{seed}:{did}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr"))
            for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_uniform_draw_matches_python_twin(spark, docs):
    got = {r["doc_id"]: r["u"] for r in
           docs.select("doc_id", uniform_draw("doc_id", seed=5).alias("u")).collect()}
    for did, u in got.items():
        assert abs(u - _u(5, did)) < 1e-12


def test_stratified_sample_exact_membership(docs):
    fr = {"en": 0.5, "de": 0.2}
    kept = {r["doc_id"] for r in
            stratified_sample(docs, "lang", fr, seed=3).collect()}
    exp = set()
    for i in range(200):
        lang = "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr")
        if lang in fr and _u(3, i) < fr[lang]:
            exp.add(i)
    assert kept == exp
    assert all(i % 3 != 2 for i in kept)  # 'fr' stratum dropped entirely


def test_stratified_sample_parallelism_invariant(docs):
    fr = {"en": 0.4, "de": 0.4, "fr": 0.4}
    a = sorted(r["doc_id"] for r in
               stratified_sample(docs, "lang", fr, seed=9).collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(docs.repartition(17), "lang", fr, seed=9).collect())
    assert a == b


def test_assign_splits_thresholds_and_total(docs):
    out = assign_splits(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                        seed=11).collect()
    assert len(out) == 200  # total partition: every row labeled exactly once
    for r in out:
        u = _u(11, r["doc_id"])
        exp = "train" if u < 0.8 else ("val" if u < 0.9 else "test")
        assert r["split"] == exp


def test_assign_splits_rejects_bad_weights(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(docs, {"a": 0.5, "b": 0.1})
