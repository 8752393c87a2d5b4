"""Similarity search (functions/similarity.py): cosine kNN vs a NumPy
oracle, and the hyperplane-LSH near-dup path — candidates are exact
(subset of brute force with identical scores), banding (OR-construction)
only adds recall, and the md5-parity sign matrix is engine-portable
(pure-Python twin reproduces the exact buckets)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from graphscope_spark.functions.similarity import (
    embedding_near_dup_exact,
    embedding_near_dup_lsh,
    hyperplane_signs,
    knn_cosine,
    lsh_hyperplane_bands,
)

DIM = 8
N = 40


def _vecs():
    # deterministic pseudo-random unit-ish vectors + planted near-dups
    out = []
    for i in range(N):
        h = hashlib.md5(f"vec{i}".encode()).digest()
        v = [((b % 64) - 32) / 32.0 for b in h[:DIM]]
        out.append((i, v))
    # planted near-duplicates of vec 0 and vec 7
    base0 = out[0][1]
    base7 = out[7][1]
    out.append((100, [x * 1.01 + 0.001 for x in base0]))
    out.append((101, [x * 0.99 - 0.002 for x in base0]))
    out.append((102, [x * 1.02 for x in base7]))
    return out


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _vecs(), "vec_id long, embedding array<double>"
    ).cache()


def _np_cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_knn_cosine_matches_numpy(spark, emb):
    queries = spark.createDataFrame(
        [(i, v) for i, v in _vecs()[:3]], "query_id long, qvec array<double>"
    )
    got = knn_cosine(emb, queries, k=4).collect()
    vecs = dict(_vecs())
    for qid in range(3):
        exp = sorted(
            ((round(_np_cos(vecs[qid], v), 4), -i) for i, v in vecs.items() if i != qid),
            reverse=True,
        )[:4]
        mine = sorted(
            ((r["cos"], -r["vec_id"]) for r in got if r["query_id"] == qid),
            reverse=True,
        )
        assert [c for c, _ in mine] == pytest.approx([c for c, _ in exp], abs=1e-4)


def test_lsh_near_dup_subset_of_exact(emb):
    exact = {
        (r["a"], r["b"]): r["cos"]
        for r in embedding_near_dup_exact(emb, threshold=0.8).collect()
    }
    lsh = {
        (r["a"], r["b"]): r["cos"]
        for r in embedding_near_dup_lsh(
            emb, threshold=0.8, num_planes=4, num_bands=4
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # planted near-dups collide in some band with overwhelming odds
    assert (0, 100) in lsh and (0, 101) in lsh and (7, 102) in lsh


def test_lsh_banding_monotone_recall(emb):
    one = embedding_near_dup_lsh(emb, 0.8, num_planes=4, num_bands=1)
    four = embedding_near_dup_lsh(emb, 0.8, num_planes=4, num_bands=4)
    p1 = {(r["a"], r["b"]) for r in one.collect()}
    p4 = {(r["a"], r["b"]) for r in four.collect()}
    assert p1 <= p4  # band 0 of the global family is the 1-band table


def test_hyperplane_signs_portable(emb):
    # pure-Python twin of the bucket computation reproduces Spark's
    planes = hyperplane_signs(8, DIM)
    vecs = dict(_vecs())
    exp = {}
    for i, v in vecs.items():
        for band in range(2):
            bucket = 0
            for p in range(band * 4, (band + 1) * 4):
                proj = sum(x * s for x, s in zip(v, planes[p]))
                bucket = bucket * 2 + (1 if proj >= 0 else 0)
            exp[(i, band)] = bucket
    got = {
        (r["vec_id"], r["band"]): r["bucket"]
        for r in lsh_hyperplane_bands(emb, num_planes=4, num_bands=2).collect()
    }
    assert got == exp


def test_knn_no_candidates_broadcast_guard(spark):
    """A large embeddings table without `candidates` must refuse the
    full-table broadcast and point at the bucketed paths (ADVICE r2)."""
    from pyspark.sql import functions as F

    from graphscope_spark.functions.similarity import knn_cosine

    big = spark.range(200_001).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))
    q = spark.createDataFrame([(9_999_999, [1.0, 0.0])],
                              "query_id long, qvec array<double>")
    with pytest.raises(ValueError, match="knn_ivf"):
        knn_cosine(big, q, k=3)


def test_quantize_embeddings_known_values(spark):
    from graphscope_spark.functions.similarity import quantize_embeddings
    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25]), (1, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    rows = {r["vec_id"]: (r["qvec_i8"], r["qvec_i8_scale"])
            for r in quantize_embeddings(df).collect()}
    # s=1.0: [127, -64 (round(-63.5) away from zero), 32 (round(31.75))]
    assert rows[0][0] == [127, -64, 32]
    assert rows[0][1] == 1.0
    # zero vector quantizes to zeros, scale 0
    assert rows[1] == ([0, 0, 0], 0.0)


def test_knn_quantized_recall_vs_exact(spark, emb):
    from graphscope_spark.functions.similarity import (knn_cosine,
                                                       knn_quantized)
    from pyspark.sql import functions as F
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    exact = {(r["query_id"], r["vec_id"])
             for r in knn_cosine(emb, queries, k=5).collect()}
    quant = {(r["query_id"], r["vec_id"])
             for r in knn_quantized(emb, queries, k=5).collect()}
    # int8 rounding barely moves cosines: recall@5 must stay high
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, f"quantized recall {recall} too low"


def test_knn_candidate_pair_shapes(spark, emb):
    from graphscope_spark.functions.similarity import (knn_cosine,
                                                       lsh_candidate_pairs)
    from pyspark.sql import functions as F
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    # (a, b) symmetric pairs from LSH plug straight in (used to raise
    # UNRESOLVED_COLUMN, the exact shape the guard error recommends)
    pairs = lsh_candidate_pairs(emb, num_planes=2)
    got = knn_cosine(emb, queries, k=3, candidates=pairs).collect()
    assert all(r["query_id"] != r["vec_id"] for r in got)
    # per-query (query_id, vec_id) pairs restrict exactly
    explicit = spark.createDataFrame(
        [(0, 5), (0, 6), (1, 7)], "query_id long, vec_id long")
    got2 = {(r["query_id"], r["vec_id"])
            for r in knn_cosine(emb, queries, k=3,
                                candidates=explicit).collect()}
    assert got2 <= {(0, 5), (0, 6), (1, 7)}
    # exclude_self=False keeps the identity match at cos 1.0
    got3 = knn_cosine(emb, queries, k=1, exclude_self=False).collect()
    assert {(r["query_id"], r["vec_id"]) for r in got3} == {(i, i) for i in range(3)}
    assert all(r["cos"] == 1.0 for r in got3)
