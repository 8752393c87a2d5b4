"""wcc warm_labels (incremental CC) and keep_best (recrawl dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark import LinkGraph
from graphscope_spark.algorithms import wcc
from graphscope_spark.functions.dedup import keep_best


def _g(spark, edges):
    return LinkGraph.from_edges(
        spark.createDataFrame(edges, ["src", "dst"]), directed=True
    )


def test_wcc_warm_start_matches_cold(spark):
    old_edges = [(i, i + 1) for i in range(0, 20)] + [(30, 31), (31, 32)]
    new_edges = old_edges + [(20, 30), (40, 41)]  # merge + new comp
    prior = wcc(_g(spark, old_edges))
    warm = {
        r["id"]: r["comp"]
        for r in wcc(_g(spark, new_edges), warm_labels=prior).collect()
    }
    cold = {
        r["id"]: r["comp"] for r in wcc(_g(spark, new_edges)).collect()
    }
    assert warm == cold


def test_wcc_warm_start_fewer_rounds_on_chain(spark):
    # a 40-chain: cold hash-min (no shortcut) needs ~diameter rounds;
    # warm-started with the true labels it must stop immediately.
    edges = [(i, i + 1) for i in range(39)]
    g = _g(spark, edges)
    prior = wcc(g)
    info_cold = wcc(g, two_phase=False, fixed_rounds=2)
    # fixed 2 rounds from scratch cannot be converged on a 40-chain
    assert (
        info_cold.where(F.col("comp") != 0).count() > 0
    )
    warm = wcc(g, two_phase=False, fixed_rounds=2, warm_labels=prior)
    assert warm.where(F.col("comp") != 0).count() == 0


def test_keep_best_matches_window_twin(spark):
    rows = [
        ("a", 1, 10, "x1"),
        ("a", 2, 10, "x2"),   # tie on score -> higher id wins
        ("a", 3, 5, "x3"),
        ("b", 4, 1, "y1"),
        ("b", 5, 2, "y2"),
    ]
    df = spark.createDataFrame(rows, ["k", "doc_id", "score", "payload"])
    got = {
        r["k"]: (r["doc_id"], r["payload"])
        for r in keep_best(df, ["k"], "score", "doc_id").collect()
    }
    assert got == {"a": (2, "x2"), "b": (5, "y2")}


def test_keep_best_partitioning_invariant(spark):
    rows = [(f"k{i % 7}", i, (i * 37) % 11, f"p{i}") for i in range(200)]
    df1 = spark.createDataFrame(rows, ["k", "doc_id", "score", "payload"])
    a = sorted(
        map(tuple, keep_best(df1, ["k"], "score", "doc_id").collect())
    )
    b = sorted(
        map(
            tuple,
            keep_best(
                df1.repartition(13), ["k"], "score", "doc_id"
            ).collect(),
        )
    )
    assert a == b and len(a) == 7
