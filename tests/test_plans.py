"""Plan-shape regression tests — the 100 TB story, asserted.

These compile Catalyst plans (explain only, no job execution) and
assert the structural properties BENCH/PLANS.md documents prose-style:
column pruning reaches the parquet scan, no accidental cartesian
products, broadcast where a broadcast is intended, partitioned (never
global) windows on per-document operators. If a refactor regresses a
plan shape, this fails before the benchmark does.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from graphscope_spark import harness as H


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return H.load(spark, SF_DIR, "documents")


def test_tfidf_plan_shape(docs):
    from graphscope_spark.functions.ranking import tfidf_top_terms

    p = plan_of(tfidf_top_terms(docs, k=3))
    # tokenize+explode fused over a 2-column pruned scan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p
    # corpus size is a broadcast 1-row aggregate, not a shuffle join
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    # top-k is a window PARTITIONED by doc_id — never a global window
    assert "PARTITION BY" in p or "windowspecdefinition(doc_id" in p


def test_bm25_plan_query_filter_under_agg(docs):
    from graphscope_spark.functions.ranking import bm25_score

    p = plan_of(bm25_score(docs, query="alpha beta"))
    # literal query terms fold into a pre-aggregate IN filter
    assert "CartesianProduct" not in p
    assert p.count("Exchange SinglePartition") <= 1  # only the 1-row agg


def test_exact_dedup_plan_no_join(docs):
    from graphscope_spark.functions.dedup import exact_dedup

    p = plan_of(exact_dedup(docs))
    assert "CartesianProduct" not in p


def test_degrees_plan_pruned_scan(spark):
    g = H.g1(spark, SF_DIR).build()
    p = plan_of(g.out_degrees())
    assert "CartesianProduct" not in p


def test_filter_pushdown_reaches_scan(docs):
    p = plan_of(docs.where(F.col("doc_id") < 10).select("doc_id"))
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in p
    # column pruning: text never read
    assert "ReadSchema: struct<doc_id:bigint>" in p


def test_embedding_schema(spark):
    emb = H.load(spark, SF_DIR, "embeddings")
    p = plan_of(emb.select("vec_id"))
    assert "ReadSchema: struct<vec_id:bigint>" in p


def test_minhash_lsh_shuffles_on_band_bucket(docs):
    from graphscope_spark.functions.dedup import minhash_lsh_pairs

    p = plan_of(minhash_lsh_pairs(docs))
    # candidate join shuffles on the (band, key) group, not all-pairs
    assert "CartesianProduct" not in p
