"""Pages pipeline (SURVEY.md §2.10 / north-rule input_hint): schema,
byte-identical extraction, link extraction, hashed graph build."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphscope_spark import LinkGraph
from graphscope_spark.pages import (
    extract_links,
    extract_text,
    generate_pages,
    pages_to_edges,
)


def test_pages_schema_and_determinism(spark):
    p1 = generate_pages(spark, n=200)
    assert [f.name for f in p1.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    a = sorted(r["url"] for r in p1.collect())
    b = sorted(r["url"] for r in generate_pages(spark, n=200).collect())
    assert a == b


def test_extract_text_byte_identical(spark):
    pages = generate_pages(spark, n=300)
    bad = (
        pages.withColumn("e", extract_text("html"))
        .where(F.col("e") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_extract_text_null_safe(spark):
    df = spark.createDataFrame([(None,), (b"<p>x</p>",)], "html binary")
    rows = df.select(extract_text("html").alias("t")).collect()
    assert {r["t"] for r in rows} == {None, "x"}


def test_links_and_graph_build(spark):
    pages = generate_pages(spark, n=300).cache()
    edges = pages_to_edges(pages)
    # every link target is a generated url shape
    assert edges.where(~F.col("dst_url").startswith("https://site")).count() == 0
    g = LinkGraph.from_url_edges(edges)
    assert g.num_vertices() > 0
    assert g.num_edges() == edges.count()
    # hash-collision audit on this population
    urls = pages.select("url")
    assert LinkGraph.audit_hash_collisions(urls) == 0
    # link extraction agrees with explode(extract_links)
    n_links = pages.select(F.explode(extract_links("html"))).count()
    assert n_links == g.num_edges()
    pages.unpersist()
