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


def test_extract_anchors_kernel(spark):
    from graphscope_spark.pages import anchor_text_index, extract_anchors

    cases = [
        # nested inline markup folds into the text
        ("u1", b'<a href="/x">pre <b>mid</b> post</a>'),
        # two anchors, one without href (skipped by the index)
        ("u2", b'<a href="/x">one</a><a>nohref</a><a href="/y"></a>'),
        # unclosed trailing anchor still flushes
        ("u3", b'text <a href="/z">tail'),
        ("u4", None),
    ]
    df = spark.createDataFrame(cases, "url string, html binary")
    rows = {r["url"]: r["a"] for r in
            df.select("url", extract_anchors("html").alias("a")).collect()}
    assert [(a["href"], a["text"]) for a in rows["u1"]] == [("/x", "pre mid post")]
    assert [(a["href"], a["text"]) for a in rows["u2"]] == [
        ("/x", "one"), (None, "nohref"), ("/y", "")]
    assert [(a["href"], a["text"]) for a in rows["u3"]] == [("/z", "tail")]
    assert rows["u4"] == []

    idx = {r["dst_url"]: (r["n_refs"], r["texts"])
           for r in anchor_text_index(df).collect()}
    assert idx["/x"] == (2, ["one", "pre mid post"])
    assert idx["/y"] == (1, [""])
    assert idx["/z"] == (1, ["tail"])


def test_anchor_index_on_generated_pages(spark):
    from graphscope_spark.pages import anchor_text_index, generate_pages

    pages = generate_pages(spark, n=200)
    idx = anchor_text_index(pages)
    # generator embeds anchors 'link {t}' at hrefs .../p/{t}: every
    # index row's texts must be exactly ['link {t}'] for its target
    bad = idx.where(
        ~(F.size("texts") == 1)
        | (F.element_at("texts", 1)
           != F.concat(F.lit("link "), F.regexp_extract("dst_url", r"/p/(\d+)$", 1)))
    ).count()
    assert bad == 0
