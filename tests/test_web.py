"""URL canonicalization + host-graph rollup (graphscope_spark/web.py):
rule-by-rule canonicalization cases, host/domain/reversed-host keys,
and the page→host rollup counts, all vs hand-computed expectations.
The kernels are pure Catalyst expressions, so the driver-side oracle
(DuckDB twin in __spark_entry__.py) covers engine parity; these tests
pin the *semantics*."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.web import (
    canonicalize_url,
    host_graph,
    registered_domain,
    reverse_host,
    url_host,
)

CANON_CASES = [
    # lowercase scheme+authority, never the path
    ("HTTPS://WWW.Example.COM/Path/To", "https://www.example.com/Path/To"),
    # strip fragment
    ("http://a.com/x#sec", "http://a.com/x"),
    # strip scheme-default port only
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    ("https://a.com:80/x", "https://a.com:80/x"),
    # drop tracking params, sort survivors, drop bare '?'
    ("http://a.com/x?utm_source=t&b=2&a=1", "http://a.com/x?a=1&b=2"),
    ("http://a.com/x?utm_campaign=z&fbclid=1&gclid=2&msclkid=3", "http://a.com/x"),
    ("http://a.com/x?", "http://a.com/x"),
    # strip one trailing slash unless path is exactly '/'
    ("http://a.com/x/", "http://a.com/x"),
    ("http://a.com/", "http://a.com/"),
    ("http://a.com", "http://a.com"),
    # all rules at once
    (
        "HTTP://News.Site.COM:80/a/b/?utm_medium=m&z=9&a=0#top",
        "http://news.site.com/a/b?a=0&z=9",
    ),
    # unparseable → unchanged
    ("not a url", "not a url"),
    ("", ""),
]


def test_canonicalize_url(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], ["url"])
    got = {
        r["url"]: r["canon"]
        for r in df.select("url", canonicalize_url("url").alias("canon")).collect()
    }
    for url, want in CANON_CASES:
        assert got[url] == want, f"{url!r}: {got[url]!r} != {want!r}"


def test_canonicalize_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], ["url"])
    rows = df.select(
        canonicalize_url("url").alias("c1"),
        canonicalize_url(canonicalize_url("url")).alias("c2"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"]


def test_host_domain_reverse(spark):
    df = spark.createDataFrame(
        [
            ("https://WWW.News.BBC.com:8443/x?q=1",),
            ("http://localhost:8080/",),
            ("nope",),
        ],
        ["url"],
    )
    rows = df.select(
        url_host("url").alias("h"),
        registered_domain(url_host("url")).alias("d"),
        reverse_host(url_host("url")).alias("r"),
    ).collect()
    assert (rows[0]["h"], rows[0]["d"], rows[0]["r"]) == (
        "www.news.bbc.com",
        "bbc.com",
        "com.bbc.news.www",
    )
    # single-label host passes through registered_domain
    assert (rows[1]["h"], rows[1]["d"], rows[1]["r"]) == (
        "localhost",
        "localhost",
        "localhost",
    )
    # unparseable → '' host
    assert rows[2]["h"] == ""


PAGE_EDGES = [
    # 3 links a.x.com → b.x.com (one via default port), 1 self-host link
    ("http://a.x.com/1", "http://b.x.com/p"),
    ("http://a.x.com/2", "http://b.x.com:80/q"),
    ("http://a.x.com/3", "http://b.x.com/r"),
    ("http://a.x.com/4", "http://a.x.com/5"),
    # cross-domain
    ("https://c.y.org/1", "http://a.x.com/1"),
    # unparseable dst dropped
    ("http://a.x.com/6", "mailto:z"),
]


def test_host_graph_levels(spark):
    df = spark.createDataFrame(PAGE_EDGES, ["src_url", "dst_url"])
    hg = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(df).collect()
    }
    assert hg == {
        ("a.x.com", "b.x.com"): 3,
        ("a.x.com", "a.x.com"): 1,
        ("c.y.org", "a.x.com"): 1,
    }
    # drop_self removes the intra-host edge
    hg2 = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(df, drop_self=True).collect()
    }
    assert ("a.x.com", "a.x.com") not in hg2 and len(hg2) == 2
    # domain level folds a.x.com/b.x.com into x.com (self-edges appear)
    dg = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(df, level="domain", drop_self=True).collect()
    }
    assert dg == {("y.org", "x.com"): 1}
    # reversed-host level
    rg = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(df, level="reversed_host").collect()
    }
    assert rg[("com.x.a", "com.x.b")] == 3


def test_host_graph_bad_level(spark):
    df = spark.createDataFrame(PAGE_EDGES, ["src_url", "dst_url"])
    with pytest.raises(ValueError):
        host_graph(df, level="tld")


def test_filter_urls(spark):
    from graphscope_spark.web import filter_urls

    df = spark.createDataFrame(
        [("https://news.bbc.com/a",), ("http://cdn.spam.net/x",),
         ("https://ok.example.org/",), ("https://spam.net:8080/y",),
         ("singlelabel",)],
        "url string")
    # literal-list form: codegen NOT-isin, no shuffle
    kept = sorted(r["url"] for r in
                  filter_urls(df, ["spam.net"]).collect())
    assert kept == ["https://news.bbc.com/a", "https://ok.example.org/",
                    "singlelabel"]
    # DataFrame form: broadcast anti-join, same result
    b = spark.createDataFrame([("spam.net",), ("bbc.com",)], "domain string")
    kept2 = sorted(r["url"] for r in filter_urls(df, b).collect())
    assert kept2 == ["https://ok.example.org/", "singlelabel"]
    # host level blocks the exact host only
    kept3 = sorted(r["url"] for r in
                   filter_urls(df, ["cdn.spam.net"], level="host").collect())
    assert "https://spam.net:8080/y" in kept3
    import pytest as _pt
    with _pt.raises(ValueError):
        filter_urls(df, [], level="nope")
