"""WARC container writer/reader (graphscope_spark/warc.py): byte-
identical round trip, determinism across parallelism, truncation
tolerance, record-type filtering."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from graphscope_spark import warc as W
from graphscope_spark.pages import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, n=200).cache()


def _roundtrip(pages, **kw):
    files = W.pages_to_warc(pages, **kw)
    return W.read_warc(files)


@pytest.mark.parametrize("gz", [True, False])
def test_round_trip_byte_identity(spark, pages, gz):
    got = _roundtrip(pages, n_shards=4, gzip_members=gz)
    j = (
        pages.select("url", F.col("html").alias("want"),
                     F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("wd"))
        .join(got, "url", "full_outer")
    )
    rows = j.collect()
    assert len(rows) == 200
    for r in rows:
        assert r["warc_type"] == "response"
        assert bytes(r["html"]) == bytes(r["want"]), r["url"]
        assert r["warc_date"] == r["wd"]


def test_warc_ts_recoverable(spark, pages):
    got = _roundtrip(pages, n_shards=4).withColumn(
        "ts", F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    )
    j = pages.select("url", "warc_ts").join(got, "url")
    assert j.where(F.col("ts") != F.col("warc_ts")).count() == 0


def test_file_bytes_deterministic_across_parallelism(spark, pages):
    def digests(df):
        return {
            r["file_name"]: hashlib.md5(bytes(r["content"])).hexdigest()
            for r in W.pages_to_warc(df, n_shards=4).collect()
        }

    a = digests(pages.repartition(1))
    b = digests(pages.repartition(7, "lang"))
    assert a == b and len(a) == 4


def test_warcinfo_filtered_by_default(spark, pages):
    files = W.pages_to_warc(pages, n_shards=2)
    assert W.read_warc(files).where(F.col("warc_type") != "response").count() == 0
    everything = W.read_warc(files, types=())
    assert everything.where(F.col("warc_type") == "warcinfo").count() == 2
    assert everything.count() == 202


def test_truncated_tail_skipped(spark, pages):
    [f] = W.pages_to_warc(pages.limit(5), n_shards=1,
                          gzip_members=False).collect()
    whole = W.read_warc(
        spark.createDataFrame([(bytes(f["content"]),)], "content binary")
    ).count()
    cut = W.read_warc(
        spark.createDataFrame([(bytes(f["content"])[:-40],)], "content binary")
    ).count()
    assert whole == 5
    assert cut == 4  # last record's body is incomplete → dropped, no crash


def test_empty_and_null_html(spark):
    df = spark.createDataFrame(
        [("https://a.example/x", "2024-01-01 00:00:00", b""),
         ("https://a.example/y", "2024-01-01 00:00:01", None)],
        "url string, warc_ts string, html binary",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    got = {r["url"]: bytes(r["html"])
           for r in _roundtrip(df, n_shards=1).collect()}
    assert got == {"https://a.example/x": b"", "https://a.example/y": b""}


def test_record_id_deterministic(spark, pages):
    a = {r["url"]: r["record_id"] for r in _roundtrip(pages, n_shards=2).collect()}
    b = {r["url"]: r["record_id"] for r in _roundtrip(pages, n_shards=3).collect()}
    assert a == b


# ---------------------------------------------------------------------
# CDX index + random-access fetch
# ---------------------------------------------------------------------
def test_surt_key(spark):
    df = spark.createDataFrame(
        [("https://www.Example.com:8080/a/b?q=1",),
         ("http://site.example/",),
         ("https://x.y.z.example/p",)],
        "url string",
    )
    got = [r[0] for r in df.select(W.surt_key("url")).collect()]
    assert got == [
        "com,example,www)/a/b?q=1",
        "example,site)/",
        "example,z,y,x)/p",
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_cdx_random_access_fetch(spark, pages, gz):
    files = W.pages_to_warc(pages, n_shards=3, gzip_members=gz).cache()
    cdx = W.cdx_index(files)
    assert cdx.count() == 200
    # digest is md5 of the html payload (cross-checked JVM-side)
    bad = (
        W.read_warc(files).select("url", F.md5("html").alias("want"))
        .join(cdx, "url")
        .where(F.col("want") != F.col("digest"))
    )
    assert bad.count() == 0
    # ranged fetch: every CDX row's (offset, length) slice must parse
    # back to the byte-identical original page
    blobs = {r["file_name"]: bytes(r["content"]) for r in files.collect()}
    want = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    for r in cdx.collect():
        url, _t, _d, _rid, html = W.fetch_warc_record(
            blobs[r["file_name"]], r["offset"], r["length"]
        )
        assert url == r["url"]
        assert html == want[url]
    files.unpersist()


def test_cdx_sorted_layout(spark, pages):
    cdx = W.cdx_index(W.pages_to_warc(pages, n_shards=3), sort=True)
    pdf = cdx.toPandas()
    # globally ordered when partitions are read in order
    assert list(pdf["surt"]) == sorted(pdf["surt"])
