"""WARC (Web ARChive, ISO 28500) container writer + reader — the
on-disk format Common Crawl actually ships (`crawl-*.warc.gz`: one
gzip member per record, a `warcinfo` record first, then `response`
records). The north star's ingestion edge: crawl containers in, the
(url, warc_ts, html, text, lang) pages table out.

Writer (`pages_to_warc`): packs a pages DataFrame into shard files.
Shard assignment is xxhash64(url) % n_shards — deterministic,
restart-stable, parallelism-independent (NOT spark_partition_id, which
changes with cluster size); records within a shard are ordered by
(warc_ts, url) so the output file bytes are bit-identical on every
run. Each record is its own gzip member (mtime=0 for determinism),
the Common-Crawl convention that lets a reader stream records without
decompressing the whole file.

Reader (`read_warc`): mapInPandas over (file, content) rows — one
task per container file, the standard Spark/CC parallelism unit (CC
shards are ~1 GB, one task each; 64k files = 64k tasks). Parses WARC
headers + the enclosed HTTP response, yields one row per record.
Truncated trailing bytes are skipped (a real crawl has them), other
malformed records raise. Gzip vs plain is sniffed per file from the
magic bytes.

Round-trip contract (tests/test_warc.py + the `warc_roundtrip` driver
query): read_warc(pages_to_warc(pages)) reproduces every (url,
warc_date, html) byte-identically — same bar as extract_text's
byte-identity contract.

Both kernels are Arrow-batched `mapInPandas`/`applyInPandas` (binary
container framing is not SQL-expressible — the same justification as
pages.py's HTML parser; everything downstream of the pages table stays
in Catalyst expressions).

Scale shape: the writer is one shuffle (groupBy shard) + one Python
pass per shard; size shards via n_shards so a shard fits an executor
(CC's own layout: fixed ~1 GB files). The reader is shuffle-free.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pages_to_warc",
    "read_warc",
    "warc_record_bytes",
    "cdx_index",
    "fetch_warc_record",
    "surt_key",
]

_WARC_VERSION = b"WARC/1.0"
_GZIP_MAGIC = b"\x1f\x8b"

WARC_FILES_SCHEMA = "shard int, file_name string, n_records long, content binary"
WARC_RECORDS_SCHEMA = (
    "url string, warc_type string, warc_date string, record_id string, "
    "html binary"
)


def _record_uuid(url: str, date: str) -> str:
    """Deterministic record id: md5(url|date) formatted as a UUID —
    restart-stable (a real uuid4 would break the byte-identity
    contract and resume semantics)."""
    h = hashlib.md5(f"{url}|{date}".encode()).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def warc_record_bytes(url: str, date: str, html: bytes) -> bytes:
    """One WARC/1.0 response record (headers + enclosed HTTP response +
    the two-CRLF record trailer), uncompressed."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{_record_uuid(url, date)}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
        f"\r\n"
    ).encode()
    return headers + http + b"\r\n\r\n"


def _warcinfo_bytes(file_name: str, n_records: int) -> bytes:
    body = (
        f"software: graphscope-spark\r\nformat: WARC File Format 1.0\r\n"
        f"records: {n_records}\r\n"
    ).encode()
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: warcinfo\r\n"
        f"WARC-Record-ID: <urn:uuid:{_record_uuid(file_name, 'warcinfo')}>\r\n"
        f"WARC-Filename: {file_name}\r\n"
        f"Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode()
    return headers + body + b"\r\n\r\n"


def pages_to_warc(
    pages: DataFrame,
    n_shards: int = 8,
    gzip_members: bool = True,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """(shard, file_name, n_records, content) — pages packed into
    deterministic WARC shard files. WARC-Date comes from `ts_col`
    rendered as ISO-8601 Z (`date_format`, JVM-side, so the Python
    kernel never touches timestamp objects or session timezones)."""
    nf = int(n_shards)
    gz = bool(gzip_members)

    staged = pages.select(
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(nf)).cast("int").alias("shard"),
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("wdate"),
        F.col(html_col).alias("html"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["wdate", "url"], kind="mergesort")
        ext = "warc.gz" if gz else "warc"
        name = f"crawl-{shard:05d}.{ext}"
        parts = [_warcinfo_bytes(name, len(pdf))]
        for url, wdate, html in zip(pdf["url"], pdf["wdate"], pdf["html"]):
            parts.append(warc_record_bytes(url, wdate, bytes(html or b"")))
        if gz:
            parts = [gzip.compress(p, mtime=0) for p in parts]
        return pd.DataFrame(
            {
                "shard": [shard],
                "file_name": [name],
                "n_records": [len(pdf)],
                "content": [b"".join(parts)],
            }
        )

    return staged.groupBy("shard").applyInPandas(pack, WARC_FILES_SCHEMA)


def _iter_gzip_members(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(compressed_offset, compressed_length, plaintext) per gzip
    member (CC convention: one record per member — which is what makes
    (offset, length) ranged fetches possible). A truncated final
    member is dropped."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        plain = d.decompress(data[pos:]) + d.flush()
        if not d.eof:
            break
        end = n - len(d.unused_data)
        yield pos, end - pos, plain
        pos = end


def _parse_warc_stream(
    data: bytes,
) -> Iterator[tuple[str, str, str, str, bytes, int, int]]:
    """Yield (url, warc_type, warc_date, record_id, html, start,
    length) per record, with (start, length) the record's byte span in
    `data`. Truncated trailing bytes are skipped; a corrupt record
    boundary mid-stream raises."""
    pos = 0
    n = len(data)
    while pos < n:
        start = pos
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad record boundary at byte {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break  # truncated header block
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers["content-length"])
        body_start = hdr_end + 4
        if body_start + clen > n:
            break  # truncated body
        body = data[body_start : body_start + clen]
        pos = body_start + clen
        if data[pos : pos + 4] == b"\r\n\r\n":
            pos += 4
        elif pos < n:
            raise ValueError(f"missing record trailer at byte {pos}")
        wtype = headers.get("warc-type", "")
        html = b""
        if wtype == "response":
            http_end = body.find(b"\r\n\r\n")
            html = body[http_end + 4 :] if http_end >= 0 else b""
        rid = headers.get("warc-record-id", "").strip("<>")
        rid = rid.removeprefix("urn:uuid:")
        yield (
            headers.get("warc-target-uri", ""),
            wtype,
            headers.get("warc-date", ""),
            rid,
            html,
            start,
            pos - start,
        )


def _iter_records(data: bytes) -> Iterator[tuple[str, str, str, str, bytes, int, int]]:
    """Records of one container file with ranged-fetch spans: for
    gzip-member files the span is the COMPRESSED member (what a CDX
    entry stores — a ranged GET + gunzip yields the record); for plain
    files it is the uncompressed record span."""
    if data[:2] == _GZIP_MAGIC:
        for off, clen, plain in _iter_gzip_members(data):
            for rec in _parse_warc_stream(plain):
                yield rec[:5] + (off, clen)
    else:
        yield from _parse_warc_stream(data)


def fetch_warc_record(
    content: bytes, offset: int, length: int
) -> tuple[str, str, str, str, bytes]:
    """Random-access fetch: parse the single record at a CDX (offset,
    length) span of a container file's bytes. At cluster scale the
    slice is a ranged GET against the object store — exactly how CC's
    index consumers read one page without scanning the shard."""
    blob = content[offset : offset + length]
    if blob[:2] == _GZIP_MAGIC:
        blob = gzip.decompress(blob)
    [rec] = list(_parse_warc_stream(blob))
    return rec[:5]


def read_warc(
    files: DataFrame,
    content_col: str = "content",
    types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """(url, warc_type, warc_date, record_id, html) — one row per WARC
    record of the requested types. One task per container file;
    gzip/plain sniffed from the magic bytes. Recover the typed pages
    columns with
    ``to_timestamp(warc_date, "yyyy-MM-dd'T'HH:mm:ss'Z'")``."""
    keep = tuple(types)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[tuple] = []
            for blob in b[content_col]:
                for rec in _iter_records(bytes(blob or b"")):
                    if not keep or rec[1] in keep:
                        rows.append(rec[:5])
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_type", "warc_date", "record_id", "html"],
            )

    return files.select(content_col).mapInPandas(parse, WARC_RECORDS_SCHEMA)


def surt_key(url: Column | str) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key, the CDX sort
    order: comma-reversed lowercased host + ')' + path[?query]
    ('https://www.Example.com:8080/a/b?q=1' →
    'com,example,www)/a/b?q=1'). Simplified vs pywb's canonicalizer
    (no www-strip / param normalization — compose canonicalize_url
    first for that); pure Catalyst expressions, zero Python."""
    from graphscope_spark.web import URL_RE, url_host

    u = url if isinstance(url, Column) else F.col(url)
    rev = F.concat_ws(",", F.reverse(F.split(url_host(u), r"\.")))
    path = F.regexp_extract(u, URL_RE, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, URL_RE, 4)
    tail = F.when(query == "", path).otherwise(F.concat(path, F.lit("?"), query))
    return F.concat(rev, F.lit(")"), tail)


CDX_SCHEMA = (
    "url string, warc_date string, file_name string, offset long, "
    "length long, digest string"
)


def cdx_index(
    files: DataFrame,
    content_col: str = "content",
    file_col: str = "file_name",
    sort: bool = False,
) -> DataFrame:
    """(surt, url, warc_date, file_name, offset, length, digest) per
    response record — the CDX(J) lookup index Common Crawl publishes
    next to its WARC shards. (offset, length) address the record's
    gzip member (ranged GET + gunzip = the record; see
    fetch_warc_record); digest is md5-hex of the html payload (the
    repo's engine-portable hash family — CC itself uses sha1-b32,
    a one-line swap where hashlib.sha1 is acceptable).

    One task per container file, then the SURT key as a codegen
    projection. `sort=True` adds the published-CDX layout: range-
    partition + sort by surt so a binary-searchable lookup needs one
    partition; costs a range shuffle, off by default."""

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[tuple] = []
            for name, blob in zip(b[file_col], b[content_col]):
                for url, wtype, wdate, _rid, html, off, ln in _iter_records(
                    bytes(blob or b"")
                ):
                    if wtype == "response":
                        rows.append(
                            (url, wdate, name, off, ln,
                             hashlib.md5(html).hexdigest())
                        )
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_date", "file_name", "offset",
                         "length", "digest"],
            )

    out = (
        files.select(file_col, content_col)
        .mapInPandas(index, CDX_SCHEMA)
        .select(surt_key("url").alias("surt"), "*")
    )
    if sort:
        out = out.repartitionByRange("surt").sortWithinPartitions("surt")
    return out
