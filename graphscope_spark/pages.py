"""Synthetic Common-Crawl-style pages + byte-identical extraction UDFs.

Input table shape per BASELINE.json input_hint:
  pages(url string, warc_ts timestamp, html binary, text string, lang string)

- `generate_pages(n, avg_degree, ...)` synthesizes a deterministic
  power-law link graph rendered as HTML into `html: binary`; the `text`
  column holds the ground-truth extraction (FIXTURES.md §1). All
  randomness from numpy.random.default_rng(seed) — identical output for
  identical arguments on every run and cluster size.
- `extract_text` / `extract_links` are vectorized Arrow pandas UDFs
  (no per-row Python in the Spark plan: one Python invocation per Arrow
  batch, vectorized string ops inside). extract_text is a real HTML
  parse (stdlib HTMLParser), NOT the generator template inverted, so
  the byte-identical test (tests/test_pages.py) is non-circular.

The reference has no extraction stage (graft-specific, SURVEY.md §2.10);
the graph-build part mirrors the reference loader path
(core/loader/arrow_fragment_loader.h:157-170): urls → xxhash64 ids →
hash-partitioned edge table.

Scale note: generation is `mapInPandas` over a `spark.range` — embarrass-
ingly parallel, no driver materialization, so the same code synthesizes
10^4 pages for pytest and 10^7+ for bench.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_LANGS = ["en", "de", "zh"]
_WORDS = (
    "web graph link page rank crawl index data spark shuffle join "
    "vertex edge hash partition iceberg arrow batch column row scan"
).split()

EPOCH = np.datetime64("2024-01-01T00:00:00")


def _out_links(k: int, n: int, rng_hi: np.random.Generator, zipf_a: float) -> list[int]:
    """Deterministic per-page out-link targets: Zipf-ish draws toward low
    ids (power-law in-degree), self-links dropped. Page k gets min(6, k)
    links (page 0 dangling) — FIXTURES.md p2p_like rule."""
    m = min(6, k)
    if m == 0 or n <= 1:
        return []
    raw = rng_hi.zipf(zipf_a, size=m * 3)
    targets = [int(t - 1) % n for t in raw if int(t - 1) % n != k]
    seen: list[int] = []
    for t in targets:
        if t not in seen:
            seen.append(t)
        if len(seen) == m:
            break
    return seen


def _page_row(k: int, n: int, seed: int, zipf_a: float) -> tuple:
    rng = np.random.default_rng(seed * 1_000_003 + k)
    url = f"https://site{k % 97}.example/p/{k}"
    title = f"Page {k}"
    n_paras = 1 + int(rng.integers(0, 3))
    paras = [
        " ".join(rng.choice(_WORDS, size=int(rng.integers(5, 12))).tolist())
        for _ in range(n_paras)
    ]
    links = _out_links(k, n, rng, zipf_a)
    anchors = "".join(
        f'<a href="https://site{t % 97}.example/p/{t}">link {t}</a>' for t in links
    )
    html = (
        f"<html><head><title>{title}</title></head><body>"
        + "".join(f"<p>{p}</p>" for p in paras)
        + anchors
        + "</body></html>"
    )
    text = title + "\n" + "\n".join(paras)
    ts = EPOCH + np.timedelta64(k, "s")
    lang = _LANGS[k % 3]
    return (url, pd.Timestamp(ts), html.encode("utf-8"), text, lang)


def generate_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    zipf_a: float = 1.5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic page synthesis (mapInPandas over range)."""
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [_page_row(int(k), n, seed, zipf_a) for k in b["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return spark.range(0, n, numPartitions=p).mapInPandas(gen, PAGES_SCHEMA)


# ----------------------------------------------------------------------
# Extraction kernels (vectorized Arrow UDFs)
# ----------------------------------------------------------------------
class _TextExtractor(HTMLParser):
    """Collects <title> and <p> contents in document order."""

    def __init__(self) -> None:
        super().__init__()
        self.chunks: list[str] = []
        self._capture = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in ("title", "p"):
            self._capture += 1
            self.chunks.append("")

    def handle_endtag(self, tag: str) -> None:
        if tag in ("title", "p") and self._capture:
            self._capture -= 1

    def handle_data(self, data: str) -> None:
        if self._capture:
            self.chunks[-1] += data


class _LinkExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)


def _extract_text_py(html: bytes | None) -> str | None:
    if html is None:
        return None
    p = _TextExtractor()
    p.feed(html.decode("utf-8", errors="replace"))
    return "\n".join(p.chunks)


def _extract_links_py(html: bytes | None) -> list[str]:
    if html is None:
        return []
    p = _LinkExtractor()
    p.feed(html.decode("utf-8", errors="replace"))
    return p.hrefs


@F.pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """html binary → extracted text. Pure, versioned, deterministic —
    the byte-identical contract of the north rule (FIXTURES.md §1)."""
    return html.map(_extract_text_py)


@F.pandas_udf(ArrayType(StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    """html binary → hrefs in document order."""
    return html.map(_extract_links_py)


class _AnchorExtractor(HTMLParser):
    """Collects (href, anchor text) per <a>; text is the concatenation
    of every data segment inside the element, so nested inline markup
    (<a>pre <b>x</b> post</a>) yields 'pre x post'."""

    def __init__(self) -> None:
        super().__init__()
        self.anchors: list[tuple[str | None, str]] = []
        self._href: str | None = None
        self._open = False
        self._chunks: list[str] = []

    def _flush(self) -> None:
        if self._open:
            self.anchors.append((self._href, "".join(self._chunks)))
        self._open, self._href, self._chunks = False, None, []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._flush()  # nested/unclosed <a>: start a new anchor
            self._href = dict(attrs).get("href")
            self._open = True
            self._chunks = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._open:
            self._chunks.append(data)

    def close(self) -> None:  # unclosed trailing <a>
        super().close()
        self._flush()


def _extract_anchors_py(html: bytes | None) -> list[tuple[str | None, str]]:
    if html is None:
        return []
    p = _AnchorExtractor()
    p.feed(html.decode("utf-8", errors="replace"))
    p.close()
    return p.anchors


_ANCHOR_TYPE = ArrayType(StructType([
    StructField("href", StringType()),
    StructField("text", StringType()),
]))


@F.pandas_udf(_ANCHOR_TYPE)
def extract_anchors(html: pd.Series) -> pd.Series:
    """html binary → [(href, anchor text)] in document order — same
    pure/deterministic contract as extract_text. The web-search /
    training-data 'anchor text' signal (the reference's GIE docs load
    web pages the same way; extraction itself is this repo's §2.10
    surface)."""
    return html.map(_extract_anchors_py)


def anchor_text_index(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """Per-target anchor-text index: DataFrame(dst_url, n_refs,
    texts) — every anchor pointing at dst_url, texts sorted-distinct.

    Scale shape: one Arrow-batched parse projection fused into the
    scan, one explode (output rows = #anchors, not #pages × k), one
    map-side-combined hash aggregate on dst_url — the same two-stage
    shape as the host-graph rollup."""
    a = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(extract_anchors(html_col)).alias("an"),
    )
    return (
        a.where(F.col("an.href").isNotNull())
        .groupBy(F.col("an.href").alias("dst_url"))
        .agg(F.count(F.lit(1)).alias("n_refs"),
             F.array_sort(F.collect_set("an.text")).alias("texts"))
    )


def pages_to_edges(pages: DataFrame) -> DataFrame:
    """pages → edge table (src_url, dst_url) via link extraction —
    the load stage of SURVEY.md §7.1."""
    return (
        pages.select("url", F.explode(extract_links("html")).alias("dst_url"))
        .withColumnRenamed("url", "src_url")
    )


def decode_fake_binary(pages: DataFrame) -> DataFrame:
    """Placeholder for non-HTML payload decode — see functions/multimodal."""
    return pages


def generate_edges(
    spark: SparkSession,
    n_vertices: int,
    avg_degree: int = 10,
    zipf_a: float = 1.5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic power-law edge table WITHOUT the HTML round-trip.

    For large-scale benchmarking: rendering + parsing HTML at 10^8 edges
    would measure the Python parser, not the graph engine. Each edge is
    a closed-form function of its index (multiplicative hash for src,
    inverse-CDF bounded Pareto for dst — hub-skewed in-degree like a web
    graph), so the table is identical at every parallelism level and
    restart — same determinism contract as generate_pages.

    Returns edges(src long, dst long), self-loops dropped.
    """
    n_edges = n_vertices * avg_degree
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        inv = -1.0 / (zipf_a - 1.0)
        for b in batches:
            i = b["id"].to_numpy(dtype=np.uint64)
            src = ((i * np.uint64(2654435761)) % np.uint64(2**32)) % np.uint64(
                n_vertices
            )
            u = (
                ((i * np.uint64(2246822519) + np.uint64(1)) % np.uint64(2**32)).astype(
                    np.float64
                )
                + 0.5
            ) / float(2**32)
            # bounded-Pareto: P(dst >= k) ~ k^-(a-1)  -> mega-hubs at low ids.
            # Clip into uint64 range before the cast: for the rare i
            # where the modular draw is ~0, u^inv exceeds 2^64 and a
            # float->uint64 cast of an out-of-range value is UNDEFINED
            # (0 on x86, saturate on ARM) — the clip keeps the table
            # bit-identical across platforms/numpy versions
            vals = np.minimum(np.power(u, inv) - 1.0,
                              np.float64(2**64 - 2**40))
            dst = vals.astype(np.uint64) % np.uint64(n_vertices)
            out = pd.DataFrame(
                {"src": src.astype(np.int64), "dst": dst.astype(np.int64)}
            )
            yield out[out["src"] != out["dst"]]

    return spark.range(0, n_edges, numPartitions=p).mapInPandas(
        gen, "src long, dst long"
    )
