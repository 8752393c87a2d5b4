"""Incremental ingestion via Structured Streaming — the Spark-native
counterpart of the reference's append-only fragment
(core/fragment/append_only_arrow_fragment.h, 1757 LoC: incremental
vertex/edge appends into a sealed Arrow fragment) and of the
per-iteration Iceberg appends the north rule asks for.

Design: the *batch* engine (LinkGraph + algorithms) stays the system
of record; streaming jobs maintain its inputs incrementally:

- `stream_pages` / `incremental_edge_sink`: new page files land in a
  directory (the sandbox stand-in for an Iceberg table's appends), are
  link-extracted with the SAME byte-identical kernels as the batch
  path (pages.py), hashed to (src, dst) and appended to the edge
  table. A periodic batch job re-`build()`s the CSR layout — exactly
  the reference's "append to fragment, reseal" cycle.
- `hourly_rollup_stream` / `sessionize_stream`: watermarked windowed
  aggregations over an event stream — late events beyond the
  watermark are dropped deterministically, and sessionization uses
  the built-in session_window (gap-based), state managed by Spark.

Everything is expressed with readStream/writeStream + built-in
operators (no foreachBatch Python loops in the hot path); the
streaming plans are the same Catalyst plans as the batch twins, so
the batch DuckDB oracles (events_hourly / events_sessions) pin the
semantics of the streaming versions too — pytest runs each stream
with trigger=availableNow against the SAME parquet input and asserts
equality with the batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphscope_spark.graph import SRC, DST

EVENTS_SCHEMA = "event_id long, user_id long, event_type string, ts timestamp, value double"


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream (new parquet files under `path` are
    discovered per micro-batch — the appends contract of an Iceberg
    events table)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def hourly_rollup_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked hourly rollup: (hour, event_type, n, sum_value).
    Late events beyond `watermark` are dropped; the finalized rows
    equal the batch events_hourly query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessionization with the built-in session_window —
    the stateful-streaming twin of the batch events_sessions query:
    one row per (user_id, session) with event count and bounds."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def stream_pages(spark: SparkSession, path: str) -> DataFrame:
    """File-source page stream with the input_hint schema."""
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    return spark.readStream.schema(schema).parquet(path)


def incremental_edges(pages: DataFrame) -> DataFrame:
    """Streaming pages → hashed (src, dst) edge increments using the
    SAME extraction kernel as the batch build (pages.extract_links →
    xxhash64), so appended edges are byte-for-byte what a batch
    rebuild would produce."""
    from graphscope_spark.pages import extract_links

    return (
        pages.select("url", F.explode(extract_links("html")).alias("dst_url"))
        .select(
            F.xxhash64("url").alias(SRC),
            F.xxhash64("dst_url").alias(DST),
        )
    )


def incremental_edge_sink(
    edges: DataFrame, out_path: str, checkpoint: str, trigger_available_now: bool = True
):
    """Append edge increments to the edge table dir (Iceberg-append
    stand-in) with exactly-once file-sink semantics; returns the
    started StreamingQuery."""
    w = (
        edges.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
