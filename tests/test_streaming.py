"""Structured Streaming twins (streaming.py) vs their batch
counterparts on identical input — availableNow triggers so each test
is deterministic and terminates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.streaming import (
    hourly_rollup_stream,
    incremental_edge_sink,
    incremental_edges,
    sessionize_stream,
    stream_events,
    stream_pages,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def events_dir(tmp_path):
    """The file stream source needs a *directory* of appends (the
    Iceberg-table stand-in); the sf testdata is a single parquet file,
    so stage it into one."""
    import shutil

    d = tmp_path / "events"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def _run_to_memory(df, spark, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_rollup_stream_equals_batch(spark, events_dir):
    ev_stream = stream_events(spark, events_dir)
    got = _run_to_memory(hourly_rollup_stream(ev_stream), spark, "hourly_stream")
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )
    g = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in got.collect()}
    b = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch.collect()}
    assert g == b and len(g) > 0


def test_sessionize_stream_counts(spark, events_dir):
    ev_stream = stream_events(spark, events_dir)
    got = _run_to_memory(sessionize_stream(ev_stream), spark, "sessions_stream")
    per_user = (
        got.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )
    g = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in per_user.collect()}
    # batch twin (events_sessions driver query semantics; gap > 30 min)
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    gaps = ev.withColumn("prev", F.lag("us").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev").isNull() | ((F.col("us") - F.col("prev")) >= 1_800_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    batch = gaps.groupBy("user_id").agg(
        F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events")
    )
    b = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch.collect()}
    assert g == b and len(g) > 0


def test_incremental_edges_match_batch(spark, tmp_path):
    """Streaming page appends produce byte-for-byte the edges a batch
    rebuild would (append-only fragment contract)."""
    from graphscope_spark.pages import generate_pages, pages_to_edges

    pages = generate_pages(spark, n=200)
    src_dir = str(tmp_path / "pages")
    pages.write.parquet(src_dir)

    out = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_edge_sink(
        incremental_edges(stream_pages(spark, src_dir)), out, ckpt
    )
    q.awaitTermination(120)

    got = {(r["src"], r["dst"]) for r in spark.read.parquet(out).collect()}
    exp = {
        (r["src"], r["dst"])
        for r in pages_to_edges(spark.read.parquet(src_dir))
        .select(F.xxhash64("src_url").alias("src"), F.xxhash64("dst_url").alias("dst"))
        .collect()
    }
    assert got == exp and len(got) > 100
