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

Everything above is expressed with readStream/writeStream + built-in
operators (no foreachBatch Python loops in the hot path); the
streaming plans are the same Catalyst plans as the batch twins, so
the batch DuckDB oracles (events_hourly / events_sessions) pin the
semantics of the streaming versions too — pytest runs each stream
with trigger=availableNow against the SAME parquet input and asserts
equality with the batch query.

The one CUSTOM stateful operator (simhash near-dup filter, bottom of
this module) is the documented exception: its keep/drop decision needs
per-key state no built-in expresses, so it uses
applyInPandasWithState with an Arrow-batched kernel — still no
per-row Python at the Spark boundary.
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


def incremental_wcc_sink(
    edge_stream: DataFrame,
    work_dir: str,
    trigger_available_now: bool = True,
    max_iter: int = 200,
):
    """Streaming incremental connected components: per micro-batch of
    appended (src, dst) edges, maintain the component labels of the
    WHOLE accumulated graph, warm-started from the previous batch's
    labels (wcc(warm_labels=...) — valid because a stream is
    append-only, the exact contract warm start requires).

    Layout under ``work_dir``: edges/ (append-only parquet, the
    Iceberg-append stand-in), labels/ (overwritten per batch),
    _checkpoint/ (exactly-once stream progress). Why foreachBatch: a
    fixpoint ITERATION is not a streaming operator — Structured
    Streaming expresses incremental aggregation, not unbounded
    self-joins; the stream's job here is exactly-once delta delivery,
    the per-batch warm-started batch job does the (few) label-repair
    rounds. At scale each batch re-reads the edge table (one Iceberg
    scan) but converges in rounds ~ how far the new edges moved
    labels, not graph diameter.

    Returns the started StreamingQuery.
    """
    import os as _os

    from graphscope_spark.algorithms.wcc import wcc as _wcc
    from graphscope_spark.graph import LinkGraph as _LG

    edges_path = _os.path.join(work_dir, "edges")
    labels_path = _os.path.join(work_dir, "labels")
    ckpt = _os.path.join(work_dir, "_checkpoint")

    def _on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.select(SRC, DST).write.mode("append").parquet(edges_path)
        g = _LG.from_edges(spark.read.parquet(edges_path), directed=True)
        warm = None
        if _os.path.isdir(labels_path) and any(
            f.startswith("part-") for f in _os.listdir(labels_path)
        ):
            warm = spark.read.parquet(labels_path)
        labels = _wcc(g, max_iter=max_iter, warm_labels=warm)
        tmp = labels_path + f"_b{batch_id}"
        labels.write.mode("overwrite").parquet(tmp)
        # atomic-ish swap: write new, then replace (single-driver FS)
        import shutil as _shutil

        if _os.path.isdir(labels_path):
            _shutil.rmtree(labels_path)
        _os.rename(tmp, labels_path)

    w = (
        edge_stream.writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


# ----------------------------------------------------------------------
# Custom stateful operator: streaming SimHash near-dup filter
# ----------------------------------------------------------------------
# Exact streaming dedup is built-in (dropDuplicates + watermark); NEAR-
# dup is not — the keep/drop decision for a document depends on every
# fingerprint KEPT so far in its bucket, which is custom per-key state.
# This is the applyInPandasWithState shape: key = simhash prefix
# bucket, state = the kept fingerprints of that bucket, batch kernel =
# Arrow-batched pandas (no per-row Python at the Spark boundary).
#
# Semantics (deterministic): documents are processed in (doc_id)
# order within each micro-batch and bucket; a document is kept iff its
# 64-bit SimHash differs by MORE than `max_hamming` bits from every
# fingerprint kept so far in its bucket. max_hamming=0 degenerates to
# exact-fingerprint keep-first (SQL-expressible — the driver oracle);
# k>0 is the true near-dup chain (pytest: stream ≡ sequential batch
# twin, state survives micro-batch boundaries).
#
# Recall note (same trade-off as dedup.simhash_near_pairs): only
# near-dups sharing the `prefix_bits` bucket are compared. State per
# bucket is capped at `max_state` fingerprints; past the cap documents
# are still compared against the retained set but no longer extend it
# (bounded state at 10^12-doc scale; the cap is a visible parameter,
# not a silent truncation).

SIMHASH_DEDUP_OUT = "bucket long, doc_id long, simhash long"
SIMHASH_DEDUP_STATE = "seen array<long>"


def _hamming_keep_kernel(
    doc_ids, fps, seen: list[int], max_hamming: int, max_state: int
):
    """Sequential keep/drop chain for one bucket, in doc_id order.
    Returns (kept doc_ids, kept fps, updated seen)."""
    mask = (1 << 64) - 1
    seen_u = [s & mask for s in seen]
    kept_ids, kept_fps = [], []
    for did, fp in zip(doc_ids, fps):
        fpu = fp & mask
        dup = any((fpu ^ s).bit_count() <= max_hamming for s in seen_u)
        if not dup:
            kept_ids.append(did)
            kept_fps.append(fp)
            if len(seen_u) < max_state:
                seen_u.append(fpu)
    new_seen = [s - (1 << 64) if s >= (1 << 63) else s for s in seen_u]
    return kept_ids, kept_fps, new_seen


def _with_simhash(docs: DataFrame, prefix_bits: int, text_col: str,
                  id_col: str) -> DataFrame:
    from graphscope_spark.functions.dedup import simhash64

    if not 0 <= prefix_bits <= 64:
        raise ValueError(f"prefix_bits must be in [0, 64], got {prefix_bits}")
    # prefix_bits=0 means ONE bucket (compare everything): special-case
    # it because the JVM masks long shifts to 6 bits, so >>> 64 would
    # silently be a no-op and give every doc its own bucket
    bucket = (F.lit(0).cast("long") if prefix_bits == 0
              else F.shiftrightunsigned("simhash", 64 - prefix_bits))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        simhash64(F.col(text_col)).alias("simhash"),
    ).withColumn("bucket", bucket)


def simhash_dedup_stream(
    docs: DataFrame,
    prefix_bits: int = 16,
    max_hamming: int = 3,
    max_state: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming near-dup filter over a document stream: emits the
    KEPT rows (bucket, doc_id, simhash). State = kept fingerprints per
    bucket, carried across micro-batches by Spark's state store (the
    checkpointed, partition-local state a 1000-executor cluster
    shards by bucket)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        seen = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        kept_ids, kept_fps, new_seen = _hamming_keep_kernel(
            pdf["doc_id"].tolist(), pdf["simhash"].tolist(), seen,
            max_hamming, max_state,
        )
        state.update((new_seen,))
        yield pd.DataFrame(
            {"bucket": [key[0]] * len(kept_ids), "doc_id": kept_ids,
             "simhash": kept_fps}
        )

    return (
        _with_simhash(docs, prefix_bits, text_col, id_col)
        .groupBy("bucket")
        .applyInPandasWithState(
            fn, SIMHASH_DEDUP_OUT, SIMHASH_DEDUP_STATE, "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def simhash_dedup_batch(
    docs: DataFrame,
    prefix_bits: int = 16,
    max_hamming: int = 3,
    max_state: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch twin of simhash_dedup_stream (same kernel, empty initial
    state) — the sequential per-bucket chain the stream must equal
    when fed the same rows."""
    import pandas as pd

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        kept_ids, kept_fps, _ = _hamming_keep_kernel(
            pdf["doc_id"].tolist(), pdf["simhash"].tolist(), [],
            max_hamming, max_state,
        )
        return pd.DataFrame(
            {"bucket": pdf["bucket"].iloc[:1].repeat(len(kept_ids)).tolist()
             if len(kept_ids) else [],
             "doc_id": kept_ids, "simhash": kept_fps}
        )

    return (
        _with_simhash(docs, prefix_bits, text_col, id_col)
        .groupBy("bucket")
        .applyInPandas(fn, SIMHASH_DEDUP_OUT)
    )
