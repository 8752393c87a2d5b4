"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schemas, batching, partition sizing, UDF
signatures) is real and tested; the actual codec step is STUBBED — the
sandbox has no image/audio libraries — behind `decode_image_stub`,
which produces a deterministic fake feature vector from the bytes.
Swap `_decode_image` for a real decoder (PIL/libvips) in production;
nothing else changes.

Scale notes: binary payloads dominate row size, so
- `spark.sql.files.maxPartitionBytes` (set in session.py) bounds scan
  partitions by bytes, not rows;
- mapInPandas streams Arrow record batches — peak memory is one batch,
  not one partition; cap batch rows via
  spark.sql.execution.arrow.maxRecordsPerBatch for fat payloads;
- feature extraction emits small fixed-width vectors: project the
  binary column away IMMEDIATELY after decode so downstream shuffles
  never carry payload bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"media_id long, kind string, n_bytes long, feature array<float>"


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic fake 'feature' from payload bytes.

    Production: replace with a real decode + model embed. Raising
    NotImplementedError here would be honest too, but a deterministic
    fake lets the full pipeline (schema, batching, joins) be tested.
    """
    h = hashlib.sha256(payload).digest()
    return (
        np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
        / 65535.0
    )


def extract_features(media: DataFrame) -> DataFrame:
    """binary payload → fixed-width float feature vector, Arrow-batched.
    Output drops the payload column (see scale notes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                _decode_image(p).tolist() if p is not None else None
                for p in b["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": b["payload"].map(lambda p: len(p) if p is not None else 0),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows via
    sequence-explode — pure built-ins; the decode of each frame is the
    stubbed kernel above."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synth_media(spark, n: int = 100, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for b in batches:
            rows = []
            for k in b["id"]:
                k = int(k)
                rng = np.random.default_rng(seed * 99991 + k)
                payload = rng.integers(0, 256, size=64 + (k % 128), dtype=np.uint8)
                rows.append(
                    (
                        k,
                        kinds[k % 3],
                        payload.tobytes(),
                        64 + k % 512,
                        64 + (k * 7) % 512,
                        1000 * (1 + k % 30),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "width", "height", "duration_ms"],
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
