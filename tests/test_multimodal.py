"""Multimodal plumbing (functions/multimodal.py): schema, Arrow
batching, determinism of the stubbed codec, payload projection."""

from __future__ import annotations

import hashlib

import numpy as np

from graphscope_spark.functions.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    synth_media,
)


def test_synth_media_deterministic(spark):
    a = synth_media(spark, n=50).collect()
    b = synth_media(spark, n=50).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_schema_and_determinism(spark):
    media = synth_media(spark, n=40)
    feats = extract_features(media)
    assert feats.columns == ["media_id", "kind", "n_bytes", "feature"]
    assert "payload" not in feats.columns  # payload projected away
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 40
    payloads = {r["media_id"]: r["payload"] for r in media.collect()}
    for mid, r in rows.items():
        p = payloads[mid]
        assert r["n_bytes"] == len(p)
        h = hashlib.sha256(p).digest()
        exp = (
            np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
            / 65535.0
        )
        assert len(r["feature"]) == FEATURE_DIM
        assert np.allclose(np.array(r["feature"], dtype=np.float32), exp)


def test_frame_sample_plan(spark):
    media = synth_media(spark, n=30)
    plan = frame_sample_plan(media, every_ms=1000)
    got = {}
    for r in plan.collect():
        got.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.where("kind = 'video'").collect()
    }
    assert set(got) == set(durations)  # videos only
    for mid, frames in got.items():
        assert sorted(frames) == list(range(0, durations[mid] + 1, 1000))
