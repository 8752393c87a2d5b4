"""Multimodal (functions/multimodal.py): real BMP/WAV codecs,
feature kernels, resize plumbing, fallback flagging, Arrow batching."""

from __future__ import annotations

import hashlib

import numpy as np

from graphscope_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_features,
    frame_sample_plan,
    resize_images,
    resize_nearest,
    synth_media,
)


def test_bmp_roundtrip_pixel_exact():
    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (5, 7), (16, 3)]:  # odd widths exercise row padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip():
    t = np.arange(500, dtype=np.float64)
    x = 0.7 * np.sin(2 * np.pi * t * 0.013)
    got, rate = decode_wav(encode_wav(x.astype(np.float32), rate=8000))
    assert rate == 8000
    assert np.allclose(got, x, atol=1.0 / 32000)  # int16 quantization


def test_resize_nearest():
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = resize_nearest(img, 3, 2)
    assert out.shape == (3, 2, 3)
    assert np.array_equal(out, img[[0, 2, 4]][:, [0, 2]])


def test_synth_media_deterministic(spark):
    a = synth_media(spark, n=50).collect()
    b = synth_media(spark, n=50).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_real_decode(spark):
    media = synth_media(spark, n=42)
    feats = extract_features(media)
    assert feats.columns == ["media_id", "kind", "n_bytes", "decoded", "feature"]
    assert "payload" not in feats.columns  # payload projected away
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 42
    payloads = {r["media_id"]: (r["kind"], r["payload"]) for r in media.collect()}
    for mid, r in rows.items():
        kind, p = payloads[mid]
        assert r["n_bytes"] == len(p)
        assert len(r["feature"]) == FEATURE_DIM
        # real codecs run for image/audio; video has no in-sandbox
        # container codec and must be FLAGGED fallback
        assert r["decoded"] == (kind in ("image", "audio"))
        if kind == "video":
            h = hashlib.sha256(bytes(p)).digest()
            exp = (np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16)
                   .astype(np.float32) / 65535.0)
            assert np.allclose(np.array(r["feature"], dtype=np.float32), exp)


def test_image_features_known_values(spark):
    # uniform mid-gray image: means = 128/255, stds = 0, luma falls in
    # bin 2 of 4, thumbnail cells all equal the mean
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_bmp(img)), 8, 8, 0)],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int")
    [r] = extract_features(media).collect()
    f = np.array(r["feature"], dtype=np.float32)
    g = np.float32(128 / 255)
    assert r["decoded"] is True
    assert np.allclose(f[0:3], g, atol=1e-6)       # mean RGB
    assert np.allclose(f[3:6], 0.0, atol=1e-6)     # std RGB
    assert np.allclose(f[6:10], [0, 0, 1, 0])      # luma histogram
    assert np.allclose(f[10:16], g, atol=1e-3)     # thumbnail grid


def test_audio_features_silence(spark):
    payload = encode_wav(np.zeros(256, dtype=np.float32), rate=8000)
    media = spark.createDataFrame(
        [(1, "audio", bytearray(payload), 0, 0, 0)],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int")
    [r] = extract_features(media).collect()
    f = np.array(r["feature"], dtype=np.float32)
    assert r["decoded"] is True
    assert f[0] == 0.0 and f[1] == 0.0            # rms, zcr
    assert np.allclose(f[2:], 0.0)                # no spectral energy


def test_resize_images_plumbing(spark):
    media = synth_media(spark, n=30)
    out = resize_images(media, 4, 6)
    rows = out.collect()
    n_images = media.where("kind = 'image'").count()
    assert len(rows) == n_images  # non-BMP payloads dropped
    for r in rows:
        img = decode_bmp(bytes(r["payload"]))  # output is a valid BMP
        assert img.shape == (4, 6, 3)
        assert (r["width"], r["height"]) == (6, 4)


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


def test_resize_drops_undecodable_bm_payload(spark):
    """A payload with 'BM' magic but unsupported format must be
    DROPPED, not kill the job (the module's corrupt-container rule)."""
    from graphscope_spark.functions.multimodal import resize_images, synth_media
    good = synth_media(spark, n=4).where("kind = 'image'")
    bad = spark.createDataFrame(
        [(999, "image", bytearray(b"BM" + b"\x00" * 20), 0)],
        "media_id long, kind string, payload binary, duration_ms long")
    media = good.select("media_id", "kind", "payload", "duration_ms") \
        .unionByName(bad)
    out = resize_images(media, 4, 4).collect()
    assert 999 not in {r["media_id"] for r in out}
    assert len(out) == good.count()
