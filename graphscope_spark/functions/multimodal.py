"""Multimodal columns: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched mapInPandas.

Real decode, stdlib+numpy only: BMP (24-bit bottom-up DIB), WAV (RIFF
PCM16 mono), baseline JPEG and 8-bit PNG (pure-Python codecs in
jpeg.py — ITU-T T.81 / RFC 2083, self-describing tables, all five PNG
filters) — plus nearest-neighbor resize and genuine image/audio
feature kernels (channel stats + luma histogram + thumbnail grid;
RMS + zero-crossings + FFT band energies). Codecs outside that scope
(progressive/arithmetic JPEG, 16-bit/interlaced PNG, MP3, H.264) fall
back to a deterministic sha256 pseudo-feature flagged
`decoded=false`, so the pipeline stays total and the swap-in point
for a faster production decoder remains exactly `_decode_payload`.

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
import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, decoded boolean, "
    "feature array<float>"
)

RESIZED_SCHEMA = "media_id long, payload binary, width int, height int"


# -- codecs (pure stdlib + numpy) ----------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit bottom-up BMP (BITMAPINFOHEADER)."""
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = np.zeros((h, row + pad), dtype=np.uint8)
    body[:, :row] = img[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> HxWx3 uint8 RGB (top-down)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    body = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    img = body.reshape(h, stride)[:, :row].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1] if flip else img


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float array in [-1,1] (or int16) -> RIFF PCM16 mono WAV."""
    if samples.dtype != np.int16:
        samples = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
        samples = np.round(samples * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM16 WAV -> (float32 samples in [-1,1] of channel 0, rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        rate = wf.getframerate()
        nch = wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    x = np.frombuffer(raw, dtype=np.int16).reshape(-1, nch)[:, 0]
    return x.astype(np.float32) / 32768.0, rate


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index grids — pure numpy gather."""
    ih, iw = img.shape[:2]
    ri = (np.arange(out_h) * ih) // out_h
    ci = (np.arange(out_w) * iw) // out_w
    return img[ri][:, ci]


# -- feature kernels ------------------------------------------------------

def _image_features(img: np.ndarray) -> np.ndarray:
    """16 dims: mean RGB (3) + std RGB (3) + 4-bin luma histogram
    fractions (4) + 2x3 thumbnail-grid luma means (6), all in [0,1]."""
    f = img.astype(np.float32) / 255.0
    luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    hist = np.histogram(luma, bins=4, range=(0.0, 1.0))[0]
    hist = hist.astype(np.float32) / max(luma.size, 1)
    thumb = resize_nearest(luma[:, :, None], 2, 3)[:, :, 0].reshape(-1)
    return np.concatenate([
        f.mean(axis=(0, 1)), f.std(axis=(0, 1)), hist, thumb,
    ]).astype(np.float32)


def _audio_features(x: np.ndarray, rate: int) -> np.ndarray:
    """16 dims: RMS (1) + zero-crossing rate (1) + energy fraction in
    14 equal rfft bands (14)."""
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if x.size > 1 else 0.0
    spec = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    bands = np.array_split(spec, 14)
    e = np.array([b.sum() for b in bands], dtype=np.float64)
    tot = e.sum()
    frac = (e / tot) if tot > 0 else np.zeros(14)
    return np.concatenate([[rms, zcr], frac]).astype(np.float32)


def _fallback_features(payload: bytes) -> np.ndarray:
    """Deterministic pseudo-feature for formats this sandbox cannot
    decode (compressed codecs) — the production swap-in point."""
    h = hashlib.sha256(payload).digest()
    return (
        np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
        / 65535.0
    )


def _decode_payload(payload: bytes) -> tuple[np.ndarray, bool]:
    """Magic-byte dispatch: real decode where the format allows, else
    the flagged fallback. JPEG (baseline) and PNG are REAL decodes via
    the pure-Python jpeg.py codecs (spec modes outside their scope —
    progressive JPEG, 16-bit PNG — raise inside and fall back,
    flagged)."""
    try:
        if payload[:2] == b"BM":
            return _image_features(decode_bmp(payload)), True
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _audio_features(*decode_wav(payload)), True
        if payload[:2] == b"\xff\xd8":
            from graphscope_spark.functions.jpeg import decode_jpeg

            return _image_features(decode_jpeg(payload)), True
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            from graphscope_spark.functions.jpeg import decode_png

            return _image_features(decode_png(payload)), True
    except Exception:
        pass  # corrupt container -> fallback, never a task failure
    return _fallback_features(payload), False


# -- Spark transforms -----------------------------------------------------

def extract_features(media: DataFrame) -> DataFrame:
    """binary payload → fixed-width float feature vector, Arrow-batched.
    Output drops the payload column (see scale notes); `decoded` says
    whether a real codec ran."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats, dec = [], []
            for p in b["payload"]:
                if p is None:
                    feats.append(None)
                    dec.append(False)
                else:
                    v, ok = _decode_payload(bytes(p))
                    feats.append(v.tolist())
                    dec.append(ok)
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": b["payload"].map(lambda p: len(p) if p is not None else 0),
                    "decoded": dec,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, Arrow-batched;
    non-BMP payloads are dropped (a production build would add codecs
    to the same dispatch). Output payloads are themselves valid BMPs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, p in zip(b["media_id"], b["payload"]):
                if p is None or bytes(p)[:2] != b"BM":
                    continue
                try:
                    img = decode_bmp(bytes(p))
                except (ValueError, IndexError, struct.error):
                    # 'BM' magic but unsupported bpp / compression /
                    # truncated header: drop the row — the module's
                    # corrupt-container rule is fallback, NEVER a task
                    # failure that kills the whole job
                    continue
                img = resize_nearest(img, out_h, out_w)
                rows.append((int(mid), encode_bmp(img), out_w, out_h))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height"])

    return media.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows via
    sequence-explode — pure built-ins; per-frame decode would feed the
    image kernel above once a container codec is plugged in."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synth_media(spark, n: int = 100, seed: int = 7) -> DataFrame:
    """Deterministic fake media table: REAL tiny BMPs for images, REAL
    PCM16 WAVs for audio, opaque bytes for video (no container codec
    in-sandbox — exercises the flagged fallback path)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for b in batches:
            rows = []
            for k in b["id"]:
                k = int(k)
                rng = np.random.default_rng(seed * 99991 + k)
                kind = kinds[k % 3]
                w, h = 4 + k % 13, 4 + (k * 7) % 11
                dur = 1000 * (1 + k % 30)
                if kind == "image":
                    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    payload = encode_bmp(img)
                elif kind == "audio":
                    t = np.arange(256 + 16 * (k % 8), dtype=np.float64)
                    x = 0.5 * np.sin(2 * np.pi * t * (0.01 + 0.002 * (k % 9)))
                    payload = encode_wav(x.astype(np.float32), rate=8000)
                else:
                    payload = rng.integers(
                        0, 256, size=64 + (k % 128), dtype=np.uint8).tobytes()
                rows.append((k, kind, payload, w, h, dur))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "width", "height", "duration_ms"],
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


# -- perceptual near-dup (dHash) ------------------------------------------

def dhash64_py(payload: bytes | None) -> int | None:
    """64-bit difference hash of a BMP payload: 9x8 nearest-neighbor
    luma grid, bit r*8+c = [luma(r,c) > luma(r,c+1)] — the standard
    perceptual fingerprint (robust to resize/re-encode, flips few bits
    under small edits). Non-BMP / corrupt payloads -> None (callers
    drop undecodable rows; the production swap-in point for JPEG/PNG
    is the same `_decode_payload` dispatch). Signed int64."""
    if payload is None:
        return None
    try:
        if bytes(payload[:2]) != b"BM":
            return None
        img = decode_bmp(bytes(payload))
    except Exception:
        return None
    f = img.astype(np.float32)
    luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    grid = resize_nearest(luma[:, :, None], 8, 9)[:, :, 0]
    v = 0
    for r in range(8):
        for c in range(8):
            if grid[r, c] > grid[r, c + 1]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= (1 << 63) else v


@F.pandas_udf(LongType())
def dhash64(payload: pd.Series) -> pd.Series:
    """Arrow-batched dHash (pixel decode is not SQL-expressible)."""
    return payload.map(dhash64_py)


def image_dhash(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(id, dhash) for every decodable image row; payload projected
    away in the same select so downstream shuffles never carry bytes."""
    return (
        media.select(F.col(id_col), dhash64(F.col(payload_col)).alias("dhash"))
        .where(F.col("dhash").isNotNull())
    )


def image_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 10,
    bands: int | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Perceptual image near-dup pairs (a, b, hamming): dHash, banded
    OR-construction over `bands` equal bit segments (any shared segment
    -> candidate; pigeonhole guarantees recall for hamming < bands),
    verified with bit_count(xor) <= max_hamming.

    bands=None derives the smallest band count that makes the
    pigeonhole guarantee cover the verification filter
    (bands > max_hamming, rounded up to a divisor of 64), so the
    output is COMPLETE up to max_hamming by construction. An explicit
    bands <= max_hamming is allowed as a recall/cost trade-off but
    warns, since pairs with bands..max_hamming differing bits can then
    be missed.

    Scale shape: one Arrow-batched decode pass emitting 8 bytes/row,
    `bands` rows per image into ONE (band, segment) shuffle — the
    image-modality sibling of simhash_near_pairs/minhash_lsh_pairs;
    never an all-pairs join."""
    if bands is None:
        bands = next(b for b in (1, 2, 4, 8, 16, 32, 64)
                     if b > int(max_hamming))
    bands = int(bands)
    if bands <= int(max_hamming):
        import warnings

        warnings.warn(
            f"bands={bands} <= max_hamming={max_hamming}: the banded "
            "candidate join only guarantees recall for hamming < "
            f"{bands}; pairs with {bands}..{max_hamming} differing "
            "bits may be missed. Pass bands=None to derive a complete "
            "setting.",
            RuntimeWarning,
            stacklevel=2,
        )
    width = 64 // bands
    h = image_dhash(media, payload_col, id_col)
    seg = h.select(
        F.col(id_col),
        "dhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band"),
                    F.shiftrightunsigned(F.col("dhash"), k * width)
                    # width == 64 (bands=1): mask with -1 (all bits);
                    # (1 << 64) - 1 would overflow the JVM long literal
                    .bitwiseAND(
                        F.lit(-1 if width == 64 else (1 << width) - 1)
                    ).alias("seg"),
                )
                for k in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, "dhash", "bk.band", "bk.seg")
    a = seg.select(F.col(id_col).alias("a"), F.col("dhash").alias("ha"),
                   "band", "seg")
    b = seg.select(F.col(id_col).alias("b"), F.col("dhash").alias("hb"),
                   "band", "seg")
    return (
        a.join(b, ["band", "seg"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                .alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
