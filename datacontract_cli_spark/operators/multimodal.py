"""Multimodal columns: image/audio/video as binary + typed metadata.

Decode policy (round 2): UNCOMPRESSED formats decode for REAL with the
stdlib codecs in :mod:`operators.codecs` — PPM(P6)/BMP24 images (pixel
stats, nearest-neighbor resize, PPM re-encode) and PCM WAV audio
(duration/rate/rms/peak). The synthesized media table emits genuine PPM and
WAV payloads, so the whole pipeline — decode, feature extraction, resize,
re-encode — executes end-to-end with no fakes. COMPRESSED codecs
(png/jpeg/mp3/mp4) are absent from this container; payloads the codecs
module cannot parse either fall back to a deterministic byte-statistics
fake (``fake_decode=True``) or raise a clearly-marked NotImplementedError
(``fake_decode=False``). Everything around the kernels is real Spark:
schemas, Arrow batch shape, ``mapInPandas`` signatures, partition sizing —
swap in PIL/librosa on a cluster that has them and nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), True),        # image | audio | video
    T.StructField("content", T.BinaryType(), True),     # opaque encoded bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, n_bytes int, sha1 string, "
    "mean_pixel double, std_pixel double, aspect double"
)


def synthesize_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic media table with GENUINE payloads where the stdlib can
    encode them: images are real PPM(P6) files, audio is real PCM WAV;
    video payloads are opaque fake bytes (no uncompressed stdlib format)."""
    from datacontract_cli_spark.operators import codecs

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(mid))
                kind = ("image", "audio", "video")[int(mid) % 3]
                if kind == "image":
                    w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
                    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    content, mime, dur = codecs.encode_ppm(arr), "image/x-portable-pixmap", None
                elif kind == "audio":
                    rate = 8000
                    dur = int(rng.integers(50, 500))  # ms
                    t = np.arange(int(rate * dur / 1000.0))
                    freq = float(rng.integers(100, 2000))
                    samples = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype("<i2")
                    content, mime = codecs.encode_wav(samples, rate), "audio/wav"
                    w = h = None
                else:
                    content = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
                    mime, dur = "video/mp4", int(rng.integers(1000, 600000))
                    w, h = int(rng.integers(320, 1920)), int(rng.integers(240, 1080))
                rows.append((int(mid), kind, content, mime, w, h, dur))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content",
                                              "mime", "width", "height",
                                              "duration_ms"])

    return spark.range(n).mapInPandas(
        kernel,
        "media_id bigint, kind string, content binary, mime string, "
        "width int, height int, duration_ms int",
    )


def _fake_pixel_stats(content: bytes) -> tuple:
    """Deterministic stand-in for a real decode: statistics of the raw bytes."""
    arr = np.frombuffer(content, dtype=np.uint8)
    return float(arr.mean()), float(arr.std())


def extract_image_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    PPM/BMP payloads decode for REAL (pixel stats from actual pixels, aspect
    from the decoded dimensions). Undecodable payloads fall back to
    byte-statistics (``fake_decode=True``) or raise (``False``). Only the 6
    small feature columns leave the executor — the binary payload is pruned
    after this stage."""
    from datacontract_cli_spark.operators import codecs

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, stds, aspects = [], [], []
            for c, w, h in zip(pdf["content"], pdf["width"], pdf["height"]):
                try:
                    arr = codecs.decode_image(bytes(c))
                    means.append(float(arr.mean()))
                    stds.append(float(arr.std()))
                    aspects.append(arr.shape[1] / arr.shape[0])
                except NotImplementedError:
                    if not fake_decode:
                        raise
                    m, s = _fake_pixel_stats(bytes(c))
                    means.append(m)
                    stds.append(s)
                    aspects.append(float(w) / float(h) if w and h else float("nan"))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": [len(c) for c in pdf["content"]],
                "sha1": [hashlib.sha1(bytes(c)).hexdigest() for c in pdf["content"]],
                "mean_pixel": means,
                "std_pixel": stds,
                "aspect": aspects,
            })

    cols = ["media_id", "content", "width", "height"]
    return df.filter(F.col("kind") == "image").select(*cols).mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, n_bytes int, rate int, duration_ms double, "
    "rms double, peak double"
)


def extract_audio_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """PCM WAV audio features — duration, sample rate, RMS level, peak —
    from a REAL stdlib decode; undecodable payloads fall back to NaNs
    (``fake_decode=True``) or raise."""
    from datacontract_cli_spark.operators import codecs

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                try:
                    samples, rate = codecs.decode_wav(bytes(c))
                    rows.append((int(mid), len(c), rate,
                                 1000.0 * len(samples) / rate,
                                 float(np.sqrt((samples ** 2).mean())) if len(samples) else 0.0,
                                 float(np.abs(samples).max()) if len(samples) else 0.0))
                except Exception:  # noqa: BLE001 — wave raises plain Error
                    if not fake_decode:
                        raise
                    rows.append((int(mid), len(c), None, None, None, None))
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "rate",
                                              "duration_ms", "rms", "peak"])

    return df.filter(F.col("kind") == "audio").select("media_id", "content") \
             .mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame timestamp.
    The timestamps are pure column math (sequence), the frame DECODE is the
    stub. At scale this is the explode that fans 1 video row into N frame
    rows — partition sizing must account for the fan-out."""
    frames = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "duration_ms", F.explode(frames).alias("frame_ms"))
    )


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224,
                  fake_decode: bool = True) -> DataFrame:
    """Resize: binary in → binary out + new dims. PPM/BMP payloads REALLY
    decode, nearest-neighbor resample (pure numpy index math), and re-encode
    as PPM; undecodable payloads get a deterministic hash-derived fake
    (``fake_decode=True``) or raise."""
    from datacontract_cli_spark.operators import codecs

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for c in pdf["content"]:
                try:
                    arr = codecs.decode_image(bytes(c))
                    out_bytes.append(codecs.encode_ppm(
                        codecs.resize_nearest(arr, target_w, target_h)))
                except NotImplementedError:
                    if not fake_decode:
                        raise
                    out_bytes.append(hashlib.sha512(
                        bytes(c) + f"{target_w}x{target_h}".encode()).digest())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "content": out_bytes,
                "width": target_w,
                "height": target_h,
            })

    return df.filter(F.col("kind") == "image").select(
        "media_id", "content", "width", "height"
    ).mapInPandas(kernel, "media_id bigint, content binary, width int, height int")
