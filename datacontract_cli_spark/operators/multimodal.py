"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The container has no image/audio codecs, so the decode kernels are STUBS —
either a deterministic fake (``fake_decode=True``, default: derives pixel
stats from a hash of the bytes so pipelines are testable end-to-end) or a
clearly-marked NotImplementedError. Everything AROUND the kernel is real
Spark: schemas, Arrow batch shape, ``mapInPandas`` signatures, partition
sizing — swap the kernel body for PIL/librosa on a cluster that has them
and nothing else changes.
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
    """Deterministic fake media table (binary payload = hash-expanded bytes)."""
    df = spark.range(n)
    h = F.xxhash64(F.col("id"), F.lit(seed))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.abs(h), F.lit(3)) + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit("media"), F.col("id").cast("string")), 512).cast("binary")
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("content"),
        F.when(kind == "image", "image/png")
        .when(kind == "audio", "audio/wav")
        .otherwise("video/mp4").alias("mime"),
        (F.pmod(F.abs(h), F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1))), F.lit(1080)) + 16)
        .cast("int").alias("height"),
        (F.pmod(F.abs(h), F.lit(600000))).cast("int").alias("duration_ms"),
    )


def _fake_pixel_stats(content: bytes) -> tuple:
    """Deterministic stand-in for a real decode: statistics of the raw bytes."""
    arr = np.frombuffer(content, dtype=np.uint8)
    return float(arr.mean()), float(arr.std())


def extract_image_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Real pipeline shape: ``mapInPandas`` receives pandas batches, the kernel
    vectorizes over each batch, output schema is fixed. Only the 6 small
    feature columns leave the executor — the binary payload is pruned after
    this stage."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not present in this "
                    "container; run with fake_decode=True or install codecs"
                )
            stats = [_fake_pixel_stats(c) for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": [len(c) for c in pdf["content"]],
                "sha1": [hashlib.sha1(c).hexdigest() for c in pdf["content"]],
                "mean_pixel": [s[0] for s in stats],
                "std_pixel": [s[1] for s in stats],
                "aspect": (pdf["width"] / pdf["height"]).astype(float),
            })

    cols = ["media_id", "content", "width", "height"]
    return df.filter(F.col("kind") == "image").select(*cols).mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )


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
    """Resize plan: mapInPandas kernel with the real pipeline shape (binary
    in → binary out + new dims). The pixel resample itself is the STUB —
    deterministic fake derives the output bytes from a hash of the input so
    downstream stages (re-encode, storage sizing) are testable; swap the
    kernel body for PIL's `Image.resize` on a cluster with codecs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real image resize requires PIL/opencv — not present in "
                    "this container; run with fake_decode=True"
                )
            out_bytes = [
                hashlib.sha512(c + f"{target_w}x{target_h}".encode()).digest()
                for c in pdf["content"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "content": out_bytes,
                "width": target_w,
                "height": target_h,
            })

    return df.filter(F.col("kind") == "image").select(
        "media_id", "content", "width", "height"
    ).mapInPandas(kernel, "media_id bigint, content binary, width int, height int")
