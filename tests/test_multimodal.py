"""Multimodal plumbing (decode stubbed) + n-gram language ID."""

import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.operators import multimodal, textstats


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synthesize_media(spark, 60).persist()


def test_image_features(spark, media):
    feats = multimodal.extract_image_features(media)
    rows = feats.collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images > 0
    for r in rows:
        assert r["n_bytes"] == 128  # sha512 hex string as bytes
        assert 0 <= r["mean_pixel"] <= 255
        assert r["aspect"] > 0
    # deterministic: same input → same features
    again = {r["media_id"]: r["sha1"] for r in multimodal.extract_image_features(media).collect()}
    assert {r["media_id"]: r["sha1"] for r in rows} == again


def test_resize_images(spark, media):
    out = multimodal.resize_images(media, 128, 96)
    rows = out.collect()
    assert all(r["width"] == 128 and r["height"] == 96 for r in rows)
    assert all(len(r["content"]) == 64 for r in rows)


def test_real_decode_path_is_marked(spark, media):
    with pytest.raises(Exception) as exc:
        multimodal.extract_image_features(media, fake_decode=False).collect()
    assert "NotImplementedError" in str(exc.value) or "PIL" in str(exc.value)


def test_frame_sampling_fanout(spark, media):
    frames = multimodal.sample_video_frames(media, every_ms=60_000)
    videos = media.filter("kind = 'video'")
    per_video = (videos.select("media_id",
                               (F.floor(F.col("duration_ms") / 60_000) + 1).alias("n")))
    expected = per_video.agg(F.sum("n")).first()[0]
    assert frames.count() == expected


def test_detect_language_ngram(spark):
    df = spark.createDataFrame(
        [("en", "the thing and the other thing are standing there"),
         ("de", "der hund und die katze gehen durch die schule"),
         ("fr", "les enfants que nous avons vus sont dans la maison"),
         ("es", "los que están aquí han llegado de la ciudad")],
        "expected string, text string")
    rows = df.select("expected",
                     textstats.detect_language_ngram(F.col("text")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expected"]
