"""Multimodal pipeline: REAL stdlib decode for PPM/WAV payloads (round 2),
fake fallback for compressed formats, + n-gram language ID."""

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
        assert r["n_bytes"] > 15  # real PPM payloads (header + pixels)
        assert 0 <= r["mean_pixel"] <= 255
        assert 30 < r["std_pixel"] < 110  # uniform random pixels: ~73.9
        assert r["aspect"] > 0
    # deterministic: same input → same features
    again = {r["media_id"]: r["sha1"] for r in multimodal.extract_image_features(media).collect()}
    assert {r["media_id"]: r["sha1"] for r in rows} == again


def test_resize_images(spark, media):
    out = multimodal.resize_images(media, 128, 96)
    rows = out.collect()
    assert all(r["width"] == 128 and r["height"] == 96 for r in rows)
    # real PPM re-encode: header + 128*96*3 pixel bytes
    expected = len("P6\n128 96\n255\n") + 128 * 96 * 3
    assert all(len(r["content"]) == expected for r in rows)


def test_real_decode_path_works_for_ppm(spark, media):
    # synthesized payloads are genuine PPMs: strict mode must succeed
    rows = multimodal.extract_image_features(media, fake_decode=False).collect()
    assert len(rows) == media.filter("kind = 'image'").count()


def test_undecodable_payload_is_marked(spark):
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNG fake bytes"), "image/png", 4, 4, None)],
        "media_id long, kind string, content binary, mime string, "
        "width int, height int, duration_ms int")
    with pytest.raises(Exception) as exc:
        multimodal.extract_image_features(df, fake_decode=False).collect()
    assert "NotImplementedError" in str(exc.value) or "PPM" in str(exc.value)
    # fake fallback still produces a row
    assert multimodal.extract_image_features(df, fake_decode=True).count() == 1


def test_audio_features_real_wav(spark, media):
    feats = multimodal.extract_audio_features(media, fake_decode=False)
    rows = feats.collect()
    assert len(rows) == media.filter("kind = 'audio'").count() > 0
    for r in rows:
        assert r["rate"] == 8000
        assert 50 <= r["duration_ms"] <= 510
        # pure sine at amplitude 12000/32768 ~ 0.366: rms ~ 0.259
        assert 0.2 < r["rms"] < 0.3
        assert 0.3 < r["peak"] <= 0.37


def test_codec_roundtrips():
    import numpy as np
    from datacontract_cli_spark.operators import codecs
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    assert (codecs.decode_image(codecs.encode_ppm(arr)) == arr).all()
    small = codecs.resize_nearest(arr, 4, 5)
    assert small.shape == (5, 4, 3)
    samples = (rng.standard_normal(800) * 10000).astype("<i2")
    out, rate = codecs.decode_wav(codecs.encode_wav(samples, 8000))
    assert rate == 8000 and len(out) == 800
    assert np.allclose(out, samples / 32768.0, atol=1e-4)


def test_bmp_decode():
    import struct
    import numpy as np
    from datacontract_cli_spark.operators import codecs
    # hand-build a 2x2 24-bit BMP (bottom-up rows, 4-byte row padding)
    w, h = 2, 2
    row = w * 3
    stride = (row + 3) & ~3
    pixels = np.array([[[255, 0, 0], [0, 255, 0]],
                       [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)  # RGB rows top-down
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        r = b"".join(bytes([p[2], p[1], p[0]]) for p in pixels[y])
        body += r + b"\x00" * (stride - row)
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    out = codecs.decode_image(header + body)
    assert (out == pixels).all()


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
