"""Multimodal plumbing tests: schema, batch shape, stub determinism."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    from kafka_topic_analyzer_spark.operators.multimodal import documents_as_media
    from kafka_topic_analyzer_spark.sources.tables import load_table

    return documents_as_media(load_table(spark, SF_SMOKE, "documents")).cache()


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "media_id": "bigint", "kind": "string", "data": "binary",
        "width": "int", "height": "int", "duration_ms": "int",
    }
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_stub_raises_without_fake(media):
    from kafka_topic_analyzer_spark.operators.multimodal import decode_image_features

    with pytest.raises(NotImplementedError):
        decode_image_features(media)


def test_image_features_deterministic(spark, media):
    from kafka_topic_analyzer_spark.operators.multimodal import (
        IMAGE_FEATURE_DIM,
        decode_image_features,
    )

    feats = decode_image_features(media, deterministic_fake=True)
    rows = feats.orderBy("media_id").limit(5).collect()
    assert rows, "expected image rows"
    for r in rows:
        assert len(r["feature"]) == IMAGE_FEATURE_DIM
        assert abs(sum(r["feature"]) - 1.0) < 1e-9  # normalized histogram
        assert 0 <= r["mean_px"] <= 255
    # rerun → identical (seeded from blob bytes)
    again = decode_image_features(media, deterministic_fake=True).orderBy("media_id").limit(5).collect()
    assert [r.asDict() for r in rows] == [r.asDict() for r in again]


def test_audio_chunk_features(media):
    from kafka_topic_analyzer_spark.operators.multimodal import decode_audio_features

    chunks = decode_audio_features(media, chunk_ms=1_000, deterministic_fake=True)
    sample = chunks.limit(50).collect()
    assert sample
    for r in sample:
        assert 1 <= r["n_samples"] <= 16_000  # one chunk at 16 kHz
        assert r["rms"] > 0  # gaussian stand-in is never silent
        assert 0 <= r["zero_crossings"] < r["n_samples"]
    # chunk grid covers duration: media with duration d ms -> ceil(d/1000) chunks
    one = chunks.groupBy("media_id").count().limit(5).collect()
    assert all(r["count"] >= 1 for r in one)


def test_video_frame_sampling(media):
    from kafka_topic_analyzer_spark.operators.multimodal import sample_video_frames

    frames = sample_video_frames(media, every_ms=10_000, deterministic_fake=True)
    sample = frames.limit(50).collect()
    assert sample
    assert all(r["frame_ts_ms"] % 10_000 == 0 for r in sample)
    assert all(len(r["frame_sha1"]) == 40 for r in sample)


def test_image_resize(media):
    from kafka_topic_analyzer_spark.operators.multimodal import resize_images

    out = resize_images(media, 32, 16, deterministic_fake=True).limit(10).collect()
    assert out
    for r in out:
        assert (r["width"], r["height"]) == (32, 16)
        assert len(bytes(r["resized"])) == 32 * 16  # uint8 grid
    # deterministic across runs
    again = resize_images(media, 32, 16, deterministic_fake=True).limit(10).collect()
    assert [r["resized_crc32"] for r in out] == [r["resized_crc32"] for r in again]
