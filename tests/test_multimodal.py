"""Multimodal tests: real PGM/WAV codecs, decode parity, stub boundaries."""

from __future__ import annotations

import numpy as np
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


# ---- codec unit tests (pure python, no spark) ----


def test_pgm_roundtrip():
    from kafka_topic_analyzer_spark.functions.codecs import pgm_decode, pgm_encode

    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    blob = pgm_encode(px)
    assert blob.startswith(b"P5\n4 3\n255\n")
    assert np.array_equal(pgm_decode(blob), px)


def test_pgm_decodes_foreign_header_with_comments():
    # netpbm grammar allows comments between tokens — a file we didn't write
    from kafka_topic_analyzer_spark.functions.codecs import pgm_decode

    blob = b"P5 # magic\n# a comment line\n 2 \n2\n255\n" + bytes([1, 2, 3, 4])
    assert np.array_equal(pgm_decode(blob), np.array([[1, 2], [3, 4]], np.uint8))


def test_wav_roundtrip():
    from kafka_topic_analyzer_spark.functions.codecs import wav_decode, wav_encode

    samples = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
    rate, back = wav_decode(wav_encode(samples, 8000))
    assert rate == 8000
    assert np.array_equal(back, samples)


def test_wav_decodes_file_with_extra_chunk():
    # chunk-walking must skip unknown chunks (e.g. LIST/INFO)
    import struct
    from kafka_topic_analyzer_spark.functions.codecs import wav_decode, wav_encode

    samples = np.array([5, -5, 7], dtype=np.int16)
    blob = wav_encode(samples, 4000)
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    # splice the extra chunk between fmt and data
    fmt_end = 12 + 8 + 16
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    rate, back = wav_decode(spliced)
    assert rate == 4000 and np.array_equal(back, samples)


# ---- spark-side decode on real blobs ----


def test_image_features_real_decode(media):
    from kafka_topic_analyzer_spark.operators.multimodal import decode_image_features

    rows = decode_image_features(media).orderBy("media_id").limit(5).collect()
    assert rows, "expected image rows"
    for r in rows:
        # decoded header dims drive the stats
        assert r["n_px"] == r["width"] * r["height"]
        assert 0 <= r["min_px"] <= r["max_px"] <= 255
        assert r["min_px"] * r["n_px"] <= r["sum_px"] <= r["max_px"] * r["n_px"]
        # blob = header + pixels
        header = f"P5\n{r['width']} {r['height']}\n255\n"
        assert r["n_bytes"] == len(header) + r["n_px"]


def test_image_features_match_text_bytes(spark, media):
    """Exact twin: pixels must be the document's UTF-8 bytes, cycled."""
    from kafka_topic_analyzer_spark.operators.multimodal import decode_image_features
    from kafka_topic_analyzer_spark.sources.tables import load_table

    feats = {
        r["media_id"]: r
        for r in decode_image_features(media).orderBy("media_id").limit(10).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for mid, r in feats.items():
        raw = docs[mid].encode("utf-8")
        px = (
            np.resize(np.frombuffer(raw, dtype=np.uint8), r["n_px"])
            if raw
            else np.zeros(r["n_px"], dtype=np.uint8)
        )
        assert r["sum_px"] == int(px.astype(np.int64).sum())
        assert r["min_px"] == int(px.min()) and r["max_px"] == int(px.max())


def test_audio_chunk_features(media):
    from kafka_topic_analyzer_spark.operators.multimodal import (
        AUDIO_RATE,
        decode_audio_features,
    )

    chunks = decode_audio_features(media, chunk_ms=500)
    sample = chunks.limit(50).collect()
    assert sample
    chunk_len = AUDIO_RATE * 500 // 1000
    for r in sample:
        assert r["sample_rate"] == AUDIO_RATE  # decoded from the fmt chunk
        assert 1 <= r["n_samples"] <= chunk_len
        assert r["sum_sq"] >= 0
        assert 0 <= r["zero_crossings"] < max(r["n_samples"], 2)
    one = chunks.groupBy("media_id").count().limit(5).collect()
    assert all(r["count"] >= 1 for r in one)


def test_video_stub_raises_without_fake(media):
    from kafka_topic_analyzer_spark.operators.multimodal import sample_video_frames

    with pytest.raises(NotImplementedError):
        sample_video_frames(media)


def test_video_frame_sampling(media):
    from kafka_topic_analyzer_spark.operators.multimodal import sample_video_frames

    frames = sample_video_frames(media, every_ms=500, deterministic_fake=True)
    sample = frames.limit(50).collect()
    assert sample
    assert all(r["frame_ts_ms"] % 500 == 0 for r in sample)
    assert all(len(r["frame_sha1"]) == 40 for r in sample)


def test_image_resize(media):
    from kafka_topic_analyzer_spark.functions.codecs import pgm_decode
    from kafka_topic_analyzer_spark.operators.multimodal import resize_images

    out = resize_images(media, 32, 16).limit(10).collect()
    assert out
    for r in out:
        assert (r["width"], r["height"]) == (32, 16)
        px = pgm_decode(bytes(r["resized"]))  # output is a valid PGM again
        assert px.shape == (16, 32)
    # deterministic across runs
    again = resize_images(media, 32, 16).limit(10).collect()
    assert [r["resized_crc32"] for r in out] == [r["resized_crc32"] for r in again]


def test_resize_grid_exact_twin(media):
    """The NN grid must match the canonical integer grid on real pixels."""
    from kafka_topic_analyzer_spark.functions.codecs import pgm_decode
    from kafka_topic_analyzer_spark.operators.multimodal import resize_images

    src = {
        r["media_id"]: bytes(r["data"])
        for r in media.where("kind = 'image'").orderBy("media_id").limit(5).collect()
    }
    out = {
        r["media_id"]: bytes(r["resized"])
        for r in resize_images(media, 32, 16).orderBy("media_id").limit(5).collect()
    }
    for mid, blob in out.items():
        px = pgm_decode(src[mid])
        ys = (np.arange(16) * px.shape[0] // 16).clip(0, px.shape[0] - 1)
        xs = (np.arange(32) * px.shape[1] // 32).clip(0, px.shape[1] - 1)
        assert np.array_equal(pgm_decode(blob), px[np.ix_(ys, xs)])


# ---- property-based codec fuzz (hypothesis) ----

try:
    from hypothesis import given, settings, strategies as st

    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_pgm_roundtrip_fuzz(w, h, seed):
        from kafka_topic_analyzer_spark.functions.codecs import pgm_decode, pgm_encode

        px = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
        assert np.array_equal(pgm_decode(pgm_encode(px)), px)

    @given(
        n=st.integers(min_value=0, max_value=5000),
        rate=st.sampled_from([2000, 8000, 16000, 44100]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_roundtrip_fuzz(n, rate, seed):
        from kafka_topic_analyzer_spark.functions.codecs import wav_decode, wav_encode

        samples = (
            np.random.default_rng(seed)
            .integers(-32768, 32768, size=n)
            .astype(np.int16)
        )
        got_rate, back = wav_decode(wav_encode(samples, rate))
        assert got_rate == rate and np.array_equal(back, samples)

except ImportError:  # pragma: no cover - hypothesis is baked in per TESTDATA
    pass
