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


def test_y4m_roundtrip():
    from kafka_topic_analyzer_spark.functions.codecs import y4m_decode, y4m_encode

    frames = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    blob = y4m_encode(frames, fps=(25, 1))
    assert blob.startswith(b"YUV4MPEG2 W4 H3 F25:1 ")
    meta, back = y4m_decode(blob)
    assert (meta["width"], meta["height"], meta["fps"]) == (4, 3, (25, 1))
    assert meta["colorspace"] == "mono"
    assert len(back) == 2
    assert all(np.array_equal(a, b) for a, b in zip(back, frames))


def test_y4m_decodes_foreign_420_with_frame_tags():
    # a C420 file with reordered header tags, an X comment and FRAME params
    # — the general grammar, not just our encoder's canonical output
    from kafka_topic_analyzer_spark.functions.codecs import y4m_decode

    w, h = 4, 2
    luma0 = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    luma1 = luma0[::-1].copy()
    chroma = bytes(w * h // 2)  # U+V at quarter resolution each
    blob = (
        b"YUV4MPEG2 C420 F30:1 H2 W4 Xsome=comment\n"
        + b"FRAME Ixyz\n" + luma0.tobytes() + chroma
        + b"FRAME\n" + luma1.tobytes() + chroma
    )
    meta, frames = y4m_decode(blob)
    assert meta["colorspace"] == "420" and meta["fps"] == (30, 1)
    assert np.array_equal(frames[0], luma0)
    assert np.array_equal(frames[1], luma1)


def test_y4m_truncated_frame_raises():
    from kafka_topic_analyzer_spark.functions.codecs import y4m_decode

    with pytest.raises(ValueError):
        y4m_decode(b"YUV4MPEG2 W4 H4 F1:1 Cmono\nFRAME\n\x00\x00")


def test_video_frames_real_decode(media):
    from kafka_topic_analyzer_spark.operators.multimodal import sample_video_frames

    frames = sample_video_frames(media)
    sample = frames.limit(50).collect()
    assert sample
    for r in sample:
        # cadence derives from the decoded F2:1 header → 500 ms grid
        assert r["frame_ts_ms"] == r["frame_idx"] * 500
        assert 0 <= r["min_px"] <= r["max_px"] <= 255
        assert r["min_px"] * r["n_px"] <= r["sum_px"] <= r["max_px"] * r["n_px"]
        assert len(r["frame_sha1"]) == 40


def test_video_frames_match_text_bytes(spark, media):
    """Exact twin: decoded luma must be the doc's UTF-8 bytes, cycled
    contiguously across frames."""
    from kafka_topic_analyzer_spark.operators.multimodal import sample_video_frames
    from kafka_topic_analyzer_spark.sources.tables import load_table

    rows = sample_video_frames(media).orderBy("media_id", "frame_idx").limit(20).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        raw = (docs[r["media_id"]] or "").encode("utf-8")
        npx = r["n_px"]
        start = r["frame_idx"] * npx
        if raw:
            idx = (start + np.arange(npx)) % len(raw)
            px = np.frombuffer(raw, dtype=np.uint8)[idx]
        else:
            px = np.zeros(npx, dtype=np.uint8)
        assert r["sum_px"] == int(px.astype(np.int64).sum())
        assert r["min_px"] == int(px.min()) and r["max_px"] == int(px.max())


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
        n=st.integers(min_value=0, max_value=6),
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=24),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_y4m_roundtrip_fuzz(n, w, h, seed):
        from kafka_topic_analyzer_spark.functions.codecs import y4m_decode, y4m_encode

        frames = np.random.default_rng(seed).integers(
            0, 256, size=(n, h, w), dtype=np.uint8
        )
        meta, back = y4m_decode(y4m_encode(frames))
        assert (meta["width"], meta["height"]) == (w, h)
        assert len(back) == n
        assert all(np.array_equal(a, b) for a, b in zip(back, frames))

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


# ---- corrupt-blob contract: skip-and-count (r7) ----

_GARBAGE_CASES = [
    b"",                                   # empty blob
    b"\x00" * 64,                          # all-zero bytes
    b"not a media file at all, sorry",     # plain text
    b"P5",                                 # magic only, no header
    b"P5\n9999999 9999999\n255\n\x00",     # header claims more pixels than data
    b"P6\n4 4\n255\n" + b"\x00" * 48,      # wrong netpbm variant
    b"P5\n4 4\n65535\n" + b"\x00" * 32,    # 16-bit maxval unsupported
    b"RIFF\x10\x00\x00\x00WAVE",           # RIFF with no fmt/data chunks
    b"RIFF\xff\xff\xff\xffWAVEfmt ",       # truncated fmt chunk
    b"YUV4MPEG2 W4 H4 F2:1\nFRAME\n\x01",  # truncated Y4M frame payload
    b"YUV4MPEG2 W4 H4 F2:1 Cweird\n",      # unknown colorspace
    # valid W/H/C but NO F tag: must raise inside the decoder, not
    # KeyError past it in sample_video_frames (advisor r7)
    b"YUV4MPEG2 W2 H2 Cmono\nFRAME\n\x00\x01\x02\x03",
]


def test_decoders_reject_garbage_strictly():
    """Every adversarial blob must raise a _DECODE_ERRORS member from
    every decoder — never return garbage, never hang, never segfault."""
    from kafka_topic_analyzer_spark.functions.codecs import (
        pgm_decode,
        wav_decode,
        y4m_decode,
    )
    from kafka_topic_analyzer_spark.operators.multimodal import _DECODE_ERRORS

    for blob in _GARBAGE_CASES:
        for decoder in (pgm_decode, wav_decode, y4m_decode):
            try:
                decoder(blob)
            except _DECODE_ERRORS:
                continue
            except Exception as e:  # pragma: no cover - contract violation
                raise AssertionError(
                    f"{decoder.__name__} raised unexpected {type(e).__name__} "
                    f"on {blob[:20]!r}"
                ) from e
            else:
                # a decoder may legitimately accept a blob of its OWN format
                # family only if the bytes are genuinely well-formed; none of
                # the cases above are
                raise AssertionError(
                    f"{decoder.__name__} accepted corrupt blob {blob[:20]!r}"
                )


def test_skip_mode_drops_exactly_corrupt_rows(spark, media):
    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.operators.multimodal import (
        corrupt_media,
        decode_audio_features,
        decode_image_features,
        resize_images,
        sample_video_frames,
    )

    bad = corrupt_media(media, modulus=7).cache()
    try:
        for decode in (decode_image_features, sample_video_frames, resize_images):
            ids = {
                r["media_id"]
                for r in decode(bad, on_error="skip").select("media_id").collect()
            }
            kind = {"decode_image_features": "image",
                    "sample_video_frames": "video",
                    "resize_images": "image"}[decode.__name__]
            expect = {
                r["media_id"]
                for r in bad.where(
                    (F.col("kind") == kind) & (F.col("media_id") % 7 >= 2)
                ).select("media_id").collect()
            }
            assert ids == expect, decode.__name__
        audio_ids = {
            r["media_id"]
            for r in decode_audio_features(bad, on_error="skip")
            .select("media_id").distinct().collect()
        }
        expect = {
            r["media_id"]
            for r in bad.where(
                (F.col("kind") == "audio") & (F.col("media_id") % 7 >= 2)
            ).select("media_id").collect()
        }
        assert audio_ids == expect
    finally:
        bad.unpersist()


def test_fail_mode_raises_on_corrupt_rows(spark, media):
    import pytest as _pytest

    from kafka_topic_analyzer_spark.operators.multimodal import (
        corrupt_media,
        decode_image_features,
    )
    from pyspark.errors import PythonException

    bad = corrupt_media(media, modulus=7)
    with _pytest.raises(PythonException):
        decode_image_features(bad, on_error="fail").collect()


def test_audit_counts_match_predicate(spark, media):
    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.operators.multimodal import (
        corrupt_media,
        media_decode_audit,
    )

    rows = media_decode_audit(corrupt_media(media, modulus=7)).collect()
    got = {r["kind"]: (r["n_media"], r["n_ok"], r["n_invalid"]) for r in rows}
    for kind in ("image", "audio", "video"):
        base = media.where(F.col("kind") == kind)
        n = base.count()
        n_bad = base.where(F.col("media_id") % 7 < 2).count()
        assert got[kind] == (n, n - n_bad, n_bad), kind
    # and on the UNcorrupted fixture every blob decodes
    clean = media_decode_audit(media).collect()
    assert all(r["n_invalid"] == 0 for r in clean)


def test_video_sampler_skips_fps_less_y4m(spark):
    """An F-less Y4M header must be a SKIP under on_error='skip' (it used
    to KeyError on meta['fps'] outside _try_decode) and a raise under
    on_error='fail' — same contract as every other corrupt blob."""
    from kafka_topic_analyzer_spark.operators.multimodal import sample_video_frames

    good = (
        b"YUV4MPEG2 W2 H2 F2:1 Cmono\nFRAME\n\x00\x01\x02\x03"
    )
    fps_less = b"YUV4MPEG2 W2 H2 Cmono\nFRAME\n\x00\x01\x02\x03"
    df = spark.createDataFrame(
        [(1, "video", bytearray(good)), (2, "video", bytearray(fps_less))],
        "media_id long, kind string, data binary",
    )
    rows = sample_video_frames(df, on_error="skip").collect()
    assert {r["media_id"] for r in rows} == {1}
    with pytest.raises(Exception) as ei:
        sample_video_frames(df, on_error="fail").collect()
    assert "Y4M header missing F" in str(ei.value)
