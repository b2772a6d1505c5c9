"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow batch shape,
``mapInPandas`` signatures, partition behavior; the actual media decode is
STUBBED (the container has no image/audio libraries): ``decode_image``
raises ``NotImplementedError`` unless ``deterministic_fake=True``, which
produces a seeded fake derived from the bytes so pipelines are testable
end-to-end.

Pattern for 100 TB: media bytes never pass through Python row-at-a-time —
``mapInPandas`` streams Arrow record batches, and per-batch vectorized
numpy does the work. Partitioning is whatever the upstream scan gives;
a ``repartition(n)`` before heavy decode evens out skew from variable
blob sizes.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

IMAGE_FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, kind string, data binary, width int, height int, "
    "duration_ms int"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic fake media table from documents (test stand-in:
    text bytes play the role of an encoded blob)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
        ((F.col("doc_id") % 640) + 16).cast("int").alias("width"),
        ((F.col("doc_id") % 480) + 16).cast("int").alias("height"),
        ((F.col("doc_id") % 90_000) + 1_000).cast("int").alias("duration_ms"),
    )


def _fake_pixels(blob: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: seeded PRNG over the blob."""
    seed = zlib.crc32(blob) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def decode_image_features(
    media: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """image rows → per-image feature vector + basic stats via mapInPandas.

    Real deployment would decode with PIL/opencv inside the same batch
    loop; the Arrow plumbing (schema below) is identical either way.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "no image codec in this environment — pass deterministic_fake=True "
            "for the seeded stand-in decoder"
        )

    out_schema = (
        "media_id long, n_bytes long, mean_px double, std_px double, "
        f"feature array<double>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r["data"])
                px = _fake_pixels(blob, int(r["width"]), int(r["height"]))
                hist, _ = np.histogram(px, bins=IMAGE_FEATURE_DIM, range=(0, 256))
                feat = (hist / max(px.size, 1)).astype(float)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(blob),
                        "mean_px": float(px.mean()),
                        "std_px": float(px.std()),
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "image").mapInPandas(batches, out_schema)


def decode_audio_features(
    media: DataFrame,
    chunk_ms: int = 1_000,
    sample_rate: int = 16_000,
    deterministic_fake: bool = False,
) -> DataFrame:
    """audio rows → per-chunk loudness features via mapInPandas.

    Real deployment would decode PCM with soundfile/ffmpeg inside the
    same Arrow batch loop; here the waveform is a seeded stand-in. Per
    blob: synthesize duration_ms worth of samples, split into chunk_ms
    windows, emit one row per chunk with RMS + zero-crossing count —
    the UDTF-shaped (one-to-many) audio analogue of frame sampling.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "no audio codec in this environment — pass deterministic_fake=True "
            "for the seeded stand-in decoder"
        )

    out_schema = (
        "media_id long, chunk_idx int, n_samples int, rms double, "
        "zero_crossings int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunk_len = sample_rate * chunk_ms // 1000
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r["data"])
                seed = zlib.crc32(blob) & 0xFFFFFFFF
                rng = np.random.default_rng(seed)
                n = sample_rate * int(r["duration_ms"]) // 1000
                wave = rng.standard_normal(n).astype(np.float32)
                for ci in range(0, max((n + chunk_len - 1) // chunk_len, 1)):
                    chunk = wave[ci * chunk_len : (ci + 1) * chunk_len]
                    if chunk.size == 0:
                        continue
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "chunk_idx": ci,
                            "n_samples": int(chunk.size),
                            "rms": float(np.sqrt(np.mean(chunk**2))),
                            "zero_crossings": int(
                                np.count_nonzero(np.diff(np.signbit(chunk)))
                            ),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "audio").mapInPandas(batches, out_schema)


def sample_video_frames(
    media: DataFrame, every_ms: int = 10_000, deterministic_fake: bool = False
) -> DataFrame:
    """video rows → one row per sampled frame timestamp (UDTF-shaped op).

    Frame *extraction* is stubbed; the timestamp grid, explode shape and
    per-frame fingerprint plumbing are real.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "no video codec in this environment — pass deterministic_fake=True"
        )

    out_schema = "media_id long, frame_ts_ms int, frame_sha1 string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r["data"])
                for ts in range(0, int(r["duration_ms"]), every_ms):
                    h = hashlib.sha1(blob + ts.to_bytes(8, "little")).hexdigest()
                    rows.append(
                        {"media_id": r["media_id"], "frame_ts_ms": ts, "frame_sha1": h}
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(batches, out_schema)


def resize_images(
    media: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    deterministic_fake: bool = False,
) -> DataFrame:
    """image rows → resized pixel buffers via mapInPandas.

    Nearest-neighbor index math is real (the same grid a PIL/cv2 resize
    would sample); only the source pixels come from the seeded stand-in
    decoder. Output carries the resized buffer as binary plus a checksum
    so downstream stages (feature extraction, dedup) can chain on it.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "no image codec in this environment — pass deterministic_fake=True"
        )

    out_schema = (
        "media_id long, width int, height int, resized binary, resized_crc32 long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                px = _fake_pixels(bytes(r["data"]), int(r["width"]), int(r["height"]))
                ys = (np.arange(target_h) * px.shape[0] // target_h).clip(0, px.shape[0] - 1)
                xs = (np.arange(target_w) * px.shape[1] // target_w).clip(0, px.shape[1] - 1)
                resized = px[np.ix_(ys, xs)]
                buf = resized.tobytes()
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": target_w,
                        "height": target_h,
                        "resized": buf,
                        "resized_crc32": zlib.crc32(buf) & 0xFFFFFFFF,
                    }
                )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "image").mapInPandas(batches, out_schema)
