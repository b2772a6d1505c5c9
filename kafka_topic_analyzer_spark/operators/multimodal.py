"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

All three media paths are REAL end-to-end: blobs are genuine PGM (P5),
RIFF/WAV PCM16 and YUV4MPEG2 (Y4M ``Cmono``) files (functions/codecs.py —
pure-numpy codecs for three public formats), and every decode step parses
those bytes back — frame geometry, sample rate and frame cadence all come
from the decoded headers, not the metadata columns.

The test fixture derives media content deterministically from document
text bytes (pixels/samples cycle through the UTF-8 bytes), which keeps
every stage SQL-reproducible for the DuckDB oracle while the Spark side
works only on the encoded blob.

Pattern for 100 TB: media bytes never pass through Python row-at-a-time —
``mapInPandas`` streams Arrow record batches, and per-batch numpy does
the work. Partitioning is whatever the upstream scan gives; a
``repartition(n)`` before heavy decode evens out skew from variable
blob sizes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from kafka_topic_analyzer_spark.functions.codecs import (
    pgm_decode,
    pgm_encode,
    wav_decode,
    wav_encode,
    y4m_decode,
    y4m_encode,
)

# Fixture geometry — small enough that the DuckDB oracle can re-derive
# pixel/sample streams by unnesting ranges (w*h <= 2145, n_samples < 5000).
IMG_W_MOD, IMG_W_BASE = 48, 8
IMG_H_MOD, IMG_H_BASE = 32, 8
AUDIO_RATE = 2_000  # Hz — fixture rate; the codec handles any rate
DUR_MOD, DUR_BASE = 2_000, 500  # duration_ms in [500, 2499]
VIDEO_FPS = (2, 1)  # 2 fps → one frame per 500 ms; frames = ceil(dur/500)

MEDIA_SCHEMA = (
    "media_id long, kind string, data binary, width int, height int, "
    "duration_ms int"
)


# The decoders' failure surface on malformed bytes: header-grammar and
# chunk-walk errors (ValueError), short struct reads (struct.error), and
# numpy buffer-bounds errors (also ValueError). A 100 TB pipeline WILL see
# truncated/corrupt blobs; the operator contract is skip-and-count —
# invalid rows drop out of the feature stream (on_error="skip", default)
# and media_decode_audit carries the counts. on_error="fail" keeps the
# loud behavior for pipelines that stage a quarantine upstream.
_DECODE_ERRORS = (ValueError, struct.error, IndexError, OverflowError)


def _try_decode(fn, blob: bytes, on_error: str):
    if on_error not in ("skip", "fail"):
        raise ValueError(f"on_error must be 'skip' or 'fail', got {on_error!r}")
    try:
        return fn(blob)
    except _DECODE_ERRORS:
        if on_error == "fail":
            raise
        return None


def corrupt_media(media: DataFrame, modulus: int = 7) -> DataFrame:
    """Deterministically corrupt a slice of blobs — the adversarial-input
    fixture for the skip-and-count contract. Two corruption classes every
    ``modulus`` ids, chosen so ALL three formats' decoders provably
    reject them: ``media_id % modulus == 0`` truncates the blob to its
    first 5 bytes (mid-header for PGM/WAV/Y4M alike), ``== 1`` zeroes the
    first byte (kills the P5/RIFF/YUV4MPEG2 magic). Pure JVM expressions
    (binary substring/concat) — the corruption predicate is trivially
    SQL-derivable for the oracle."""
    mid = F.col("media_id") % modulus
    return media.withColumn(
        "data",
        F.when(mid == 0, F.expr("substring(data, 1, 5)"))
        .when(mid == 1, F.concat(F.lit(b"\x00"), F.expr("substring(data, 2, 2147483647)")))
        .otherwise(F.col("data")),
    )


def media_decode_audit(media: DataFrame) -> DataFrame:
    """Per-kind decode health: attempt the kind's REAL decoder on every
    blob and count successes/failures — the counting half of the
    skip-and-count contract. One mapInPandas pass emits a tiny
    (media_id, kind, ok) stream; the per-kind rollup is a 3-group
    aggregate, so at 100 TB the only corpus-sized cost is the decode scan
    itself."""
    decoders = {
        "image": pgm_decode,
        "audio": wav_decode,
        "video": y4m_decode,
    }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                fn = decoders[r["kind"]]
                ok = _try_decode(fn, bytes(r["data"]), "skip") is not None
                rows.append(
                    {"media_id": r["media_id"], "kind": r["kind"], "ok": ok}
                )
            yield pd.DataFrame(rows)

    flags = media.mapInPandas(batches, "media_id long, kind string, ok boolean")
    return (
        flags.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.col("ok").cast("long")).alias("n_ok"),
            F.sum((~F.col("ok")).cast("long")).alias("n_invalid"),
        )
        .orderBy("kind")
    )


def _cycle_bytes(blob: bytes, n: int) -> np.ndarray:
    """First ``n`` bytes of ``blob`` repeated cyclically (zeros if empty)."""
    if not blob:
        return np.zeros(n, dtype=np.uint8)
    return np.resize(np.frombuffer(blob, dtype=np.uint8), n)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """documents → media table with REAL encoded blobs.

    kind cycles image/audio/video by ``doc_id % 3``; content derives from
    the document's UTF-8 bytes (cycled), so the oracle can reproduce the
    decoded stats from ``text`` alone:

    * image: ``width x height`` grayscale PGM, pixel[i] = byte[i mod L]
    * audio: mono 16-bit WAV at AUDIO_RATE, sample[k] = (byte[k mod L] - 128) * 256
    * video: ``Cmono`` Y4M at VIDEO_FPS with ``ceil(duration_ms / 500)``
      frames of ``width x height`` luma; frame f pixel i = byte[(f*w*h + i) mod L]
      (one contiguous cycled stream across frames)
    """
    meta = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("raw"),
        ((F.col("doc_id") % IMG_W_MOD) + IMG_W_BASE).cast("int").alias("width"),
        ((F.col("doc_id") % IMG_H_MOD) + IMG_H_BASE).cast("int").alias("height"),
        ((F.col("doc_id") % DUR_MOD) + DUR_BASE).cast("int").alias("duration_ms"),
    )

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for _, r in pdf.iterrows():
                raw = bytes(r["raw"]) if r["raw"] is not None else b""
                if r["kind"] == "image":
                    w, h = int(r["width"]), int(r["height"])
                    blobs.append(pgm_encode(_cycle_bytes(raw, w * h).reshape(h, w)))
                elif r["kind"] == "audio":
                    n = AUDIO_RATE * int(r["duration_ms"]) // 1000
                    samples = (
                        (_cycle_bytes(raw, n).astype(np.int64) - 128) * 256
                    ).astype(np.int16)
                    blobs.append(wav_encode(samples, AUDIO_RATE))
                else:
                    w, h = int(r["width"]), int(r["height"])
                    n_frames = (int(r["duration_ms"]) + 499) // 500
                    frames = _cycle_bytes(raw, n_frames * w * h).reshape(
                        n_frames, h, w
                    )
                    blobs.append(y4m_encode(frames, fps=VIDEO_FPS))
            out = pdf.drop(columns=["raw"])
            out["data"] = blobs
            yield out[
                ["media_id", "kind", "data", "width", "height", "duration_ms"]
            ]

    return meta.mapInPandas(encode_batches, MEDIA_SCHEMA)


def decode_image_features(media: DataFrame, on_error: str = "skip") -> DataFrame:
    """image rows → integer pixel statistics via real PGM decode.

    All outputs are integers (sums/extremes over uint8 pixels), so the
    oracle can reproduce them exactly — no float discipline needed.
    ``width``/``height`` come from the DECODED header, not the metadata
    columns, proving the bytes were parsed. Corrupt blobs follow the
    skip-and-count contract (``_try_decode``): skipped here, counted by
    ``media_decode_audit``.
    """
    out_schema = (
        "media_id long, n_bytes long, width int, height int, n_px long, "
        "sum_px long, min_px int, max_px int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r["data"])
                px = _try_decode(pgm_decode, blob, on_error)
                if px is None:
                    continue
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(blob),
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "n_px": px.size,
                        "sum_px": int(px.astype(np.int64).sum()),
                        "min_px": int(px.min()),
                        "max_px": int(px.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "image").mapInPandas(batches, out_schema)


def decode_audio_features(
    media: DataFrame, chunk_ms: int = 500, on_error: str = "skip"
) -> DataFrame:
    """audio rows → per-chunk features via real WAV decode (one-to-many).

    Integer features per chunk: ``sum_sq`` (int64 energy — exact),
    ``zero_crossings`` (sign changes, 0 counts as non-negative), sample
    count. The sample rate comes from the DECODED fmt chunk. Corrupt
    blobs skip-and-count (see ``media_decode_audit``).
    """
    out_schema = (
        "media_id long, sample_rate int, chunk_idx int, n_samples int, "
        "sum_sq long, zero_crossings int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                decoded = _try_decode(wav_decode, bytes(r["data"]), on_error)
                if decoded is None:
                    continue
                rate, samples = decoded
                chunk_len = max(rate * chunk_ms // 1000, 1)
                s64 = samples.astype(np.int64)
                for ci in range(max((len(s64) + chunk_len - 1) // chunk_len, 1)):
                    chunk = s64[ci * chunk_len : (ci + 1) * chunk_len]
                    if chunk.size == 0:
                        continue
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "sample_rate": rate,
                            "chunk_idx": ci,
                            "n_samples": int(chunk.size),
                            "sum_sq": int((chunk * chunk).sum()),
                            "zero_crossings": int(
                                np.count_nonzero(np.diff(np.signbit(chunk)))
                            ),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "audio").mapInPandas(batches, out_schema)


def sample_video_frames(media: DataFrame, on_error: str = "skip") -> DataFrame:
    """video rows → one row per decoded frame (UDTF-shaped op).

    REAL decode: parses the Y4M stream (functions/codecs.py), emitting
    one row per frame with integer luma statistics and a fingerprint of
    the raw frame bytes. The frame cadence (``frame_ts_ms``) comes from
    the DECODED ``F`` header rate, not the metadata columns, proving the
    bytes were parsed. Reference analogue: opaque-bytes metric columns,
    ``src/metric.rs:233-245`` — this goes beyond it (the reference has
    no media decode at all).
    """
    out_schema = (
        "media_id long, frame_idx int, frame_ts_ms int, n_px long, "
        "sum_px long, min_px int, max_px int, frame_sha1 string"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                decoded = _try_decode(y4m_decode, bytes(r["data"]), on_error)
                if decoded is None:
                    continue
                meta, frames = decoded
                num, den = meta["fps"]
                for idx, luma in enumerate(frames):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": idx,
                            "frame_ts_ms": idx * 1000 * den // num,
                            "n_px": luma.size,
                            "sum_px": int(luma.astype(np.int64).sum()),
                            "min_px": int(luma.min()),
                            "max_px": int(luma.max()),
                            "frame_sha1": hashlib.sha1(luma.tobytes()).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(batches, out_schema)


def resize_images(
    media: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    on_error: str = "skip",
) -> DataFrame:
    """image rows → nearest-neighbor resize over real decoded pixels.

    Decodes the PGM blob, samples the same integer grid a PIL/cv2
    nearest-neighbor resize uses, re-encodes the result as PGM and
    carries a checksum so downstream stages (feature extraction, dedup)
    can chain on it.
    """
    out_schema = (
        "media_id long, width int, height int, resized binary, "
        "resized_crc32 long, sum_px long, min_px int, max_px int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                px = _try_decode(pgm_decode, bytes(r["data"]), on_error)
                if px is None:
                    continue
                ys = (np.arange(target_h) * px.shape[0] // target_h).clip(
                    0, px.shape[0] - 1
                )
                xs = (np.arange(target_w) * px.shape[1] // target_w).clip(
                    0, px.shape[1] - 1
                )
                out = px[np.ix_(ys, xs)]
                buf = pgm_encode(out)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": target_w,
                        "height": target_h,
                        "resized": buf,
                        "resized_crc32": zlib.crc32(buf) & 0xFFFFFFFF,
                        "sum_px": int(out.astype(np.int64).sum()),
                        "min_px": int(out.min()),
                        "max_px": int(out.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "image").mapInPandas(batches, out_schema)
