"""Multimodal pipeline queries.

Image, audio AND video stats all have REAL decode paths (PGM / WAV / Y4M
parsers, functions/codecs.py) and exact DuckDB oracles: the fixture
derives pixel/sample streams from document text bytes
(operators/multimodal.py), so the oracle re-derives the same integers
from ``text`` alone — byte values come from ``to_hex`` nibble lookups,
pixel/sample indices from ``unnest(range(...))``. NULL ``text`` is
normalized to the empty blob on both sides (Spark maps NULL raw bytes to
b''; the SQL coalesces) so driver-regenerated testdata with NULLs cannot
diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.operators.multimodal import (
    AUDIO_RATE,
    DUR_BASE,
    DUR_MOD,
    IMG_H_BASE,
    IMG_H_MOD,
    IMG_W_BASE,
    IMG_W_MOD,
)
from kafka_topic_analyzer_spark.registry import register
from kafka_topic_analyzer_spark.sources.tables import load_table

# byte j (0-based) of a blob's hex dump (DuckDB to_hex is UPPERCASE), 0..255
_HEX = "0123456789ABCDEF"


def _byte_at(j: str) -> str:
    return (
        f"(strpos('{_HEX}', substr(hx, 2*CAST({j} AS INTEGER)+1, 1))-1)*16"
        f" + (strpos('{_HEX}', substr(hx, 2*CAST({j} AS INTEGER)+2, 1))-1)"
    )


def _image_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → real PGM blobs → real decode → integer pixel stats."""
    from kafka_topic_analyzer_spark.operators.multimodal import (
        decode_image_features,
        documents_as_media,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return decode_image_features(media).orderBy("media_id")


def _image_feature_sql() -> str:
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(doc_id % {IMG_W_MOD} + {IMG_W_BASE} AS INTEGER) AS width,
         CAST(doc_id % {IMG_H_MOD} + {IMG_H_BASE} AS INTEGER) AS height,
         to_hex(COALESCE(encode(text), ''::BLOB)) AS hx,
         COALESCE(octet_length(encode(text)), 0) AS L
  FROM documents WHERE doc_id % 3 = 0
),
px AS (
  SELECT media_id, width, height, L, hx,
         unnest(range(width * height)) AS i
  FROM m
),
vals AS (
  SELECT media_id, width, height,
         CASE WHEN L = 0 THEN 0 ELSE {_byte_at("i % L")} END AS b
  FROM px
)
SELECT media_id,
       -- 'P5\\n' + w digits + ' ' + h digits + '\\n255\\n' + pixels
       CAST(3 + length(CAST(width AS VARCHAR)) + 1
              + length(CAST(height AS VARCHAR)) + 5
              + width * height AS BIGINT) AS n_bytes,
       width, height,
       CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(b) AS BIGINT) AS sum_px,
       CAST(min(b) AS INTEGER) AS min_px,
       CAST(max(b) AS INTEGER) AS max_px
FROM vals
GROUP BY media_id, width, height
ORDER BY media_id
"""


register("image_feature_stats", _image_feature_stats, _image_feature_sql())


AUDIO_CHUNK_MS = 500
_CHUNK_LEN = AUDIO_RATE * AUDIO_CHUNK_MS // 1000


def _audio_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → real WAV blobs → real decode → per-chunk energy rows."""
    from kafka_topic_analyzer_spark.operators.multimodal import (
        decode_audio_features,
        documents_as_media,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return decode_audio_features(media, chunk_ms=AUDIO_CHUNK_MS).orderBy(
        "media_id", "chunk_idx"
    )


def _audio_chunk_sql() -> str:
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(doc_id % {DUR_MOD} + {DUR_BASE} AS INTEGER) AS duration_ms,
         to_hex(COALESCE(encode(text), ''::BLOB)) AS hx,
         COALESCE(octet_length(encode(text)), 0) AS L
  FROM documents WHERE doc_id % 3 = 1
),
s AS (
  SELECT media_id, L, hx,
         unnest(range(({AUDIO_RATE} * duration_ms) // 1000)) AS k
  FROM m
),
samp AS (
  SELECT media_id, k, CAST(k // {_CHUNK_LEN} AS INTEGER) AS chunk_idx,
         CAST(((CASE WHEN L = 0 THEN 0 ELSE {_byte_at("k % L")} END) - 128) * 256
              AS BIGINT) AS v
  FROM s
),
flagged AS (
  SELECT media_id, chunk_idx, v,
         CASE WHEN v < 0 THEN 1 ELSE 0 END AS neg,
         lag(CASE WHEN v < 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY media_id, chunk_idx ORDER BY k) AS prev_neg
  FROM samp
)
SELECT media_id,
       CAST({AUDIO_RATE} AS INTEGER) AS sample_rate,
       chunk_idx,
       CAST(count(*) AS INTEGER) AS n_samples,
       CAST(sum(v * v) AS BIGINT) AS sum_sq,
       CAST(sum(CASE WHEN prev_neg IS NOT NULL AND neg <> prev_neg
                THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings
FROM flagged
GROUP BY media_id, chunk_idx
ORDER BY media_id, chunk_idx
"""


register("audio_chunk_stats", _audio_chunk_stats, _audio_chunk_sql())


def _video_frame_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → real Y4M blobs → real frame decode → luma stats."""
    from kafka_topic_analyzer_spark.operators.multimodal import (
        documents_as_media,
        sample_video_frames,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    frames = sample_video_frames(media)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("n_px").alias("n_px"),
        F.sum("sum_px").alias("sum_px"),
        F.min("min_px").alias("min_px"),
        F.max("max_px").alias("max_px"),
    ).orderBy("media_id")


def _video_frame_sql() -> str:
    """Frames are a contiguous cycled byte stream (frame f pixel i =
    byte[(f*w*h + i) mod L]), so the oracle flattens all frames into one
    ``range(n_frames * w * h)`` unnest and re-derives the decoded totals
    from ``text`` alone. Per-frame sha1 stays unit-test-only (no SHA in
    DuckDB's core)."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(doc_id % {IMG_W_MOD} + {IMG_W_BASE} AS INTEGER) AS width,
         CAST(doc_id % {IMG_H_MOD} + {IMG_H_BASE} AS INTEGER) AS height,
         ((doc_id % {DUR_MOD} + {DUR_BASE}) + 499) // 500 AS n_frames,
         to_hex(COALESCE(encode(text), ''::BLOB)) AS hx,
         COALESCE(octet_length(encode(text)), 0) AS L
  FROM documents WHERE doc_id % 3 = 2
),
px AS (
  SELECT media_id, n_frames, L, hx,
         unnest(range(n_frames * width * height)) AS j
  FROM m
),
vals AS (
  SELECT media_id, n_frames,
         CASE WHEN L = 0 THEN 0 ELSE {_byte_at("j % L")} END AS b
  FROM px
)
SELECT media_id,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(b) AS BIGINT) AS sum_px,
       CAST(min(b) AS INTEGER) AS min_px,
       CAST(max(b) AS INTEGER) AS max_px
FROM vals
GROUP BY media_id, n_frames
ORDER BY media_id
"""


register("video_frame_inventory", _video_frame_inventory, _video_frame_sql())


RESIZE_W, RESIZE_H = 64, 64


def _image_resize_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.operators.multimodal import (
        documents_as_media,
        resize_images,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    resized = resize_images(media, RESIZE_W, RESIZE_H)
    return resized.select(
        "media_id", "width", "height",
        F.length("resized").alias("n_bytes"),
        "sum_px", "min_px", "max_px",
    ).orderBy("media_id")


def _image_resize_sql() -> str:
    """The NN resize grid is integer arithmetic over the cycled text bytes:
    resized[r][c] = pixel[(r*h//H)*w + (c*w//W)], so the oracle re-derives
    the decoded-and-resized pixel stats from ``text`` alone. (The crc32 of
    the re-encoded buffer is exercised by unit tests instead.)"""
    src_idx = f"((r * height) // {RESIZE_H}) * width + ((c * width) // {RESIZE_W})"
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(doc_id % {IMG_W_MOD} + {IMG_W_BASE} AS INTEGER) AS width,
         CAST(doc_id % {IMG_H_MOD} + {IMG_H_BASE} AS INTEGER) AS height,
         to_hex(COALESCE(encode(text), ''::BLOB)) AS hx,
         COALESCE(octet_length(encode(text)), 0) AS L
  FROM documents WHERE doc_id % 3 = 0
),
rows_g AS (SELECT *, unnest(range({RESIZE_H})) AS r FROM m),
grid AS (SELECT *, unnest(range({RESIZE_W})) AS c FROM rows_g),
vals AS (
  SELECT media_id,
         CASE WHEN L = 0 THEN 0 ELSE {_byte_at(f"({src_idx}) % L")} END AS b
  FROM grid
)
SELECT media_id,
       CAST({RESIZE_W} AS INTEGER) AS width,
       CAST({RESIZE_H} AS INTEGER) AS height,
       -- 'P5\\n64 64\\n255\\n' header + pixels
       CAST({3 + len(str(RESIZE_W)) + 1 + len(str(RESIZE_H)) + 5} + {RESIZE_W * RESIZE_H} AS INTEGER) AS n_bytes,
       CAST(sum(b) AS BIGINT) AS sum_px,
       CAST(min(b) AS INTEGER) AS min_px,
       CAST(max(b) AS INTEGER) AS max_px
FROM vals
GROUP BY media_id
ORDER BY media_id
"""


register("image_resize_inventory", _image_resize_inventory, _image_resize_sql())


CORRUPT_MOD = 7


def _media_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-blob handling, end-to-end: deterministically corrupt two
    classes of blobs (truncate-to-5-bytes, magic-byte-zeroed —
    operators/multimodal.py corrupt_media), then attempt every kind's
    REAL decoder on every blob and count per kind. The Spark side decides
    validity by actually parsing the corrupted bytes; the oracle derives
    the expected counts from the corruption predicate alone — so a
    decoder that crashed on (or wrongly accepted) a corrupt blob breaks
    the hash. This is the counting half of the skip-and-count contract
    every decode operator follows (on_error="skip")."""
    from kafka_topic_analyzer_spark.operators.multimodal import (
        corrupt_media,
        documents_as_media,
        media_decode_audit,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return media_decode_audit(corrupt_media(media, modulus=CORRUPT_MOD))


def _media_decode_audit_sql() -> str:
    return f"""
WITH m AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INTEGER)
              WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CASE WHEN doc_id % {CORRUPT_MOD} IN (0, 1) THEN 1 ELSE 0 END AS corrupt
  FROM documents
)
SELECT kind,
       CAST(count(*) AS BIGINT) AS n_media,
       CAST(sum(1 - corrupt) AS BIGINT) AS n_ok,
       CAST(sum(corrupt) AS BIGINT) AS n_invalid
FROM m
GROUP BY kind
ORDER BY kind
"""


register("media_decode_audit", _media_decode_audit, _media_decode_audit_sql())
