"""Multimodal pipeline queries (rows-only: stub decoders aren't SQL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.registry import register
from kafka_topic_analyzer_spark.sources.tables import load_table


def _image_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → fake media blobs → mapInPandas feature extraction →
    aggregate; exercises the full multimodal plumbing distributed."""
    from kafka_topic_analyzer_spark.operators.multimodal import (
        decode_image_features,
        documents_as_media,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = decode_image_features(media, deterministic_fake=True)
    return feats.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.round(F.sum(F.col("mean_px").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 4).alias("mean_of_means"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


register("image_feature_stats", _image_feature_stats, None)


def _audio_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.operators.multimodal import (
        decode_audio_features,
        documents_as_media,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    chunks = decode_audio_features(media, chunk_ms=1_000, deterministic_fake=True)
    return chunks.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_samples").alias("total_samples"),
        F.round(F.max("rms"), 4).alias("peak_rms"),
        F.sum("zero_crossings").alias("total_zero_crossings"),
    ).orderBy("media_id")


register("audio_chunk_stats", _audio_chunk_stats, None)


def _video_frame_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.operators.multimodal import (
        documents_as_media,
        sample_video_frames,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    frames = sample_video_frames(media, every_ms=10_000, deterministic_fake=True)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("frame_sha1").alias("n_distinct_frames"),
    ).orderBy("media_id")


register("video_frame_inventory", _video_frame_inventory, None)


def _image_resize_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.operators.multimodal import (
        documents_as_media,
        resize_images,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    resized = resize_images(media, 64, 64, deterministic_fake=True)
    return resized.select(
        "media_id", "width", "height",
        F.length("resized").alias("n_bytes"), "resized_crc32",
    ).orderBy("media_id")


register("image_resize_inventory", _image_resize_inventory, None)
