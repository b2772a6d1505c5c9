"""Watermarked event-time windowing over the events stream (SURVEY.md §2.10).

The reference has no late-data concept (every message is "on time",
ref ``src/metric.rs:65-72``); this is the north-star streaming extension:
a tumbling event-time window aggregation with ``withWatermark`` in APPEND
mode — the mode where the watermark actually gates emission. On bounded
(AvailableNow) input the result is deterministic: after the final no-data
micro-batch the watermark settles at ``max(event_time) - delay``, and
exactly the windows with ``window.end <= watermark`` have been emitted.
That cut is plain SQL over the same data, so even this query is
oracle-checkable — the trailing (still-open) windows are withheld by
design, matching what a live pipeline would have emitted so far.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.session import prepare_session
from kafka_topic_analyzer_spark.streaming.report_stream import events_stream
from kafka_topic_analyzer_spark.streaming.runner import run_bounded_memory_stream


def streaming_windowed_counts(
    spark: SparkSession,
    sf_dir: str,
    window_sec: int = 3600,
    delay_sec: int = 3600,
) -> DataFrame:
    """Hourly per-event-type counts, append mode, watermark-gated."""
    prepare_session(spark)
    ev = events_stream(spark, sf_dir).select(
        F.timestamp_seconds(
            F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("long")
        ).alias("ev_ts"),
        "event_type",
    )
    agg = (
        ev.withWatermark("ev_ts", f"{delay_sec} seconds")
        .groupBy(F.window("ev_ts", f"{window_sec} seconds"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    name = run_bounded_memory_stream(agg, spark, "append", "ckpt_window_")
    return (
        spark.table(name)
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start", "event_type")
    )


def streaming_session_stats(
    spark: SparkSession,
    sf_dir: str,
    gap_sec: int = 1800,
    delay_sec: int = 3600,
) -> DataFrame:
    """Per-user session windows (merging stateful windows), append mode.

    ``session_window`` merges events whose gap is <= gap_sec (boundary
    pinned by test: a gap of exactly ``gap_sec`` MERGES, matching the
    batch islands rule ``diff > gap`` starts a session). Emitted set on
    bounded input = sessions whose end (last event + gap) the final
    watermark has passed — the same deterministic cut as
    :func:`streaming_windowed_counts`. Event times are floored to whole
    seconds first so the session assignment is identical to the batch
    oracle's integer-second islands.
    """
    prepare_session(spark)
    ev = events_stream(spark, sf_dir).select(
        F.timestamp_seconds(
            F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("long")
        ).alias("ev_ts"),
        "user_id",
    )
    agg = (
        ev.withWatermark("ev_ts", f"{delay_sec} seconds")
        .groupBy(F.session_window("ev_ts", f"{gap_sec} seconds"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    name = run_bounded_memory_stream(agg, spark, "append", "ckpt_sess_")
    return (
        spark.table(name)
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
            (
                F.unix_timestamp(F.col("session_window.end"))
                - F.unix_timestamp(F.col("session_window.start"))
                - F.lit(gap_sec)
            ).alias("duration_sec"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
