"""Streaming-mode queries — same oracles as their batch twins.

The strongest correctness statement the harness can make about the
streaming engine: a bounded (AvailableNow) streaming run must produce
byte-identical results to the batch DataFrame plan and to the DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_topic_analyzer_spark.registry import all_queries, register
from kafka_topic_analyzer_spark.sources.events_log import kafka_oracle


def _streaming_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.streaming.report_stream import (
        streaming_partition_report,
    )

    return streaming_partition_report(spark, sf_dir)


def _streaming_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.sources.tables import load_table
    from kafka_topic_analyzer_spark.sources.events_log import kafka_frame_from_events_df
    from kafka_topic_analyzer_spark.streaming.alive_keys_stream import (
        streaming_compacted_state,
    )
    from kafka_topic_analyzer_spark.streaming.report_stream import events_stream

    return streaming_compacted_state(kafka_frame_from_events_df(events_stream(spark, sf_dir)), spark)


def _register() -> None:
    # reuse the batch oracles verbatim — streaming must agree with them
    from kafka_topic_analyzer_spark.queries import kafka_core  # noqa: F401
    from kafka_topic_analyzer_spark.registry import _REGISTRY

    register(
        "kafka_report_partition_streaming",
        _streaming_report,
        _REGISTRY["kafka_report_partition"].oracle,
    )
    register(
        "kafka_compacted_state_streaming",
        _streaming_compacted,
        _REGISTRY["kafka_compacted_state"].oracle,
    )


_register()
