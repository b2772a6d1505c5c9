"""Sources producing the canonical Kafka-shaped DataFrame or the testdata tables."""

from kafka_topic_analyzer_spark.sources.tables import load_table, load_tables
from kafka_topic_analyzer_spark.sources.events_log import (
    kafka_frame_from_events,
    KAFKA_MESSAGES_ORACLE_CTE,
)

__all__ = [
    "load_table",
    "load_tables",
    "kafka_frame_from_events",
    "KAFKA_MESSAGES_ORACLE_CTE",
]
