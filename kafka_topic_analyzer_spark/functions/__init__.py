"""Column-expression building blocks (all JVM-side built-ins, codegen-friendly)."""

from kafka_topic_analyzer_spark.functions.metrics import (
    key_len,
    value_len,
    message_size,
    ts_seconds,
    partition_metric_aggs,
    global_metric_aggs,
    derived_partition_metrics,
)

__all__ = [
    "key_len",
    "value_len",
    "message_size",
    "ts_seconds",
    "partition_metric_aggs",
    "global_metric_aggs",
    "derived_partition_metrics",
]
