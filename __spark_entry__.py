"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``kafka_topic_analyzer_spark``; this file only
adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_topic_analyzer_spark.registry import all_queries
from kafka_topic_analyzer_spark.session import prepare_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's per-partition report over the
    kafka-shaped log derived from events, at sf0.001."""
    prepare_session(spark)
    from kafka_topic_analyzer_spark.operators.report import partition_report
    from kafka_topic_analyzer_spark.sources.events_log import kafka_frame_from_events

    return partition_report(kafka_frame_from_events(spark, "/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare_session(spark)
            return fn(spark, sf_dir)

        return runner

    return {name: wrap(spec.spark) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-executable oracle SQL for each hash-checkable query."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
