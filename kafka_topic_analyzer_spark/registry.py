"""Query registry — every implemented operator as (Spark callable, oracle SQL).

Each entry pairs a PySpark DataFrame query with the ANSI-SQL statement DuckDB
runs over the same parquet tables; the driver hash-compares the two at
sf=0.01 (see __spark_entry__.py). Column names/aliases MUST match between
the two sides. Kafka-core queries run over the deterministic log derived
from ``events`` (sources/events_log.py) so the oracle can reproduce them
from the pre-registered views alone.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One registered query: Spark side + optional DuckDB oracle SQL."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, spark_fn: Callable[[SparkSession, str], DataFrame], oracle: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    _REGISTRY[name] = QuerySpec(spark_fn, oracle)


def all_queries() -> dict[str, QuerySpec]:
    # Import triggers registration of every operator module exactly once.
    import kafka_topic_analyzer_spark.queries  # noqa: F401

    return dict(_REGISTRY)
