"""Loaders for the driver-generated testdata tables (TESTDATA.md).

All reads are plain ``spark.read.parquet`` so Catalyst column pruning and
filter pushdown reach the scan. The one wrinkle: ``events.parquet`` stores
TIMESTAMP(NANOS) which Spark reads only as a raw long via the legacy
``nanosAsLong`` conf (applied in session.prepare_session) — ``load_table``
normalizes the ``ts`` column to epoch-nanoseconds LongType either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kafka_topic_analyzer_spark.schema import TESTDATA_TABLES
from kafka_topic_analyzer_spark.session import prepare_session

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table by name."""
    prepare_session(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load several testdata tables; returns {name: DataFrame}."""
    return {name: load_table(spark, sf_dir, name) for name in names}
