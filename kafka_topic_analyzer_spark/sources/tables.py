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


# Tables whose downstream pipelines are per-row-compute-heavy (tokenize /
# hash / decode higher-order functions and UDFs): for these, spreading a
# too-few-splits scan across the cluster beats the one-off shuffle. For
# everything else (cheap column expressions + aggregation) the scan-side
# partial aggregation shrinks data before any exchange, so a repartition
# would only ADD a full-row shuffle — measured slower across the board.
_HEAVY_PER_ROW_TABLES = frozenset({"documents", "embeddings"})


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool | None = None
) -> DataFrame:
    """Load one testdata table by name.

    ``parallel`` repartitions a scan that yields fewer input splits than
    the cluster's parallelism (default: auto — on for the per-row-heavy
    tables above). The fixtures are single-row-group parquet files, which
    Spark cannot split — without this, every downstream per-row
    computation runs in ONE task regardless of core count. On a
    production layout (many files / row groups per table) the scan
    already parallelizes and the repartition is skipped. Safe for oracle
    parity because every oracle-matched aggregation here is
    order-independent (exact decimal / integer sums — see
    queries/relational.py float discipline).
    """
    prepare_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if parallel is None:
        parallel = name in _HEAVY_PER_ROW_TABLES
    if parallel:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load several testdata tables; returns {name: DataFrame}."""
    return {name: load_table(spark, sf_dir, name) for name in names}
