"""Loaders for the driver-generated testdata tables (TESTDATA.md).

All reads are plain ``spark.read.parquet`` so Catalyst column pruning and
filter pushdown reach the scan. The one wrinkle: ``events.parquet``'s ``ts``
physical type has varied across testdata generations — TIMESTAMP(NANOS)
(readable only as a raw long via the legacy ``nanosAsLong`` conf) or native
TIMESTAMP / TIMESTAMP_NTZ micros — so ``load_table`` normalizes ``ts`` to
epoch-nanoseconds LongType either way; every downstream consumer divides by
1e9 / 1e6 and is insulated from the storage type.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Return ``df`` with ``ts`` as epoch-nanoseconds LongType.

    Handles both physical encodings the driver has shipped: raw long nanos
    (parquet TIMESTAMP(NANOS) under ``nanosAsLong``) and native TIMESTAMP /
    TIMESTAMP_NTZ micros. Session TZ is pinned to UTC (session.RUNTIME_CONFS),
    so the NTZ→LTZ cast is a wall-clock identity and ``unix_micros`` yields
    the same epoch DuckDB's ``epoch()`` / ``epoch_ms()`` compute on the naive
    value — oracle parity holds for both encodings. Works on batch AND
    streaming frames (stateless projection).
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype is None or not dtype.startswith("timestamp"):
        return df
    nanos = (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("long")
    return df.withColumn("ts", nanos)


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
    if name == "events":
        df = normalize_events_ts(df)
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
