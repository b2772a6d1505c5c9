"""Deterministic Kafka-shaped log derived from the ``events`` testdata table.

The driver's correctness oracle (DuckDB) only pre-registers the ten testdata
tables, so the canonical ``kafka_messages`` frame used by the core metric
operators is DERIVED from ``events`` with pure modular arithmetic — defined
once here in BOTH dialects so the Spark DataFrame and the DuckDB CTE stay in
lock-step. The derivation intentionally produces every edge case the
reference's data model has (SURVEY.md §1, FIXTURES.md §1):

* 8 partitions, contiguous offsets per partition
* ~1% missing timestamps (→ 0 ms, the reference's ``unwrap_or(0)``,
  reference ``src/metric.rs:209``)
* ~9% NULL keys; repeating keys (``key-0..key-199``) so compaction churn
  exists, including keys spanning multiple partitions
* ~14% NULL values (tombstones — reference ``src/metric.rs:241-244``) and
  ~2% empty-but-alive ``''`` values (distinct from tombstone)

Key/value are ASCII strings here (length == byte length in both engines);
real-Kafka and the unit fixture use BinaryType — operators handle both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.schema import (
    KEY,
    OFFSET,
    PARTITION,
    TIMESTAMP_MS,
    TOPIC,
    VALUE,
)
from kafka_topic_analyzer_spark.sources.tables import load_table

N_PARTITIONS = 8
N_KEYS = 200
MISSING_TS_MOD = 97  # event_id % 97 == 0  -> missing timestamp
NULL_KEY_MOD = 11  # event_id % 11 == 0  -> null key
TOMBSTONE_MOD = 7  # event_id % 7 == 3   -> tombstone (NULL value)
EMPTY_VALUE_MOD = 53  # event_id % 53 == 5  -> empty-but-alive value


def kafka_frame_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the derivation (must mirror KAFKA_MESSAGES_ORACLE_CTE)."""
    return kafka_frame_from_events_df(load_table(spark, sf_dir, "events"))


def kafka_frame_from_events_df(e: DataFrame) -> DataFrame:
    """Derivation over an already-loaded events frame (batch OR streaming)."""
    eid = F.col("event_id")
    # events.ts arrives normalized to epoch-nanoseconds long (tables.py
    # normalize_events_ts handles both physical encodings).
    ts_ms = F.floor(F.col("ts") / F.lit(1_000_000)).cast("long")
    return e.select(
        F.lit("events-log").alias(TOPIC),
        (eid % N_PARTITIONS).cast("int").alias(PARTITION),
        F.floor(eid / N_PARTITIONS).cast("long").alias(OFFSET),
        F.when(eid % MISSING_TS_MOD == 0, F.lit(0).cast("long"))
        .otherwise(F.coalesce(ts_ms, F.lit(0).cast("long")))
        .alias(TIMESTAMP_MS),
        F.when(eid % NULL_KEY_MOD == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("key-"), (F.col("user_id") % N_KEYS).cast("string")))
        .alias(KEY),
        F.when(eid % TOMBSTONE_MOD == 3, F.lit(None).cast("string"))
        .when(eid % EMPTY_VALUE_MOD == 5, F.lit(""))
        .otherwise(F.concat(F.col("event_type"), F.lit(":"), F.col("props")))
        .alias(VALUE),
    )


# DuckDB CTE mirroring kafka_frame_from_events — prepend to oracle SQL via
# kafka_oracle(). epoch_ms(ts) == floor(nanos/1e6) because DuckDB truncates
# parquet nanos to micros.
KAFKA_MESSAGES_ORACLE_CTE = f"""
WITH kafka_messages AS (
  SELECT
    'events-log' AS topic,
    CAST(event_id % {N_PARTITIONS} AS INTEGER) AS "partition",
    CAST(event_id // {N_PARTITIONS} AS BIGINT) AS "offset",
    CASE WHEN event_id % {MISSING_TS_MOD} = 0 THEN 0
         ELSE COALESCE(epoch_ms(ts), 0) END AS timestamp_ms,
    CASE WHEN event_id % {NULL_KEY_MOD} = 0 THEN NULL
         ELSE 'key-' || CAST(user_id % {N_KEYS} AS VARCHAR) END AS "key",
    CASE WHEN event_id % {TOMBSTONE_MOD} = 3 THEN NULL
         WHEN event_id % {EMPTY_VALUE_MOD} = 5 THEN ''
         ELSE event_type || ':' || props END AS "value"
  FROM events
)
"""


def kafka_oracle(select_sql: str) -> str:
    """Wrap a SELECT over ``kafka_messages`` with the derivation CTE."""
    return KAFKA_MESSAGES_ORACLE_CTE + select_sql
