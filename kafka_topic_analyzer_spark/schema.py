"""Canonical Kafka-shaped schema the whole engine consumes.

The reference reads exactly five fields off each Kafka message —
partition, offset, timestamp(ms, optional), key bytes (optional),
value bytes (optional) (reference ``src/metric.rs:206-253``,
``src/kafka.rs:100-105``). The canonical frame mirrors that:

    topic: string (non-null)
    partition: int (non-null)
    offset: long (non-null)
    timestamp_ms: long  -- ms since epoch; 0 == "missing" per the reference's
                           ``unwrap_or(0)`` (src/metric.rs:209)
    key: binary or string, nullable
    value: binary or string, nullable  -- NULL == tombstone; b"" is alive

``key``/``value`` may be BinaryType (real Kafka) or StringType (derived
fixtures); all operators use byte-length semantics (``octet_length``)
which behaves identically on both.
"""

from __future__ import annotations

from pyspark.sql import types as T

TOPIC = "topic"
PARTITION = "partition"
OFFSET = "offset"
TIMESTAMP_MS = "timestamp_ms"
KEY = "key"
VALUE = "value"

KAFKA_FIELDS = [TOPIC, PARTITION, OFFSET, TIMESTAMP_MS, KEY, VALUE]


def kafka_schema(binary: bool = True) -> T.StructType:
    """Canonical schema; ``binary=False`` uses strings for key/value."""
    kv_type = T.BinaryType() if binary else T.StringType()
    return T.StructType(
        [
            T.StructField(TOPIC, T.StringType(), False),
            T.StructField(PARTITION, T.IntegerType(), False),
            T.StructField(OFFSET, T.LongType(), False),
            T.StructField(TIMESTAMP_MS, T.LongType(), False),
            T.StructField(KEY, kv_type, True),
            T.StructField(VALUE, kv_type, True),
        ]
    )


TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
