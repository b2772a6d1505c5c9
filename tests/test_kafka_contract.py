"""Connector-contract test: canonicalize_kafka_frame against a checked-in
parquet fixture carrying the spark-sql-kafka source's EXACT raw schema
(key/value binary, TimestampType timestamp, timestampType int, headers
array<struct>) — the closest a broker-less sandbox gets to the real path
(ref behavior: src/kafka.rs:74-137). Fixture: tools/gen_kafka_contract_fixture.py.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F, types as T

FIXTURE = str(Path(__file__).parent / "fixtures" / "kafka_connector_raw.parquet")


@pytest.fixture(scope="module")
def raw(spark):
    return spark.read.parquet(FIXTURE)


def test_fixture_matches_connector_schema(raw):
    """Column names, order and Spark types must be the connector's
    (includeHeaders=true variant). If this fails, the fixture drifted —
    do NOT adapt the assertion; regenerate the fixture."""
    expect = [
        ("key", T.BinaryType()),
        ("value", T.BinaryType()),
        ("topic", T.StringType()),
        ("partition", T.IntegerType()),
        ("offset", T.LongType()),
        ("timestamp", T.TimestampType()),
        ("timestampType", T.IntegerType()),
        (
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.BinaryType()),
                    ]
                )
            ),
        ),
    ]
    got = [(f.name, f.dataType) for f in raw.schema.fields]
    assert got == expect, f"fixture schema drifted: {got}"


def test_canonicalize_contract_fixture(raw):
    from kafka_topic_analyzer_spark.schema import kafka_schema
    from kafka_topic_analyzer_spark.sources.kafka import canonicalize_kafka_frame

    kdf = canonicalize_kafka_frame(raw)
    # canonical schema modulo nullability (source nullability is looser)
    assert [(f.name, f.dataType) for f in kdf.schema.fields] == [
        (f.name, f.dataType) for f in kafka_schema(binary=True).fields
    ]
    got = {(r["partition"], r["offset"]): r for r in kdf.collect()}
    assert len(got) == 8
    # µs floor to ms, not round: BASE + 123_999 µs -> BASE_ms + 123
    assert got[(0, 1)]["timestamp_ms"] == 1_700_000_000_123
    # Kafka's -1 ms "missing" sentinel clamps to 0 (ref src/metric.rs:209)
    assert got[(0, 3)]["timestamp_ms"] == 0
    # genuine epoch-0 stays 0
    assert got[(2, 0)]["timestamp_ms"] == 0
    # tombstone NULL preserved; empty-but-alive preserved distinct
    assert got[(0, 2)]["value"] is None
    assert bytes(got[(0, 4)]["value"]) == b""
    assert got[(0, 4)]["key"] is None


def test_report_pipeline_over_contract_fixture(raw):
    """End-to-end: the full 15-column report over the canonicalized
    connector frame, expectations computed by hand from the fixture rows."""
    from kafka_topic_analyzer_spark.operators.report import partition_report
    from kafka_topic_analyzer_spark.sources.kafka import canonicalize_kafka_frame

    rep = {r["partition"]: r.asDict() for r in partition_report(canonicalize_kafka_frame(raw)).collect()}
    assert sorted(rep) == [0, 1, 2]

    p0 = rep[0]
    assert p0["total"] == 5
    assert p0["tombstones"] == 1
    assert p0["key_non_null"] == 4 and p0["key_null"] == 1
    # "alive" is the reference's A3 metric: non-tombstone MESSAGE count
    # (value IS NOT NULL), not compacted-key liveness — 4 of 5 rows
    assert p0["alive"] == 4
    # value bytes: v0(2) + v1-longer(9) + v3(2) + ""(0); tombstone adds 0
    assert p0["value_bytes"] == 13
    # key bytes: k-a + k-a + k-b + k-c = 4 * 3
    assert p0["key_bytes"] == 12
    assert p0["start_offset"] == 0 and p0["end_offset"] == 5

    p1 = rep[1]  # all-tombstone keyed partition
    assert p1["total"] == 2 and p1["tombstones"] == 2 and p1["alive"] == 0
    assert p1["key_bytes"] == 6 and p1["value_bytes"] == 0

    p2 = rep[2]
    assert p2["total"] == 1 and p2["key_non_null"] == 0
    assert p2["value_bytes"] == len(b"v-final")


def test_streaming_report_over_contract_fixture(spark, raw):
    """The streaming surface consumes the same canonical frame: replay the
    fixture through readStream + Trigger.AvailableNow and assert the
    per-partition report matches the batch one bit-for-bit."""
    from kafka_topic_analyzer_spark.functions.metrics import (
        derived_partition_metrics,
        partition_metric_aggs,
    )
    from kafka_topic_analyzer_spark.operators.report import (
        PARTITION_REPORT_COLUMNS,
        partition_report,
    )
    from kafka_topic_analyzer_spark.sources.kafka import canonicalize_kafka_frame
    from kafka_topic_analyzer_spark.streaming.runner import run_bounded_memory_stream

    stream_raw = spark.readStream.schema(raw.schema).parquet(str(Path(FIXTURE).parent))
    agg = canonicalize_kafka_frame(stream_raw).groupBy("partition").agg(
        *partition_metric_aggs()
    )
    name = run_bounded_memory_stream(agg, spark, "complete", "ckpt_contract_")
    streamed = (
        derived_partition_metrics(spark.table(name))
        .select(*PARTITION_REPORT_COLUMNS)
        .orderBy("partition")
    )
    batch = partition_report(canonicalize_kafka_frame(raw))
    assert [r.asDict() for r in streamed.collect()] == [
        r.asDict() for r in batch.collect()
    ]
