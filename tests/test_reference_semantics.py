"""Pin the reference's semantic quirks (SURVEY.md §7 'hard parts') on a
hand-built BinaryType fixture — tombstone vs empty value, all-tombstone
division guard, missing timestamps, size extremes, key lifecycle."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def kdf(spark):
    """FIXTURES.md §1 edge-case rows, real BinaryType with NULLs."""
    from kafka_topic_analyzer_spark.schema import kafka_schema

    rows = [
        # partition 0: normal traffic + lifecycle triple
        ("t", 0, 0, 1609459200_000, b"k_dead", b"v1"),
        ("t", 0, 1, 1609459201_500, b"k_dead", None),          # killed
        ("t", 0, 2, 1609459202_000, b"k_res", b"v1"),
        ("t", 0, 3, 1609459203_000, b"k_res", None),
        ("t", 0, 4, 1609459204_000, b"k_res", b"v2"),          # resurrected
        ("t", 0, 5, 1609459205_000, b"k_live", b"v1"),
        ("t", 0, 6, 1609459206_000, b"k_live", b"v2"),         # overwritten
        ("t", 0, 7, 0, b"no_ts", b"x"),                         # missing ts -> epoch
        ("t", 0, 8, 1609459207_000, None, None),                # null-key tombstone
        ("t", 0, 9, 1609459208_000, b"k_split", b"alive-p0"),
        # partition 1: empty-but-alive value; extremes
        ("t", 1, 0, 1609459300_000, b"e", b""),                 # alive, 0 bytes
        ("t", 1, 1, 1609459301_000, None, b"m"),                # 1-byte msg (smallest)
        ("t", 1, 2, 1609459302_000, b"q", b"X" * 10_000),       # largest
        ("t", 1, 3, 1609459303_000, b"very-long-tombstone-key" * 30, None),
        ("t", 1, 4, 1609459304_000, b"k_split", None),          # k_split dead in p1
        # partition 2: ALL-tombstone keyed partition (avg div-by-zero trap)
        ("t", 2, 0, 1609459400_000, b"t1", None),
        ("t", 2, 1, 1609459401_000, b"t2", None),
    ]
    return spark.createDataFrame(rows, kafka_schema(binary=True))


def _prow(df, p):
    return {r["partition"]: r.asDict() for r in df.collect()}[p]


def test_partition_report_core(spark, kdf):
    from kafka_topic_analyzer_spark.operators.report import partition_report

    rep = partition_report(kdf)
    p0 = _prow(rep, 0)
    assert p0["total"] == 10
    assert p0["tombstones"] == 3  # k_dead kill, k_res kill, null-key tombstone
    assert p0["alive"] == 7
    assert p0["key_null"] == 1 and p0["key_non_null"] == 9
    assert p0["start_offset"] == 0 and p0["end_offset"] == 10
    assert p0["dirty_ratio"] == 30.0

    p1 = _prow(rep, 1)
    assert p1["alive"] == 3  # includes the empty-but-non-null value
    assert p1["tombstones"] == 2


def test_all_tombstone_partition_avg_guard(spark, kdf):
    """Reference would panic (divide by alive=0, src/metric.rs:132-139);
    engine pins 0."""
    from kafka_topic_analyzer_spark.operators.report import partition_report

    p2 = _prow(partition_report(kdf), 2)
    assert p2["alive"] == 0 and p2["key_bytes"] > 0
    assert p2["key_size_avg"] == 0
    assert p2["value_size_avg"] == 0
    assert p2["message_size_avg"] == 0
    assert p2["dirty_ratio"] == 100.0


def test_global_extremes_exclude_tombstones(spark, kdf):
    from kafka_topic_analyzer_spark.operators.report import global_report

    g = global_report(kdf).collect()[0].asDict()
    # smallest alive message: partition 1 offset 1 = null key + 1-byte value
    assert g["smallest_message"] == 1
    # largest: 1-byte key + 10k value; the huge tombstone key must NOT win
    assert g["largest_message"] == 10_001
    # missing ts -> epoch dominates the min (ref src/metric.rs:209)
    assert g["earliest_ts_sec"] == 0
    assert g["latest_ts_sec"] == 1609459401
    assert g["overall_count"] == 17


def test_second_truncation(spark, kdf):
    """ms 1609459201_500 truncates to 1609459201 (ref src/metric.rs:210)."""
    from kafka_topic_analyzer_spark.functions.metrics import ts_seconds

    secs = (
        kdf.where((F.col("partition") == 0) & (F.col("offset") == 1))
        .select(ts_seconds().alias("s"))
        .collect()[0]["s"]
    )
    assert secs == 1609459201


def test_alive_keys_lifecycle(spark, kdf):
    """k_dead dead, k_res resurrected, k_live once, k_split: latest is
    (p1, o4) -> dead (deterministic (partition, offset) order, SURVEY §3.2)."""
    from kafka_topic_analyzer_spark.operators.alive_keys import (
        alive_key_count,
        compacted_state,
    )

    state = {bytes(r["key"]): r.asDict() for r in compacted_state(kdf).collect()}
    assert state[(b"k_dead")]["alive"] is False
    assert state[(b"k_res")]["alive"] is True
    assert state[(b"k_live")]["alive"] is True
    assert state[(b"k_live")]["versions"] == 2
    assert state[(b"k_split")]["alive"] is False
    assert state[(b"k_split")]["last_partition"] == 1

    # alive: k_res, k_live, no_ts, e, q = 5 (null-key rows ignored)
    assert alive_key_count(kdf).collect()[0]["alive_keys"] == 5


def test_tombstone_vs_empty_value(spark, kdf):
    """NULL value is a tombstone; b'' is alive (ref src/metric.rs:233-245)."""
    from kafka_topic_analyzer_spark.operators.alive_keys import compacted_state

    state = {bytes(r["key"]): r.asDict() for r in compacted_state(kdf).collect()}
    assert state[(b"e")]["alive"] is True


def test_canonicalize_raw_kafka_frame(spark):
    """The real-broker path: a frame with the Kafka source's exact schema
    canonicalizes into the engine frame (ms timestamps, missing ts -> 0,
    binary key/value nullness preserved) and feeds the same report."""
    import datetime as dt

    from pyspark.sql import types as T, functions as F
    from kafka_topic_analyzer_spark.operators.report import partition_report
    from kafka_topic_analyzer_spark.sources.kafka import canonicalize_kafka_frame

    schema = T.StructType([
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ])
    ts = dt.datetime(2024, 1, 1, 0, 0, 1, 500000, tzinfo=dt.timezone.utc)
    rows = [
        (b"k1", b"v1", "t", 0, 0, ts, 0),
        (b"k1", None, "t", 0, 1, ts, 0),      # tombstone
        (None, b"v2", "t", 0, 2, None, 0),    # null key, missing ts
        (b"k2", b"", "t", 1, 0, ts, 0),       # empty-but-present value
    ]
    kdf = canonicalize_kafka_frame(spark.createDataFrame(rows, schema))
    got = {(r["partition"], r["offset"]): r for r in kdf.collect()}
    assert got[(0, 0)]["timestamp_ms"] == 1704067201500
    assert got[(0, 2)]["timestamp_ms"] == 0          # missing -> epoch
    assert got[(0, 1)]["value"] is None              # tombstone kept NULL
    assert got[(1, 0)]["value"] == bytearray(b"")    # empty != tombstone

    rep = {r["partition"]: r for r in partition_report(kdf).collect()}
    assert rep[0]["total"] == 3 and rep[0]["tombstones"] == 1
    assert rep[1]["alive"] == 1 and rep[1]["value_bytes"] == 0
