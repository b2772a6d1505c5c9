"""Streaming-mode queries — same oracles as their batch twins.

The strongest correctness statement the harness can make about the
streaming engine: a bounded (AvailableNow) streaming run must produce
byte-identical results to the batch DataFrame plan and to the DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_topic_analyzer_spark.registry import all_queries, register
from kafka_topic_analyzer_spark.sources.events_log import kafka_oracle


def _streaming_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.streaming.report_stream import (
        streaming_partition_report,
    )

    return streaming_partition_report(spark, sf_dir)


def _streaming_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.sources.tables import load_table
    from kafka_topic_analyzer_spark.sources.events_log import kafka_frame_from_events_df
    from kafka_topic_analyzer_spark.streaming.alive_keys_stream import (
        streaming_compacted_state,
    )
    from kafka_topic_analyzer_spark.streaming.report_stream import events_stream

    return streaming_compacted_state(kafka_frame_from_events_df(events_stream(spark, sf_dir)), spark)


def _streaming_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.streaming.windowed_stream import (
        streaming_windowed_counts,
    )

    return streaming_windowed_counts(spark, sf_dir)


# Append-mode watermark gate: on bounded input the emitted set is exactly
# the windows closed at the final watermark (max event time - delay) —
# a deterministic SQL-expressible cut (see streaming/windowed_stream.py).
_WINDOWED_ORACLE = """
WITH t AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_type FROM events
),
g AS (
  SELECT tsec - tsec % 3600 AS window_start, event_type,
         CAST(count(*) AS BIGINT) AS n_events
  FROM t GROUP BY 1, 2
)
SELECT window_start, event_type, n_events FROM g
WHERE window_start + 3600 <= (SELECT max(tsec) - 3600 FROM t)
ORDER BY window_start, event_type
"""


def _streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.streaming.windowed_stream import (
        streaming_session_stats,
    )

    return streaming_session_stats(spark, sf_dir)


# Emitted sessions = those the final watermark (max tsec - delay) closed:
# session end (last event + gap) <= watermark. Same islands construction
# as the user_session_stats oracle, plus the cut.
_SESSION_ORACLE = """
WITH t AS (
  SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events
),
numbered AS (
  SELECT user_id, ts, tsec,
         CASE WHEN tsec - lag(tsec) OVER (PARTITION BY user_id ORDER BY ts) > 1800
                   OR lag(tsec) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM t
),
sessioned AS (
  SELECT user_id, tsec,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM numbered
),
per_session AS (
  SELECT user_id, min(tsec) AS session_start,
         max(tsec) - min(tsec) AS duration_sec,
         count(*) AS n_events
  FROM sessioned GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(session_start AS BIGINT) AS session_start,
       CAST(duration_sec AS BIGINT) AS duration_sec,
       CAST(n_events AS BIGINT) AS n_events
FROM per_session
WHERE session_start + duration_sec + 1800 <= (SELECT max(tsec) - 3600 FROM t)
ORDER BY user_id, session_start
"""


def _streaming_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.streaming.join_stream import (
        streaming_purchase_click_join,
    )

    return streaming_purchase_click_join(spark, sf_dir)


# Stream-stream interval join on bounded input == batch interval join
# (all rows on-time; see streaming/join_stream.py).
_SS_JOIN_ORACLE = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       CAST(floor(epoch(p.ts)) - floor(epoch(c.ts)) AS BIGINT) AS gap_sec
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND floor(epoch(c.ts)) BETWEEN floor(epoch(p.ts)) - 3600 AND floor(epoch(p.ts))
ORDER BY purchase_id, click_id
"""


def _streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.streaming.dedup_stream import (
        streaming_distinct_fingerprints,
    )

    return streaming_distinct_fingerprints(spark, sf_dir)


# Streaming dropDuplicates on bounded input emits exactly the distinct
# fingerprint set (which copy won the state race is invisible in fp-only
# output — see streaming/dedup_stream.py).
_STREAM_DEDUP_ORACLE = r"""
SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
FROM documents ORDER BY fp
"""


def _streaming_wm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_topic_analyzer_spark.streaming.dedup_stream import (
        streaming_dedup_within_watermark,
    )

    return streaming_dedup_within_watermark(spark, sf_dir)


# The stream is DOUBLED before dedup (see streaming/dedup_stream.py), so
# matching the plain batch counts proves the watermarked state dropped
# exactly one copy of every event.
_WM_DEDUP_ORACLE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


def _streaming_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined to the (batch)
    customer dimension, rolled up per segment — the canonical "enrich a
    firehose against a slowly-changing dim" pattern. The static side is
    broadcast per micro-batch (stateless join: no watermark, no state
    store); the aggregation holds the only state. At 100 TB/day the dim
    side stays a broadcast as long as it fits executors — past that this
    becomes the salted shuffled join (salted_user_enrichment's operator).
    """
    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.queries.relational import dec
    from kafka_topic_analyzer_spark.sources.tables import load_table
    from kafka_topic_analyzer_spark.streaming.report_stream import events_stream
    from kafka_topic_analyzer_spark.streaming.runner import (
        run_bounded_memory_stream,
    )

    ev = events_stream(spark, sf_dir)
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    agg = (
        ev.join(dim, "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("total_value"),
        )
    )
    name = run_bounded_memory_stream(agg, spark, "complete", "enrich_")
    return spark.table(name).orderBy("c_mktsegment", "event_type")


# Stateless stream-static join + complete-mode agg on bounded input ==
# the plain batch join-aggregate.
_ENRICH_ORACLE = """
SELECT c_mktsegment, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


def _register() -> None:
    # reuse the batch oracles verbatim — streaming must agree with them
    from kafka_topic_analyzer_spark.queries import kafka_core  # noqa: F401
    from kafka_topic_analyzer_spark.registry import _REGISTRY

    register(
        "kafka_report_partition_streaming",
        _streaming_report,
        _REGISTRY["kafka_report_partition"].oracle,
    )
    register(
        "kafka_compacted_state_streaming",
        _streaming_compacted,
        _REGISTRY["kafka_compacted_state"].oracle,
    )
    register(
        "windowed_counts_streaming",
        _streaming_windowed,
        _WINDOWED_ORACLE,
    )
    register(
        "purchase_click_join_streaming",
        _streaming_purchase_click,
        _SS_JOIN_ORACLE,
    )
    register(
        "exact_dedup_streaming",
        _streaming_dedup,
        _STREAM_DEDUP_ORACLE,
    )
    register(
        "dedup_within_watermark_streaming",
        _streaming_wm_dedup,
        _WM_DEDUP_ORACLE,
    )
    register(
        "session_windows_streaming",
        _streaming_sessions,
        _SESSION_ORACLE,
    )
    register(
        "enriched_segment_stats_streaming",
        _streaming_enrichment,
        _ENRICH_ORACLE,
    )


_register()


def _streaming_upsert_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed-incremental MERGE sink (streaming/upsert_sink.py,
    r12) driven end-to-end by the streamed Kafka frame: keyed messages
    upsert into the manifest-versioned bucket state (latest per key
    wins, tombstones delete, only touched buckets rewrite per epoch);
    the returned frame is the FINAL state table, hash-checked against
    the windowed latest-per-key oracle — the driver row that proves the
    incremental mode computes exactly the compacted state. Multi-epoch
    incrementality itself is pinned by tests/test_sinks.py."""
    import tempfile

    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.sources.events_log import (
        kafka_frame_from_events_df,
    )
    from kafka_topic_analyzer_spark.streaming.report_stream import events_stream
    from kafka_topic_analyzer_spark.streaming.upsert_sink import (
        read_state_bucketed,
        stream_upsert_compacted_state_bucketed,
    )

    kdf = kafka_frame_from_events_df(events_stream(spark, sf_dir)).where(
        F.col("key").isNotNull()
    )
    import shutil

    state_dir = tempfile.mkdtemp(prefix="upsert_bucketed_q_")
    try:
        stream_upsert_compacted_state_bucketed(spark, kdf, state_dir, n_buckets=64)
        state = read_state_bucketed(spark, state_dir)
        if state is None:
            # Empty manifest (no keyed non-tombstone messages): the oracle
            # returns zero rows — mirror that instead of raising (advisor r12).
            return spark.createDataFrame(
                [],
                "key string, last_partition int, last_offset bigint, value string",
            )
        # materialize before deleting the state files the plan reads
        # (advisor-r15 tempdir-leak hygiene)
        return (
            state.select(
                "key",
                F.col("partition").cast("int").alias("last_partition"),
                F.col("offset").cast("long").alias("last_offset"),
                "value",
            )
            .orderBy("key")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


register(
    "kafka_upsert_state_bucketed",
    _streaming_upsert_bucketed,
    kafka_oracle("""
, numbered AS (
  SELECT "key", "partition", "offset", "value",
         row_number() OVER (PARTITION BY "key" ORDER BY "partition" DESC, "offset" DESC) AS rn
  FROM kafka_messages WHERE "key" IS NOT NULL
)
SELECT "key",
       CAST("partition" AS INTEGER) AS last_partition,
       CAST("offset" AS BIGINT) AS last_offset,
       "value"
FROM numbered WHERE rn = 1 AND "value" IS NOT NULL
ORDER BY "key"
"""),
)
