"""Streaming exact deduplication — the corpus-ingest shape of
operators/dedup.exact_dup_clusters.

A training-data pipeline ingests documents continuously; exact dedup
there is ``dropDuplicates`` on the content fingerprint, which Structured
Streaming runs with per-key state (first arrival wins, later arrivals
dropped). On bounded input (AvailableNow) the emitted fingerprint SET is
deterministic — exactly the distinct fingerprints — even though which
doc_id carried each fingerprint first is a race. The query therefore
emits only the fingerprint column (any other column — even lang — can
differ between copies, and which copy wins the state race is not
deterministic; sf0.1 has 7 fingerprints spanning two langs).

State note for unbounded topics: keyed state grows with the number of
distinct fingerprints; the production variant bounds it with
``dropDuplicatesWithinWatermark`` once records carry event time. Bounded
runs here don't need a watermark.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from kafka_topic_analyzer_spark.functions.text import md5_fingerprint
from kafka_topic_analyzer_spark.session import prepare_session
from kafka_topic_analyzer_spark.streaming.runner import run_bounded_memory_stream

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded file-source stream over documents.parquet."""
    prepare_session(spark)
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", "1")
        .load(sf_dir)
    )


def streaming_distinct_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: one row per distinct content fingerprint.

    ``dropDuplicates(["fp"])`` keeps streaming state per fingerprint; the
    append-mode memory sink collects the survivors. Returns fp sorted —
    identical to the batch/SQL ``SELECT DISTINCT``.
    """
    prepare_session(spark)
    docs = documents_stream(spark, sf_dir)
    deduped = docs.select(md5_fingerprint(F.col("text")).alias("fp")).dropDuplicates(
        ["fp"]
    )

    name = run_bounded_memory_stream(deduped, spark, "append", "ckpt_dedup_")

    return spark.table(name).orderBy("fp")


def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup — the unbounded-topic variant.

    The input is deliberately DOUBLED (the events stream unioned with
    itself) so the dedup state provably drops rows;
    ``dropDuplicatesWithinWatermark`` keys on event_id and, unlike plain
    ``dropDuplicates``, expires state once the watermark passes a key's
    event time + delay — state size tracks the duplication window, not
    the full history. On bounded input every row is on-time, so the
    surviving set is exactly the distinct event_ids; the returned
    per-type counts equal plain batch counts over events.
    """
    from kafka_topic_analyzer_spark.streaming.report_stream import events_stream

    prepare_session(spark)

    def with_event_time(df: DataFrame) -> DataFrame:
        ts = F.timestamp_seconds(F.floor(F.col("ts") / F.lit(1_000_000_000)))
        return df.select("event_id", "event_type", ts.alias("event_ts"))

    a = with_event_time(events_stream(spark, sf_dir))
    b = with_event_time(events_stream(spark, sf_dir))
    doubled = a.unionAll(b).withWatermark("event_ts", "1 hour")
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"])

    name = run_bounded_memory_stream(deduped, spark, "append", "ckpt_wmdedup_")

    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )
