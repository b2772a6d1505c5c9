"""Streaming ingest → curated parquet shards via ``foreachBatch``.

The production shape of the shard pipeline (operators/pipeline.py): an
unbounded document stream is cleaned, fingerprinted, streaming-deduped,
and appended to a hive-partitioned parquet corpus per micro-batch.
``foreachBatch`` is the right sink here because the batch writer's
controls (partitionBy + maxRecordsPerFile + in-file sort) aren't
available on ``writeStream.format("parquet")`` — and it gives exactly-once
per-epoch semantics: the sink directory is idempotent under micro-batch
replay as long as the write is append-only partitioned by epoch-stable
keys (lang here).

State note: cross-batch dedup state lives in ``dropDuplicates`` keyed by
fingerprint (bounded variants: see dedup_stream.py). Within-batch the
write itself is a plain batch parquet append.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.functions.text import clean_text, md5_fingerprint
from kafka_topic_analyzer_spark.session import prepare_session
from kafka_topic_analyzer_spark.streaming.dedup_stream import documents_stream


def stream_curated_corpus(spark: SparkSession, sf_dir: str, out_path: str) -> int:
    """Run the bounded ingest: clean → fingerprint → dedup → shard write.

    Returns the number of rows written to ``out_path``.
    """
    prepare_session(spark)
    docs = documents_stream(spark, sf_dir)
    curated = (
        docs.select(
            "doc_id",
            "lang",
            clean_text(F.col("text")).alias("text"),
            md5_fingerprint(F.col("text")).alias("fp"),
        )
        .dropDuplicates(["fp"])
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.repartition("lang")
            .sortWithinPartitions("doc_id")
            .write.mode("append")
            .option("maxRecordsPerFile", 100_000)
            .partitionBy("lang")
            .parquet(out_path)
        )

    query = (
        curated.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_corpus_"))
        .queryName(f"corpus_{uuid.uuid4().hex[:12]}")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        if query.isActive:
            query.stop()

    return spark.read.parquet(out_path).count()
