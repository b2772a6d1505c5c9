"""Streaming Count-Min sketch maintenance over the events stream.

The batch sketch (operators/sketches.py) is built from the per-key census;
online, the same cells are maintained DIRECTLY from the raw stream — each
arriving event increments d counters, so the streaming aggregation state is
d*w rows (2048 here), constant in stream length. This is the canonical
"sketch as streaming state" deployment: the cell relation the batch query
derives is exactly what a long-running job keeps hot for heavy-hitter
alerting, without ever holding the per-key census.

Cell totals from raw events equal cell totals from the census by
associativity (sum over keys of cnt_k grouped by cell == count of raw rows
grouped by cell), which is what the driver-hash against the batch oracle
proves — including sum(user_id) per cell, so membership is pinned, not
just occupancy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH, hash32
from kafka_topic_analyzer_spark.session import prepare_session
from kafka_topic_analyzer_spark.streaming.report_stream import events_stream
from kafka_topic_analyzer_spark.streaming.runner import run_bounded_memory_stream


def streaming_cms_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the d x w Count-Min cell relation as a complete-mode
    streaming aggregation over the bounded events stream; return the final
    cells as a batch frame ordered (row_j, col_j)."""
    prepare_session(spark)
    stream = events_stream(spark, sf_dir)
    rc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("row_j"),
                    F.pmod(hash32(F.col("user_id"), j), F.lit(CMS_WIDTH)).alias(
                        "col_j"
                    ),
                )
                for j in range(CMS_DEPTH)
            ]
        )
    ).alias("rc")
    cells = (
        stream.select(rc, "user_id")
        .select("rc.row_j", "rc.col_j", "user_id")
        .groupBy("row_j", "col_j")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("user_id").cast("long").alias("sum_user_id"),
        )
    )
    name = run_bounded_memory_stream(cells, spark, "complete", "ckpt_cms_")
    return (
        spark.table(name)
        .select("row_j", "col_j", "n_events", "sum_user_id")
        .orderBy("row_j", "col_j")
    )
