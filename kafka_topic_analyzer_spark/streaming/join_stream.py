"""Watermarked stream-stream interval join (purchase <- preceding clicks).

The reference never joins (SURVEY.md §2.5); this is the streaming-native
extension a live attribution pipeline needs: two event streams joined on
user within a bounded event-time interval, with watermarks on BOTH sides so
the join state is provably prunable (Spark drops buffered rows once the
other side's watermark passes the interval bound — without the time-range
condition the state would grow forever at 100 TB/day).

On bounded AvailableNow input every row is on-time, so the emitted result
equals the batch interval join and the query is oracle-checkable — same
determinism argument as windowed_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.session import prepare_session
from kafka_topic_analyzer_spark.streaming.report_stream import events_stream
from kafka_topic_analyzer_spark.streaming.runner import run_bounded_memory_stream


def streaming_purchase_click_join(
    spark: SparkSession, sf_dir: str, lookback_sec: int = 3600
) -> DataFrame:
    """Each purchase joined to the same user's clicks in the preceding
    ``lookback_sec`` (inclusive both ends), second-truncated event time."""
    prepare_session(spark)

    def typed(event_type: str, prefix: str) -> DataFrame:
        return (
            events_stream(spark, sf_dir)
            .where(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.timestamp_seconds(
                    F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("long")
                ).alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", f"{lookback_sec} seconds")
        )

    purchases = typed("purchase", "purchase")
    clicks = typed("click", "click")
    joined = purchases.join(
        clicks,
        (F.col("purchase_user") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback_sec} SECONDS"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
    ).select(
        F.col("purchase_id"),
        F.col("click_id"),
        F.col("purchase_user").alias("user_id"),
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).alias("gap_sec"),
    )

    # 4 state partitions, not the runner's 8 (r16): a stream-stream join
    # keeps FOUR state stores per partition (keyToNumValues /
    # keyWithIndexToValue per side), so store bring-up dominates this
    # bounded twin harder than the aggregation twins — interleaved A/B
    # 2.36s -> 2.19s min, faster in 4/4 reps, while the aggregation twins
    # measured a wash-to-worse at 4 (see runner.py). Unbounded
    # deployments keep the cores-sized default.
    name = run_bounded_memory_stream(
        joined, spark, "append", "ckpt_ssjoin_", state_partitions=4
    )
    return spark.table(name).orderBy("purchase_id", "click_id")
