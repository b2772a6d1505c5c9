"""Event-time window operators over the ``events`` table.

Batch formulations that mirror Structured Streaming semantics (the
streaming module reuses the same aggregates with ``window()`` /
``session_window()``): tumbling and sliding windows via epoch-second
arithmetic (engine-portable, no timestamp-type pitfalls), sessionization
via the lag/cumsum gap pattern.

``ts`` arrives as epoch-nanoseconds LongType (see sources/tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

NS_PER_SEC = 1_000_000_000


def ts_sec(col: str = "ts") -> F.Column:
    return F.floor(F.col(col) / F.lit(NS_PER_SEC)).cast("long")


def tumbling(df: DataFrame, width_sec: int = 3600) -> DataFrame:
    """Assign each event its tumbling-window start (epoch seconds)."""
    s = ts_sec()
    return df.withColumn("window_start", (s - s % width_sec).cast("long"))


def sliding(df: DataFrame, width_sec: int = 3600, slide_sec: int = 1800) -> DataFrame:
    """Explode each event into every sliding window containing it.

    With width = n*slide each event lands in exactly n windows:
    starts = aligned_start - i*slide for i in 0..n-1.
    """
    n = width_sec // slide_sec
    s = ts_sec()
    aligned = s - s % slide_sec
    starts = F.array(*[(aligned - i * slide_sec).cast("long") for i in range(n)])
    return df.withColumn("window_start", F.explode(starts))


def sessionize(df: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Gap-based sessions per user: lag + cumulative session counter.

    The two windows shuffle once on user_id (same partitioning reused for
    both window specs — Catalyst plans a single Exchange).
    """
    s = ts_sec()
    w = W.partitionBy("user_id").orderBy("ts")
    gap = s - F.lag(s).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )


def session_stats(df: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Per-user session summary (count, sizes, durations)."""
    sess = sessionize(df, gap_sec)
    s = ts_sec()
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(s) - F.min(s)).alias("duration_sec"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.sum("duration_sec").alias("total_duration_sec"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )
