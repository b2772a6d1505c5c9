"""Progress reporting (SURVEY.md §2.1 S7, §2.10).

The reference updates a per-message spinner with seq/topic/partition/offset
(ref ``src/kafka.rs:85-86, 111-113, 136``). Per-message callbacks don't
exist in a distributed engine; the Spark-idiomatic equivalents are:

* batch  — ``df.observe(Observation, ...)``: metric expressions evaluated
  piggyback on the job (zero extra pass), readable once the action
  finishes. :func:`observe_scan` attaches message-count/byte throughput
  metrics to any Kafka-shaped frame.
* stream — a ``StreamingQueryListener`` receiving per-micro-batch progress
  (rows/sec, offsets) from the engine. :class:`ScanProgressListener`
  collects them; :func:`attach_progress_listener` wires it to a session.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F
from pyspark.sql.streaming import listener as L

from kafka_topic_analyzer_spark.functions.metrics import message_size
from kafka_topic_analyzer_spark.schema import OFFSET, PARTITION


def observe_scan(kdf: DataFrame, name: str = "scan_progress") -> tuple[DataFrame, Observation]:
    """Attach scan metrics to a frame; read ``obs.get`` after an action.

    Metrics mirror the reference's end-of-run stats (messages seen, bytes
    seen, max offset) at no extra cost — Catalyst evaluates them inside
    the same physical plan.
    """
    obs = Observation(name)
    observed = kdf.observe(
        obs,
        F.count(F.lit(1)).alias("messages"),
        F.coalesce(F.sum(message_size()), F.lit(0)).alias("bytes"),
        F.max(OFFSET).alias("max_offset"),
        F.approx_count_distinct(PARTITION).alias("partitions_seen"),
    )
    return observed, obs


@dataclass
class ScanProgressListener(L.StreamingQueryListener):
    """Collects per-micro-batch progress (the streaming spinner analogue)."""

    progress: list[dict[str, Any]] = field(default_factory=list)

    def onQueryStarted(self, event: Any) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "rows_per_second": p.processedRowsPerSecond,
            }
        )

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        pass


def attach_progress_listener(spark: SparkSession) -> ScanProgressListener:
    """Register a fresh progress listener on the session; returns it so the
    caller can read ``listener.progress`` and detach with
    ``spark.streams.removeListener``."""
    listener = ScanProgressListener()
    spark.streams.addListener(listener)
    return listener
