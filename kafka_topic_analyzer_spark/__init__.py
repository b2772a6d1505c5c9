"""kafka_topic_analyzer_spark — a PySpark-native analytics engine.

A brand-new engine with the query / data-processing capabilities of the
reference CLI ``xenji/kafka-topic-analyzer`` (a single-pass Rust Kafka topic
metrics scanner — see SURVEY.md), re-expressed Spark-first:

* the canonical input is a Kafka-shaped DataFrame
  (``partition int, offset long, timestamp, key binary?, value binary?``),
  produced by a real Kafka source, a Parquet fixture, or a deterministic
  derivation from any event table;
* every metric the reference computes in its hand-fused streaming pass
  (reference ``src/metric.rs:206-253``) is a built-in Spark SQL aggregate —
  one shuffle for the whole per-partition + global report;
* the log-compaction "alive keys" scan (reference ``src/metric.rs:262-305``)
  is an exact ``max_by`` per-key aggregation with a documented deterministic
  ``(partition, offset)`` ordering;
* beyond the reference surface: dedup, similarity search, text analysis and
  windowed event analytics designed for 100 TB scale (no driver-side data
  paths, broadcast-able dims, partial-aggregable shuffles).
"""

__version__ = "0.1.0"
