"""Query registry — every implemented operator as (Spark callable, oracle SQL).

Each entry pairs a PySpark DataFrame query with the ANSI-SQL statement DuckDB
runs over the same parquet tables; the driver hash-compares the two at
sf=0.01 (see __spark_entry__.py). Column names/aliases MUST match between
the two sides. Kafka-core queries run over the deterministic log derived
from ``events`` (sources/events_log.py) so the oracle can reproduce them
from the pre-registered views alone.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One registered query: Spark side + optional DuckDB oracle SQL."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, spark_fn: Callable[[SparkSession, str], DataFrame], oracle: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    _REGISTRY[name] = QuerySpec(spark_fn, oracle)


# The verify driver checks queries in iteration order and stops after ~50.
# With more registered queries than that (97 as of round 3), iteration order
# decides which get a driver correctness row each round — so we rotate:
# queries that have never received a row (rounds 1-2 stopped at the same
# first 50) go first, then the
# kafka-core family (broken by the round-2 testdata ts-type change; the fix
# needs a green row), then queries whose implementation changed this round.
# Everything not listed follows in registration order and gets its turn in a
# later round's rotation.
CHECK_PRIORITY: tuple[str, ...] = (
    # -- never verified by the driver (rounds 1-2) --
    "hourly_event_counts",
    "sliding_window_counts",
    "user_session_stats",
    "props_key_distribution",
    "purchase_attribution_asof",
    "value_percentiles",
    "peak_window_event_counts",
    "hourly_spike_detection",
    "event_funnel",
    "weekly_retention_cohorts",
    "user_state_history",
    "events_quality_checks",
    "kafka_report_partition_streaming",
    "kafka_compacted_state_streaming",
    "windowed_counts_streaming",
    "purchase_click_join_streaming",
    "exact_dedup_streaming",
    "dedup_within_watermark_streaming",
    "session_windows_streaming",
    "image_feature_stats",
    "audio_chunk_stats",
    "video_frame_inventory",
    "image_resize_inventory",
    "stratified_sample_summary",
    "per_group_sample",
    "event_value_histogram",
    "quality_percentile_gate",
    "sequence_packing",
    "training_shard_manifest",
    "doc_chunking",
    "source_char_dispersion",
    "per_lang_length_norm",
    "source_mixing_weights",
    "corpus_summary",
    "mixed_sample_audit",
    "top_terms_per_source",
    # new this round (hash-backed); event_value_quantiles_approx (rows-only
    # check, weaker signal) and semantic_dup_clusters (expensive oracle)
    # rotate into a later round's window instead
    "embedding_label_stats",
    "term_postings",
    "keyword_search",
    "benchmark_contamination",
    # -- kafka core: re-verify the events.ts normalization fix --
    "kafka_report_partition",
    "kafka_report_global",
    "kafka_alive_keys",
    "kafka_compacted_state",
    # -- implementation changed this round: re-verify --
    "embedding_near_dup_pairs",
    "embedding_near_dups_lsh",
    "simhash_near_dups",
    "minhash_near_dups",
    "knn_lsh_cosine",
    "rich_customers_per_segment",
)


def all_queries() -> dict[str, QuerySpec]:
    # Import triggers registration of every operator module exactly once.
    import kafka_topic_analyzer_spark.queries  # noqa: F401

    ordered: dict[str, QuerySpec] = {}
    for name in CHECK_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
