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
# With more registered queries than that (109 as of round 4), iteration order
# decides which get a driver correctness row each round — so we rotate:
# queries that have never received a row (rounds 1-2 stopped at the same
# first 50) go first, then the
# kafka-core family (broken by the round-2 testdata ts-type change; the fix
# needs a green row), then queries whose implementation changed this round.
# Everything not listed follows in registration order and gets its turn in a
# later round's rotation.
CHECK_PRIORITY: tuple[str, ...] = (
    # -- round 4 rotation (tools/rotate_priority.py): never-verified first --
    "bigram_familiarity",
    "embedding_coverage_check",
    "semantic_dup_clusters",
    "incremental_dedup_status",
    "substring_dup_spans",
    "near_dup_source_matrix",
    "dataset_split_summary",
    "quality_weighted_sample",
    "event_value_quantiles_approx",
    # -- registered this round, never checked: exact-twin audits --
    "kafka_alive_keys_hll_audit",
    "compression_roundtrip_audit",
    "event_value_quantiles_audit",
    # -- registered this round, never checked: round-4 operator additions --
    "bm25_doc_ranking",
    "zorder_layout_audit",
    "salted_user_enrichment",
    "enriched_segment_stats_streaming",
    "tfidf_cosine_pairs",
    "dup_graph_triangles",
    "event_lateness_profile",
    "q4_late_ship_priority",
    "q13_order_count_distribution",
    "q22_idle_rich_customers",
    "kafka_report_rendered",
    "kafka_summary_rendered",
    "documents_quality_checks",
    "embeddings_quality_checks",
    # -- implementation changed this round (real Y4M decode replaced the
    #    deterministic fake); its only green row verified the fake --
    "video_frame_inventory",
    # -- iterative-graph implementation changed this round; last green r2 --
    "dup_graph_pagerank",
    # -- stalest rows (last green r2 or earlier) --
    "kafka_alive_keys_approx",
    "report_metrics_unpivot",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "top3_customers_per_segment",
    "orders_rollup",
    "customers_without_recent_orders",
    "priority_with_discounted_lines",
    "large_parts_in_lineitem",
    "order_status_pivot",
    "supplier_running_revenue",
    "customer_retention_sets",
    "orders_cube",
    "balance_deciles",
    "monthly_order_growth",
    "q6_forecast_revenue",
    "q12_returnflag_priority",
    "q14_promo_share",
    "doc_token_stats",
    "source_quality_summary",
    "lang_id_confusion",
    "text_cleaning",
    "pii_redaction",
    "doc_repetition_stats",
    "doc_fingerprints",
    "sentence_stats",
    "compression_quality",
    "exact_dup_summary",
    "near_dup_pairs_jaccard",
    "dup_cluster_assignment",
    "minhash_signatures",
    "knn_bruteforce_cosine",
    "knn_ivf_cosine",
    "embedding_pair_stats",
    "embedding_quantization",
    "simhash_fingerprints",
    "consensus_near_dups",
    "fuzzy_match_pairs",
    "hourly_event_counts",
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
