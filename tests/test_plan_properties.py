"""Plan-regression guards: the optimizer behaviors the engine relies on.

Each assertion pins a property that silently regressing would turn into
a 100 TB incident: filters reaching the parquet scan, small dims
broadcast, aggregates partially aggregated before the exchange.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filters_push_to_scan(spark):
    import __spark_entry__ as E

    plan = _executed(E.queries()["q3_shipping_priority"](spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull" in plan, "scan lost filter pushdown"


def test_small_dims_broadcast(spark):
    import __spark_entry__ as E

    plan = _executed(E.queries()["q5_regional_revenue"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 4, "dim joins should broadcast"
    assert "SortMergeJoin" not in plan, "no dim join should shuffle-sort"


def test_report_is_single_pass(spark):
    from kafka_topic_analyzer_spark.operators.report import full_report
    from kafka_topic_analyzer_spark.sources.events_log import kafka_frame_from_events

    plan = _executed(full_report(kafka_frame_from_events(spark, SF_SMOKE)))
    # partial + final aggregate pair, one data shuffle (plus the 9-row sort)
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") <= 2


def test_sampling_filter_is_scan_side(spark):
    """The stratified-sample audit must partial-aggregate next to the scan:
    one exchange for the 4 language groups, no shuffle of raw rows."""
    import __spark_entry__ as E

    plan = _executed(E.queries()["stratified_sample_summary"](spark, SF_SMOKE))
    assert plan.count("HashAggregate") == 2, "sampling audit lost partial agg"
    # exchanges: documented scan-spread repartition (tables.py) + the
    # 4-group hash agg + the final orderBy — and nothing else
    assert plan.count("Exchange") <= 3
    assert "partial_count" in plan and plan.index("partial_count") > plan.index(
        "hashpartitioning"
    ), "partial aggregation must run before the shuffle"


def test_event_filter_pushdown_in_stream_join_batch_twin(spark):
    """Interval-join inputs must push the event_type filter into the scan —
    at 100 TB the join should never see non-click/purchase rows."""
    from pyspark.sql import functions as F
    from kafka_topic_analyzer_spark.sources.tables import load_table

    e = load_table(spark, SF_SMOKE, "events", parallel=False).where(
        F.col("event_type") == "purchase"
    )
    plan = _executed(e)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)" in plan


def test_column_pruning_reaches_scan(spark):
    from pyspark.sql import functions as F
    from kafka_topic_analyzer_spark.sources.tables import load_table

    df = load_table(spark, SF_SMOKE, "lineitem").select(
        F.sum("l_quantity").alias("q")
    )
    plan = _executed(df)
    scan = plan[plan.index("ReadSchema") :].split("\n")[0]
    assert "l_quantity" in scan and "l_extendedprice" not in scan, (
        "2-column projection must not read the full table: " + scan
    )
