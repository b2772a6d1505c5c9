"""Bucketed co-located join: the 100 TB shuffle-elimination strategy.

Big fact-fact joins at scale shuffle both sides on the key every query;
pre-bucketing both tables by the join key moves that cost to write time
— every subsequent join is exchange-free. This test proves the engine's
layout produces a shuffle-free plan (no Exchange over either scan).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from kafka_topic_analyzer_spark.sources.tables import load_table

    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # external tables at a tmp path (warehouse.dir is static on a live session)
    load_table(spark, SF_SMOKE, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).option("path", str(wh / "b_orders")).mode("overwrite").saveAsTable("b_orders")
    load_table(spark, SF_SMOKE, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).option("path", str(wh / "b_lineitem")).mode("overwrite").saveAsTable("b_lineitem")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the JOIN itself must not shuffle either side; the only exchange
        # allowed is the small post-join groupBy
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, "bucketed join should not shuffle scans"
        # and it must still be correct
        rows = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
        assert sum(rows.values()) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
