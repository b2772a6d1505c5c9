"""Relational coverage: scan→filter→project→agg→join→sort over the TPC-H-ish
testdata tables (SURVEY.md §5 strategy — the reference has no tests, so the
harness exercises the engine's general relational surface here).

Float discipline (oracle-parity critical): double summation is
order-dependent, so any SUM the driver hash-compares is computed in DECIMAL
(exact, associative, identical across engines), rounded while still decimal,
and only then cast to double for a scale-stable output column. AVGs divide
the exact decimal sum as double — IEEE division of identical inputs is
deterministic. Never emit a raw decimal column (engines disagree on
scale/precision repr); never round a double sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.registry import register
from kafka_topic_analyzer_spark.sources.tables import load_table


def dec(col: str | Column, precision: int = 18, scale: int = 4) -> Column:
    """Exact-summation guard: cast a double measure to decimal early."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money_sum(expr: Column, ndigits: int = 2) -> Column:
    """sum→round→double, all order-independent (see module docstring)."""
    return F.round(F.sum(expr), ndigits).cast("double")


def dec_avg(expr: Column, ndigits: int = 4) -> Column:
    """Exact decimal sum / count, divided (and rounded) in double."""
    return F.round(F.sum(expr).cast("double") / F.count(F.lit(1)), ndigits)


# SQL-side equivalents (DuckDB): sum(CAST(x AS DECIMAL(18,4))) etc.
DEC = "CAST({} AS DECIMAL(18,4))"


def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: 2-col groupBy, 8 fused aggregates, one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    qty, price, disc, tax = (dec("l_quantity"), dec("l_extendedprice"),
                             dec("l_discount", 6, 4), dec("l_tax", 6, 4))
    disc_price = price * (1 - disc)
    charge = disc_price * (1 + tax)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(qty).alias("sum_qty"),
            money_sum(price).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            dec_avg(qty).alias("avg_qty"),
            dec_avg(price).alias("avg_price"),
            dec_avg(disc).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register(
    "q1_pricing_summary",
    _q1_pricing_summary,
    """
SELECT l_returnflag, l_linestatus,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) / count(*), 4) AS avg_disc,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)


def _q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, agg, top-10 by rounded revenue.

    The customer filter shrinks that side before the join; Catalyst/AQE
    broadcast the filtered dim. Ordering is on the ROUNDED revenue with
    full tiebreak so the LIMIT cutoff is deterministic across engines.
    """
    cutoff = F.lit("1998-06-01").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(dec("l_extendedprice") * (1 - dec("l_discount", 6, 4))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


register(
    "q3_shipping_priority",
    _q3_shipping_priority,
    """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""",
)


def _q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with two broadcast-able tiny dims."""
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(dec("l_extendedprice") * (1 - dec("l_discount", 6, 4))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


register(
    "q5_regional_revenue",
    _q5_regional_revenue,
    """
SELECT n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
""",
)


def _top3_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window row_number (SURVEY.md §2.7 analogue)."""
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rank_in_segment", F.row_number().over(w))
        .where(F.col("rank_in_segment") <= 3)
        .select(
            "c_mktsegment",
            "rank_in_segment",
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


_TOP3_SEGMENT_ORACLE = """
SELECT c_mktsegment, rank_in_segment, c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM (
  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
         CAST(row_number() OVER (PARTITION BY c_mktsegment
              ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER) AS rank_in_segment
  FROM customer
)
WHERE rank_in_segment <= 3
"""

register("top3_customers_per_segment", _top3_customers_per_segment, _TOP3_SEGMENT_ORACLE)


def _top3_customers_per_segment_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-free twin of top3_customers_per_segment: the exact form
    windows over c_mktsegment — FIVE distinct values, so at 100 TB five
    tasks each sort a fifth of the table. The twin prunes to the local
    top-3 per (segment, input task) first — any global top-3 row is in
    its own task's top-3 — then runs the exact window over the
    3-per-task survivor set (operators/ranks.py:topk_per_group). Shares
    the exact form's oracle SQL VERBATIM."""
    from kafka_topic_analyzer_spark.operators.ranks import topk_per_group

    c = load_table(spark, sf_dir, "customer")
    return topk_per_group(
        c,
        ["c_mktsegment"],
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        3,
        rank_col="rank_in_segment",
    ).select(
        "c_mktsegment",
        "rank_in_segment",
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("acctbal"),
    )


register(
    "top3_customers_per_segment_scalable",
    _top3_customers_per_segment_scalable,
    _TOP3_SEGMENT_ORACLE,
)


def _orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (status, priority): multi-level aggregation in one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(dec("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


register(
    "orders_rollup",
    _orders_rollup,
    """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
""",
)


def _customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no order since 2000-01-01."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_nationkey")
    )


register(
    "customers_without_recent_orders",
    _customers_without_recent_orders,
    """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)


def _priority_with_discounted_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): orders having at least one deep-discount line."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_discount") > 0.05)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


register(
    "priority_with_discounted_lines",
    _priority_with_discounted_lines,
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)


def _rich_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers above the global average balance.

    The global average is a 1-row aggregate broadcast-crossJoined onto the
    scan — fully declarative (ONE plan, no driver round-trip), so Catalyst
    sees the whole query and the broadcast is a 16-byte exchange. Exact
    decimal sum / double division, like the oracle.
    """
    c = load_table(spark, sf_dir, "customer")
    global_avg = c.agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("_avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(global_avg))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rich"),
            dec_avg(dec("c_acctbal"), 2).alias("avg_rich_bal"),
        )
        .orderBy("c_mktsegment")
    )


register(
    "rich_customers_per_segment",
    _rich_customers_per_segment,
    """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rich,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*), 2) AS avg_rich_bal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*) FROM customer)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)


def _large_parts_in_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: INTERSECT of projected key sets."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") > 25).select(
        F.col("p_partkey").alias("partkey")
    )
    lp = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("partkey"))
    return p.intersect(lp).agg(F.count(F.lit(1)).alias("n_parts"))


register(
    "large_parts_in_lineitem",
    _large_parts_in_lineitem,
    """
SELECT CAST(count(*) AS BIGINT) AS n_parts FROM (
  SELECT p_partkey AS partkey FROM part WHERE p_size > 25
  INTERSECT
  SELECT l_partkey AS partkey FROM lineitem
)
""",
)


def _order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation (engine-portable SELECT list)."""
    o = load_table(spark, sf_dir, "orders")

    def n_status(s: str):
        return F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0)).cast("long")

    return (
        o.groupBy("o_orderpriority")
        .agg(
            n_status("O").alias("n_open"),
            n_status("F").alias("n_fulfilled"),
            n_status("P").alias("n_partial"),
        )
        .orderBy("o_orderpriority")
    )


register(
    "order_status_pivot",
    _order_status_pivot,
    """
SELECT o_orderpriority,
  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)


def _supplier_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: per-supplier cumulative monthly revenue."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    monthly = (
        li.groupBy(
            "l_suppkey", F.date_trunc("month", "l_shipdate").alias("month")
        ).agg(
            # keep rev decimal so the window accumulation below stays exact
            F.round(F.sum(dec("l_extendedprice") * (1 - dec("l_discount", 6, 4))), 2).alias("rev_dec")
        )
    )
    w = W.partitionBy("l_suppkey").orderBy("month").rowsBetween(W.unboundedPreceding, 0)
    return (
        monthly.withColumn("cum_rev", F.round(F.sum("rev_dec").over(w), 2).cast("double"))
        .where(F.col("l_suppkey") <= 20)  # keep result small & stable
        .select(
            "l_suppkey",
            F.date_format("month", "yyyy-MM").alias("month"),
            F.col("rev_dec").cast("double").alias("rev"),
            "cum_rev",
        )
    )


register(
    "supplier_running_revenue",
    _supplier_running_revenue,
    """
WITH monthly AS (
  SELECT l_suppkey, date_trunc('month', l_shipdate) AS month,
         round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS rev_dec
  FROM lineitem
  GROUP BY l_suppkey, date_trunc('month', l_shipdate)
)
SELECT l_suppkey, strftime(month, '%Y-%m') AS month,
       CAST(rev_dec AS DOUBLE) AS rev,
       CAST(round(sum(rev_dec) OVER (PARTITION BY l_suppkey ORDER BY month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS cum_rev
FROM monthly
WHERE l_suppkey <= 20
""",
)


def _customer_retention_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY.md §2.7): INTERSECT / EXCEPT / UNION ALL.

    Customers with 1996 orders vs 1997 orders: repeat (intersect),
    lapsed (except, 96→97), acquired (except, 97→96), unioned into one
    labeled count table.
    """
    o = load_table(spark, sf_dir, "orders")

    def buyers(year: int) -> DataFrame:
        return o.where(F.year("o_orderdate") == year).select("o_custkey").distinct()

    b96, b97 = buyers(1996), buyers(1997)
    repeat = b96.intersect(b97).agg(
        F.lit("repeat").alias("cohort"), F.count(F.lit(1)).alias("n_customers")
    )
    lapsed = b96.exceptAll(b97).agg(
        F.lit("lapsed").alias("cohort"), F.count(F.lit(1)).alias("n_customers")
    )
    acquired = b97.exceptAll(b96).agg(
        F.lit("acquired").alias("cohort"), F.count(F.lit(1)).alias("n_customers")
    )
    return repeat.unionByName(lapsed).unionByName(acquired).orderBy("cohort")


register(
    "customer_retention_sets",
    _customer_retention_sets,
    """
WITH b96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
b97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
SELECT 'repeat' AS cohort, CAST(count(*) AS BIGINT) AS n_customers
  FROM (SELECT * FROM b96 INTERSECT SELECT * FROM b97)
UNION ALL
SELECT 'lapsed', CAST(count(*) AS BIGINT)
  FROM (SELECT * FROM b96 EXCEPT SELECT * FROM b97)
UNION ALL
SELECT 'acquired', CAST(count(*) AS BIGINT)
  FROM (SELECT * FROM b97 EXCEPT SELECT * FROM b96)
ORDER BY cohort
""",
)


def _orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (status, priority): all four grouping sets — the per-dimension
    subtotals ROLLUP can't express — still one shuffle (grouping sets
    expand map-side). Fixture columns are never NULL, so output NULLs
    unambiguously mark subtotal rows and grouping_id() is also emitted
    for the NULL-data general case."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(dec("o_totalprice")).alias("total_price"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


# Spark grouping_id() and DuckDB GROUPING() both put the FIRST listed
# column in the most significant bit — verified part of this oracle.
register(
    "orders_cube",
    _orders_cube,
    """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
""",
)


def _balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(10) over account balance: per-decile customer counts and
    balance bounds. Tie-broken by c_custkey so the bucket assignment is
    total-order deterministic on both engines."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return (
        c.select("c_custkey", "c_acctbal", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("decile")
    )


_BALANCE_DECILES_ORACLE = """
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM (
  SELECT c_custkey, c_acctbal,
         CAST(ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS INTEGER) AS decile
  FROM customer
)
GROUP BY decile ORDER BY decile
"""

register("balance_deciles", _balance_deciles, _BALANCE_DECILES_ORACLE)


def _balance_deciles_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-free twin of balance_deciles: a global ``NTILE(10) OVER
    (ORDER BY ...)`` sorts the ENTIRE table in one task — the worst
    window shape there is at 100 TB. This twin gets the identical
    bucket assignment from an exact distributed global rank
    (operators/ranks.py:global_ranks_scalable — range-repartitioned
    local row_numbers plus broadcast per-range base offsets) and SQL
    ntile's exact quota arithmetic: with q = total div 10 and
    r = total % 10, the first r buckets take q+1 rows, the rest q —
    all-integer, so the bucket is bit-identical on both engines.
    Shares balance_deciles' oracle SQL VERBATIM: the driver hash proves
    rank arithmetic == ntile."""
    from kafka_topic_analyzer_spark.operators.ranks import global_ranks_scalable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = global_ranks_scalable(
        c, [F.col("c_acctbal").asc(), F.col("c_custkey").asc()]
    )
    decile = F.expr(
        "CAST(CASE WHEN rank <= (total % 10) * (total div 10 + 1)"
        " THEN (rank - 1) div (total div 10 + 1) + 1"
        " ELSE (total % 10)"
        "      + (rank - (total % 10) * (total div 10 + 1) - 1)"
        "        div greatest(total div 10, 1) + 1"
        " END AS INT)"
    )
    return (
        ranked.select("c_custkey", "c_acctbal", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("decile")
    )


register("balance_deciles_scalable", _balance_deciles_scalable, _BALANCE_DECILES_ORACLE)


def _monthly_order_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month order volume with LAG: the remaining window class
    (offset functions) not covered by rank/running-sum/ntile queries.
    One shuffle for the monthly rollup; the lag window then runs on the
    tiny aggregated frame."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.select(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.orderBy("month")
    prev = F.lag("n_orders").over(w)
    growth = F.when(
        prev.isNotNull() & (prev > 0),
        F.round((F.col("n_orders") - prev).cast("double") / prev, 6),
    )
    return (
        monthly.select(
            F.date_format("month", "yyyy-MM").alias("month"),
            "n_orders",
            prev.alias("prev_orders"),
            growth.alias("growth_rate"),
        )
        .orderBy("month")
    )


register(
    "monthly_order_growth",
    _monthly_order_growth,
    """
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT month, n_orders,
       lag(n_orders) OVER (ORDER BY month) AS prev_orders,
       CASE WHEN lag(n_orders) OVER (ORDER BY month) > 0
            THEN round(CAST(n_orders - lag(n_orders) OVER (ORDER BY month) AS DOUBLE)
                       / lag(n_orders) OVER (ORDER BY month), 6)
       END AS growth_rate
FROM m ORDER BY month
""",
)


def _q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — deliberately written through the SQL API
    (temp view + spark.sql) to pin that the engine's SQL entry point
    plans identically to the DataFrame path: same scan pushdown, same
    single partial-agged aggregate."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS forecast_revenue
        FROM lineitem_v
        WHERE l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


register(
    "q6_forecast_revenue",
    _q6_forecast_revenue,
    """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
       AS forecast_revenue
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)


def _q12_returnflag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (join + CASE-conditional counts); the slim fixture
    lineitem has no l_shipmode, so the grouping key is l_returnflag —
    same plan shape: fact-fact equi-join, conditional aggregation."""
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("A", "R")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


register(
    "q12_returnflag_priority",
    _q12_returnflag_priority,
    """
SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('A','R')
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)


def _q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional decimal sums,
    part dim broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - dec("l_discount", 6, 4))
    promo = F.col("p_type").startswith("PROMO")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return j.agg(
        F.round(
            (F.sum(F.when(promo, rev).otherwise(F.lit(0).cast("decimal(18,4)"))) * 100)
            .cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )


register(
    "q14_promo_share",
    _q14_promo_share,
    """
SELECT round(
  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                THEN CAST(l_extendedprice AS DECIMAL(18,4))
                     * (1 - CAST(l_discount AS DECIMAL(6,4)))
                ELSE CAST(0 AS DECIMAL(18,4)) END) * 100 AS DOUBLE)
  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE), 4)
  AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
""",
)


# ---------------------------------------------------------------------------
# Correlated-subquery shapes (TPC-H q4/q13/q22 adapted to the fixture schema)
# — the decorrelation rewrites SURVEY.md §4 credits to Catalyst: EXISTS
# becomes a LeftSemi join, NOT EXISTS a LeftAnti, and the scalar subquery a
# 1-row broadcast, never a per-row re-execution.


def _q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 shape: orders counted per priority WHERE EXISTS a lineitem that
    shipped after the order date (the fixture lacks commit/receipt dates —
    ship-after-order is the same correlated-EXISTS plan)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


register(
    "q4_late_ship_priority",
    _q4_late_ship_priority,
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)


def _q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13 shape: LEFT OUTER join customers to their orders, count per
    customer (zero-order customers KEPT), then the histogram of counts —
    two aggregations over one outer join, the classic distribution query."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("c_count"))
    )


register(
    "q13_order_count_distribution",
    _q13_order_count_distribution,
    """
WITH per_cust AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust
GROUP BY c_count
ORDER BY n_customers DESC, c_count DESC
""",
)


def _q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape: customers above the positive-balance average (scalar
    subquery → 1-row broadcast) with NO orders (NOT EXISTS → LeftAnti),
    grouped by market segment. Decimal-exact sums keep acctbal math
    hash-stable."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(dec("c_acctbal", 18, 2)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal").cast("double") > F.col("avg_bal")
    )
    idle = rich.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(dec("c_acctbal", 18, 2)), 2)
            .cast("double")
            .alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


register(
    "q22_idle_rich_customers",
    _q22_idle_rich_customers,
    """
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_balance
FROM customer, avg_bal
WHERE CAST(c_acctbal AS DOUBLE) > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)


# ---------------------------------------------------------------------------
# Round-5 additions: the remaining architecturally-distinct TPC-H shapes
# expressible over this testdata (no partsupp / commit-receipt dates here,
# so q2/q20 are out of reach; q17/q18/q19 run natively and q21's
# double-EXISTS shape is adapted to the returnflag column).


def _q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part correlated scalar average, decorrelated to
    an aggregate join — the pattern where a naive engine re-runs the
    subquery per probe row and Spark runs ONE partial-aggregated pass.
    Revenue that would be lost by refusing small (<20% of the part's mean
    quantity) orders of the target parts, divided by 7 years.

    Scale shape: the part filter broadcasts; the per-part mean is a
    map-side-combined groupBy on l_partkey (shuffle O(parts), not
    O(lines)); the final agg is a 1-row fold.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#1") & (F.col("p_size") < 10))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    avg_q = li.groupBy("l_partkey").agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), "l_partkey")
        .join(avg_q, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(dec("l_extendedprice")).cast("double") / 7.0, 2).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


register(
    "q17_small_quantity_revenue",
    _q17_small_quantity_revenue,
    """
WITH target AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1' AND p_size < 10),
avg_q AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small_lines
FROM lineitem
JOIN target ON l_partkey = p_partkey
JOIN avg_q USING (l_partkey)
WHERE l_quantity < 0.2 * avg_qty
""",
)


Q18_QTY_THRESHOLD = 300


def _q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery — Catalyst turns
    the IN into a semi join against the aggregated order list, so the big
    lineitem table aggregates once instead of once per order probe.
    Emits the customers behind orders totalling > threshold units.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    big = (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum(dec("l_quantity")).alias("qsum"))
        .where(F.col("qsum") > Q18_QTY_THRESHOLD)
        .select("o_orderkey", F.col("qsum").cast("double").alias("total_qty"))
    )
    return (
        o.join(big, "o_orderkey")
        .join(F.broadcast(c), "o_custkey")
        .select(
            "c_name",
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("orderkey"))
        .limit(100)
    )


register(
    "q18_large_volume_orders",
    _q18_large_volume_orders,
    f"""
WITH big AS (
  SELECT l_orderkey AS o_orderkey,
         sum(CAST(l_quantity AS DECIMAL(18,4))) AS qsum
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > {Q18_QTY_THRESHOLD}
)
SELECT c_name, o_custkey AS custkey, o_orderkey AS orderkey,
       o_totalprice AS totalprice, CAST(qsum AS DOUBLE) AS total_qty
FROM orders
JOIN big USING (o_orderkey)
JOIN customer ON c_custkey = o_custkey
ORDER BY total_qty DESC, orderkey ASC
LIMIT 100
""",
)


def _q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of brand/size/quantity conjunct groups across
    a join — the disjunctive-predicate case where Catalyst extracts the
    common l_partkey equi-condition so the join stays a hash join and each
    side's local conjuncts still push to its scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(
        F.broadcast(p), li.l_partkey == p.p_partkey
    )
    qty, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#1") & sz.between(1, 5) & qty.between(1, 11))
        | ((br == "Brand#2") & sz.between(1, 10) & qty.between(10, 20))
        | ((br == "Brand#3") & sz.between(1, 15) & qty.between(20, 30))
    )
    price, disc = dec("l_extendedprice"), dec("l_discount", 6, 4)
    return j.where(cond).agg(
        money_sum(price * (1 - disc)).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


register(
    "q19_disjunctive_revenue",
    _q19_disjunctive_revenue,
    """
SELECT round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
              * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2)::DOUBLE AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
)


def _q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted to this schema (no commit/receipt dates —
    ``l_returnflag = 'R'`` plays the "failed the order" role): suppliers
    with a returned line in a multi-supplier order where NO other supplier
    had a returned line — i.e. the sole visible culprit. The signature
    double-correlation: EXISTS (another supplier in the order) AND NOT
    EXISTS (another supplier with a returned line), which Catalyst
    decorrelates to a LeftSemi + LeftAnti pair of self-joins with
    non-equi conjuncts — no per-row subquery re-execution.

    Scale shape: both probe sides are the deduplicated (order, supplier)
    pairs — shuffle O(distinct pairs); the per-supplier count is
    map-side combinable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    returned = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = pairs.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    other_ret = returned.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    culprit = (
        returned.join(
            other,
            (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            other_ret,
            (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        culprit.join(F.broadcast(s), "l_suppkey")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


register(
    "q21_waiting_suppliers",
    _q21_waiting_suppliers,
    """
WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
ret AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM ret r
JOIN supplier ON s_suppkey = r.l_suppkey
WHERE EXISTS (SELECT 1 FROM pairs p
              WHERE p.l_orderkey = r.l_orderkey AND p.l_suppkey <> r.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM ret r2
                  WHERE r2.l_orderkey = r.l_orderkey AND r2.l_suppkey <> r.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
""",
)
