"""Event-analytics queries: windows, sessionization, JSON extraction.

DuckDB mirrors use ``floor(epoch(ts))`` == Spark's ``floor(ns/1e9)`` (DuckDB
truncates parquet nanos to micros; both land on whole epoch seconds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.operators import windows as WOP
from kafka_topic_analyzer_spark.queries.relational import dec
from kafka_topic_analyzer_spark.registry import register
from kafka_topic_analyzer_spark.sources.tables import load_table

_TS = "CAST(floor(epoch(ts)) AS BIGINT)"


def _hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = WOP.tumbling(
        load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull()), 3600
    )
    return (
        e.groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


register(
    "hourly_event_counts",
    _hourly_event_counts,
    f"""
SELECT {_TS} - {_TS} % 3600 AS window_start, event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
""",
)


def _sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = WOP.sliding(load_table(spark, sf_dir, "events"), 3600, 1800)
    return (
        e.groupBy("window_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("total_value"),
        )
        .orderBy("window_start")
    )


register(
    "sliding_window_counts",
    _sliding_window_counts,
    f"""
WITH exploded AS (
  SELECT unnest([
           {_TS} - {_TS} % 1800,
           {_TS} - {_TS} % 1800 - 1800
         ]) AS window_start,
         value
  FROM events
)
SELECT CAST(window_start AS BIGINT) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM exploded
GROUP BY 1
ORDER BY 1
""",
)


def _user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows without event time cannot be sessionized; excluding them
    # explicitly also sidesteps engine-default NULL ordering in the
    # session windows (Spark NULLS FIRST vs DuckDB NULLS LAST)
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    return WOP.session_stats(e, 1800)


register(
    "user_session_stats",
    _user_session_stats,
    f"""
WITH numbered AS (
  SELECT user_id, ts, {_TS} AS tsec,
         CASE WHEN {_TS} - lag({_TS}) OVER (PARTITION BY user_id ORDER BY ts) > 1800
                   OR lag({_TS}) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE ts IS NOT NULL
),
sessioned AS (
  SELECT user_id, tsec,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM numbered
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         max(tsec) - min(tsec) AS duration_sec
  FROM sessioned GROUP BY user_id, session_id
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(sum(n_events) AS BIGINT) AS n_events,
  CAST(sum(duration_sec) AS BIGINT) AS total_duration_sec,
  CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per_session
GROUP BY user_id
ORDER BY user_id
""",
)


def _props_key_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (from_json-style): distribution of props.k.

    Malformed-JSON semantics pinned by the adversarial events fuzz:
    Spark's get_json_object returns NULL for unparseable props where
    DuckDB's ``->>`` ERRORS, so the oracle guards with json_valid() —
    the engine-behavior difference a real pipeline hits on dirty
    event streams."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("k_bucket")
    )


register(
    "props_key_distribution",
    _props_key_distribution,
    """
WITH extracted AS (
  SELECT CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END AS INTEGER) AS k
  FROM events
)
SELECT CAST(k % 10 AS INTEGER) AS k_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(k) AS INTEGER) AS min_k,
       CAST(max(k) AS INTEGER) AS max_k
FROM extracted
GROUP BY 1
ORDER BY 1
""",
)


def _purchase_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's most recent
    click at-or-before it (operators/asof.py). Right side deduped to one
    click per (user, second) so both engines' as-of pick is unambiguous.

    NULL contract (pinned by the registry fuzz): NULL user/timestamp
    never matches — standard SQL predicate semantics. DuckDB's native
    ASOF instead compares timestamps in SORT order (NULL highest), which
    would attribute a NULL-ts click to a NULL-ts purchase; the oracle
    filters candidates and CASE-nulls NULL-ts/user purchases to pin the
    engine's contract, not the quirk."""
    from kafka_topic_analyzer_spark.operators.asof import asof_join_backward

    e = load_table(spark, sf_dir, "events")
    tsec = F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("long")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", tsec.alias("tsec")
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .select("user_id", tsec.alias("tsec"), "event_id")
        .groupBy("user_id", "tsec")
        .agg(F.max("event_id").alias("click_id"))
    )
    joined = asof_join_backward(
        purchases, clicks, key="user_id", ts="tsec",
        right_payload=["click_id"], tiebreak="purchase_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.col("tsec").alias("purchase_tsec"),
        F.col("_asof.click_id").alias("click_id"),
    ).orderBy("purchase_id")


register(
    "purchase_attribution_asof",
    _purchase_attribution_asof,
    f"""
WITH p2 AS (
  SELECT event_id AS purchase_id, user_id, {_TS} AS tsec
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, {_TS} AS tsec, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' AND user_id IS NOT NULL AND {_TS} IS NOT NULL
  GROUP BY 1, 2
)
SELECT p2.purchase_id, p2.user_id, p2.tsec AS purchase_tsec,
       CASE WHEN p2.user_id IS NULL OR p2.tsec IS NULL THEN NULL
            ELSE c.click_id END AS click_id
FROM p2 ASOF LEFT JOIN c
  ON p2.user_id = c.user_id AND c.tsec <= p2.tsec
ORDER BY purchase_id
""",
)


def _value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (order statistics are
    order-independent, so the parallel sort-based aggregate is safe for
    oracle parity — unlike running float sums)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99_value"),
        )
        .orderBy("event_type")
    )


register(
    "value_percentiles",
    _value_percentiles,
    """
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  round(quantile_cont(value, 0.5), 6) AS median_value,
  round(quantile_cont(value, 0.9), 6) AS p90_value,
  round(quantile_cont(value, 0.99), 6) AS p99_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)


def _peak_window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/asof.py range_join_binned): events falling in
    derived 20-minute 'peak windows' ([h+300, h+1500) for every active
    hour h), counted per window."""
    from kafka_topic_analyzer_spark.operators.asof import range_join_binned

    e = load_table(spark, sf_dir, "events")
    tsec = F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("long")
    points = e.select(tsec.alias("tsec"), "user_id")
    intervals = (
        points.select((F.col("tsec") - F.col("tsec") % 3600).alias("h"))
        .distinct()
        .select(
            (F.col("h") + 300).alias("w_start"), (F.col("h") + 1500).alias("w_end")
        )
    )
    joined = range_join_binned(
        points, intervals, point_col="tsec", start_col="w_start",
        end_col="w_end", bin_size=600,
    )
    return (
        joined.groupBy("w_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("w_start")
    )


register(
    "peak_window_event_counts",
    _peak_window_event_counts,
    f"""
WITH pts AS (SELECT {_TS} AS tsec, user_id FROM events),
iv AS (
  SELECT DISTINCT tsec - tsec % 3600 + 300 AS w_start,
                  tsec - tsec % 3600 + 1500 AS w_end
  FROM pts
)
SELECT w_start,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM pts JOIN iv ON pts.tsec >= iv.w_start AND pts.tsec < iv.w_end
GROUP BY w_start
ORDER BY w_start
""",
)


SPIKE_TRAILING_HOURS = 24


def _hourly_spike_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly flags: an hour spikes when its count exceeds
    2x the trailing-24h hourly average. The comparison is pure int64
    (count * 24 > 2 * trailing_sum) — no float averages, so the flag is
    bit-identical on every engine. One shuffle for the hourly rollup;
    the trailing window runs on the tiny per-hour frame. This is the
    monitoring-side read of the reference's report: watch the per-hour
    message rate instead of printing it once."""
    from pyspark.sql import Window

    e = WOP.tumbling(
        load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull()), 3600
    )
    hourly = (
        e.select(F.col("window_start").alias("hour"))
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.orderBy("hour").rowsBetween(-SPIKE_TRAILING_HOURS, -1)
    trailing = F.sum("n_events").over(w)
    n_trailing = F.count("n_events").over(w)
    return (
        hourly.select(
            "hour",
            "n_events",
            F.coalesce(trailing, F.lit(0)).alias("trailing_sum"),
            n_trailing.cast("long").alias("n_trailing_hours"),
            (
                (F.col("n_events") * n_trailing) > (F.lit(2) * F.coalesce(trailing, F.lit(0)))
            ).alias("is_spike"),
        )
        .where(F.col("n_trailing_hours") > 0)
        .orderBy("hour")
    )


register(
    "hourly_spike_detection",
    _hourly_spike_detection,
    f"""
WITH hourly AS (
  SELECT {_TS} - {_TS} % 3600 AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
t AS (
  SELECT hour, n_events,
    CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT) AS trailing_sum,
    CAST(count(n_events) OVER w AS BIGINT) AS n_trailing_hours
  FROM hourly
  WINDOW w AS (ORDER BY hour ROWS BETWEEN {SPIKE_TRAILING_HOURS} PRECEDING AND 1 PRECEDING)
)
SELECT hour, n_events, trailing_sum, n_trailing_hours,
       (n_events * n_trailing_hours) > (2 * trailing_sum) AS is_spike
FROM t WHERE n_trailing_hours > 0
ORDER BY hour
""",
)


def _event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup→view→click→purchase: users counted at each
    stage only if the stage's FIRST occurrence is strictly after the
    previous stage's entry time. Each stage is one user-keyed
    conditional aggregate joined back on user_id — four partial-agged
    shuffles on the same key (co-partitioned after the first), no
    event-level self-join."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", WOP.ts_sec().alias("tsec")
    )

    def first_after(df: DataFrame, etype: str, prev: DataFrame, prev_col: str, out: str) -> DataFrame:
        return (
            df.join(prev, "user_id")
            .where((F.col("event_type") == etype) & (F.col("tsec") > F.col(prev_col)))
            .groupBy("user_id")
            .agg(F.min("tsec").alias(out))
        )

    s1 = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("tsec").alias("t1"))
    )
    s2 = first_after(e, "view", s1, "t1", "t2")
    s3 = first_after(e, "click", s2, "t2", "t3")
    s4 = first_after(e, "purchase", s3, "t3", "t4")
    return spark.createDataFrame(
        [("1_signup",), ("2_view",), ("3_click",), ("4_purchase",)], "stage string"
    ).join(
        s1.agg(F.count(F.lit(1)).alias("n")).select(F.lit("1_signup").alias("stage"), "n")
        .unionAll(s2.agg(F.count(F.lit(1)).alias("n")).select(F.lit("2_view").alias("stage"), "n"))
        .unionAll(s3.agg(F.count(F.lit(1)).alias("n")).select(F.lit("3_click").alias("stage"), "n"))
        .unionAll(s4.agg(F.count(F.lit(1)).alias("n")).select(F.lit("4_purchase").alias("stage"), "n")),
        "stage",
    ).select("stage", F.col("n").cast("long").alias("n_users")).orderBy("stage")


register(
    "event_funnel",
    _event_funnel,
    f"""
WITH e AS (SELECT user_id, event_type, {_TS} AS tsec FROM events),
s1 AS (SELECT user_id, min(tsec) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(tsec) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'view' AND tsec > t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(tsec) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'click' AND tsec > t2 GROUP BY e.user_id),
s4 AS (SELECT e.user_id, min(tsec) AS t4 FROM e JOIN s3 USING (user_id)
       WHERE event_type = 'purchase' AND tsec > t3 GROUP BY e.user_id)
SELECT stage, n_users FROM (
  SELECT '1_signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
  UNION ALL SELECT '2_view', CAST(count(*) AS BIGINT) FROM s2
  UNION ALL SELECT '3_click', CAST(count(*) AS BIGINT) FROM s3
  UNION ALL SELECT '4_purchase', CAST(count(*) AS BIGINT) FROM s4
) ORDER BY stage
""",
)


WEEK_SEC = 7 * 24 * 3600


def _weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted as retained in each later week they were active. All-integer
    week arithmetic; two user-keyed aggregates + one distinct — the
    classic warehouse rollup, partial-aggregable end to end."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", (WOP.ts_sec() - WOP.ts_sec() % WEEK_SEC).alias("week")
    )
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = e.distinct()
    return (
        active.join(first, "user_id")
        .select(
            "cohort_week",
            ((F.col("week") - F.col("cohort_week")) / WEEK_SEC).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


register(
    "weekly_retention_cohorts",
    _weekly_retention_cohorts,
    f"""
WITH e AS (
  SELECT DISTINCT user_id, {_TS} - {_TS} % {WEEK_SEC} AS week FROM events
),
first AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
SELECT cohort_week,
       CAST((week - cohort_week) // {WEEK_SEC} AS BIGINT) AS week_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM e JOIN first USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
""",
)


def _user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event log → SCD2-style state history: consecutive duplicate states
    collapsed, each surviving row stamped [valid_from, valid_to) with
    valid_to = next change (NULL while current) — the anti-join+window
    CDC-merge emulation pattern, run log-side. Two windows over the same
    (user_id, ts) partitioning = one shuffle."""
    from pyspark.sql import Window

    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts", "event_id", WOP.ts_sec().alias("tsec"))
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = e.withColumn(
        "prev_state", F.lag("event_type").over(order)
    ).where(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("event_type"))
    )
    order2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changed.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("tsec").alias("valid_from_sec"),
            F.lead("tsec").over(order2).alias("valid_to_sec"),
        )
        .orderBy("user_id", "valid_from_sec", "state")
    )


register(
    "user_state_history",
    _user_state_history,
    f"""
WITH e AS (
  SELECT user_id, event_type, ts, event_id, {_TS} AS tsec FROM events
  WHERE ts IS NOT NULL
),
changed AS (
  SELECT * FROM (
    SELECT user_id, event_type, ts, event_id, tsec,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
    FROM e
  ) WHERE prev_state IS NULL OR prev_state <> event_type
)
SELECT user_id, event_type AS state,
       tsec AS valid_from_sec,
       lead(tsec) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_sec
FROM changed
ORDER BY user_id, valid_from_sec, state
""",
)


_CHECKS: list[tuple[str, str]] = [
    # (check name, SQL predicate that flags a VIOLATION) — shared between
    # engines verbatim: every predicate is portable SQL on scan columns.
    ("value_negative", "value < 0"),
    ("value_over_400", "value > 400"),
    ("value_null", "value IS NULL"),
    ("unknown_event_type",
     "event_type NOT IN ('click','view','purchase','signup','error')"),
    ("user_id_null", "user_id IS NULL"),
]


def _events_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-validation pass (the 'expectations' pattern): every invariant
    evaluated in ONE scan via conditional aggregation — adding a check
    adds a column to the same partial-aggregated pass, never a second
    read. Violation counts + rates in long form for alerting."""
    e = load_table(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("long").alias(name)
        for name, pred in _CHECKS
    ] + [F.count(F.lit(1)).alias("_n")]
    row = e.agg(*aggs)
    stacked = row.selectExpr(
        "_n",
        "stack({}, {}) AS (check, n_violations)".format(
            len(_CHECKS), ", ".join(f"'{n}', {n}" for n, _ in _CHECKS)
        ),
    )
    return stacked.select(
        "check",
        "n_violations",
        F.col("_n").alias("n_rows"),
        F.round(F.col("n_violations").cast("double") / F.col("_n"), 6).alias(
            "violation_rate"
        ),
    ).orderBy("check")


_CHECK_ARMS = "\nUNION ALL ".join(
    f"SELECT '{name}' AS \"check\", {name} AS n_violations, CAST(n AS BIGINT) AS n_rows, "
    f"round(CAST({name} AS DOUBLE) / n, 6) AS violation_rate FROM agg"
    for name, _ in _CHECKS
)

register(
    "events_quality_checks",
    _events_quality_checks,
    f"""
WITH agg AS (
  SELECT count(*) AS n,
    {", ".join(f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS {name}" for name, pred in _CHECKS)}
  FROM events
)
{_CHECK_ARMS}
ORDER BY "check"
""",
)


# ---------------------------------------------------------------------------
# Skew-mitigated enrichment join (operators/skew.salted_equi_join end-to-end)


def _salted_user_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events enriched with the customer dimension through the SALTED
    equi-join, then rolled up per market segment — the end-to-end proof
    that salting is semantics-preserving (the oracle is the plain join).

    Scale rationale: ``events.user_id`` is the canonical hot key (a few
    power users own most rows); when the dim side is too large to
    broadcast, a shuffled join puts every hot user's rows in ONE task.
    ``salted_equi_join`` spreads each key over ``salt`` partitions at the
    cost of replicating the (small but not broadcastable) dim ``salt``
    times. At this fixture's size Spark will broadcast the dim anyway —
    correctness is what the driver can check; the skewed-shuffle plan
    shape is pinned in tests/test_extensions.py and
    tests/test_plan_properties.py.
    """
    from kafka_topic_analyzer_spark.operators.skew import salted_equi_join

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", dec("value").alias("v")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    j = salted_equi_join(e, c, "user_id", salt=8)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("v"), 2).cast("double").alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


register(
    "salted_user_enrichment",
    _salted_user_enrichment,
    """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
