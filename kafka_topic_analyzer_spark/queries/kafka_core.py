"""Kafka-core queries: the reference's full metric surface (SURVEY.md §2.4/§2.9).

Spark side runs over :func:`kafka_frame_from_events`; oracle SQL reproduces
the identical derivation via the shared CTE, so both engines see the same
log. Every aggregate is aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_topic_analyzer_spark.operators.alive_keys import (
    alive_key_count,
    alive_key_count_approx,
    compacted_state,
)
from kafka_topic_analyzer_spark.operators.report import (
    global_report,
    partition_report,
)
from kafka_topic_analyzer_spark.registry import register
from kafka_topic_analyzer_spark.sources.events_log import (
    kafka_frame_from_events,
    kafka_oracle,
)


def _kafka_report_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return partition_report(kafka_frame_from_events(spark, sf_dir))


# Partition metrics as a reusable CTE suffix: `kafka_report_partition`
# selects it raw; `kafka_report_rendered` formats its cells.
_PARTITION_REP_CTE = """
, agg AS (
  SELECT "partition",
    CAST(min("offset") AS BIGINT) AS start_offset,
    CAST(max("offset") + 1 AS BIGINT) AS end_offset,
    CAST(count(*) AS BIGINT) AS total,
    CAST(count("value") AS BIGINT) AS alive,
    CAST(count(*) - count("value") AS BIGINT) AS tombstones,
    CAST(count(*) - count("key") AS BIGINT) AS key_null,
    CAST(count("key") AS BIGINT) AS key_non_null,
    CAST(coalesce(sum(length("key")), 0) AS BIGINT) AS key_bytes,
    CAST(coalesce(sum(length("value")), 0) AS BIGINT) AS value_bytes
  FROM kafka_messages
  GROUP BY "partition"
),
rep AS (
  SELECT
    "partition", start_offset, end_offset, total, alive, tombstones,
    CASE WHEN total > 0 AND tombstones > 0
         THEN round(tombstones * 100.0 / total, 4) ELSE 0.0 END AS dirty_ratio,
    key_null, key_non_null,
    CAST(key_bytes + value_bytes AS BIGINT) AS p_bytes,
    key_bytes, value_bytes,
    CAST(CASE WHEN key_bytes > 0 AND alive > 0 THEN key_bytes // alive ELSE 0 END AS BIGINT) AS key_size_avg,
    CAST(CASE WHEN value_bytes > 0 AND alive > 0 THEN value_bytes // alive ELSE 0 END AS BIGINT) AS value_size_avg,
    CAST(CASE WHEN key_bytes + value_bytes > 0 AND alive > 0
              THEN (key_bytes + value_bytes) // alive ELSE 0 END AS BIGINT) AS message_size_avg
  FROM agg
)
"""

register(
    "kafka_report_partition",
    _kafka_report_partition,
    kafka_oracle(_PARTITION_REP_CTE + 'SELECT * FROM rep ORDER BY "partition"'),
)


def _kafka_report_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return global_report(kafka_frame_from_events(spark, sf_dir))


register(
    "kafka_report_global",
    _kafka_report_global,
    kafka_oracle("""
SELECT
  CAST(count(*) AS BIGINT) AS overall_count,
  CAST(coalesce(sum(coalesce(length("key"), 0) + coalesce(length("value"), 0)), 0) AS BIGINT) AS overall_size,
  CAST(coalesce(min(CASE WHEN "value" IS NOT NULL
        THEN coalesce(length("key"), 0) + length("value") END), 0) AS BIGINT) AS smallest_message,
  CAST(coalesce(max(CASE WHEN "value" IS NOT NULL
        THEN coalesce(length("key"), 0) + length("value") END), 0) AS BIGINT) AS largest_message,
  CAST(min(timestamp_ms // 1000) AS BIGINT) AS earliest_ts_sec,
  CAST(max(timestamp_ms // 1000) AS BIGINT) AS latest_ts_sec
FROM kafka_messages
"""),
)


def _kafka_alive_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return alive_key_count(kafka_frame_from_events(spark, sf_dir))


register(
    "kafka_alive_keys",
    _kafka_alive_keys,
    kafka_oracle("""
, latest AS (
  SELECT "key", "value" IS NOT NULL AS alive,
         row_number() OVER (PARTITION BY "key" ORDER BY "partition" DESC, "offset" DESC) AS rn
  FROM kafka_messages WHERE "key" IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS alive_keys FROM latest WHERE rn = 1 AND alive
"""),
)


def _kafka_compacted_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compacted_state(kafka_frame_from_events(spark, sf_dir))


register(
    "kafka_compacted_state",
    _kafka_compacted_state,
    kafka_oracle("""
, numbered AS (
  SELECT "key",
         "value" IS NOT NULL AS alive,
         "partition" AS last_partition,
         "offset" AS last_offset,
         row_number() OVER (PARTITION BY "key" ORDER BY "partition" DESC, "offset" DESC) AS rn,
         count(*) OVER (PARTITION BY "key") AS versions
  FROM kafka_messages WHERE "key" IS NOT NULL
)
SELECT "key", alive,
       CAST(last_partition AS INTEGER) AS last_partition,
       CAST(last_offset AS BIGINT) AS last_offset,
       CAST(versions AS BIGINT) AS versions
FROM numbered WHERE rn = 1
"""),
)


def _kafka_alive_keys_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    return alive_key_count_approx(kafka_frame_from_events(spark, sf_dir))


# HLL sketches differ across engines — rows-only check (driver records the
# weaker gate; the exact variant above is the hash-matched one).
register("kafka_alive_keys_approx", _kafka_alive_keys_approx, None)


def _kafka_alive_keys_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable audit of the HLL path: the exact alive-key count
    (hash-checked against the oracle) plus a boolean asserting the HLL++
    estimate lands within 3×rsd of it. A sketch regression flips the
    boolean and the value-hash goes red — the approx path now carries a
    real driver signal instead of a rows-only row."""
    from pyspark.sql import functions as F

    kdf = kafka_frame_from_events(spark, sf_dir)
    rsd = 0.01
    exact = alive_key_count(kdf)  # 1 row: alive_keys
    approx = alive_key_count_approx(kdf, rsd=rsd)  # 1 row: alive_keys_approx
    return exact.crossJoin(F.broadcast(approx)).select(
        "alive_keys",
        (
            F.abs(F.col("alive_keys_approx") - F.col("alive_keys"))
            <= 3 * rsd * F.col("alive_keys")
        ).alias("within_3rsd"),
    )


register(
    "kafka_alive_keys_hll_audit",
    _kafka_alive_keys_hll_audit,
    kafka_oracle("""
, latest AS (
  SELECT "key", "value" IS NOT NULL AS alive,
         row_number() OVER (PARTITION BY "key" ORDER BY "partition" DESC, "offset" DESC) AS rn
  FROM kafka_messages WHERE "key" IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS alive_keys, true AS within_3rsd
FROM latest WHERE rn = 1 AND alive
"""),
)


def _report_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (long-form) of the per-partition report — the inverse of
    order_status_pivot's wide-form: one (partition, metric, value) row
    per counter, the shape metric stores and dashboards ingest. stack()
    is pure projection — no extra shuffle beyond the report itself."""
    from kafka_topic_analyzer_spark.operators.report import partition_report
    from kafka_topic_analyzer_spark.sources.events_log import kafka_frame_from_events

    rep = partition_report(kafka_frame_from_events(spark, sf_dir))
    return (
        rep.selectExpr(
            "partition",
            "stack(4, 'total', total, 'alive', alive, 'tombstones', tombstones, "
            "'key_non_null', key_non_null) AS (metric, value)",
        )
        .orderBy("partition", "metric")
    )


register(
    "report_metrics_unpivot",
    _report_metrics_unpivot,
    kafka_oracle("""
, agg AS (
  SELECT "partition",
    CAST(count(*) AS BIGINT) AS total,
    CAST(count("value") AS BIGINT) AS alive,
    CAST(count(*) - count("value") AS BIGINT) AS tombstones,
    CAST(count("key") AS BIGINT) AS key_non_null
  FROM kafka_messages GROUP BY "partition"
)
SELECT "partition", metric, value FROM (
  SELECT "partition", 'total' AS metric, total AS value FROM agg
  UNION ALL SELECT "partition", 'alive', alive FROM agg
  UNION ALL SELECT "partition", 'tombstones', tombstones FROM agg
  UNION ALL SELECT "partition", 'key_non_null', key_non_null FROM agg
)
ORDER BY "partition", metric
"""),
)


def _event_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile of the topic, per partition — the
    operational input to watermark sizing: ``withWatermark(delay)`` must
    cover the disorder the data actually exhibits, and this measures it
    (messages in OFFSET order vs their event timestamps; the reference
    only surfaces min/max ts, src/metric.rs:39-47 — this extends that to
    the full lateness distribution the streaming operators care about).

    A message is "late by d" if a higher event-time message preceded it
    in the same partition's offset order (d = running-max - ts). The
    zero sentinel the log uses for missing timestamps is excluded from
    the running max and counted separately.

    Plan: one window pass per partition (partitionBy(partition)
    ORDER BY offset — the shuffle is the same partition-keyed exchange
    the report pays), then a per-partition aggregate; O(partitions)
    output rows.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    kdf = kafka_frame_from_events(spark, sf_dir)
    w = (
        Window.partitionBy("partition")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_ok = F.when(F.col("timestamp_ms") > 0, F.col("timestamp_ms"))
    run_max = F.max(ts_ok).over(w)
    prof = kdf.select(
        "partition",
        F.col("timestamp_ms"),
        _lateness_col(run_max).alias("late_ms"),
    )
    return _lateness_rollup(prof)


def _lateness_col(run_max):
    """late_ms from a running-max column — shared by the exact window
    form and the two-level scalable twin so the lateness definition
    cannot drift between them."""
    from pyspark.sql import functions as F

    return F.when(
        (F.col("timestamp_ms") > 0) & run_max.isNotNull(),
        F.greatest(run_max - F.col("timestamp_ms"), F.lit(0)),
    )


def _lateness_rollup(prof: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return (
        prof.groupBy("partition")
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.sum((F.col("timestamp_ms") == 0).cast("long")).alias("n_missing_ts"),
            F.sum((F.col("late_ms") > 0).cast("long")).alias("n_out_of_order"),
            F.sum((F.col("late_ms") > 1_000).cast("long")).alias("n_late_1s"),
            F.sum((F.col("late_ms") > 60_000).cast("long")).alias("n_late_60s"),
            F.coalesce(F.max("late_ms"), F.lit(0)).alias("max_disorder_ms"),
        )
        .orderBy("partition")
    )


def _event_lateness_profile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-free twin of event_lateness_profile for corpus-sized Kafka
    partitions: the exact form's ``max() OVER (PARTITION BY partition
    ORDER BY offset)`` materializes each topic-partition in ONE task —
    at 100 TB a partition holds billions of offsets, so that task is
    the job. This twin computes the identical exclusive running max via
    the two-level scan (operators/ranks.py:prefix_max_scalable): 32
    contiguous offset ranges per partition scan in parallel, their
    maxima get a tiny cumulative pass, and greatest(base, local)
    reassembles the global prefix. Shares the exact form's oracle SQL
    VERBATIM — the driver hash proves the sharded plan computes the
    same lateness profile (the sequence_packing_scalable pattern)."""
    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.operators.ranks import prefix_max_scalable

    kdf = kafka_frame_from_events(spark, sf_dir)
    ts_ok = F.when(F.col("timestamp_ms") > 0, F.col("timestamp_ms"))
    t = prefix_max_scalable(kdf, "partition", "offset", ts_ok, "run_max")
    prof = t.select(
        "partition",
        F.col("timestamp_ms"),
        _lateness_col(F.col("run_max")).alias("late_ms"),
    )
    return _lateness_rollup(prof)


_LATENESS_ORACLE = kafka_oracle("""
, prof AS (
  SELECT "partition", timestamp_ms,
         CASE WHEN timestamp_ms > 0 THEN
           greatest(
             max(CASE WHEN timestamp_ms > 0 THEN timestamp_ms END)
               OVER (PARTITION BY "partition" ORDER BY "offset"
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             - timestamp_ms, 0)
         END AS late_ms
  FROM kafka_messages
)
SELECT "partition",
       CAST(count(*) AS BIGINT) AS n_messages,
       CAST(sum(CASE WHEN timestamp_ms = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_ts,
       CAST(sum(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_order,
       CAST(sum(CASE WHEN late_ms > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1s,
       CAST(sum(CASE WHEN late_ms > 60000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_60s,
       CAST(COALESCE(max(late_ms), 0) AS BIGINT) AS max_disorder_ms
FROM prof
GROUP BY "partition"
ORDER BY "partition"
""")

register("event_lateness_profile", _event_lateness_profile, _LATENESS_ORACLE)
# the twin shares the oracle VERBATIM: same semantics, sharded plan
register(
    "event_lateness_profile_scalable",
    _event_lateness_profile_scalable,
    _LATENESS_ORACLE,
)


def _kafka_report_rendered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The report's TABLE CELLS exactly as render.py prints them (S5/§2.9,
    ref src/main.rs:150-172): every metric as its rendered string —
    ``str(int)`` for counts/bytes/averages, ``%.4f`` for the dirty ratio
    (X4). Makes the rendering surface driver-hashable instead of
    golden-file-only; the ascii frame/padding (pure layout) stays under
    the golden test in tests/test_render_cli.py."""
    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.operators.report import partition_report

    rep = partition_report(kafka_frame_from_events(spark, sf_dir))
    int_fields = [
        "start_offset", "end_offset", "total", "alive", "tombstones",
        "key_null", "key_non_null", "p_bytes", "key_bytes", "value_bytes",
        "key_size_avg", "value_size_avg", "message_size_avg",
    ]
    return rep.select(
        "partition",
        F.col("partition").cast("string").alias("c_partition"),
        *[F.col(f).cast("string").alias(f"c_{f}") for f in int_fields],
        F.format_string("%.4f", F.col("dirty_ratio")).alias("c_dirty_ratio"),
    ).orderBy("partition")


register(
    "kafka_report_rendered",
    _kafka_report_rendered,
    kafka_oracle(
        _PARTITION_REP_CTE
        + """
SELECT "partition",
  CAST("partition" AS VARCHAR) AS c_partition,
  CAST(start_offset AS VARCHAR) AS c_start_offset,
  CAST(end_offset AS VARCHAR) AS c_end_offset,
  CAST(total AS VARCHAR) AS c_total,
  CAST(alive AS VARCHAR) AS c_alive,
  CAST(tombstones AS VARCHAR) AS c_tombstones,
  CAST(key_null AS VARCHAR) AS c_key_null,
  CAST(key_non_null AS VARCHAR) AS c_key_non_null,
  CAST(p_bytes AS VARCHAR) AS c_p_bytes,
  CAST(key_bytes AS VARCHAR) AS c_key_bytes,
  CAST(value_bytes AS VARCHAR) AS c_value_bytes,
  CAST(key_size_avg AS VARCHAR) AS c_key_size_avg,
  CAST(value_size_avg AS VARCHAR) AS c_value_size_avg,
  CAST(message_size_avg AS VARCHAR) AS c_message_size_avg,
  printf('%.4f', dirty_ratio) AS c_dirty_ratio
FROM rep ORDER BY "partition"
"""
    ),
)


def _kafka_summary_rendered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The summary block's rendered values (ref src/main.rs:125-148):
    timestamps in the reference's `%Y-%m-%d %H:%M:%S UTC` format (X3) and
    comma-grouped byte/message counts — the strings render.py interpolates,
    hash-checked against DuckDB's own formatting. Timestamp arithmetic is
    tz-free on both sides (epoch + interval), so a hostile driver session
    timezone cannot skew it (prepare_session pins UTC for Spark's
    date_format)."""
    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.operators.report import global_report

    g = global_report(kafka_frame_from_events(spark, sf_dir))

    def ts_str(col: str):
        return F.concat(
            F.date_format(F.timestamp_seconds(F.col(col)), "yyyy-MM-dd HH:mm:ss"),
            F.lit(" UTC"),
        )

    return g.select(
        ts_str("earliest_ts_sec").alias("earliest_rendered"),
        ts_str("latest_ts_sec").alias("latest_rendered"),
        F.format_number(F.col("largest_message"), 0).alias("largest_rendered"),
        F.format_number(F.col("smallest_message"), 0).alias("smallest_rendered"),
        F.format_number(F.col("overall_size"), 0).alias("size_rendered"),
        F.format_number(F.col("overall_count"), 0).alias("count_rendered"),
    )


register(
    "kafka_summary_rendered",
    _kafka_summary_rendered,
    kafka_oracle("""
, g AS (
  SELECT
    CAST(count(*) AS BIGINT) AS overall_count,
    CAST(coalesce(sum(coalesce(length("key"), 0) + coalesce(length("value"), 0)), 0) AS BIGINT) AS overall_size,
    CAST(coalesce(min(CASE WHEN "value" IS NOT NULL
          THEN coalesce(length("key"), 0) + length("value") END), 0) AS BIGINT) AS smallest_message,
    CAST(coalesce(max(CASE WHEN "value" IS NOT NULL
          THEN coalesce(length("key"), 0) + length("value") END), 0) AS BIGINT) AS largest_message,
    CAST(min(timestamp_ms // 1000) AS BIGINT) AS earliest_ts_sec,
    CAST(max(timestamp_ms // 1000) AS BIGINT) AS latest_ts_sec
  FROM kafka_messages
)
SELECT
  strftime(TIMESTAMP '1970-01-01' + to_seconds(earliest_ts_sec), '%Y-%m-%d %H:%M:%S') || ' UTC' AS earliest_rendered,
  strftime(TIMESTAMP '1970-01-01' + to_seconds(latest_ts_sec), '%Y-%m-%d %H:%M:%S') || ' UTC' AS latest_rendered,
  format('{:,}', largest_message) AS largest_rendered,
  format('{:,}', smallest_message) AS smallest_rendered,
  format('{:,}', overall_size) AS size_rendered,
  format('{:,}', overall_count) AS count_rendered
FROM g
"""),
)


# ---------------------------------------------------------------------------
# Driver-hashable audits for the CLI/guard surfaces (S2, S4, X7) — these
# were previously unit-test-only because they don't read data tables; the
# declarative twins below let the driver hash the RULES themselves.


_CONFIG_FIXTURE = (
    "max.poll.records=500, fetch.min.bytes = 1024,"
    "kafka.security.protocol=PLAINTEXT,sasl.jaas.config=user=admin"
)


def _kafka_consumer_config_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 + X7 as a cross-engine query: the ``key=value`` parse (split on
    the FIRST '=' so values may contain '='; whitespace trimmed — ref
    ``src/main.rs:84-92``, mirrored by ``cli.py parse_consumer_config``)
    and the ``kafka.*`` option-prefix rule (``sources/kafka.py
    kafka_options``: already-prefixed keys pass through, bare consumer
    keys gain the prefix). Both engines parse the same fixture string
    independently, so a drift in either rule hash-mismatches."""
    from pyspark.sql import functions as F

    pairs = spark.range(1).select(
        F.explode(F.split(F.lit(_CONFIG_FIXTURE), ",")).alias("pair")
    )
    key = F.trim(F.substring_index(F.col("pair"), "=", 1))
    value = F.trim(F.expr("substring(pair, instr(pair, '=') + 1)"))
    return (
        pairs.select(key.alias("key"), value.alias("value"))
        .withColumn(
            "option_key",
            F.when(F.col("key").startswith("kafka."), F.col("key")).otherwise(
                F.concat(F.lit("kafka."), F.col("key"))
            ),
        )
        .orderBy("option_key")
    )


register(
    "kafka_consumer_config_audit",
    _kafka_consumer_config_audit,
    f"""
WITH pairs AS (
  SELECT unnest(string_split('{_CONFIG_FIXTURE}', ',')) AS pair
),
parsed AS (
  SELECT trim(substr(pair, 1, strpos(pair, '=') - 1)) AS key,
         trim(substr(pair, strpos(pair, '=') + 1)) AS value
  FROM pairs
)
SELECT key, value,
       CASE WHEN key LIKE 'kafka.%' THEN key ELSE 'kafka.' || key END AS option_key
FROM parsed
ORDER BY option_key
""",
)


def _kafka_empty_topic_guard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 as a hashable decision table: exit code −2 iff the bounded scan
    is empty, 0 otherwise (ref ``src/main.rs:98-101``). The production
    guard (``sources/kafka.py guard_empty_topic``) decides on
    ``limit(1).isEmpty`` — this twin evaluates the same predicate
    declaratively over the real scan AND a provably-empty scan, so the
    driver hashes both branches of the rule."""
    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.sources.kafka import EMPTY_TOPIC_EXIT_CODE

    kdf = kafka_frame_from_events(spark, sf_dir)

    def probe(df: DataFrame, name: str) -> DataFrame:
        return (
            df.agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.lit(name).alias("probe"),
                (F.col("n") == 0).alias("is_empty"),
                F.when(F.col("n") == 0, F.lit(EMPTY_TOPIC_EXIT_CODE))
                .otherwise(F.lit(0))
                .cast("int")
                .alias("exit_code"),
            )
        )

    return (
        probe(kdf, "scan")
        .unionAll(probe(kdf.where(F.lit(False)), "empty_scan"))
        .orderBy("probe")
    )


register(
    "kafka_empty_topic_guard_audit",
    _kafka_empty_topic_guard_audit,
    kafka_oracle("""
, s AS (SELECT count(*) AS n FROM kafka_messages),
e AS (SELECT count(*) AS n FROM kafka_messages WHERE false)
SELECT * FROM (
  SELECT 'empty_scan' AS probe, n = 0 AS is_empty,
         CAST(CASE WHEN n = 0 THEN -2 ELSE 0 END AS INTEGER) AS exit_code FROM e
  UNION ALL
  SELECT 'scan', n = 0,
         CAST(CASE WHEN n = 0 THEN -2 ELSE 0 END AS INTEGER) FROM s
)
ORDER BY probe
"""),
)


def _kafka_scan_observability_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 as a hashable audit: the ``observe()`` metrics attached to the
    scan (messages, bytes, max offset — the reference's end-of-run
    progress stats, ref ``src/main.rs`` progress reporting) must equal the
    same aggregates computed declaratively. The Spark side routes through
    the REAL observability plumbing — ``observe_scan`` + an action +
    ``Observation.get`` — and emits the observed values as the result row,
    so a drift anywhere in that path (metric expressions, listener
    wiring) hash-mismatches the oracle's plain SQL aggregate.
    ``partitions_seen`` is approx_count_distinct and deliberately NOT
    emitted (the one non-deterministic metric in the set)."""
    from kafka_topic_analyzer_spark.observability import observe_scan

    observed, obs = observe_scan(kafka_frame_from_events(spark, sf_dir), "audit")
    observed.write.format("noop").mode("overwrite").save()  # action -> metrics
    got = obs.get
    return spark.createDataFrame(
        [(int(got["messages"]), int(got["bytes"]), int(got["max_offset"]))],
        "messages long, bytes long, max_offset long",
    )


register(
    "kafka_scan_observability_audit",
    _kafka_scan_observability_audit,
    kafka_oracle("""
SELECT CAST(count(*) AS BIGINT) AS messages,
       CAST(coalesce(sum(coalesce(length("key"), 0) + coalesce(length("value"), 0)), 0) AS BIGINT) AS bytes,
       CAST(max("offset") AS BIGINT) AS max_offset
FROM kafka_messages
"""),
)
