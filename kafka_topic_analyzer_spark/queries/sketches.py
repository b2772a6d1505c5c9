"""Sketch & join-planning queries: Count-Min heavy hitters, Bloom-pruned
joins, and pre-shuffle skew forecasting.

The reference engine answers "how many keys / which keys" with one exact
in-process hash table (`src/metric.rs`); at 100 TB the same questions are
answered with mergeable sketches and censuses built map-side. This module
registers the sketch family the HLL alive-keys audit started
(queries/kafka_core.py `kafka_alive_keys_hll_audit`), extended to
frequency (Count-Min) and membership (Bloom), plus the exact skew
forecast a shuffle planner consumes.

Scale shape (all queries):
- the only corpus-sized shuffle is a per-key census (groupBy key) — map-
  side combinable, output |keys| rows, never |rows|;
- every sketch relation (d*w CMS cells, <= m Bloom bits) is broadcast;
- fact scans never shuffle: Bloom probing is k broadcast joins beside the
  scan — the explicit form of AQE's runtime bloom-filter pruning;
- no windows anywhere; final top-k is a global ORDER BY + LIMIT
  (TakeOrderedAndProject).

Oracle discipline: the hash family is md5-prefix arithmetic (identical
lowercase hex on both engines — see operators/sketches.py:hash32 /
HASH32_SQL), every output column is exact integer, and ties at LIMIT
boundaries are broken by key — so every row is bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.operators import sketches as SK
from kafka_topic_analyzer_spark.registry import register
from kafka_topic_analyzer_spark.sources.tables import load_table

TOP_HEAVY = 20
_W = SK.CMS_WIDTH
_D = SK.CMS_DEPTH
_M = SK.BLOOM_M
_K = SK.BLOOM_K
_M_SWEEP = (1024, 2048, 4096, 8192)
_SEGMENT = "BUILDING"


def _pos_sql(key_expr: str, salt_expr: str, m: int | str) -> str:
    return f"({SK.HASH32_SQL(key_expr, salt_expr)} % {m})"


# ---------------------------------------------------------------------------
# Count-Min heavy hitters
# ---------------------------------------------------------------------------


def _heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point estimates vs exact counts for the top events users.

    Build: per-user census (THE one shuffle) -> d*w cell relation (2048
    rows, from the census not the raw scan) -> top-20 candidates by exact
    count -> estimate = min over d probed counters (broadcast join).
    ``overcount`` (est - exact, >= 0 by construction — CMS never
    underestimates) is the audit column: it measures collision pressure at
    this (d, w) for this key distribution, the number that says whether
    the sketch is sized right before it replaces the census online."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    cells = SK.cms_cells(counts, "user_id", "exact_cnt", _D, _W)
    top = counts.orderBy(F.desc("exact_cnt"), "user_id").limit(TOP_HEAVY)
    est = SK.cms_estimates(top, cells, "user_id", _D, _W)
    return (
        est.select(
            "user_id",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("exact_cnt"), "user_id")
    )


register(
    "heavy_hitters_cms",
    _heavy_hitters_cms,
    f"""
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt FROM events GROUP BY user_id
),
pos AS (
  SELECT c.user_id, c.exact_cnt, CAST(t.j AS INT) AS row_j,
         {_pos_sql('c.user_id', 't.j', _W)} AS col_j
  FROM counts c, range({_D}) t(j)
),
cells AS (
  SELECT row_j, col_j, CAST(sum(exact_cnt) AS BIGINT) AS cell_total
  FROM pos GROUP BY row_j, col_j
),
top AS (
  SELECT user_id, exact_cnt FROM counts
  ORDER BY exact_cnt DESC, user_id NULLS FIRST LIMIT {TOP_HEAVY}
),
-- probe positions derived FROM top directly (not an equi-join back on
-- user_id, which would drop a NULL key), LEFT-joined to the sparse cell
-- relation with empty cells counting 0 — mirroring the Spark side's
-- cms_estimates fix (advisor r13): a NULL/non-member key estimates 0
-- instead of silently vanishing. Caught by the adversarial fuzz's
-- NULL-user events (r14).
pos_top AS (
  SELECT t.user_id, t.exact_cnt, CAST(r.j AS INT) AS row_j,
         {_pos_sql('t.user_id', 'r.j', _W)} AS col_j
  FROM top t, range({_D}) r(j)
),
est AS (
  SELECT user_id, exact_cnt, min(coalesce(cl.cell_total, 0)) AS est_cnt
  FROM pos_top LEFT JOIN cells cl USING (row_j, col_j)
  GROUP BY user_id, exact_cnt
)
SELECT CAST(user_id AS BIGINT) AS user_id, exact_cnt,
       CAST(est_cnt AS BIGINT) AS est_cnt,
       CAST(est_cnt - exact_cnt AS BIGINT) AS overcount
FROM est
ORDER BY exact_cnt DESC, user_id
""",
)


# ---------------------------------------------------------------------------
# Bloom-pruned semi-join
# ---------------------------------------------------------------------------


def _bloom_join_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-side Bloom pruning audit: filter the orders fact against a
    k=3-hash, m=8192-bit Bloom of the BUILDING-segment customer keys.

    The serving pattern at 100 TB: the dim-side bit relation (<= m rows)
    broadcasts to every fact scan task, and non-member rows drop BEFORE
    any shuffle — the explicit, auditable form of what
    spark.sql.optimizer.runtime.bloomFilter.enabled injects. The single
    output row pins the economics: pass volume vs true members
    (false-positive overhead the downstream join still discards) and
    n_missed = 0 (a Bloom filter never false-negatives — the invariant
    that makes pre-shuffle dropping SAFE)."""
    cust = load_table(spark, sf_dir, "customer")
    dim = (
        cust.where(F.col("c_mktsegment") == _SEGMENT).select("c_custkey").distinct()
    )
    bloom = SK.bloom_positions(dim, "c_custkey", _K, _M)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    flags = SK.bloom_probe_flags(orders, "o_custkey", bloom, _K, _M)
    member = flags.join(
        F.broadcast(dim.withColumn("_is_m", F.lit(1))),
        flags["o_custkey"] == dim["c_custkey"],
        "left",
    )
    stats = member.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).cast("long").alias("n_pass"),
        F.sum(F.when(F.col("_is_m").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_member"),
        F.sum(F.when(F.col("bloom_pass") & F.col("_is_m").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(
            F.when(~F.col("bloom_pass") & F.col("_is_m").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_missed"),
    )
    consts = (
        dim.agg(F.count(F.lit(1)).cast("long").alias("n_dim_keys"))
        .crossJoin(bloom.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set")))
    )
    return consts.crossJoin(stats).select(
        "n_dim_keys", "n_bits_set", "n_orders", "n_pass", "n_member",
        "n_false_pos", "n_missed",
    )


def _bloom_pos_exprs(key: str, m: int | str) -> list[str]:
    return [_pos_sql(key, str(j), m) for j in range(_K)]


register(
    "bloom_join_pruning",
    _bloom_join_pruning,
    f"""
WITH dim AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = '{_SEGMENT}'
),
bloom AS (
  SELECT DISTINCT {_pos_sql('c_custkey', 't.j', _M)} AS pos
  FROM dim, range({_K}) t(j)
),
probe AS (
  SELECT o_orderkey, o_custkey,
         {_bloom_pos_exprs('o_custkey', _M)[0]} AS p0,
         {_bloom_pos_exprs('o_custkey', _M)[1]} AS p1,
         {_bloom_pos_exprs('o_custkey', _M)[2]} AS p2
  FROM orders
),
flags AS (
  SELECT o_orderkey,
         (b0.pos IS NOT NULL AND b1.pos IS NOT NULL AND b2.pos IS NOT NULL) AS pass,
         (p.o_custkey IN (SELECT c_custkey FROM dim)) AS member
  FROM probe p
  LEFT JOIN bloom b0 ON b0.pos = p.p0
  LEFT JOIN bloom b1 ON b1.pos = p.p1
  LEFT JOIN bloom b2 ON b2.pos = p.p2
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM dim) AS n_dim_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM bloom) AS n_bits_set,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_member,
       CAST(sum(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       CAST(sum(CASE WHEN member AND NOT pass THEN 1 ELSE 0 END) AS BIGINT) AS n_missed
FROM flags
""",
)


# ---------------------------------------------------------------------------
# Bloom sizing sweep — one scan, every m
# ---------------------------------------------------------------------------


def _bloom_fp_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """False-positive economics across Bloom sizes m in {1024..8192}, k=3,
    from ONE pass: the three 32-bit base hashes are computed once per key;
    each m just reduces them mod m (the sweep discipline of
    lsh_banding_sweep / near_dup_threshold_sweep — never rescan per
    configuration). Output: per m, bits actually set, probe passes, true
    members (constant column — the floor any m converges to), and false
    positives — the table that picks the smallest m whose FP overhead the
    downstream join can absorb."""
    cust = load_table(spark, sf_dir, "customer")
    dim = (
        cust.where(F.col("c_mktsegment") == _SEGMENT).select("c_custkey").distinct()
    )
    hash_cols = lambda key: [  # noqa: E731 — tiny local projection helper
        SK.hash32(F.col(key), j).alias(f"h{j}") for j in range(_K)
    ]
    mdf = spark.createDataFrame([(m,) for m in _M_SWEEP], "m: long")
    dim_h = dim.select("c_custkey", *hash_cols("c_custkey"))
    bloom = (
        dim_h.crossJoin(F.broadcast(mdf))
        .select(
            "m",
            F.explode(
                F.array(*[F.pmod(F.col(f"h{j}"), F.col("m")) for j in range(_K)])
            ).alias("pos"),
        )
        .distinct()
        # materialized once (r15): the bit table feeds FOUR consumers (one
        # broadcast probe side per hash + the bits census) and each built
        # its own copy of the dim scan + md5 projection + distinct —
        # localCheckpoint makes it one compute, four cheap broadcasts
        .localCheckpoint(eager=True)
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    probe = (
        orders.select("o_custkey", *hash_cols("o_custkey"))
        .crossJoin(F.broadcast(mdf))
        .select(
            "m",
            "o_custkey",
            *[F.pmod(F.col(f"h{j}"), F.col("m")).alias(f"p{j}") for j in range(_K)],
        )
    )
    out = probe
    for j in range(_K):
        side = bloom.select(
            "m", F.col("pos").alias(f"p{j}"), F.lit(1).alias(f"_bm{j}")
        )
        out = out.join(F.broadcast(side), ["m", f"p{j}"], "left")
    passed = F.col("_bm0").isNotNull()
    for j in range(1, _K):
        passed = passed & F.col(f"_bm{j}").isNotNull()
    member_side = dim.select(F.col("c_custkey").alias("o_custkey")).withColumn(
        "_is_m", F.lit(1)
    )
    flagged = out.withColumn("pass", passed).join(
        F.broadcast(member_side), "o_custkey", "left"
    )
    per_m = flagged.groupBy("m").agg(
        F.sum(F.when(F.col("pass"), 1).otherwise(0)).cast("long").alias("n_pass"),
        F.sum(F.when(F.col("_is_m").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_member"),
        F.sum(F.when(F.col("pass") & F.col("_is_m").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    )
    bits = bloom.groupBy("m").agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    return (
        per_m.join(F.broadcast(bits), "m")
        .select("m", "n_bits_set", "n_pass", "n_member", "n_false_pos")
        .orderBy("m")
    )


register(
    "bloom_fp_calibration",
    _bloom_fp_calibration,
    f"""
WITH mv AS (SELECT CAST(m AS BIGINT) AS m FROM (VALUES {', '.join(f'({m})' for m in _M_SWEEP)}) AS v(m)),
dim AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = '{_SEGMENT}'
),
dimh AS (
  SELECT c_custkey,
         {SK.HASH32_SQL('c_custkey', "'0'")} AS h0,
         {SK.HASH32_SQL('c_custkey', "'1'")} AS h1,
         {SK.HASH32_SQL('c_custkey', "'2'")} AS h2
  FROM dim
),
bloom AS (
  SELECT DISTINCT m, h0 % m AS pos FROM dimh, mv
  UNION SELECT DISTINCT m, h1 % m FROM dimh, mv
  UNION SELECT DISTINCT m, h2 % m FROM dimh, mv
),
oh AS (
  SELECT o_custkey,
         {SK.HASH32_SQL('o_custkey', "'0'")} AS h0,
         {SK.HASH32_SQL('o_custkey', "'1'")} AS h1,
         {SK.HASH32_SQL('o_custkey', "'2'")} AS h2
  FROM orders
),
probe AS (
  SELECT o.o_custkey, mv.m, o.h0 % mv.m AS p0, o.h1 % mv.m AS p1, o.h2 % mv.m AS p2
  FROM oh o, mv
),
flags AS (
  SELECT p.m,
         (b0.pos IS NOT NULL AND b1.pos IS NOT NULL AND b2.pos IS NOT NULL) AS pass,
         (p.o_custkey IN (SELECT c_custkey FROM dim)) AS member
  FROM probe p
  LEFT JOIN bloom b0 ON b0.m = p.m AND b0.pos = p.p0
  LEFT JOIN bloom b1 ON b1.m = p.m AND b1.pos = p.p1
  LEFT JOIN bloom b2 ON b2.m = p.m AND b2.pos = p.p2
)
SELECT f.m, bs.n_bits_set,
       CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_member,
       CAST(sum(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM flags f
JOIN (SELECT m, CAST(count(*) AS BIGINT) AS n_bits_set FROM bloom GROUP BY m) bs USING (m)
GROUP BY f.m, bs.n_bits_set
ORDER BY f.m
""",
)


# ---------------------------------------------------------------------------
# Pre-shuffle self-join skew forecast
# ---------------------------------------------------------------------------


def _join_skew_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast the per-key output of the l_partkey self-join (the blocked
    dedup/candidate-pair shape) from the census alone — cnt^2 pairs per
    key, share in integer basis points — WITHOUT executing the join. At
    100 TB this is the planner input that decides salting: a key whose
    share_bp dominates means one reducer would build nearly the whole
    output, the exact failure operators/skew.py's salted path exists
    for."""
    li = load_table(spark, sf_dir, "lineitem")
    return SK.selfjoin_skew_forecast(li, "l_partkey", top_n=15)


register(
    "join_skew_forecast",
    _join_skew_forecast,
    """
WITH cnts AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_rows FROM lineitem GROUP BY l_partkey
),
contrib AS (
  SELECT l_partkey, n_rows,
         CAST(n_rows * n_rows AS BIGINT) AS pair_contribution
  FROM cnts
),
tot AS (SELECT CAST(sum(pair_contribution) AS BIGINT) AS total_pairs FROM contrib)
SELECT CAST(l_partkey AS BIGINT) AS l_partkey, n_rows, pair_contribution,
       -- HUGEINT product mirrors Spark's DECIMAL(38,0) div: both exact
       -- floor division, no BIGINT overflow at extreme skew (advisor r13)
       CAST(CAST(pair_contribution AS HUGEINT) * 10000 // total_pairs AS BIGINT) AS share_bp,
       total_pairs
FROM contrib, tot
ORDER BY pair_contribution DESC, l_partkey
LIMIT 15
""",
)


# ---------------------------------------------------------------------------
# Streaming CMS maintenance (complete-mode, d*w-row state)
# ---------------------------------------------------------------------------


def _cms_census_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the Count-Min cell build: counters maintained
    directly from the raw events stream (AvailableNow), state = d*w rows —
    constant in stream length. The oracle aggregates the batch positions
    the same way; count AND sum(user_id) per cell, so the hash proves cell
    MEMBERSHIP (which keys landed where), not just occupancy."""
    from kafka_topic_analyzer_spark.streaming.sketch_stream import streaming_cms_cells

    return streaming_cms_cells(spark, sf_dir)


register(
    "cms_census_streaming",
    _cms_census_streaming,
    f"""
WITH pos AS (
  SELECT user_id, CAST(t.j AS INT) AS row_j,
         {_pos_sql('user_id', 't.j', _W)} AS col_j
  FROM events, range({_D}) t(j)
)
SELECT row_j, CAST(col_j AS BIGINT) AS col_j,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(user_id) AS BIGINT) AS sum_user_id
FROM pos
GROUP BY row_j, col_j
ORDER BY row_j, col_j
""",
)
