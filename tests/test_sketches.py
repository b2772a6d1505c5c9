"""Sketch-family invariants: Count-Min one-sided error, Bloom zero false
negatives + monotone sizing, skew-forecast accounting, hash portability."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE
from kafka_topic_analyzer_spark.operators import sketches as SK
from kafka_topic_analyzer_spark.sources.tables import load_table


def test_hash32_matches_duckdb(duck):
    """The md5-prefix hash is the cross-engine contract: pin a few values."""
    import pyspark.sql.functions as F  # noqa: F811
    from kafka_topic_analyzer_spark.session import get_spark

    spark = get_spark("tests")
    keys = [0, 1, 42, 999_999_999, -7]
    for salt in (0, 2):
        df = spark.createDataFrame([(k,) for k in keys], "k: long")
        got = {
            r["k"]: r["h"]
            for r in df.select("k", SK.hash32(F.col("k"), salt).alias("h")).collect()
        }
        for k in keys:
            (want,) = duck.execute(
                f"SELECT {SK.HASH32_SQL(str(k), repr(str(salt)))}"
            ).fetchone()
            assert got[k] == want, (salt, k)


def test_cms_never_underestimates(spark):
    """CMS point estimates are one-sided: est >= exact for EVERY key."""
    e = load_table(spark, SF_SMOKE, "events")
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cells = SK.cms_cells(counts, "user_id", "cnt")
    est = SK.cms_estimates(counts, cells, "user_id")
    bad = est.where(F.col("est_cnt") < F.col("cnt")).count()
    assert bad == 0
    # and the sketch is exact when a key collides with nothing in some row
    total_cells = cells.count()
    assert total_cells <= SK.CMS_DEPTH * SK.CMS_WIDTH


def test_cms_cells_conserve_mass(spark):
    """Every CMS row partitions the corpus: sum over its counters == n rows."""
    e = load_table(spark, SF_SMOKE, "events")
    n = e.count()
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cells = SK.cms_cells(counts, "user_id", "cnt")
    per_row = {
        r["row_j"]: r["s"]
        for r in cells.groupBy("row_j").agg(F.sum("cell_total").alias("s")).collect()
    }
    assert set(per_row) == set(range(SK.CMS_DEPTH))
    assert all(v == n for v in per_row.values())


def test_cms_nonmember_probe_estimates_zero_or_min(spark):
    """Generic-API hazard pinned (advisor r13): a probe key ABSENT from
    the census must still estimate correctly — 0 when any of its d cells
    is empty, never silently dropped from the output."""
    counts = spark.createDataFrame(
        [(1, 10), (2, 20)], "user_id: long, cnt: long"
    )
    cells = SK.cms_cells(counts, "user_id", "cnt")
    # probe a key far outside the census; with 2 keys x 4 rows in a
    # 4x512 sketch, at least one of ANY third key's cells is empty with
    # overwhelming certainty — but the invariant we pin is weaker and
    # exact: the key appears in the output and est >= 0 (0 if a cell is
    # empty, a collision total otherwise; never NULL, never missing)
    probes = spark.createDataFrame([(999_999,), (1,)], "user_id: long")
    est = {r["user_id"]: r["est_cnt"] for r in SK.cms_estimates(probes, cells, "user_id").collect()}
    assert set(est) == {999_999, 1}, "non-member key dropped from output"
    assert est[1] >= 10  # member: one-sided as ever
    assert est[999_999] is not None and est[999_999] >= 0
    # and with this tiny census the non-member's min-cell is in fact 0
    assert est[999_999] == 0


def test_bloom_probe_flags_rejects_reserved_column_clash(spark):
    """bloom_probe_flags refuses a fact frame already carrying one of its
    temp column names instead of silently corrupting it (advisor r13)."""
    import pytest

    dim = spark.createDataFrame([(1,)], "k: long")
    bloom = SK.bloom_positions(dim, "k")
    fact = spark.createDataFrame([(1, 7)], "k: long, _bp0: long")
    with pytest.raises(ValueError, match="_bp0"):
        SK.bloom_probe_flags(fact, "k", bloom)


def test_bloom_no_false_negatives_and_monotone(spark):
    """Members always pass; larger m never admits more false positives
    than are observed at saturation (fp monotone non-increasing in m)."""
    cust = load_table(spark, SF_SMOKE, "customer")
    dim = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey").distinct()
    orders = load_table(spark, SF_SMOKE, "orders").select("o_custkey")
    member_keys = {r["c_custkey"] for r in dim.collect()}
    fp_by_m = {}
    # The monotonicity assertion below is only GUARANTEED because the
    # swept sizes are nested powers of two: when m1 | m2, pos mod m1 is
    # determined by pos mod m2, so every bit set at m2 collapses onto a
    # set bit at m1 and a key passing at m2 must pass at m1 — FP counts
    # are deterministically non-increasing. With non-dividing sizes the
    # claim is only probabilistic and this test would be flaky (advisor
    # r13); the assert pins the precondition against future edits.
    sweep = (256, 1024, 4096)
    for a, b in zip(sweep, sweep[1:]):
        assert b % a == 0, "bloom m sweep must be nested moduli (m1 | m2)"
    for m in sweep:
        bloom = SK.bloom_positions(dim, "c_custkey", m=m)
        flags = SK.bloom_probe_flags(orders, "o_custkey", bloom, m=m)
        rows = flags.select("o_custkey", "bloom_pass").collect()
        missed = [r for r in rows if r["o_custkey"] in member_keys and not r["bloom_pass"]]
        assert missed == [], f"false negative at m={m}"
        fp_by_m[m] = sum(
            1 for r in rows if r["bloom_pass"] and r["o_custkey"] not in member_keys
        )
    assert fp_by_m[256] >= fp_by_m[1024] >= fp_by_m[4096]


def test_skew_forecast_accounting(spark):
    """Forecast columns are internally consistent: contribution = n^2,
    shares bounded by 10000 bp, and total matches the census."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    top = SK.selfjoin_skew_forecast(li, "l_partkey", top_n=10)
    rows = top.collect()
    assert 0 < len(rows) <= 10
    total = rows[0]["total_pairs"]
    exact_total = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("t"))
        .collect()[0]["t"]
    )
    assert total == exact_total
    for r in rows:
        assert r["pair_contribution"] == r["n_rows"] * r["n_rows"]
        assert 0 <= r["share_bp"] <= 10000
        assert r["total_pairs"] == total
    # descending contribution, key tie-break
    contribs = [(r["pair_contribution"], r["l_partkey"]) for r in rows]
    assert contribs == sorted(contribs, key=lambda t: (-t[0], t[1]))


def test_streaming_cms_equals_batch(spark):
    """The streaming-maintained cell relation is bit-equal to the batch
    aggregation of the same positions (count AND sum of user_id)."""
    from kafka_topic_analyzer_spark.streaming.sketch_stream import streaming_cms_cells

    got = {
        (r["row_j"], r["col_j"]): (r["n_events"], r["sum_user_id"])
        for r in streaming_cms_cells(spark, SF_SMOKE).collect()
    }
    e = load_table(spark, SF_SMOKE, "events")
    rc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("row_j"),
                    F.pmod(SK.hash32(F.col("user_id"), j), F.lit(SK.CMS_WIDTH)).alias(
                        "col_j"
                    ),
                )
                for j in range(SK.CMS_DEPTH)
            ]
        )
    ).alias("rc")
    want = {
        (r["row_j"], r["col_j"]): (r["n"], r["s"])
        for r in e.select(rc, "user_id")
        .select("rc.row_j", "rc.col_j", "user_id")
        .groupBy("row_j", "col_j")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum("user_id").cast("long").alias("s"))
        .collect()
    }
    assert got == want


def test_runtime_bloom_filter_injects_on_this_join_shape(spark):
    """bloom_join_pruning is the explicit, auditable form of Spark's AQE
    runtime bloom filter. Pin that the built-in DOES inject a
    bloom_filter_agg / BloomFilterMightContain pair on exactly this join
    shape (selective dim -> fact) once the application side crosses the
    size threshold — on the small fixture we lower the threshold; at
    warehouse scale the default (10 GB scan) triggers naturally.

    All three knobs are runtime SQL confs: set on the shared session and
    restored after, so nothing leaks into other tests.
    """
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").where(
            F.col("c_mktsegment") == "BUILDING"
        )
        o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        j = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert j.count() > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
