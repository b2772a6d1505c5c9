"""Window-free rank/prefix-scan twins (operators/ranks.py).

Each twin shares its exact-window sibling's oracle SQL verbatim, so the
driver/selfcheck hash already proves equivalence at sf0.01/sf0.1; these
tests add the sf0.001 row-for-row pin, the plan-shape claims (the
parallelism is real, not asserted), and the ntile quota arithmetic on
totals the fixture can't produce (total % 10 != 0 and total < 10).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

PAIRS = [
    ("event_lateness_profile", "event_lateness_profile_scalable"),
    ("balance_deciles", "balance_deciles_scalable"),
    ("top3_customers_per_segment", "top3_customers_per_segment_scalable"),
    ("per_group_sample", "per_group_sample_scalable"),
]


@pytest.mark.parametrize("exact,twin", PAIRS)
def test_twin_equals_exact_window(spark, exact, twin):
    import __spark_entry__ as E

    qs = E.queries()
    a = sorted(tuple(r) for r in qs[exact](spark, SF_SMOKE).collect())
    b = sorted(tuple(r) for r in qs[twin](spark, SF_SMOKE).collect())
    assert a == b
    assert a, f"{exact} must be non-empty"


def _plan(spark, name):
    import __spark_entry__ as E

    return (
        E.queries()[name](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_lateness_twin_shards_the_partition_scan(spark):
    plan = _plan(spark, "event_lateness_profile_scalable")
    assert "_shard" in plan  # the running max windows on (partition, _shard)
    assert "BroadcastHashJoin" in plan  # lims + shard bases come back broadcast
    assert "CartesianProduct" not in plan


def test_deciles_twin_range_partitions_the_rank(spark):
    plan = _plan(spark, "balance_deciles_scalable")
    assert "_pid" in plan  # local row_number per range shard
    assert "rangepartitioning" in plan.lower()
    assert "ntile" not in plan.lower()  # the global-sort window is gone
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "twin", ["top3_customers_per_segment_scalable", "per_group_sample_scalable"]
)
def test_topk_twin_prunes_locally(spark, twin):
    plan = _plan(spark, twin)
    assert "_pid" in plan  # local per-task top-k prune before the exact window
    assert "CartesianProduct" not in plan


def test_keyword_search_uses_distributed_topk(spark):
    plan = _plan(spark, "keyword_search")
    assert "TakeOrderedAndProject" in plan  # no global row_number window


def test_ntile_quota_arithmetic_all_residues(spark):
    """The scalable decile formula must equal F.ntile(10) for totals
    covering every residue class mod 10 AND totals below 10 — the
    fixture's 1500 customers only exercise residue 0."""
    from kafka_topic_analyzer_spark.operators.ranks import global_ranks_scalable

    for total in [1, 3, 7, 10, 11, 12, 19, 23, 40, 57]:
        df = spark.range(total).select(F.col("id").alias("k"))
        w = Window.orderBy(F.col("k").asc())
        expected = {
            r["k"]: r["d"]
            for r in df.select("k", F.ntile(10).over(w).alias("d")).collect()
        }
        ranked = global_ranks_scalable(df, [F.col("k").asc()], shards=4)
        formula = F.expr(
            "CAST(CASE WHEN rank <= (total % 10) * (total div 10 + 1)"
            " THEN (rank - 1) div (total div 10 + 1) + 1"
            " ELSE (total % 10)"
            "      + (rank - (total % 10) * (total div 10 + 1) - 1)"
            "        div greatest(total div 10, 1) + 1"
            " END AS INT)"
        )
        got = {
            r["k"]: r["d"]
            for r in ranked.select("k", formula.alias("d")).collect()
        }
        assert got == expected, f"total={total}"


def test_global_ranks_scalable_is_exact_rownumber(spark):
    """Rank must be an exact 1..N permutation matching the window's
    row_number under the same total order, for shard counts that both
    divide and straddle the row count."""
    from kafka_topic_analyzer_spark.operators.ranks import global_ranks_scalable

    df = spark.range(101).select(
        (F.col("id") * 37 % 101).alias("k"), F.col("id").alias("uid")
    )
    w = Window.orderBy(F.col("k").asc(), F.col("uid").asc())
    expected = {
        (r["k"], r["uid"]): r["r"]
        for r in df.select("k", "uid", F.row_number().over(w).alias("r")).collect()
    }
    # 257 > row count exercises empty range shards; None is the
    # cluster-derived default (max(32, defaultParallelism), r9)
    for shards in (1, 7, 32, 257, None):
        got = {
            (r["k"], r["uid"]): r["rank"]
            for r in global_ranks_scalable(
                df, [F.col("k").asc(), F.col("uid").asc()], shards=shards
            ).collect()
        }
        assert got == expected, f"shards={shards}"


def test_prefix_max_shard_counts_including_default(spark):
    """Shard boundaries never change prefix-max results: sweep fixed
    counts that divide, straddle, and exceed the per-group row count,
    plus the cluster-derived default (r9)."""
    from kafka_topic_analyzer_spark.operators.ranks import prefix_max_scalable

    rows = [(g, i, (i * 7 + g) % 13 if i % 4 else None) for g in range(3) for i in range(40)]
    df = spark.createDataFrame(rows, "g int, o int, v long")
    w = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    expected = {
        (r["g"], r["o"]): r["m"]
        for r in df.select("g", "o", F.max("v").over(w).alias("m")).collect()
    }
    for shards in (1, 7, 32, 257, None):
        got = {
            (r["g"], r["o"]): r["run"]
            for r in prefix_max_scalable(
                df, "g", "o", F.col("v"), "run", shards=shards
            ).collect()
        }
        assert got == expected, f"shards={shards}"


def test_global_ranks_correct_without_exchange_reuse(spark):
    """The advisor-r8 failure scenario: with exchange reuse disabled the
    two consumers of the range-repartitioned frame would re-sample range
    boundaries independently and base+local could duplicate/skip ranks.
    The localCheckpoint makes the shared partitioning structural — the
    rank must stay an exact 1..N permutation with reuse OFF."""
    from kafka_topic_analyzer_spark.operators.ranks import global_ranks_scalable

    key = "spark.sql.exchange.reuse"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        df = spark.range(500).select(
            (F.col("id") * 131 % 499).alias("k"), F.col("id").alias("uid")
        )
        got = sorted(
            r["rank"]
            for r in global_ranks_scalable(
                df, [F.col("k").asc(), F.col("uid").asc()], shards=7
            ).collect()
        )
        assert got == list(range(1, 501))
    finally:
        spark.conf.set(key, old)


def test_default_shards_is_cluster_derived(spark):
    from kafka_topic_analyzer_spark.operators.ranks import _default_shards

    df = spark.range(1)
    assert _default_shards(df) == max(
        32, spark.sparkContext.defaultParallelism
    )


def test_reserved_temp_name_collision_raises(spark):
    """A caller column named like an internal temp would be silently
    overwritten then dropped (advisor r8) — the operators must refuse."""
    import pytest

    from kafka_topic_analyzer_spark.operators.ranks import (
        global_ranks_scalable,
        prefix_max_scalable,
        topk_per_group,
    )

    df = spark.createDataFrame([(1, 2)], "g int, _pid int")
    with pytest.raises(ValueError, match="_pid"):
        topk_per_group(df, ["g"], [F.col("_pid").asc()], 3)
    with pytest.raises(ValueError, match="_pid"):
        global_ranks_scalable(df, [F.col("g").asc()])
    df2 = spark.createDataFrame([(1, 2, 3)], "g int, o int, _shard int")
    with pytest.raises(ValueError, match="_shard"):
        prefix_max_scalable(df2, "g", "o", F.col("o"), "run")


def test_prefix_max_handles_all_null_prefixes(spark):
    """Rows before the first non-null value must get a NULL running max
    in the twin exactly as in the window form — including across shard
    boundaries (a shard whose every value is null contributes no base)."""
    from kafka_topic_analyzer_spark.operators.ranks import prefix_max_scalable

    rows = [(0, i, None if i < 5 or i % 3 == 0 else i * 10) for i in range(12)]
    rows += [(1, i, None) for i in range(6)]  # a group with NO values at all
    df = spark.createDataFrame(rows, "g int, o int, v long")
    w = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    expected = {
        (r["g"], r["o"]): r["m"]
        for r in df.select("g", "o", F.max("v").over(w).alias("m")).collect()
    }
    got = {
        (r["g"], r["o"]): r["run"]
        for r in prefix_max_scalable(
            df, "g", "o", F.col("v"), "run", shards=4
        ).collect()
    }
    assert got == expected


def test_packed_offsets_autoscale_shards(spark):
    """shards=None derives the shard count from the input row count
    (~1M rows/shard, min 32) plan-side; results are bit-identical to
    any explicit shard count, and the auto split actually uses >= 32
    shards on the fixture (balance, not correctness, is what changes)."""
    from kafka_topic_analyzer_spark.operators.pipeline import (
        packed_offsets_scalable,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", F.length("text").cast("long").alias("n_tokens")
    )
    auto = packed_offsets_scalable(d, "source", "doc_id", "n_tokens")
    fixed = packed_offsets_scalable(d, "source", "doc_id", "n_tokens", shards=7)
    key = lambda r: (r["source"], r["doc_id"])
    a = {key(r): r["token_start"] for r in auto.collect()}
    b = {key(r): r["token_start"] for r in fixed.collect()}
    assert a == b
    # the auto shard expression must appear in the plan (computed from _cnt)
    plan = auto._jdf.queryExecution().optimizedPlan().toString()
    assert "_cnt" in plan


# ---- property-based equivalence (hypothesis) ----

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 3),          # group
                st.integers(-50, 50),       # order value (ties likely)
                st.integers(0, 5),          # weight-ish payload
            ),
            min_size=0,
            max_size=60,
        ),
        k=st.integers(1, 4),
        shards=st.sampled_from([1, 3, 8]),
    )
    def test_rank_ops_match_windows_property(spark, rows, k, shards):
        """topk_per_group / global_ranks_scalable == their window forms on
        arbitrary small frames — including ties in the order value (a
        unique uid tiebreaker completes the total order, the operators'
        documented contract) and empty inputs."""
        from kafka_topic_analyzer_spark.operators.ranks import (
            global_ranks_scalable,
            topk_per_group,
        )

        data = [(g, v, w, i) for i, (g, v, w) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "g int, v int, w int, uid int"
        ) if data else spark.createDataFrame([], "g int, v int, w int, uid int")
        order = [F.desc("v"), F.asc("uid")]

        w_top = Window.partitionBy("g").orderBy(*order)
        expect_top = {
            (r["g"], r["uid"]): r["rk"]
            for r in df.withColumn("rk", F.row_number().over(w_top))
            .where(F.col("rk") <= k)
            .collect()
        }
        got_top = {
            (r["g"], r["uid"]): r["rank"]
            for r in topk_per_group(df, ["g"], order, k).collect()
        }
        assert got_top == expect_top

        w_glob = Window.orderBy(*order)
        expect_glob = {
            r["uid"]: r["rk"]
            for r in df.withColumn("rk", F.row_number().over(w_glob)).collect()
        }
        got_glob = {
            r["uid"]: r["rank"]
            for r in global_ranks_scalable(df, order, shards=shards).collect()
        }
        assert got_glob == expect_glob

except ImportError:  # pragma: no cover - hypothesis is baked in per TESTDATA
    pass
