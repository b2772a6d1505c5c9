"""Window-twin ladder: exact per-partition window vs two-level scan.

The r8 scalable twins (operators/ranks.py) claim to remove the
one-task-per-group bottleneck of corpus-sized window partitions. This
probe MEASURES that on the lateness shape (the worst case: a Kafka
partition is one window group), at replicated-log scale:

* wall seconds for the full lateness profile, exact window vs
  prefix_max_scalable twin (ambient-load-dependent on a shared VM), and
* the LOAD-INSENSITIVE structural number: max rows any single task of
  the running-max stage received (the skew-ladder discipline — on a
  cluster the exact form's straggler IS the job wall time).

Replication extends each partition's offset range (offset*R + rep), so
the running max stays a genuine prefix scan over R× longer partitions.
Both forms' final profiles are asserted EQUAL before anything is timed.

Usage: python tools/window_twin_probe.py [sf_dir] [reps-csv]
Emits one JSON line {"metric": "window_twin_ladder", "rungs": [...]} —
quoted in SCALING.md per round.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [100, 400]

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.operators.ranks import prefix_max_scalable
    from kafka_topic_analyzer_spark.queries.kafka_core import (
        _lateness_col,
        _lateness_rollup,
    )
    from kafka_topic_analyzer_spark.session import get_spark
    from kafka_topic_analyzer_spark.sources.events_log import (
        kafka_frame_from_events,
    )

    spark = get_spark("window-twin-probe")
    base = kafka_frame_from_events(spark, sf_dir).select(
        "partition", "offset", "timestamp_ms"
    )

    def ts_ok():
        return F.when(F.col("timestamp_ms") > 0, F.col("timestamp_ms"))

    def exact_runmax(df):
        w = (
            Window.partitionBy("partition")
            .orderBy("offset")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return df.withColumn("run_max", F.max(ts_ok()).over(w))

    def twin_runmax(df):
        return prefix_max_scalable(df, "partition", "offset", ts_ok(), "run_max")

    def profile(runmax_df):
        return _lateness_rollup(
            runmax_df.select(
                "partition",
                F.col("timestamp_ms"),
                _lateness_col(F.col("run_max")).alias("late_ms"),
            )
        )

    def max_task_rows(runmax_df) -> int:
        # rows per task at the running-max stage: pid stamped on the
        # window's/twin's own output partitioning, before any later
        # exchange (the structural straggler number). The aggregate MUST
        # reference run_max: a bare count lets column pruning delete the
        # whole window/scan pipeline and stamp pid on the file scan.
        rows = (
            runmax_df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("n"), F.max("run_max").alias("_keep"))
            .collect()
        )
        print(f"#   tasks={len(rows)}", file=sys.stderr)
        return max(r["n"] for r in rows)

    out = []
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled")
    for rep in reps:
        big = (
            base.select(
                "partition",
                F.explode(F.expr(f"sequence(0, {rep - 1})")).alias("rep"),
                "offset",
                "timestamp_ms",
            )
            .withColumn("offset", F.col("offset") * rep + F.col("rep"))
            .drop("rep")
        )
        work = tempfile.mkdtemp(prefix="window_twin_")
        try:
            path = os.path.join(work, "log")
            big.repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(path)
            log = spark.read.parquet(path)
            n = log.count()

            # equality first: the twin must be the same computation
            ex = {tuple(r) for r in profile(exact_runmax(log)).collect()}
            tw = {tuple(r) for r in profile(twin_runmax(log)).collect()}
            assert ex == tw, "twin diverged from exact window"

            rung = {"rows": n}
            for label, fn in (("exact_window", exact_runmax), ("twin", twin_runmax)):
                t0 = time.perf_counter()
                profile(fn(log)).collect()
                rung[label] = {"wall_sec": round(time.perf_counter() - t0, 2)}
            # structural: AQE off (no coalescing blur) at a cluster-
            # realistic 512 shuffle partitions — at the session's 32,
            # one hash partition holds a whole group for BOTH forms and
            # the per-group ceiling is invisible (skew-ladder
            # discipline, bench.py). The exact window can never split a
            # group below group size no matter how many partitions; the
            # twin's (group, shard) cells can.
            from kafka_topic_analyzer_spark.session import (
                scoped_shuffle_partitions,
            )

            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                with scoped_shuffle_partitions(spark, 512):
                    for label, fn in (
                        ("exact_window", exact_runmax),
                        ("twin", twin_runmax),
                    ):
                        rung[label]["max_task_rows"] = max_task_rows(fn(log))
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
            rung["straggler_reduction"] = round(
                rung["exact_window"]["max_task_rows"]
                / max(rung["twin"]["max_task_rows"], 1),
                2,
            )
            out.append(rung)
            print(f"# {rung}", file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"metric": "window_twin_ladder", "rungs": out}))


if __name__ == "__main__":
    main()
