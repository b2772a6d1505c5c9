"""Report-throughput scale ladder: does msg/s hold as the log grows 16x?

Replicates the events-derived log to N stored rows for each rung, writes it
as parquet with a production file layout (2 files per core), then times the
full report (per-partition + global + alive keys) twice and keeps the best.
Linear scaling == flat-or-rising msg/s across rungs; a falling curve would
mean some per-row cost grows with input (the thing SCALING.md claims cannot
happen: the rollup shuffles O(partitions), not O(messages)).

    python tools/scale_ladder.py [sf_dir] [rungs_csv]

Run on an idle machine; results land on stdout as one JSON line (quoted in
SCALING.md).
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
    rungs = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [10_000_000, 40_000_000, 160_000_000]
    )

    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.operators.report import full_report
    from kafka_topic_analyzer_spark.session import get_spark
    from kafka_topic_analyzer_spark.sources.events_log import kafka_frame_from_events

    spark = get_spark("scale-ladder")
    kdf = kafka_frame_from_events(spark, sf_dir)
    n_base = kdf.count()
    n_files = spark.sparkContext.defaultParallelism * 2

    out = []
    for target in rungs:
        repl = max(1, target // max(n_base, 1))
        big = (
            kdf.select("*", F.explode(F.expr(f"sequence(0, {repl - 1})")).alias("rep"))
            .withColumn("offset", F.col("offset") * repl + F.col("rep"))
            .drop("rep")
        )
        big_dir = tempfile.mkdtemp(prefix="ladder_")
        path = os.path.join(big_dir, "log")
        try:
            big.repartition(n_files).write.mode("overwrite").parquet(path)
            stored = spark.read.parquet(path)
            rows = stored.count()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                full_report(stored).collect()
                best = min(best, time.perf_counter() - t0)
            out.append(
                {
                    "rows": rows,
                    "sec": round(best, 3),
                    "msgs_per_sec": round(rows / best, 1),
                }
            )
            print(f"# {rows} rows: {best:.2f}s = {rows/best/1e6:.1f}M msg/s", file=sys.stderr)
        finally:
            shutil.rmtree(big_dir, ignore_errors=True)
    print(json.dumps({"sf_dir": sf_dir, "rungs": out}))


if __name__ == "__main__":
    main()
