"""Production-depth BPE: a real ~30k-merge training run, timed.

The r6 verdict named the gap: a production tokenizer needs ~30k merges
and one-Spark-job-per-merge cannot get there. The hybrid engine
(operators/bpe.py) can: this probe builds the richest fused corpus the
fixture pool supports — adjacent-token TRIGRAMS (~27k distinct compound
forms, ~350k symbols) — runs the distributed census, then trains to a
30,000-merge budget in the driver-local incremental loop and reports
wall time, merges completed (early-stops if the vocabulary exhausts
first), and the greedy-count profile.

Usage: python tools/bpe_depth_probe.py [sf_dir] [n_merges]
Emits one JSON line {"metric": "bpe_depth_probe", ...} for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000

    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.functions.text import tokens
    from kafka_topic_analyzer_spark.operators.bpe import bpe_local_merge_loop
    from kafka_topic_analyzer_spark.session import get_spark
    from kafka_topic_analyzer_spark.sources.tables import load_table

    spark = get_spark("bpe-depth-probe")
    d = load_table(spark, sf_dir, "documents")

    t0 = time.perf_counter()
    grams = (
        d.select(tokens(F.lower(F.col("text"))).alias("toks"))
        .where(F.size("toks") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks)-2),"
                    " i -> concat(toks[i-1], '_', toks[i], '_', toks[i+1]))"
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = [(r["word"], r["wc"]) for r in grams.collect()]
    census_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    merges, final = bpe_local_merge_loop(vocab, n_merges)
    train_sec = time.perf_counter() - t0

    n_syms_total = sum(n for _, n, _ in final)
    print(
        json.dumps(
            {
                "metric": "bpe_depth_probe",
                "sf_dir": sf_dir,
                "vocab_forms": len(vocab),
                "census_sec": round(census_sec, 2),
                "merge_budget": n_merges,
                "merges_done": len(merges),
                "train_sec": round(train_sec, 2),
                "first_count": merges[0][3] if merges else None,
                "last_count": merges[-1][3] if merges else None,
                "final_symbols": n_syms_total,
            }
        )
    )


if __name__ == "__main__":
    main()
