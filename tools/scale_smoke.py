"""Scale smoke: run the heavy dedup/similarity operators on a corpus
replicated well past fixture size, and report wall times + output volumes.

Reproduces the measured numbers quoted in SCALING.md (run on an idle
machine — the shared VM's ambient load swings results):

    python tools/scale_smoke.py [replication] [sf_dir]

Replication clones the documents table R times with disjoint doc_id
ranges; replica 0 keeps the original text, later replicas keep text
verbatim — i.e. every doc gains R-1 exact clones, the adversarial
high-duplication profile (pair output grows quadratically per clone
group, which is the cost that dominates real dedup runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import Window, functions as F

    from kafka_topic_analyzer_spark.operators import dedup as D
    from kafka_topic_analyzer_spark.session import get_spark, prepare_session
    from kafka_topic_analyzer_spark.sources.tables import load_table

    spark = prepare_session(get_spark("scale-smoke"))
    base = load_table(spark, sf_dir, "documents")
    # shift replicas by max(doc_id)+1 — collision-free for sparse or
    # non-zero-based fixture ids too (same fix as bench.py)
    max_id = base.agg(F.max("doc_id")).first()[0]
    id_shift = (max_id or 0) + 1
    docs = (
        base.select(
            "*", F.explode(F.expr(f"sequence(0, {repl - 1})")).alias("rep")
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(id_shift))
        .drop("rep")
        .localCheckpoint(eager=True)  # freeze the corpus; time operators only
    )
    n_docs = docs.count()
    results: dict[str, dict[str, float | int]] = {}

    def run(name, fn):
        import gc

        gc.collect()
        t0 = time.time()
        out = fn()
        results[name] = {"seconds": round(time.time() - t0, 2), "rows": out}
        print(f"# {name}: {results[name]}", file=sys.stderr)

    run("exact_dup_clusters", lambda: D.exact_dup_clusters(docs).count())
    # On a heavily-cloned corpus the df cap and the clone multiplicity
    # fight: every clone inflates shingle df, so at 20x replication the
    # df<=50 cap admits almost nothing (measured: 0 candidate pairs),
    # while raising the cap to compensate re-opens the quadratic posting
    # self-join the cap exists to prevent (measured: GC-thrash at
    # max_df=1000). The production order is exact dedup FIRST — clones
    # collapse to one canonical before any near-dup pass — so the smoke
    # measures the inverted-index operators the way the shard pipeline
    # runs them.
    run(
        "tfidf_cosine_pairs_raw_capped",
        lambda: D.tfidf_cosine_pairs(docs, k=3, threshold=(4, 5), max_df=50).count(),
    )
    canon = (
        docs.withColumn("fp", F.md5(F.coalesce(F.col("text"), F.lit(""))))
        .withColumn(
            "keep",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .where(F.col("keep") == 1)
        .drop("fp", "keep")
        .localCheckpoint(eager=True)
    )
    results["canonical_docs"] = {"seconds": 0.0, "rows": canon.count()}
    run(
        "tfidf_cosine_pairs_after_dedup",
        lambda: D.tfidf_cosine_pairs(canon, k=3, threshold=(4, 5), max_df=50).count(),
    )
    run(
        "jaccard_pairs",
        lambda: D.near_dup_pairs_jaccard(docs, k=3, threshold=0.7, max_df=50).count(),
    )
    print(
        json.dumps(
            {"n_docs": n_docs, "replication": repl, "sf_dir": sf_dir, "ops": results}
        )
    )


if __name__ == "__main__":
    main()
