"""BPE train/encode scale probe: train stays vocabulary-sized, encode
scales with the scan, as the corpus grows 16x.

Replicates the documents corpus (disjoint doc_ids) to each rung,
materializes it to parquet (untimed), then times (a) the 10-merge trainer
and (b) the full encode query on the stored corpus, best of 2. The
trainer's wall time must stay FLAT across rungs once the fixture's
vocabulary saturates (Heaps' law — replication adds no new word forms);
encode time may grow with the scan but sub-linearly vs the 16x data
growth on a box with idle cores.

    python tools/bpe_scale_probe.py [sf_dir] [rungs_csv]

Run on an idle machine; one JSON line on stdout (quoted in SCALING.md).
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
        else [5_000, 20_000, 80_000]
    )

    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.queries.terms import (
        BPE_N_MERGES,
        _bpe_symbolized_vocab,
        _bpe_train_state,
    )
    from kafka_topic_analyzer_spark.session import get_spark
    from kafka_topic_analyzer_spark.sources.tables import load_table

    spark = get_spark("bpe-scale-probe")
    base = load_table(spark, sf_dir, "documents")
    n_base, max_id = base.agg(F.count(F.lit(1)), F.max("doc_id")).first()
    id_shift = (max_id or 0) + 1

    def timed_train(docs):
        """Returns (best train seconds, merge log, MATERIALIZED final vocab).

        The final state is localCheckpoint'ed so timed_encode measures
        ONLY the serving path (vocab join + aggregation) — not a lazy
        re-derivation of training (advisor r6: the two metrics were
        conflated when encode re-ran the trainer inside its timer)."""
        best, merges, final = float("inf"), None, None
        for _ in range(2):
            t0 = time.perf_counter()
            m, f = _bpe_train_state(_bpe_symbolized_vocab(docs), BPE_N_MERGES)
            f = f.localCheckpoint(eager=True)
            best = min(best, time.perf_counter() - t0)
            merges, final = m, f
        return best, merges, final

    def timed_encode(docs, final):
        """Time the encode half alone: join exploded tokens to the
        pre-trained (checkpointed) vocab and aggregate."""
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            s2 = "··"
            vocab = final.select(
                "word",
                F.size(
                    F.split(F.expr("substring(sym, 2, length(sym)-2)"), s2)
                ).cast("long").alias("n_syms"),
            )
            from kafka_topic_analyzer_spark.functions.text import tokens

            doc_words = docs.select(
                "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("word")
            )
            enc = doc_words.join(vocab, "word", "left")
            enc.agg(
                F.sum(F.coalesce("n_syms", F.length("word").cast("long")))
            ).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    out = []
    for target in rungs:
        repl = max(1, target // max(n_base, 1))
        big = (
            base.select("*", F.explode(F.expr(f"sequence(0, {repl - 1})")).alias("rep"))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(id_shift))
            .drop("rep")
        )
        work = tempfile.mkdtemp(prefix="bpe_probe_")
        try:
            path = os.path.join(work, "documents")
            big.repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(path)
            stored = spark.read.parquet(path)
            n_docs = stored.count()
            train_sec, merges, final = timed_train(stored)
            encode_sec = timed_encode(stored, final)
            out.append(
                {
                    "docs": n_docs,
                    "train_sec": round(train_sec, 2),
                    "encode_sec": round(encode_sec, 2),
                    "merges": [m[4] for m in merges],
                }
            )
            print(f"# {n_docs} docs: train {train_sec:.2f}s encode {encode_sec:.2f}s",
                  file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"metric": "bpe_scale_ladder", "rungs": out}))


if __name__ == "__main__":
    main()
