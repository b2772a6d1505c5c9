"""Benchmark-contamination detection: which corpus documents share long
word n-grams with an evaluation set — the decontamination pass every
serious training-data pipeline runs before training (published recipes use
8-13-gram collision; k=8 here because the fixture docs are short).

Spark shape: the eval set's distinct grams are a broadcast-joined filter
on the exploded corpus grams — at 100 TB the corpus side streams through
the scan once, the eval side is tiny by definition (benchmarks are small),
and the only shuffle is the per-doc hit count. The stand-in eval set is
``doc_id < 20`` (a real deployment passes the benchmark corpus as the
second table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.functions.text import word_shingles
from kafka_topic_analyzer_spark.registry import register
from kafka_topic_analyzer_spark.sources.tables import load_table

CONTAM_K = 8  # words per gram
EVAL_MAX_DOC_ID = 50  # fixture stand-in benchmark: doc_id < 50


def _benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    grams = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.explode(F.array_distinct(word_shingles(F.col("text"), CONTAM_K))).alias("gram"),
    )
    eval_grams = (
        grams(d.where(F.col("doc_id") < EVAL_MAX_DOC_ID)).select("gram").distinct()
    )
    corpus_grams = grams(d.where(F.col("doc_id") >= EVAL_MAX_DOC_ID))
    totals = corpus_grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    # the decontam decision needs the RATE (drop docs above a collision
    # fraction), so report shared/total per contaminated doc
    return (
        hits.join(totals, "doc_id")
        .select(
            "doc_id",
            "n_shared_grams",
            "n_grams",
            F.round(
                F.col("n_shared_grams").cast("double") / F.col("n_grams"), 6
            ).alias("contamination_rate"),
        )
        .orderBy("doc_id")
    )


_TOKS = r"""CASE WHEN length(trim(lower(text))) = 0 THEN []
            ELSE string_split_regex(trim(lower(text)), '\s+') END"""
_GRAMS = f"""CASE WHEN len({_TOKS}) < {CONTAM_K} THEN []
    ELSE [array_to_string(({_TOKS})[i + 1 : i + {CONTAM_K}], ' ')
          FOR i IN range(0, len({_TOKS}) - {CONTAM_K - 1})] END"""

register(
    "benchmark_contamination",
    _benchmark_contamination,
    f"""
WITH g AS (
  SELECT doc_id, unnest(list_distinct({_GRAMS})) AS gram FROM documents
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < {EVAL_MAX_DOC_ID}),
corpus AS (SELECT doc_id, gram FROM g WHERE doc_id >= {EVAL_MAX_DOC_ID}),
totals AS (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY doc_id),
hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
  FROM corpus JOIN ev USING (gram) GROUP BY doc_id
)
SELECT doc_id, n_shared_grams, CAST(n_grams AS BIGINT) AS n_grams,
       round(CAST(n_shared_grams AS DOUBLE) / n_grams, 6) AS contamination_rate
FROM hits JOIN totals USING (doc_id)
ORDER BY doc_id
""",
)
