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
    # ONE pass over the exploded corpus grams (r16, guide §2.4): a
    # broadcast LEFT join against the (distinct, hence at-most-one-match)
    # eval grams tags each gram with a hit flag, and one doc-keyed
    # aggregate yields totals AND hit counts together — the old
    # totals/hits pair planned the corpus scan+explode under each
    # consumer and then re-joined the two aggregates on doc_id.
    flagged = corpus_grams.join(
        F.broadcast(eval_grams.withColumn("_hit", F.lit(1))), "gram", "left"
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("_hit").alias("n_shared_grams"),  # count skips the NULL misses
    )
    # the decontam decision needs the RATE (drop docs above a collision
    # fraction), so report shared/total per contaminated doc
    return (
        per_doc.where(F.col("n_shared_grams") > 0)
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


# Decontamination drop rule, exact integers (float-free at the boundary):
# a doc is dropped when n_shared_grams * DEN >= n_grams * NUM, i.e. when
# >= NUM/DEN of its distinct k-grams collide with the eval set. Docs too
# short to form a single k-gram cannot be measured and are RETAINED
# (reported separately so the owner sees the blind spot).
DECONTAM_NUM = 1
DECONTAM_DEN = 5


def _decontamination_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION to benchmark_contamination's measurement: the per-source
    manifest of the decontaminated corpus — docs dropped by the collision
    gate, docs retained, tokens retained, and the unmeasurable
    (too-short-to-gram) residue. This is the artifact a pipeline owner
    attaches to a training run ('trained on X after dropping Y docs that
    collide with the benchmark').

    Scale shape: same as the detector — eval grams broadcast, corpus
    grams stream through one scan, the drop flag is a per-doc integer
    comparison (no float threshold ambiguity between engines), and the
    manifest is one source-sized map-combinable aggregate. Same
    signal->action pairing as the IVF drift audit -> re-cut tool.
    """
    from kafka_topic_analyzer_spark.functions.text import token_count

    d = load_table(spark, sf_dir, "documents")
    grams = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(F.col("text"), CONTAM_K))
        ).alias("gram"),
    )
    eval_grams = (
        grams(d.where(F.col("doc_id") < EVAL_MAX_DOC_ID)).select("gram").distinct()
    )
    corpus = d.where(F.col("doc_id") >= EVAL_MAX_DOC_ID)
    corpus_grams = grams(corpus)
    # one corpus-gram pass for totals AND hits (r16, guide §2.4) — same
    # fused broadcast-left-join shape as _benchmark_contamination; a doc
    # with grams but no collisions now carries n_shared = 0 instead of a
    # NULL from the old left join, which the coalesce below already
    # normalized, so the drop rule is value-identical
    stats = (
        corpus_grams.join(
            F.broadcast(eval_grams.withColumn("_hit", F.lit(1))), "gram", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count("_hit").cast("long").alias("n_shared"),
        )
    )
    # the >= comparison is vacuously true at n_grams=0; gate it so the
    # unmeasurable docs are RETAINED, not dropped
    dropped = (
        (
            F.coalesce("n_shared", F.lit(0)) * DECONTAM_DEN
            >= F.coalesce("n_grams", F.lit(0)) * DECONTAM_NUM
        )
        & (F.coalesce("n_grams", F.lit(0)) > 0)
    ).alias("dropped")
    per_doc = (
        corpus.select(
            "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
        )
        .join(stats, "doc_id", "left")
        .select(
            "source",
            "n_tokens",
            (F.coalesce("n_grams", F.lit(0)) == 0).alias("unmeasured"),
            dropped,
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("dropped").cast("long")).cast("long").alias("n_dropped"),
            F.sum((~F.col("dropped")).cast("long")).cast("long").alias("n_retained"),
            F.sum(F.col("unmeasured").cast("long")).cast("long").alias("n_unmeasured"),
            F.sum(
                F.when(~F.col("dropped"), F.col("n_tokens")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("tokens_retained"),
        )
        .select(
            "source",
            "n_docs",
            "n_dropped",
            "n_retained",
            "n_unmeasured",
            "tokens_retained",
            (F.floor(
                (F.col("n_retained").cast("double") / F.col("n_docs")) * F.lit(1e6)
                + F.lit(0.5)
            ) / F.lit(1e6)).alias("retention_rate"),
        )
        .orderBy(F.asc_nulls_last("source"))
    )


_NTOK_SQL = f"""CAST(CASE WHEN length(trim(text)) = 0 THEN 0
  ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)"""

register(
    "decontamination_manifest",
    _decontamination_manifest,
    f"""
WITH g AS (
  SELECT doc_id, unnest(list_distinct({_GRAMS})) AS gram FROM documents
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < {EVAL_MAX_DOC_ID}),
corpus_g AS (SELECT doc_id, gram FROM g WHERE doc_id >= {EVAL_MAX_DOC_ID}),
totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM corpus_g GROUP BY doc_id),
hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
  FROM corpus_g JOIN ev USING (gram) GROUP BY doc_id
),
per_doc AS (
  SELECT d.source,
         {_NTOK_SQL} AS n_tokens,
         COALESCE(n_grams, 0) = 0 AS unmeasured,
         (COALESCE(n_shared, 0) * {DECONTAM_DEN} >= COALESCE(n_grams, 0) * {DECONTAM_NUM})
           AND COALESCE(n_grams, 0) > 0 AS dropped
  FROM documents d
  LEFT JOIN totals ON d.doc_id = totals.doc_id
  LEFT JOIN hits ON d.doc_id = hits.doc_id
  WHERE d.doc_id >= {EVAL_MAX_DOC_ID}
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(sum(CASE WHEN dropped THEN 0 ELSE 1 END) AS BIGINT) AS n_retained,
       CAST(sum(CASE WHEN unmeasured THEN 1 ELSE 0 END) AS BIGINT) AS n_unmeasured,
       CAST(sum(CASE WHEN dropped THEN 0 ELSE n_tokens END) AS BIGINT) AS tokens_retained,
       floor((CAST(sum(CASE WHEN dropped THEN 0 ELSE 1 END) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS retention_rate
FROM per_doc
GROUP BY source
ORDER BY source NULLS LAST
""",
)
