"""Similarity-search queries over ``embeddings`` (LLM-pipeline operators).

Brute-force cosine top-k is oracle-matched: both engines do the identical
sequential double fold (Spark ``aggregate`` == DuckDB ``list_reduce``), so
rounded scores hash-match. The LSH ANN variant is the scale path with a
rows-only check + recall unit test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.operators import similarity as S
from kafka_topic_analyzer_spark.registry import register
from kafka_topic_analyzer_spark.sources.tables import load_table

N_QUERIES = 10  # vectors with vec_id < 10 act as the query set
TOP_K = 5

# DuckDB mirror of functions/vectors.py: dot as sequential fold over doubles
_DOT = """list_reduce(
    list_prepend(CAST(0 AS DOUBLE),
      list_transform({a}, (x, i) -> CAST(x AS DOUBLE) * CAST({b}[i] AS DOUBLE))),
    (acc, x) -> acc + x)"""


def _dot_sql(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


def _knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return S.knn_bruteforce(emb, queries, k=TOP_K)


register(
    "knn_bruteforce_cosine",
    _knn_bruteforce,
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
    round(
      CASE WHEN sqrt({_dot_sql("q_emb", "q_emb")}) > 0
            AND sqrt({_dot_sql("c_emb", "c_emb")}) > 0
           THEN {_dot_sql("q_emb", "c_emb")}
                / (sqrt({_dot_sql("q_emb", "q_emb")}) * sqrt({_dot_sql("c_emb", "c_emb")}))
      END, 6) AS score
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, score FROM ranked WHERE rank <= {TOP_K}
""",
)


def _knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return S.knn_lsh(emb, queries, k=TOP_K, dim=64, bits=4, tables=8)


# rows-only: ANN recall is probabilistic by design; unit tests measure it
# against knn_bruteforce_cosine.
register("knn_lsh_cosine", _knn_lsh, None)


def _knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return S.knn_ivf(emb, queries, k=TOP_K, nlist=16, nprobe=4)


# rows-only: the IVF cut (k-means cells) isn't SQL-expressible; recall is
# unit-tested against knn_bruteforce_cosine like the LSH path.
register("knn_ivf_cosine", _knn_ivf, None)


def _embedding_self_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine corpus stats on a bounded slice (near-dup screening).

    Bounded to vec_id < 100 so the exact pair count stays ~5k at any sf —
    the all-pairs version at scale is exactly what knn_lsh avoids.
    """
    from kafka_topic_analyzer_spark.functions.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    a = emb.select(F.col("vec_id").alias("i"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("j"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("i") < F.col("j")).select(
        F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("score")
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum(F.col("score").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6).alias("mean_cosine"),
        F.max("score").alias("max_cosine"),
        F.min("score").alias("min_cosine"),
    )


register(
    "embedding_pair_stats",
    _embedding_self_join_stats,
    f"""
WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
pairs AS (
  SELECT round(
    CASE WHEN sqrt({_dot_sql("a.embedding", "a.embedding")}) > 0
          AND sqrt({_dot_sql("b.embedding", "b.embedding")}) > 0
         THEN {_dot_sql("a.embedding", "b.embedding")}
              / (sqrt({_dot_sql("a.embedding", "a.embedding")}) * sqrt({_dot_sql("b.embedding", "b.embedding")}))
    END, 6) AS score
  FROM sub a JOIN sub b ON a.vec_id < b.vec_id
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_cosine,
       max(score) AS max_cosine,
       min(score) AS min_cosine
FROM pairs
""",
)


def _embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantize every embedding (functions/vectors.py quantize_int8).
    The int8 array is emitted as a CSV string so the value-hash compare is
    representation-stable across engines."""
    from kafka_topic_analyzer_spark.functions.vectors import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    scale, q = quantize_int8(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.concat_ws(",", F.transform(q, lambda x: x.cast("string"))).alias("qvec"),
    ).orderBy("vec_id")


register(
    "embedding_quantization",
    _embedding_quantization,
    """
WITH x AS (
  SELECT vec_id,
    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd,
    list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS s
  FROM embeddings
)
SELECT vec_id,
  round(s, 6) AS scale,
  array_to_string(
    CASE WHEN s > 0
         THEN list_transform(xd, v -> CAST(floor(v / s * 127 + 0.5) AS INT))
         ELSE list_transform(xd, v -> 0) END, ',') AS qvec
FROM x ORDER BY vec_id
""",
)
