"""Similarity search over an embedding column (LLM-pipeline operator).

* :func:`knn_bruteforce` — exact top-k cosine neighbors for a (small) query
  set: broadcast the queries, scan the corpus once, window-rank. The
  baseline and the correctness oracle.
* :func:`lsh_buckets` / :func:`knn_lsh` — the scale path: deterministic
  random-hyperplane LSH (sign bits of dot products with pseudo-random
  planes derived from a fixed integer hash, no RNG state), bucket join,
  exact re-rank within bucket. At 100 TB the corpus scan becomes a
  bucket-pruned scan; recall is tunable via bits/tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from kafka_topic_analyzer_spark.functions.vectors import as_double, cosine, dot

MINSTD = 2147483647  # 2^31-1


def _plane_component(bit: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    MINSTD-style integer mixing of (bit, dim) — stable across runs,
    machines, and engines; no RNG object to seed or serialize.
    """
    h = (1103515245 * (bit * 9973 + dim + 1) + 12345) % MINSTD
    return (h / MINSTD) * 2.0 - 1.0


def knn_bruteforce(
    corpus: DataFrame, queries: DataFrame, k: int = 5, round_digits: int = 6
) -> DataFrame:
    """Exact top-k: cross join (queries broadcast), cosine, rank, keep k.

    Ordering is on the ROUNDED score with id tiebreak so the cut is
    deterministic; self-matches excluded.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), round_digits).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def lsh_buckets(
    df: DataFrame, dim: int = 64, bits: int = 8, tables: int = 1
) -> DataFrame:
    """Explode each vector into one (table_id, bucket) row per hash table.

    Multi-table sign-bit LSH: each table uses an independent deterministic
    plane set; candidates are the union over tables, which is what makes
    recall workable on weakly-clustered (random-ish) embeddings. One
    projection pass computes all tables' buckets (tables × bits dot
    products, still a single scan).
    """
    v = as_double(F.col("embedding"))
    table_structs = []
    for t in range(tables):
        bucket = F.lit(0).cast("long")
        for bit in range(bits):
            plane = F.array(
                *[F.lit(_plane_component(t * bits + bit, d)) for d in range(dim)]
            )
            proj = dot(v, plane)
            bucket = bucket + F.when(proj >= 0, F.lit(2**bit)).otherwise(F.lit(0))
        table_structs.append(
            F.struct(F.lit(t).alias("table_id"), bucket.alias("bucket"))
        )
    return (
        df.withColumn("tb", F.explode(F.array(*table_structs)))
        .withColumn("table_id", F.col("tb.table_id"))
        .withColumn("bucket", F.col("tb.bucket"))
        .drop("tb")
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    bits: int = 4,
    tables: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """ANN top-k: equi-join on (table, bucket), exact cosine re-rank inside.

    The bucket equi-join replaces the cross join; union over `tables`
    independent hash tables trades candidate volume for recall (bits up →
    fewer candidates, recall down). Unit tests measure recall against
    :func:`knn_bruteforce`.
    """
    qb = lsh_buckets(queries, dim, bits, tables).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"),
        "table_id", "bucket",
    )
    cb = lsh_buckets(corpus, dim, bits, tables).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"),
        "table_id", "bucket",
    )
    scored = (
        cb.join(qb, ["table_id", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_emb", "c_emb")
        .dropDuplicates(["query_id", "neighbor_id"])  # union across tables
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), round_digits).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )
