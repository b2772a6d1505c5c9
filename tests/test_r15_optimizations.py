"""Focused tests for the r15 optimization-round operator changes.

Covers the internals the optimizations touched:
- jaccard_size_prefilter must NEVER drop a pair the rounded-Jaccard cut
  would keep (exactness of the integer feasibility bound);
- minhash_near_dups output is unchanged by the prefilter (pinned against
  a prefilter-free reimplementation of the verify);
- opq._agg_moments fails loudly on NULL / ragged embeddings instead of
  silently skewing the moments (advisor r14).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_size_prefilter_never_drops_passing_pair(spark):
    """For every (n_i, n_j, shared) with shared <= min(n_i, n_j):
    round(J, 6) >= t implies the bound holds — sweep the small lattice
    exhaustively for the registered thresholds."""
    from kafka_topic_analyzer_spark.operators.dedup import (
        jaccard_size_prefilter,
    )

    rows = []
    # shared >= 1: a candidate pair always shares at least one shingle,
    # so union >= 1 and the jaccard division is defined (ANSI mode).
    # Sizes beyond 214 pin the int32-overflow regime the bound must
    # survive (size * 1e7 exceeds int32 there).
    sizes = list(range(1, 25)) + [214, 215, 1000, 100_000]
    for ni in sizes:
        for nj in sizes:
            for s in sorted({1, 2, min(ni, nj) // 2, min(ni, nj)}):
                if 1 <= s <= min(ni, nj):
                    rows.append((ni, nj, s))
    df = spark.createDataFrame(rows, "n_i int, n_j int, shared int")
    for t in (0.5, 0.6, 0.7, 0.8, 0.9):
        jac = F.round(
            F.col("shared").cast("double")
            / (F.col("n_i") + F.col("n_j") - F.col("shared")),
            6,
        )
        passing = df.where(jac >= t)
        dropped = passing.where(
            ~jaccard_size_prefilter(F.col("n_i"), F.col("n_j"), t)
        ).count()
        assert dropped == 0, f"prefilter dropped a passing pair at t={t}"


def test_minhash_near_dups_unchanged_by_prefilter(spark):
    """Full-path pin: the prefilter-equipped operator equals a
    prefilter-free verify over the same candidates."""
    from kafka_topic_analyzer_spark.functions.text import word_shingles
    from kafka_topic_analyzer_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_near_dups,
        minhash_signatures,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    got = sorted(map(tuple, minhash_near_dups(docs, k=3, threshold=0.7).collect()))

    cands = lsh_candidate_pairs(minhash_signatures(docs, 3))
    sh = docs.select(
        "doc_id", F.array_distinct(word_shingles(F.col("text"), 3)).alias("sh")
    )
    inter = F.size(F.array_intersect(F.col("sh_i"), F.col("sh_j")))
    union = F.size(F.col("sh_i")) + F.size(F.col("sh_j")) - inter
    jac = F.round(inter.cast("double") / union, 6)
    ref = sorted(
        map(
            tuple,
            (
                cands.join(
                    sh.select(
                        F.col("doc_id").alias("doc_i"), F.col("sh").alias("sh_i")
                    ),
                    "doc_i",
                )
                .join(
                    sh.select(
                        F.col("doc_id").alias("doc_j"), F.col("sh").alias("sh_j")
                    ),
                    "doc_j",
                )
                .select("doc_i", "doc_j", jac.alias("jaccard"))
                .where(F.col("jaccard") >= 0.7)
            ).collect(),
        )
    )
    assert got == ref and len(got) > 0


def test_agg_moments_raises_on_null_embedding(spark):
    from kafka_topic_analyzer_spark.operators.opq import _agg_moments

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="NULL"):
        _agg_moments(df)


def test_agg_moments_raises_on_ragged_embedding(spark):
    from kafka_topic_analyzer_spark.operators.opq import _agg_moments

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0]), (3, [4.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="per-dim counts differ"):
        _agg_moments(df)


def test_agg_moments_clean_input_ok(spark):
    from kafka_topic_analyzer_spark.operators.opq import _agg_moments

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    n, s = _agg_moments(df)
    assert n == 2 and list(s) == [4.0, 6.0]
