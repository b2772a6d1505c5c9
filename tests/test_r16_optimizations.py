"""Round-16 optimization pins.

1. connected_components' observe-based convergence (label-sum
   monotonicity) on graphs that need MULTIPLE two-hop batches, and on
   the empty graph — the two shapes where a broken convergence rule
   would either under-iterate (wrong labels) or loop to max_iterations.
2. Retention-grace vacuum (reader-contract shape (b)) for BOTH manifest
   stores: a DataFrame resolved against a superseded manifest still
   scans while the window holds, and dirs beyond the window are still
   collected (disk stays bounded).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_SMOKE
from kafka_topic_analyzer_spark.functions.vectors import as_double
from kafka_topic_analyzer_spark.operators.ivf_centroids_v1 import CENTROIDS
from kafka_topic_analyzer_spark.operators.pq_codebooks_v1 import CODEBOOKS
from kafka_topic_analyzer_spark.sources.tables import load_table


def test_cc_long_chain_needs_multiple_batches(spark):
    """A 10-vertex path has diameter 9: the 2-hop batches must iterate
    several times before the label sum stops moving. Every vertex must
    end labeled 0 (the min id) — an early-stopping bug would leave
    higher labels in the tail of the chain."""
    from kafka_topic_analyzer_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    got = {
        (r["doc_id"], r["cluster_id"]) for r in connected_components(edges).collect()
    }
    assert got == {(i, 0) for i in range(10)}


def test_cc_two_cliques_and_empty_graph(spark):
    from kafka_topic_analyzer_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)], "src long, dst long"
    )
    got = {
        (r["doc_id"], r["cluster_id"]) for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}

    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).collect() == []


def _emb_base(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    return emb.select("vec_id", as_double(F.col("embedding")).alias("embedding"))


def test_index_retention_grace_stale_reader(spark, tmp_path):
    """With retain_epochs=1 a reader holding a DataFrame resolved against
    the PREVIOUS manifest survives one more flip; a second flip retires
    the oldest epoch's dirs (disk stays bounded)."""
    from kafka_topic_analyzer_spark.streaming import index_upsert as IU

    base = _emb_base(spark)
    index_dir = str(tmp_path / "idx")
    os.makedirs(index_dir)
    IU.merge_index_batch(base, index_dir, 0, CENTROIDS, CODEBOOKS, retain_epochs=1)

    stale = IU.read_postings(spark, index_dir)  # resolved against manifest v0
    n0 = stale.count()

    # update EVERY key so each flip repoints every cell/bucket: epoch-0
    # dirs then survive only through the grace history, which is exactly
    # what the window assertions below need to observe
    upd = base.select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(0.5)).alias("embedding"),
    )
    IU.merge_index_batch(upd, index_dir, 1, CENTROIDS, CODEBOOKS, retain_epochs=1)
    # epoch-0 dirs are superseded but inside the grace window: the held
    # plan still scans and still sees the pre-flip content
    assert stale.count() == n0

    epochs = lambda: {  # noqa: E731
        e.split("_")[1] for e in os.listdir(index_dir) if e.startswith("epoch_v")
    }
    assert "v000000" in epochs()

    IU.merge_index_batch(upd, index_dir, 2, CENTROIDS, CODEBOOKS, retain_epochs=1)
    # window slid: epoch-0 dirs are gone, epoch-1's grace dirs remain
    assert "v000000" not in epochs()
    assert "v000001" in epochs()

    # the CURRENT index is unaffected by retention bookkeeping
    cur = IU.read_postings(spark, index_dir)
    assert cur.count() == n0


def test_bucketed_retention_grace_stale_reader(spark, tmp_path):
    from kafka_topic_analyzer_spark.streaming.upsert_sink import (
        merge_batch_bucketed,
        read_state_bucketed,
    )

    def batch(epoch, value):
        return spark.createDataFrame(
            [("k1", 0, epoch, value)],
            "key string, partition int, offset long, value string",
        )

    state = str(tmp_path / "state")
    os.makedirs(state)
    merge_batch_bucketed(batch(0, "a"), state, 0, n_buckets=4, retain_epochs=1)
    stale = read_state_bucketed(spark, state)  # resolved against manifest v0

    merge_batch_bucketed(batch(1, "b"), state, 1, n_buckets=4, retain_epochs=1)
    # grace window: the superseded epoch-0 file still scans (old content)
    assert [r["value"] for r in stale.collect()] == ["a"]

    epochs = lambda: {  # noqa: E731
        e.split("_")[1] for e in os.listdir(state) if e.startswith("epoch_v")
    }
    assert "v000000" in epochs()

    merge_batch_bucketed(batch(2, "c"), state, 2, n_buckets=4, retain_epochs=1)
    assert "v000000" not in epochs()  # beyond the window: collected
    assert "v000001" in epochs()  # inside the window: retained
    assert [r["value"] for r in read_state_bucketed(spark, state).collect()] == ["c"]


def test_bucketed_default_retention_unchanged(spark, tmp_path):
    """retain_epochs=0 (default) keeps the r12 behavior byte-for-byte:
    superseded dirs vanish at the next flip and no sidecar appears."""
    from kafka_topic_analyzer_spark.streaming.upsert_sink import (
        MANIFEST_HISTORY,
        merge_batch_bucketed,
    )

    def batch(epoch, value):
        return spark.createDataFrame(
            [("k1", 0, epoch, value)],
            "key string, partition int, offset long, value string",
        )

    state = str(tmp_path / "state")
    os.makedirs(state)
    merge_batch_bucketed(batch(0, "a"), state, 0, n_buckets=4)
    merge_batch_bucketed(batch(1, "b"), state, 1, n_buckets=4)
    epochs = {e.split("_")[1] for e in os.listdir(state) if e.startswith("epoch_v")}
    assert epochs == {"v000001"}
    assert not os.path.exists(os.path.join(state, MANIFEST_HISTORY))


def test_adaptive_search_pins_corpus_pass_once(spark):
    """The adaptive IVF searches feed the corpus assignment/index into
    THREE consumers (census, total mass, candidate join); the assign and
    encode UDFs are asNondeterministic, so without the r16 pin each
    consumer plans its own full-corpus UDF pass. The pin must survive:
    the executed plan scans the pinned relation (ExistingRDD) and the
    only remaining Python evaluations are the tiny query-side ones — a
    regression to per-consumer corpus evaluation pushes the
    ArrowEvalPython census back up to >= 5."""
    from kafka_topic_analyzer_spark.operators.pq import knn_ivfpq_adaptive
    from kafka_topic_analyzer_spark.operators.similarity import knn_ivf_adaptive

    emb = _emb_base(spark)
    q = emb.where(F.col("vec_id") < 5)

    for df in (
        knn_ivf_adaptive(emb, q, CENTROIDS, k=3),
        knn_ivfpq_adaptive(emb, q, CENTROIDS, CODEBOOKS, k=3),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan, "corpus assignment/index pin is gone"
        assert plan.count("ArrowEvalPython") <= 3, (
            "corpus-side UDF pass is being re-planned per consumer:\n" + plan
        )
        rows = df.collect()
        assert len(rows) == 15  # 5 queries x k=3
        assert all(r["nprobe_used"] >= 1 for r in rows)


def test_lsh_match_masks_reproduce_every_banding(spark):
    """The banding-sweep rewrite derives each banding's candidate set
    from the finest leg's permutation-match mask (nested aligned bands).
    Pin the equivalence: for every sweep banding, the mask-derived pair
    set must equal lsh_candidate_pairs' string-keyed self-join output —
    including a signature-less (NULL-sig) doc, which both paths must
    drop, and including docs agreeing on SOME but not all permutations
    of a band (partial agreement must NOT produce a coarse candidate)."""
    from kafka_topic_analyzer_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_mask_band_hit,
        lsh_permutation_match_masks,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup
            (3, "the quick brown fox jumps over the lazy cat tonight"),  # near dup
            (4, "completely unrelated text about spark shuffle internals"),
            (5, "ab"),  # < 3 tokens -> NULL signature, must vanish
            (6, "another unrelated document mentioning quick brown foxes"),
        ],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, 3).localCheckpoint(eager=True)
    masks = lsh_permutation_match_masks(sigs).collect()
    for bands in (2, 4, 8, 16):
        want = {
            (r["doc_i"], r["doc_j"])
            for r in lsh_candidate_pairs(sigs, bands=bands).collect()
        }
        got = set()
        for r in masks:
            hit = any(
                (r["mask"] >> (j * (16 // bands))) & ((1 << (16 // bands)) - 1)
                == (1 << (16 // bands)) - 1
                for j in range(bands)
            )
            if hit:
                got.add((r["doc_i"], r["doc_j"]))
        assert got == want, f"bands={bands}: {got} != {want}"
    # the column expression agrees with the python reference above
    mdf = lsh_permutation_match_masks(sigs)
    for bands in (2, 4, 8, 16):
        via_col = {
            (r["doc_i"], r["doc_j"])
            for r in mdf.where(lsh_mask_band_hit(F.col("mask"), bands)).collect()
        }
        want = {
            (r["doc_i"], r["doc_j"])
            for r in lsh_candidate_pairs(sigs, bands=bands).collect()
        }
        assert via_col == want


def test_embedding_lsh_pin_policy_same_pairs(spark):
    """Above materialize_threshold the LSH bucket relation is pinned and
    both self-join sides scan the pin (one corpus UDF pass); below it the
    recompute shape stays. Same pairs either way, and the pinned plan
    must actually scan the checkpoint (ExistingRDD) instead of
    re-planning the bucket UDF per side."""
    from kafka_topic_analyzer_spark.operators.dedup import embedding_near_dups_lsh

    emb = _emb_base(spark).where(F.col("vec_id") < 200)
    recompute = embedding_near_dups_lsh(
        emb, threshold=0.4, tables=4, n_vecs=200
    )
    pinned = embedding_near_dups_lsh(
        emb, threshold=0.4, tables=4, materialize_threshold=10, n_vecs=200
    )
    plan = pinned._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, "bucket pin is gone above the threshold"
    got_a = sorted(map(tuple, recompute.collect()))
    got_b = sorted(map(tuple, pinned.collect()))
    assert got_a == got_b and len(got_a) > 0
