"""OPQ rung (operators/opq.py): rotation properties, engine parity of the
sequential-fold matmul, and the variance-balancing claim the artifact is
shipped for (lower quantization error than raw-space PQ at equal code
size)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE
from kafka_topic_analyzer_spark.operators.opq import (
    opq_train_rotation,
    rotate,
)
from kafka_topic_analyzer_spark.operators.opq_rotation_v1 import (
    DIM,
    M as ROT_M,
    ROTATION,
)
from kafka_topic_analyzer_spark.operators.pq import pq_encode_scored
from kafka_topic_analyzer_spark.operators.pq_codebooks_opq_v1 import (
    CODEBOOKS as OPQ_CB,
)
from kafka_topic_analyzer_spark.operators.pq_codebooks_v3 import (
    CODEBOOKS as RAW_CB,
)
from kafka_topic_analyzer_spark.sources.tables import load_table

ROT = np.array(ROTATION, dtype=np.float64)


def test_shipped_rotation_is_orthogonal():
    assert ROT.shape == (DIM, DIM)
    assert np.allclose(ROT @ ROT.T, np.eye(DIM), atol=1e-10)


def test_rotation_preserves_l2():
    rng = np.random.default_rng(7)
    x, y = rng.normal(size=DIM), rng.normal(size=DIM)
    raw = float(((x - y) ** 2).sum())
    rot = float(((ROT @ x - ROT @ y) ** 2).sum())
    assert raw == pytest.approx(rot, rel=1e-12)


def test_train_rotation_balanced_allocation():
    """Each subspace gets exactly dsub eigen-directions and the result is
    orthogonal — on a deliberately anisotropic sample (so allocation has
    something to balance)."""
    rng = np.random.default_rng(11)
    scales = np.linspace(5.0, 0.1, 16)
    mat = rng.normal(size=(400, 16)) * scales[None, :]
    r = opq_train_rotation(mat, m=4)
    assert r.shape == (16, 16)
    assert np.allclose(r @ r.T, np.eye(16), atol=1e-10)
    # balanced: per-subspace variance products of the rotated sample are
    # far closer together than the raw per-subspace products
    y = mat @ r.T

    def spread(z):
        v = z.var(axis=0).reshape(4, 4).prod(axis=1)
        return v.max() / max(v.min(), 1e-30)

    assert spread(y) < spread(mat)


def test_rotate_udf_matches_fold_matmul(spark):
    """Spark rotate() must equal the trainer's sequential-fold matmul
    bit-for-bit — the parity contract the DuckDB mirror relies on."""
    emb = load_table(spark, SF_SMOKE, "embeddings").where(F.col("vec_id") < 40)
    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in rotate(emb, ROTATION).select("vec_id", "embedding").collect()
    }
    raw = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    for vid, x in raw.items():
        acc = np.zeros(DIM)
        for i in range(DIM):
            acc = acc + x[i] * ROT[:, i]
        assert (got[vid] == acc).all(), f"vec {vid} not bit-equal"


def test_opq_quantization_error_below_raw(spark):
    """The reason OPQ exists: at equal code size (M=8, K=256) the rotated
    space quantizes with LESS total squared error than the raw space —
    the deterministic form of the recall claim BENCH measures.

    Evaluated on sf0.1 — the corpus BOTH artifact families were cut on
    (v3 raw codebooks and the OPQ pair). The sf0.001/sf0.01 fixtures are
    differently-distributed corpora (the raw v3 per-vector error is 48%
    higher there too), i.e. the quantizer-drift case the recut lifecycle
    handles — a rotation can't be expected to transfer its gain across a
    distribution shift, so the balancing claim is pinned where the
    distributions match (measured: 425.2 vs 465.1, -8.6%)."""
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    raw_err = (
        pq_encode_scored(emb, RAW_CB)
        .select(F.aggregate("qerrs", F.lit(0.0), lambda a, x: a + x).alias("e"))
        .agg(F.sum("e"))
        .first()[0]
    )
    opq_err = (
        pq_encode_scored(rotate(emb, ROTATION), OPQ_CB)
        .select(F.aggregate("qerrs", F.lit(0.0), lambda a, x: a + x).alias("e"))
        .agg(F.sum("e"))
        .first()[0]
    )
    assert opq_err < raw_err, (opq_err, raw_err)


def test_trainer_m_matches_codebooks():
    assert ROT_M == len(OPQ_CB) == 8
    assert len(OPQ_CB[0]) == 256
