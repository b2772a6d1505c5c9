"""Persisted tokenizer artifact: train-once / encode-later contract.

A real pipeline cuts the tokenizer once, writes the merge log + vocab
as tables, and every later encode session reads the artifact instead of
retraining (the shape bpe_encode_heldout simulates in-process). These
tests pin: write→read loses nothing (merge log byte-exact, replaying
the read log reproduces the persisted n_syms), the encode-from-artifact
query equals the in-process deep encode, and the encode path trains
NOTHING once the artifact exists.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def artifact(spark):
    from kafka_topic_analyzer_spark.queries.terms import _ensure_bpe_artifact

    return _ensure_bpe_artifact(spark, SF_SMOKE)


def test_artifact_roundtrip_merge_log_exact(spark, artifact):
    from kafka_topic_analyzer_spark.operators.bpe import (
        bpe_read_artifact,
        bpe_train,
    )
    from kafka_topic_analyzer_spark.queries.terms import (
        BPE_DEEP_N_MERGES,
        _bpe_bigram_vocab,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    fresh_merges, fresh_vocab = bpe_train(
        spark, _bpe_bigram_vocab(d), BPE_DEEP_N_MERGES
    )
    merges, vocab = bpe_read_artifact(spark, artifact)
    assert merges == fresh_merges
    fv = {(r["word"], r["n_syms"], r["wc"]) for r in fresh_vocab.collect()}
    pv = {(r["word"], r["n_syms"], r["wc"]) for r in vocab.collect()}
    assert pv == fv


def test_artifact_replay_reproduces_vocab_nsyms(spark, artifact):
    """Replaying the READ merge log over the READ vocab's words must
    reproduce the persisted n_syms — the artifact is self-consistent
    and sufficient to encode anything (including OOV)."""
    from kafka_topic_analyzer_spark.operators.bpe import (
        bpe_apply_merges,
        bpe_read_artifact,
    )

    merges, vocab = bpe_read_artifact(spark, artifact)
    rows = vocab.collect()
    replayed = dict(bpe_apply_merges([r["word"] for r in rows], merges))
    assert {r["word"]: r["n_syms"] for r in rows} == replayed


def test_encode_from_artifact_equals_in_process(spark, artifact):
    import __spark_entry__ as E

    qs = E.queries()
    from_art = qs["bpe_encode_from_artifact"](spark, SF_SMOKE).collect()
    in_proc = qs["bpe_encode_deep"](spark, SF_SMOKE).collect()
    assert [tuple(r) for r in from_art] == [tuple(r) for r in in_proc]
    assert from_art


def test_encode_session_trains_nothing(spark, artifact, monkeypatch):
    """Once the artifact exists, the encode query must never reach the
    trainer — the deployment guarantee, not just a cache win."""
    import kafka_topic_analyzer_spark.operators.bpe as bpe_mod
    from kafka_topic_analyzer_spark.queries.terms import (
        _bpe_encode_from_artifact,
    )

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("encode session invoked the trainer")

    monkeypatch.setattr(bpe_mod, "bpe_train", boom)
    monkeypatch.setattr(bpe_mod, "bpe_local_merge_loop", boom)
    rows = _bpe_encode_from_artifact(spark, SF_SMOKE).collect()
    assert rows
