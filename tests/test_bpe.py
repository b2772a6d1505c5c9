"""BPE trainer/encoder invariants beyond oracle parity.

The oracle proves both engines compute the same thing; these prove the
thing computed IS byte-pair encoding:

- greedy-argmax monotonicity: the merge-log ``pair_count`` sequence is
  non-increasing (a newly created symbol's adjacent-pair counts are
  bounded by the occurrences of the merge that created it, and every
  pre-existing pair can only lose occurrences to a merge);
- merge-log well-formedness (steps 1..n, new_symbol = left+right);
- encode/train reconciliation: the corpus rollup row equals the sum of
  the per-document rows, tokens never exceed characters (a merge only
  shrinks), and a corpus re-encoded with zero learned merges is exactly
  character-level.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_merge_log_is_greedy_monotone(spark):
    import __spark_entry__ as E

    rows = E.queries()["bpe_train_merges"](spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= 10
    assert [r["step"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["new_symbol"] == r["left_sym"] + r["right_sym"]
        assert r["pair_count"] > 0
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True), counts


def test_encode_rollup_reconciles(spark):
    import __spark_entry__ as E

    rows = E.queries()["bpe_encode_corpus"](spark, SF_SMOKE).collect()
    per_doc = [r for r in rows if r["doc_id"] is not None]
    totals = [r for r in rows if r["doc_id"] is None]
    assert len(totals) == 1
    tot = totals[0]
    assert tot["n_words"] == sum(r["n_words"] for r in per_doc)
    assert tot["n_chars"] == sum(r["n_chars"] for r in per_doc)
    assert tot["n_bpe_tokens"] == sum(r["n_bpe_tokens"] for r in per_doc)
    for r in per_doc:
        # merges only shrink; a word is at least 1 token
        assert r["n_words"] <= r["n_bpe_tokens"] <= r["n_chars"]
    # merges genuinely applied: strictly fewer tokens than characters
    assert tot["n_bpe_tokens"] < tot["n_chars"]


def test_zero_merges_is_character_level(spark):
    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.queries.terms import (
        _bpe_symbolized_vocab,
        _bpe_train_state,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    merges, final = _bpe_train_state(_bpe_symbolized_vocab(d), 0)
    assert merges == []
    s2 = "··"
    bad = final.where(
        F.size(F.split(F.expr("substring(sym, 2, length(sym)-2)"), s2))
        != F.length("word")
    ).count()
    assert bad == 0
