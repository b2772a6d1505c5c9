"""Property-based verification of the BPE merge-loop implementations.

Three implementations of the greedy loop exist (driver-local incremental,
distributed per-merge-job, DuckDB recursive CTE); tests/test_bpe_hybrid.py
pins them equal on the FIXTURE corpus, whose ~30-word pool never produces
the hard shapes. These tests attack the semantics where merge loops
actually break:

- overlapping pair runs (``aaaa`` — left-to-right NON-overlapping
  replacement must yield [aa, aa], and pair counting must count the
  overlapping adjacencies 3x),
- merged symbols that nest/concatenate ambiguously (``ab``+``b`` vs
  ``a``+``bb`` — the sentinel-wrapped string replace and the token-scan
  must agree),
- weight ties everywhere (wc ties resolved by (l, r) codepoint order),
- single-char and fully-mergeable words (early exhaustion).

Two oracles per input: the naive full-recount loop (pure Python, no heap,
no incremental state) and the production DuckDB recursive CTE built by
``_bpe_recursive_blocks`` over a VALUES census — the identical SQL the
registered deep queries ship, exercised on vocabularies the fixtures
cannot produce.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_topic_analyzer_spark.operators.bpe import bpe_local_merge_loop
from tests.test_bpe_hybrid import _naive_merge_loop

# small alphabet + short words maximizes pair collisions, run-overlaps and
# count ties per example
WORDS = st.lists(
    st.text(alphabet="ab_", min_size=2, max_size=8),
    min_size=0,
    max_size=10,
    unique=True,
)
WEIGHTS = st.integers(min_value=1, max_value=4)


@given(words=WORDS, data=st.data())
@settings(max_examples=300, deadline=None)
def test_incremental_equals_naive_on_adversarial_vocabs(words, data):
    vocab = [(w, data.draw(WEIGHTS)) for w in words]
    fast_m, fast_f = bpe_local_merge_loop(list(vocab), 12)
    naive_m, naive_f = _naive_merge_loop(list(vocab), 12)
    assert fast_m == naive_m
    assert {w: n for w, n, _ in fast_f} == naive_f


_OVERLAP_VOCABS = [
    # the classic run-overlap shapes
    [("aaaa", 1)],
    [("aaaa", 2), ("aaa", 3)],
    [("aaaaaaa", 1), ("aa", 5)],
    # nesting/concatenation ambiguity: does 'ab'+'b' or 'a'+'bb' win, and
    # does the later replace see the right boundaries
    [("abb", 2), ("ab", 3), ("bb", 3)],
    [("ababab", 1), ("aba", 2), ("bab", 2)],
    # separator char inside words (the fused-bigram shape) + ties
    [("a_a", 1), ("b_b", 1), ("a_b", 1), ("b_a", 1)],
    # fully-mergeable tiny vocab: loop must exhaust early, log < budget
    [("ab", 1), ("ba", 1)],
]


def _values_census(vocab) -> str:
    rows = ", ".join(f"('{w}', CAST({wc} AS BIGINT))" for w, wc in vocab)
    return f"SELECT word, wc FROM (VALUES {rows}) AS v(word, wc)"


@pytest.mark.parametrize("vocab", _OVERLAP_VOCABS, ids=lambda v: v[0][0])
def test_recursive_cte_oracle_matches_local_loop(vocab):
    """The SHIPPED recursive SQL (same builder as bpe_train_merges_deep's
    oracle) must replay the local loop exactly on vocabularies that
    stress replace semantics — merge log AND final per-word symbol
    counts."""
    from kafka_topic_analyzer_spark.queries.terms import _bpe_recursive_blocks

    n = 12
    base = "WITH RECURSIVE " + _bpe_recursive_blocks(_values_census(vocab), n)
    con = duckdb.connect()
    log = con.execute(
        base
        + """
SELECT step, l, r, cnt, l || r AS new_symbol
FROM (SELECT DISTINCT step, l, r, cnt FROM t WHERE step >= 1)
ORDER BY step
"""
    ).fetchall()
    final = con.execute(
        base
        + """
SELECT word, CAST(len(string_split(substr(sym, 2, length(sym)-2), '··')) AS BIGINT)
FROM t WHERE step = (SELECT max(step) FROM t) ORDER BY word
"""
    ).fetchall()
    merges, loc_final = bpe_local_merge_loop(list(vocab), n)
    assert [(s, l, r, c, ns) for s, l, r, c, ns in merges] == log
    assert sorted((w, n_) for w, n_, _ in loc_final) == [tuple(r) for r in final]


def test_overlap_run_semantics_exact():
    """'aaaa' x1: pair (a,a) counts 3 (overlapping adjacencies), the merge
    applies left-to-right non-overlapping -> [aa, aa], and the next round
    counts (aa,aa) once."""
    merges, final = bpe_local_merge_loop([("aaaa", 1)], 2)
    assert merges[0] == (1, "a", "a", 3, "aa")
    assert merges[1] == (2, "aa", "aa", 1, "aaaa")
    assert final == [("aaaa", 1, 1)]


@given(words=WORDS, data=st.data())
@settings(max_examples=150, deadline=None)
def test_rank_replay_reproduces_trainer_final_state(words, data):
    """Self-consistency of the serving path: replaying the learned merge
    log in rank order over the TRAINING words must land exactly on the
    trainer's final symbol counts — the property that lets the final
    state double as the encoder table and the replay serve unseen words."""
    from kafka_topic_analyzer_spark.operators.bpe import bpe_apply_merges

    vocab = [(w, data.draw(WEIGHTS)) for w in words]
    merges, final = bpe_local_merge_loop(list(vocab), 12)
    replayed = dict(bpe_apply_merges([w for w, _ in vocab], merges))
    assert replayed == {w: n for w, n, _ in final}
