"""Planted-extreme semantics for the LM-quality operators (lm_quality.py).

The oracle-parity suite proves Spark==DuckDB on the real tables; these
tests pin that the FORMULAS mean what the docstrings claim, on corpora
built so the right answer is computable by hand.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_topic_analyzer_spark.queries.lm_quality import (
    BOILER_MIN_DF,
    _boilerplate_coverage,
    _source_unigram_kl,
    _unigram_logprob_quality,
)


def _write_docs(tmp_path, rows):
    d = tmp_path / "lmq"
    d.mkdir(exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_unigram_surprisal_extremes(spark, tmp_path):
    # corpus: 9 occurrences of "common", 1 of "rare" -> total 10
    sf = _write_docs(
        tmp_path,
        [
            (0, "common common common common", "en", "s0"),
            (1, "common common common common common", "en", "s0"),
            (2, "rare", "en", "s1"),
        ],
    )
    out = {r["doc_id"]: r for r in _unigram_logprob_quality(spark, sf).collect()}
    # all-common docs: every token has surprisal ln(10/9)
    exp_common = round(math.log(10 / 9), 6)
    assert out[0]["n_tokens"] == 4
    assert out[0]["mean_surprisal"] == pytest.approx(exp_common, abs=2e-6)
    assert out[0]["max_surprisal"] == pytest.approx(exp_common, abs=1e-6)
    # the hapax doc: surprisal ln(10/1)
    assert out[2]["n_tokens"] == 1
    assert out[2]["mean_surprisal"] == pytest.approx(round(math.log(10.0), 6), abs=1e-6)
    # rarer text scores strictly higher — the filter's ordering property
    assert out[2]["mean_surprisal"] > out[0]["mean_surprisal"]


def test_unigram_surprisal_empty_doc_is_zero(spark, tmp_path):
    sf = _write_docs(tmp_path, [(0, "a b", "en", "s0"), (1, "   ", "en", "s0")])
    out = {r["doc_id"]: r for r in _unigram_logprob_quality(spark, sf).collect()}
    assert out[1]["n_tokens"] == 0
    assert out[1]["mean_surprisal"] == 0.0
    assert out[1]["max_surprisal"] == 0.0


def test_source_kl_zero_when_source_matches_corpus(spark, tmp_path):
    # only two sources, with IDENTICAL token distributions -> each equals
    # the corpus mix exactly -> KL == 0 (the distance's identity axiom)
    sf = _write_docs(
        tmp_path, [(0, "x x y", "en", "s0"), (1, "x x y", "en", "s1")]
    )
    out = {r["source"]: r for r in _source_unigram_kl(spark, sf).collect()}
    assert out["s0"]["kl_nats"] == pytest.approx(0.0, abs=1e-6)
    assert out["s1"]["kl_nats"] == pytest.approx(0.0, abs=1e-6)


def test_source_kl_positive_for_skewed_source(spark, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            (0, "x x y", "en", "s0"),
            (1, "x x y", "en", "s1"),
            (2, "zzz zzz zzz", "en", "s2"),
        ],
    )
    out = {r["source"]: r for r in _source_unigram_kl(spark, sf).collect()}
    # s2's only token is exclusive to it: c_st=3, c_t=3, n_s=3, N=9
    # -> KL = ln((3*9)/(3*3)) = ln 3
    assert out["s2"]["kl_nats"] == pytest.approx(math.log(3.0), abs=1e-6)
    assert out["s2"]["vocab_size"] == 1
    # Gibbs' inequality: KL >= 0 for every source
    assert all(r["kl_nats"] >= 0.0 for r in out.values())


def test_boilerplate_coverage_planted_header(spark, tmp_path):
    # BOILER_MIN_DF docs share the header trigram "terms of service";
    # doc 100 is original prose -> coverage 0.
    rows = [
        (i, f"terms of service unique{i} words{i} here{i}", "en", "s0")
        for i in range(BOILER_MIN_DF)
    ] + [(100, "completely original content nothing shared", "en", "s1")]
    sf = _write_docs(tmp_path, rows)
    out = {r["doc_id"]: r for r in _boilerplate_coverage(spark, sf).collect()}
    # each header doc: 6 tokens -> 4 trigram positions, exactly 1 boiler
    for i in range(BOILER_MIN_DF):
        assert out[i]["n_positions"] == 4
        assert out[i]["n_boiler"] == 1
        assert out[i]["boiler_coverage"] == pytest.approx(0.25, abs=1e-9)
    assert out[100]["n_boiler"] == 0
    assert out[100]["boiler_coverage"] == 0.0


def test_boilerplate_short_doc_zero_positions(spark, tmp_path):
    sf = _write_docs(tmp_path, [(0, "one two", "en", "s0")])
    row = _boilerplate_coverage(spark, sf).collect()[0]
    assert row["n_positions"] == 0 and row["boiler_coverage"] == 0.0


def test_curation_funnel_planted_cascade(spark, tmp_path):
    """One doc planted to die at each gate; attribution goes to the FIRST
    failing gate (the lang-fail doc is also rare-token soup, yet counts
    only at lang_identified)."""
    from kafka_topic_analyzer_spark.queries.lm_quality import _curation_funnel

    pool = ["kestrel", "bramble", "orchid", "galleon", "meridian"]
    clone_pool = ["anvil", "bucket", "copper", "dynamo"]
    cycle = " ".join(clone_pool[(i % 4)] for i in range(100))
    rows = []
    # 3 clean docs: marker + 5-word cycle (shingle df=3 < BOILER_MIN_DF,
    # pool tokens common enough for low surprisal)
    for i in range(3):
        shifted = " ".join(pool[(i + j) % 5] for j in range(100))
        rows.append((i, "the " + shifted, "en", "s0"))
    # dies at gate 1: no language markers at all
    rows.append((10, " ".join(f"qq{j}" for j in range(100)), "en", "s1"))
    # dies at gate 2: marker but only 10 tokens -> quality < 0.6
    rows.append((11, "the alpha bravo charlie delta echo foxtrot golf hotel india", "en", "s1"))
    # dies at gate 3: BOILER_MIN_DF identical docs -> every trigram df=5
    for i in range(5):
        rows.append((20 + i, "the " + cycle, "en", "s2"))
    # dies at gate 4: marker + 99 hapaxes -> mean surprisal >> 3.5
    rows.append((30, "the " + " ".join(f"uq{j}" for j in range(99)), "en", "s3"))
    sf = _write_docs(tmp_path, rows)
    out = {r["gate"]: r for r in _curation_funnel(spark, sf).collect()}
    assert out["ingest"]["evaluated"] == 11 and out["ingest"]["survivors"] == 11
    assert out["lang_identified"]["dropped"] == 1
    assert out["quality_min"]["evaluated"] == 10 and out["quality_min"]["dropped"] == 1
    assert out["boilerplate_max"]["evaluated"] == 9 and out["boilerplate_max"]["dropped"] == 5
    assert out["surprisal_max"]["evaluated"] == 4 and out["surprisal_max"]["dropped"] == 1
    assert out["surprisal_max"]["survivors"] == 3
    assert out["surprisal_max"]["cumulative_rate"] == pytest.approx(3 / 11, abs=1e-6)
    assert out["boilerplate_max"]["survival_rate"] == pytest.approx(4 / 9, abs=1e-6)


def test_curation_funnel_short_doc_passes_boiler(spark, tmp_path):
    """A doc too short to shingle has no boilerplate -> boiler gate passes
    it (it still dies at quality, attribution stays sequential)."""
    from kafka_topic_analyzer_spark.queries.lm_quality import _curation_funnel

    sf = _write_docs(tmp_path, [(0, "the and", "en", "s0")])
    out = {r["gate"]: r for r in _curation_funnel(spark, sf).collect()}
    assert out["lang_identified"]["survivors"] == 1
    assert out["quality_min"]["dropped"] == 1  # 2 tokens -> q < 0.6
    assert out["boilerplate_max"]["evaluated"] == 0
    assert out["boilerplate_max"]["survival_rate"] == 0.0


def test_bigram_fluent_vs_shuffled(spark, tmp_path):
    """The bigram rung's reason to exist: unigram counts CANNOT tell
    fluent prose from the same tokens shuffled — the bigram conditional
    can. Two docs with IDENTICAL token multisets (so identical unigram
    scores): doc 0 repeats a fixed phrase (every adjacent pair common),
    doc 1 is the same tokens in a scrambled order (pairs mostly unique).
    """
    from kafka_topic_analyzer_spark.queries.lm_quality import (
        _bigram_logprob_quality,
        _unigram_logprob_quality,
    )

    phrase = ["the", "quick", "brown", "fox", "jumps"]
    fluent = " ".join(phrase * 12)
    import random

    toks = phrase * 12
    random.Random(7).shuffle(toks)
    shuffled = " ".join(toks)
    sf = _write_docs(tmp_path, [(0, fluent, "en", "s0"), (1, shuffled, "en", "s0")])

    uni = {r["doc_id"]: r for r in _unigram_logprob_quality(spark, sf).collect()}
    assert uni[0]["mean_surprisal"] == pytest.approx(
        uni[1]["mean_surprisal"], abs=1e-9
    ), "unigram score must be blind to order (same token multiset)"

    big = {r["doc_id"]: r for r in _bigram_logprob_quality(spark, sf).collect()}
    assert big[0]["n_bigrams"] == big[1]["n_bigrams"] == 59
    assert big[1]["mean_bigram_surprisal"] > big[0]["mean_bigram_surprisal"] + 0.5, (
        "shuffled text must score strictly higher bigram surprisal"
    )


def test_bigram_short_and_empty_docs_zero(spark, tmp_path):
    from kafka_topic_analyzer_spark.queries.lm_quality import (
        _bigram_logprob_quality,
    )

    sf = _write_docs(
        tmp_path, [(0, "a b a b", "en", "s0"), (1, "solo", "en", "s0"), (2, " ", "en", "s0")]
    )
    out = {r["doc_id"]: r for r in _bigram_logprob_quality(spark, sf).collect()}
    for i in (1, 2):
        assert out[i]["n_bigrams"] == 0
        assert out[i]["mean_bigram_surprisal"] == 0.0
        assert out[i]["max_bigram_surprisal"] == 0.0
    # doc 0: pairs (a b), (b a), (a b); hist a·=2, b·=1
    # surp(a b)=ln(2/2)=0, surp(b a)=ln(1/1)=0 -> mean 0 under pure MLE
    assert out[0]["n_bigrams"] == 3
    assert out[0]["mean_bigram_surprisal"] == pytest.approx(0.0, abs=1e-9)


def test_trigram_fluent_vs_shuffled(spark, tmp_path):
    """The trigram rung separates fluent repetition from the same tokens
    shuffled (and strictly sharper than unigram, which is order-blind on
    identical multisets)."""
    from kafka_topic_analyzer_spark.queries.lm_quality import (
        _trigram_logprob_quality,
    )

    phrase = ["the", "quick", "brown", "fox", "jumps"]
    fluent = " ".join(phrase * 12)
    import random

    toks = phrase * 12
    random.Random(7).shuffle(toks)
    shuffled = " ".join(toks)
    sf = _write_docs(tmp_path, [(0, fluent, "en", "s0"), (1, shuffled, "en", "s0")])

    tri = {r["doc_id"]: r for r in _trigram_logprob_quality(spark, sf).collect()}
    assert tri[0]["n_trigrams"] == tri[1]["n_trigrams"] == 58
    assert tri[1]["mean_trigram_surprisal"] > tri[0]["mean_trigram_surprisal"] + 0.5


def test_trigram_short_and_empty_docs_zero(spark, tmp_path):
    from kafka_topic_analyzer_spark.queries.lm_quality import (
        _trigram_logprob_quality,
    )

    sf = _write_docs(
        tmp_path,
        [(0, "a b c a b c", "en", "s0"), (1, "two toks", "en", "s0"), (2, "", "en", "s0")],
    )
    out = {r["doc_id"]: r for r in _trigram_logprob_quality(spark, sf).collect()}
    for i in (1, 2):
        assert out[i]["n_trigrams"] == 0
        assert out[i]["mean_trigram_surprisal"] == 0.0
        assert out[i]["max_trigram_surprisal"] == 0.0
    # doc 0: triples (a b c) x2, (b c a), (c a b); every history is
    # deterministic -> pure-MLE surprisal 0 everywhere
    assert out[0]["n_trigrams"] == 4
    assert out[0]["mean_trigram_surprisal"] == pytest.approx(0.0, abs=1e-9)


def test_bigram_backoff_train_score_split(spark, tmp_path):
    """Add-nothing backoff on a disjoint train/score split: a score-side
    bigram unseen in training falls back to the trained UNIGRAM surprisal
    of its second token; a fully-OOV token gets the hapax ceiling
    ln(total). Hand-computed on a 10-token training corpus."""
    import math

    from kafka_topic_analyzer_spark.queries.lm_quality import (
        bigram_surprisal_per_doc,
    )

    train = spark.createDataFrame(
        # tokens: alpha x4, beta x4, gamma x2 (total 10)
        # bigrams: (alpha beta) x4, (beta alpha) x3, (alpha gamma)... none
        [(0, "alpha beta alpha beta alpha beta alpha beta gamma gamma")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        # pairs: (alpha beta) seen, surp 0 (hist(alpha)=4, all -> beta);
        # (beta gamma) seen ONCE of hist(beta)=4 -> ln(4);
        # (gamma zzz) unseen + zzz OOV as unigram -> ceiling ln(10);
        # (beta echo) unseen but echo... not present: covered below via doc 8
        [(7, "alpha beta gamma zzz"), (8, "gamma alpha")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_surprisal_per_doc(score, train).collect()}
    row = rows[7]
    exp = [0.0, math.floor(math.log(4) * 1e6 + 0.5) / 1e6,
           math.floor(math.log(10) * 1e6 + 0.5) / 1e6]
    assert row["n_bigrams"] == 3
    assert float(row["ssum"]) == pytest.approx(sum(exp), abs=1e-9)
    assert float(row["smax"]) == pytest.approx(max(exp), abs=1e-9)
    # doc 8's (gamma alpha) is the true bigram-unseen-but-both-tokens-known
    # backoff: falls to unigram(alpha) = ln(10/4)
    row8 = rows[8]
    assert row8["n_bigrams"] == 1
    assert float(row8["ssum"]) == pytest.approx(
        math.floor(math.log(10 / 4) * 1e6 + 0.5) / 1e6, abs=1e-9
    )


def test_source_kl_token_free_source_gets_zero_row(spark, tmp_path):
    """Advisor r9: a source whose docs all tokenize to empty must still
    get a row (n_tokens=0, vocab_size=0, kl=0.0) — output row count is
    the distinct-source count, not data-dependent."""
    sf = _write_docs(
        tmp_path,
        [(0, "x x y", "en", "s0"), (1, "   ", "en", "sEmpty"), (2, "", "en", "sEmpty")],
    )
    out = {r["source"]: r for r in _source_unigram_kl(spark, sf).collect()}
    assert set(out) == {"s0", "sEmpty"}
    row = out["sEmpty"]
    assert row["n_tokens"] == 0 and row["vocab_size"] == 0 and row["kl_nats"] == 0.0


def test_funnel_monotone_for_arbitrary_gates(spark, tmp_path):
    """Property (judge r9 item 4): for ANY gate configuration the funnel
    is monotone — survivors non-increasing along gates, evaluated[k] ==
    survivors[k-1], dropped sums to n0 - final survivors — and tightening
    any single gate never increases its survivors."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kafka_topic_analyzer_spark.queries.lm_quality import (
        FunnelGates,
        curation_funnel_frame,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog " * 8, "en", "s0"),
        (1, "qq1 qq2 qq3 qq4 qq5 qq6", "xx", "s1"),
        (2, "the and of to a in is", "en", "s0"),
        (3, "the " + " ".join(f"rare{j}" for j in range(60)), "en", "s2"),
        (4, "anvil bucket copper " * 30, "en", "s2"),
        (5, "", "en", "s3"),
    ]
    sf = _write_docs(tmp_path, rows)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        q=st.floats(min_value=0.0, max_value=1.0),
        num=st.integers(min_value=0, max_value=4),
        den=st.integers(min_value=1, max_value=8),
        s=st.floats(min_value=0.0, max_value=10.0),
    )
    def prop(q, num, den, s):
        gates = FunnelGates(quality_min=q, boiler_num=num, boiler_den=den, surp_max=s)
        out = sorted(
            curation_funnel_frame(spark, sf, gates).collect(),
            key=lambda r: r["gate_order"],
        )
        n0 = out[0]["evaluated"]
        prev = n0
        for r in out:
            assert 0 <= r["survivors"] <= r["evaluated"] <= n0
            if r["gate_order"] > 0:
                assert r["evaluated"] == prev, "gate k must evaluate gate k-1 survivors"
            prev = r["survivors"]
            assert r["dropped"] == r["evaluated"] - r["survivors"]

    prop()

    # tightening one gate never increases its survivors
    loose = {r["gate"]: r for r in curation_funnel_frame(
        spark, sf, FunnelGates(quality_min=0.3)).collect()}
    tight = {r["gate"]: r for r in curation_funnel_frame(
        spark, sf, FunnelGates(quality_min=0.9)).collect()}
    assert tight["quality_min"]["survivors"] <= loose["quality_min"]["survivors"]


def test_rounding_contract_engine_fuzz(spark):
    """Batched cross-engine fuzz of BOTH floor-round rules (_r6 at 6dp,
    _r9 at 9dp): 6000 deterministic-seed doubles — uniform, log-scaled,
    negatives, and adversarial tie neighborhoods (k/2e6, k/4e9, small
    integer quotients) — must agree bit-for-bit across Spark, DuckDB and
    Python on ONE job per engine."""
    import math
    import random

    import duckdb

    from pyspark.sql import functions as F
    from kafka_topic_analyzer_spark.queries.lm_quality import _r6, _r9

    rng = random.Random(20260815)
    vals = []
    for _ in range(2000):
        vals.append(rng.uniform(-100, 100))
    for _ in range(1000):
        vals.append(math.exp(rng.uniform(-20, 10)) * rng.choice((1, -1)))
    for _ in range(1500):
        vals.append(rng.randrange(-4_000_000, 4_000_000) / 2e6)  # 6dp ties
    for _ in range(1500):
        vals.append(rng.randrange(-8_000_000_000, 8_000_000_000) / 4e9)  # 9dp
    sp_rows = (
        spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i long, x double"
        )
        .select("i", _r6(F.col("x")).alias("r6"), _r9(F.col("x")).alias("r9"))
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE v(i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO v VALUES (?, ?)", list(enumerate(vals)))
    du_rows = con.execute(
        "SELECT i, floor(x * 1e6 + 0.5) / 1e6 AS r6,"
        " floor(x * 1e9 + 0.5) / 1e9 AS r9 FROM v ORDER BY i"
    ).fetchall()
    for (i, v), sp, du in zip(enumerate(vals), sp_rows, du_rows):
        py6 = math.floor(v * 1e6 + 0.5) / 1e6
        py9 = math.floor(v * 1e9 + 0.5) / 1e9
        assert sp["r6"] == du[1] == py6, (i, v, sp["r6"], du[1], py6)
        assert sp["r9"] == du[2] == py9, (i, v, sp["r9"], du[2], py9)


def test_r6_tie_rule_matches_engines(spark):
    """The tie-safe round contract: Spark _r6, DuckDB's floor twin, and
    Python floor(x*1e6+0.5)/1e6 agree bit-for-bit — including exact
    7th-decimal ties (the 2.0001705 class where round() split the
    engines) and negative values."""
    import duckdb
    import math

    from kafka_topic_analyzer_spark.queries.lm_quality import _r6

    vals = [
        2.0001705,        # the fuzz-found tie: 8.000682 / 4
        8.000682 / 4,
        0.10000005,       # (0.1 + 0.1000001) / 2
        -2.0001705,
        0.0, 1.0, 3.5, 3.4999995, 27.631021, 1e-7, 5e-7,
        123456.1234565,
    ]
    vals += [v / 4 for v in (0.000001, 0.000002, 0.000003, 8.000682, 13.999998)]
    from pyspark.sql import functions as F

    sp = (
        spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, x double")
        .select("i", _r6(F.col("x")).alias("r"))
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    for i, v in enumerate(vals):
        py = math.floor(v * 1e6 + 0.5) / 1e6
        du = con.execute("SELECT floor(? * 1e6 + 0.5) / 1e6", [v]).fetchone()[0]
        assert sp[i]["r"] == py == du, (v, sp[i]["r"], py, du)
