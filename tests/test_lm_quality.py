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
