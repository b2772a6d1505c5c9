"""Planted-extreme semantics for the decontamination manifest (the ACTION
to benchmark_contamination's measurement): drop attribution, the exact
integer gate boundary, unmeasured-doc retention, per-source accounting."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_topic_analyzer_spark.queries.contamination import (
    CONTAM_K,
    DECONTAM_DEN,
    DECONTAM_NUM,
    EVAL_MAX_DOC_ID,
    _decontamination_manifest,
)


def _write_docs(tmp_path, rows):
    d = tmp_path / "decon"
    d.mkdir(exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array(
                [len(r[1]) if r[1] else 0 for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_decontamination_manifest_planted(spark, tmp_path):
    bench_text = " ".join(f"ev{i}" for i in range(CONTAM_K))  # one eval gram
    clean_words = " ".join(f"cl{i}" for i in range(CONTAM_K + 1))
    rows = [
        # the stand-in benchmark (doc_id < EVAL_MAX_DOC_ID)
        (0, bench_text, "bench"),
        # fully contaminated corpus doc: its only k-gram IS the eval gram
        (EVAL_MAX_DOC_ID + 1, bench_text, "sA"),
        # clean doc, same source: k+1 words -> 2 grams, 0 shared
        (EVAL_MAX_DOC_ID + 2, clean_words, "sA"),
        # too short to gram: RETAINED but counted unmeasured
        (EVAL_MAX_DOC_ID + 3, "tiny doc", "sB"),
    ]
    sf = _write_docs(tmp_path, rows)
    out = {r["source"]: r for r in _decontamination_manifest(spark, sf).collect()}

    a = out["sA"]
    assert a["n_docs"] == 2 and a["n_dropped"] == 1 and a["n_retained"] == 1
    assert a["n_unmeasured"] == 0
    assert a["tokens_retained"] == CONTAM_K + 1  # only the clean doc's words
    assert a["retention_rate"] == pytest.approx(0.5, abs=1e-9)

    b = out["sB"]
    assert b["n_docs"] == 1 and b["n_dropped"] == 0
    assert b["n_unmeasured"] == 1 and b["tokens_retained"] == 2
    assert b["retention_rate"] == pytest.approx(1.0, abs=1e-9)


def test_decontamination_gate_boundary_exact(spark, tmp_path):
    """The drop rule n_shared * DEN >= n_grams * NUM is exact-integer: a
    doc at EXACTLY the threshold drops, one gram under it survives.
    With NUM/DEN = 1/5: 10 grams sharing 2 -> dropped; sharing 1 -> kept."""
    assert (DECONTAM_NUM, DECONTAM_DEN) == (1, 5), "test calibrated for 1/5"
    ev = " ".join(f"e{i}" for i in range(CONTAM_K + 1))  # eval grams e0..eK
    # corpus docs built from CONTAM_K+9 words -> 10 distinct grams each;
    # overlap controlled by how many leading eval words they reuse
    def corpus_doc(n_eval_words):
        words = [f"e{i}" for i in range(n_eval_words)] + [
            f"u{i}" for i in range(CONTAM_K + 9 - n_eval_words)
        ]
        return " ".join(words)

    at_bar = corpus_doc(CONTAM_K + 1)  # first 2 grams are eval grams
    under_bar = corpus_doc(CONTAM_K)  # only the first gram is
    rows = [
        (0, ev, "bench"),
        (EVAL_MAX_DOC_ID + 1, at_bar, "at"),
        (EVAL_MAX_DOC_ID + 2, under_bar, "under"),
    ]
    sf = _write_docs(tmp_path, rows)
    out = {r["source"]: r for r in _decontamination_manifest(spark, sf).collect()}
    assert out["at"]["n_dropped"] == 1, "2/10 shared == 1/5 bar -> dropped"
    assert out["under"]["n_dropped"] == 0, "1/10 shared < 1/5 bar -> kept"
