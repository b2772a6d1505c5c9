"""Seeded fuzz parity: text operators vs their DuckDB oracle formulas on
generated inputs far nastier than the fixtures (boundary lengths, repeated
separators, tag fragments, PII-lookalikes).

Alphabet is printable ASCII + \\t\\n — deliberately excluding \\x0b and
unicode spaces, where Java regex and RE2 genuinely diverge on \\s (a
documented engine difference, not a bug; clean_text strips control chars
before any \\s so IT stays portable on the full range).
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

WORDS = ["the", "fox", "a1", "<b>", "</b>", "<div class='x'>", "e@x.io",
         "1.2.3.4", "...", "!!", "hi?", "end.", "", " ", "\t", "\n",
         "data", "10.0.0.255", "+1 (555) 000-1111x", "<", ">", "<>"]


def _gen_texts(n: int = 250) -> list[tuple[int, str]]:
    rng = random.Random(20260813)
    out = []
    for i in range(n):
        k = rng.randint(0, 40)
        out.append((i, rng.choice([" ", ""]).join(rng.choice(WORDS) for _ in range(k))))
    # adversarial lengths around the chunking stride/window boundaries
    for j, ln in enumerate([0, 1, 149, 150, 151, 199, 200, 201, 349, 350, 351]):
        out.append((1000 + j, "x" * ln))
    return out


@pytest.fixture(scope="module")
def fuzz_docs(spark):
    df = spark.createDataFrame(_gen_texts(), "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    return df, con


def _compare(spark_df, con, sql, key="doc_id"):
    got = {tuple(r) for r in spark_df.collect()}
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


def test_clean_text_fuzz(fuzz_docs):
    from kafka_topic_analyzer_spark.functions.text import clean_text

    df, con = fuzz_docs
    _compare(
        df.select("doc_id", clean_text(F.col("text")).alias("c")),
        con,
        r"""SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
              text, '<[^<>]*>', ' ', 'g'),
              '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
              '\s+', ' ', 'g')) FROM documents""",
    )


def test_chunking_fuzz(fuzz_docs):
    df, con = fuzz_docs
    from kafka_topic_analyzer_spark.queries.curation import CHUNK_CHARS, CHUNK_STRIDE

    chunks = df.where(F.length("text") > 0).select(
        "doc_id",
        F.explode(
            F.expr(
                f"sequence(0L, cast(ceil(length(text) / double({CHUNK_STRIDE})) as long) - 1L)"
            )
        ).alias("i"),
        F.col("text"),
    ).select(
        "doc_id",
        "i",
        F.substring(F.col("text"), F.col("i").cast("int") * CHUNK_STRIDE + 1, CHUNK_CHARS).alias("c"),
    )
    _compare(
        chunks,
        con,
        f"""SELECT doc_id, chunk_idx,
              substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_CHARS})
            FROM (SELECT doc_id, text,
                    unnest(range(0, CAST(ceil(length(text) / {CHUNK_STRIDE}.0) AS BIGINT))) AS chunk_idx
                  FROM documents WHERE length(text) > 0)""",
    )


def test_pii_redaction_fuzz(fuzz_docs):
    from kafka_topic_analyzer_spark.functions.text import (
        EMAIL_REGEX,
        IPV4_REGEX,
        PHONE_REGEX,
        redact_pii,
    )

    df, con = fuzz_docs
    _compare(
        df.select("doc_id", redact_pii(F.col("text")).alias("r")),
        con,
        f"""SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(
                text, '{EMAIL_REGEX}', '<EMAIL>', 'g'),
                '{IPV4_REGEX}', '<IP>', 'g'),
                '{PHONE_REGEX}', '<PHONE>', 'g')
            FROM documents""",
    )


def test_sentence_split_fuzz(fuzz_docs):
    df, con = fuzz_docs
    parts = F.filter(
        F.transform(F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    _compare(
        df.select("doc_id", F.concat_ws("\x1f", parts).alias("s")),
        con,
        """SELECT doc_id,
             -- coalesce: DuckDB array_to_string([]) is NULL, Spark
             -- concat_ws over an empty array is '' (representation only)
             coalesce(array_to_string(list_filter(list_transform(
               string_split_regex(text, '[.!?]+'), s -> trim(s)),
               s -> length(s) > 0), chr(31)), '')
           FROM documents""",
    )


def test_known_unicode_casing_divergences_are_pinned(spark, duck):
    """The engine's text semantics are the JVM's Unicode rules (Spark
    `lower`); the DuckDB oracle harness differs on exactly two known
    mappings — pinned here so an engine upgrade that silently changes
    either side is caught, and so the divergence class is documented
    rather than latent:

    - U+0130 'İ' (Turkish capital dotted I): JVM lowers to 'i' + U+0307
      combining dot (2 codepoints); DuckDB to plain 'i'.
    - word-final 'Σ': the JVM applies the context-aware final-sigma rule
      ('ς'); DuckDB maps every 'Σ' to 'σ'.

    The companion guarantee (test below) is that the shipped fixtures
    contain none of these codepoints, so oracle-parity green never
    silently depends on matching behavior that does not match.
    """
    from pyspark.sql import functions as F

    rows = (
        spark.createDataFrame([("İ",), ("ΣΟΦΟΣ",)], "t string")
        .select("t", F.lower("t").alias("lo"))
        .collect()
    )
    jvm = {r["t"]: r["lo"] for r in rows}
    assert jvm["İ"] == "i̇"
    assert jvm["ΣΟΦΟΣ"] == "σοφος"  # final sigma
    got = dict(
        duck.execute("SELECT t, lower(t) FROM (VALUES ('İ'), ('ΣΟΦΟΣ')) v(t)").fetchall()
    )
    assert got["İ"] == "i"
    assert got["ΣΟΦΟΣ"] == "σοφοσ"  # no final-sigma rule


def test_fixtures_avoid_casing_divergent_codepoints(duck):
    """Guard: the testdata corpora carry none of the codepoints on which
    the two engines' lower() disagree (see test above)."""
    from tests.conftest import SF_ORACLE, SF_SMOKE

    for sf in (SF_SMOKE, SF_ORACLE):
        n = duck.execute(
            f"SELECT count(*) FROM '{sf}/documents.parquet'"
            " WHERE regexp_matches(text, '[İΣ]')"
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} docs carry casing-divergent codepoints"
