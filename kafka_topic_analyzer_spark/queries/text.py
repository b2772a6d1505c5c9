"""Text-analysis queries over ``documents`` (LLM-pipeline operators).

Covers: token counting, quality scoring, language-ID heuristic, document
fingerprinting (md5 + rolling hash), exact-dup clustering. Spark side is
pure built-in expressions (functions/text.py); oracle SQL mirrors each
formula. DuckDB gotcha encoded here: its regexp_replace needs the 'g' flag
to match Spark's replace-all semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.functions import text as TX
from kafka_topic_analyzer_spark.registry import register
from kafka_topic_analyzer_spark.sources.tables import load_table

# --- shared DuckDB snippets (mirror functions/text.py exactly) -------------

_TOKS = r"""CASE WHEN length(trim(text)) = 0 THEN []
            ELSE string_split_regex(trim(text), '\s+') END"""
_NTOK = f"len({_TOKS})"
_STOPS = "('" + "','".join(TX.EN_STOPWORDS) + "')"
_STOP_HITS = f"len(list_filter({_TOKS}, t -> lower(t) IN {_STOPS}))"
_PUNCT = r"length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g'))"
_NOSPACE = r"length(regexp_replace(trim(text), '\s+', '', 'g'))"


def _doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        TX.bpe_token_count(t).alias("n_bpe_tokens"),
        TX.char_count(t).alias("n_chars_measured"),
        TX.avg_token_len(t).alias("avg_token_len"),
        TX.stopword_ratio(t).alias("stopword_ratio"),
        TX.punct_ratio(t).alias("punct_ratio"),
        TX.quality_score(t).alias("quality_score"),
    )


register(
    "doc_token_stats",
    _doc_token_stats,
    rf"""
SELECT doc_id,
  CAST({_NTOK} AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+')) AS BIGINT) AS n_bpe_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_measured,
  round(CASE WHEN {_NTOK} > 0
        THEN CAST({_NOSPACE} AS DOUBLE) / {_NTOK} ELSE 0.0 END, 4) AS avg_token_len,
  round(CASE WHEN {_NTOK} > 0
        THEN CAST({_STOP_HITS} AS DOUBLE) / {_NTOK} ELSE 0.0 END, 4) AS stopword_ratio,
  round(CASE WHEN length(text) > 0
        THEN CAST({_PUNCT} AS DOUBLE) / length(text) ELSE 0.0 END, 4) AS punct_ratio,
  round(0.5 * least(1.0, CAST({_NTOK} AS DOUBLE) / 100.0)
      + 0.3 * (1.0 - round(CASE WHEN {_NTOK} > 0
                THEN CAST({_STOP_HITS} AS DOUBLE) / {_NTOK} ELSE 0.0 END, 4))
      + 0.2 * (1.0 - round(CASE WHEN length(text) > 0
                THEN CAST({_PUNCT} AS DOUBLE) / length(text) ELSE 0.0 END, 4)), 6) AS quality_score
FROM documents
""",
)


def _source_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation view: per-source doc counts + mean quality/len.

    Double means go through exact decimal sums (see relational.py float
    discipline).
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    q = TX.quality_score(t).cast("decimal(18,6)")
    n_tok = TX.token_count(t)
    cnt = F.count(F.lit(1))
    return (
        d.groupBy("source")
        .agg(
            cnt.alias("n_docs"),
            F.sum(n_tok).alias("total_tokens"),
            F.round(F.sum(q).cast("double") / cnt, 6).alias("mean_quality"),
            F.round(F.sum(n_tok).cast("double") / cnt, 4).alias("mean_tokens"),
        )
        .orderBy("source")
    )


register(
    "source_quality_summary",
    _source_quality_summary,
    f"""
WITH scored AS (
  SELECT source,
    CAST({_NTOK} AS BIGINT) AS n_tokens,
    CAST(round(0.5 * least(1.0, CAST({_NTOK} AS DOUBLE) / 100.0)
        + 0.3 * (1.0 - round(CASE WHEN {_NTOK} > 0
                  THEN CAST({_STOP_HITS} AS DOUBLE) / {_NTOK} ELSE 0.0 END, 4))
        + 0.2 * (1.0 - round(CASE WHEN length(text) > 0
                  THEN CAST({_PUNCT} AS DOUBLE) / length(text) ELSE 0.0 END, 4)), 6)
      AS DECIMAL(18,6)) AS q
  FROM documents
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  round(CAST(sum(q) AS DOUBLE) / count(*), 6) AS mean_quality,
  round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 4) AS mean_tokens
FROM scored
GROUP BY source
ORDER BY source
""",
)


def _lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the labeled lang column (confusion counts)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", TX.predicted_lang(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted")
    )


def _lang_score_sql(lang: str) -> str:
    markers = "('" + "','".join(TX.LANG_MARKERS[lang]) + "')"
    return f"len(list_filter({_TOKS}, t -> lower(t) IN {markers}))"


_LANG_PRED = "CASE "
for _lang in TX.LANG_MARKERS:  # first language wins ties, same as Spark side
    _best = ", ".join(_lang_score_sql(lg) for lg in TX.LANG_MARKERS)
    _LANG_PRED += (
        f"WHEN {_lang_score_sql(_lang)} > 0 AND "
        f"{_lang_score_sql(_lang)} >= greatest({_best}) THEN '{_lang}' "
    )
_LANG_PRED += "ELSE 'unknown' END"

register(
    "lang_id_confusion",
    _lang_id_confusion,
    f"""
SELECT lang, {_LANG_PRED} AS predicted, CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY lang, predicted
ORDER BY lang, predicted
""",
)


def _doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        TX.md5_fingerprint(t).alias("md5_fp"),
        TX.rolling_hash_udf(t).alias("rolling_fp"),
    )


def _text_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    cleaned = TX.clean_text(t)
    return d.select(
        "doc_id",
        cleaned.alias("cleaned"),
        F.regexp_count(t, F.lit(TX.HTML_TAG_REGEX)).cast("long").alias("n_tags_removed"),
        (F.length(t) - F.length(cleaned)).cast("long").alias("chars_removed"),
    ).orderBy("doc_id")


# The \x0b/\x7f control strip runs BEFORE the \s+ collapse, so the one
# whitespace-class divergence between Java regex and RE2 (vertical tab)
# can't reach the collapse — cleaned text is engine-identical.
register(
    "text_cleaning",
    _text_cleaning,
    r"""
WITH c AS (
  SELECT doc_id, text,
    trim(regexp_replace(regexp_replace(regexp_replace(
      text, '<[^<>]*>', ' ', 'g'),
      '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
      '\s+', ' ', 'g')) AS cleaned
  FROM documents
)
SELECT doc_id, cleaned,
  CAST(len(regexp_extract_all(text, '<[^<>]*>')) AS BIGINT) AS n_tags_removed,
  CAST(length(text) - length(cleaned) AS BIGINT) AS chars_removed
FROM c ORDER BY doc_id
""",
)


def _pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    # staged counts mirror the staged redaction (see functions/text.py
    # redact_pii): emails counted on raw text, IPs on the email-redacted
    # text, phones on the IP-redacted text.
    s1 = F.regexp_replace(t, TX.EMAIL_REGEX, "<EMAIL>")
    s2 = F.regexp_replace(s1, TX.IPV4_REGEX, "<IP>")
    return d.select(
        "doc_id",
        TX.redact_pii(t).alias("redacted"),
        F.regexp_count(t, F.lit(TX.EMAIL_REGEX)).cast("long").alias("n_emails"),
        F.regexp_count(s1, F.lit(TX.IPV4_REGEX)).cast("long").alias("n_ips"),
        F.regexp_count(s2, F.lit(TX.PHONE_REGEX)).cast("long").alias("n_phones"),
    ).orderBy("doc_id")


# Fixture docs contain no PII, so the oracle also proves NO FALSE
# POSITIVES on 500 real texts; the positive-match semantics are pinned by
# tests/test_extensions.py on synthetic PII.
register(
    "pii_redaction",
    _pii_redaction,
    rf"""
WITH s AS (
  SELECT doc_id, text,
    regexp_replace(text, '{TX.EMAIL_REGEX}', '<EMAIL>', 'g') AS s1
  FROM documents
), s2 AS (
  SELECT *, regexp_replace(s1, '{TX.IPV4_REGEX}', '<IP>', 'g') AS s2 FROM s
)
SELECT doc_id,
  regexp_replace(s2, '{TX.PHONE_REGEX}', '<PHONE>', 'g') AS redacted,
  CAST(len(regexp_extract_all(text, '{TX.EMAIL_REGEX}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(s1, '{TX.IPV4_REGEX}')) AS BIGINT) AS n_ips,
  CAST(len(regexp_extract_all(s2, '{TX.PHONE_REGEX}')) AS BIGINT) AS n_phones
FROM s2 ORDER BY doc_id
""",
)


def _doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: top-bigram concentration and
    type-token ratio. Bigram counts shuffle on (doc_id, bigram) then
    reduce per doc — both map-side combinable; TTR stays scan-side."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        TX.tokens(F.lower(F.col("text"))).alias("t"),
    ).withColumn(
        "bgs",
        # explicit <2 guard: sequence(1, 0) would DESCEND ([1, 0]), not
        # produce an empty array
        F.expr(
            "CASE WHEN size(t) < 2 THEN array() "
            "ELSE transform(sequence(1, size(t) - 1), "
            "i -> concat(element_at(t, CAST(i AS INT)), ' ', element_at(t, CAST(i + 1 AS INT)))) END"
        ),
    )
    per_bigram = (
        base.select("doc_id", F.explode_outer("bgs").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("bg").alias("cnt"))
    )
    per_doc = per_bigram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"), F.max("cnt").alias("top_bigram_count")
    )
    ttr = F.when(
        F.size("t") > 0,
        F.round(F.size(F.array_distinct("t")).cast("double") / F.size("t"), 6),
    ).otherwise(F.lit(0.0))
    ratio = F.when(
        F.col("n_bigrams") > 0,
        F.round(F.col("top_bigram_count").cast("double") / F.col("n_bigrams"), 6),
    ).otherwise(F.lit(0.0))
    return (
        base.select("doc_id", ttr.alias("type_token_ratio"))
        .join(per_doc, "doc_id")
        .select(
            "doc_id",
            "n_bigrams",
            "top_bigram_count",
            ratio.alias("top_bigram_ratio"),
            "type_token_ratio",
        )
        .orderBy("doc_id")
    )


_LTOKS = r"""CASE WHEN length(trim(lower(text))) = 0 THEN []
            ELSE string_split_regex(trim(lower(text)), '\s+') END"""

register(
    "doc_repetition_stats",
    _doc_repetition_stats,
    f"""
WITH t AS (SELECT doc_id, {_LTOKS} AS toks FROM documents),
b AS (
  SELECT doc_id,
    CASE WHEN len(toks) < 2 THEN []
         ELSE [concat(toks[i], ' ', toks[i + 1]) FOR i IN range(1, len(toks))] END AS bgs,
    toks
  FROM t
),
e AS (SELECT doc_id, unnest(bgs) AS bg FROM b),
c AS (SELECT doc_id, bg, count(*) AS cnt FROM e GROUP BY 1, 2),
agg AS (SELECT doc_id, sum(cnt) AS n_bigrams, max(cnt) AS top FROM c GROUP BY 1)
SELECT b.doc_id,
  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
  CAST(coalesce(top, 0) AS BIGINT) AS top_bigram_count,
  CASE WHEN coalesce(n_bigrams, 0) > 0
       THEN round(CAST(top AS DOUBLE) / n_bigrams, 6) ELSE 0.0 END AS top_bigram_ratio,
  CASE WHEN len(toks) > 0
       THEN round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
       ELSE 0.0 END AS type_token_ratio
FROM b LEFT JOIN agg ON b.doc_id = agg.doc_id
ORDER BY b.doc_id
""",
)


register(
    "doc_fingerprints",
    _doc_fingerprints,
    f"""
SELECT doc_id,
  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS md5_fp,
  CASE WHEN text IS NULL THEN NULL ELSE list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
    (acc, c) -> (acc * 31 + c) % {TX.ROLLING_HASH_MOD}
  ) END AS rolling_fp
FROM documents
""",
)


def _sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc sentence segmentation stats via pure built-ins (the hot
    path; the equivalent Python UDTF lives in functions/udtf.py as the
    extension-API demo, equality-tested against this)."""
    d = load_table(spark, sf_dir, "documents")
    parts = F.filter(
        F.transform(F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    base = d.select("doc_id", parts.alias("parts"))
    total_chars = F.aggregate(
        F.col("parts"), F.lit(0), lambda acc, s: acc + F.length(s)
    )
    avg_chars = F.when(
        F.size("parts") > 0,
        F.round(total_chars.cast("double") / F.size("parts"), 6),
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        F.size("parts").cast("long").alias("n_sentences"),
        avg_chars.alias("avg_sentence_chars"),
    ).orderBy("doc_id")


register(
    "sentence_stats",
    _sentence_stats,
    """
WITH p AS (
  SELECT doc_id,
    list_filter(list_transform(string_split_regex(text, '[.!?]+'), s -> trim(s)),
                s -> length(s) > 0) AS parts
  FROM documents
)
SELECT doc_id,
  CAST(len(parts) AS BIGINT) AS n_sentences,
  CASE WHEN len(parts) > 0
       THEN round(CAST(list_sum(list_transform(parts, s -> length(s))) AS DOUBLE)
                  / len(parts), 6)
       ELSE 0.0 END AS avg_sentence_chars
FROM p ORDER BY doc_id
""",
)


def _compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compressibility profile (rows-only: zlib has no SQL
    twin; semantics pinned by unit tests on planted extremes)."""
    d = load_table(spark, sf_dir, "documents")
    r = TX.compression_ratio_udf(F.col("text"))
    return (
        d.select("source", r.alias("ratio"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("ratio"), 6).alias("min_ratio"),
            F.round(F.expr("percentile(ratio, 0.5)"), 6).alias("median_ratio"),
            F.round(F.max("ratio"), 6).alias("max_ratio"),
        )
        .orderBy("source")
    )


register("compression_quality", _compression_quality, None)


def _compression_roundtrip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable audit of the zlib path: per source, the exact doc
    count (hash-checked) plus booleans asserting (a) every document
    survives a compress→decompress roundtrip and (b) every ratio stays in
    the sane (0, 2] band — for documents of >= 64 raw bytes, because
    below that zlib's fixed header dominates and a 1-char doc's ratio is
    legitimately ~9 (pinned by the adversarial fuzz fixture); tiny docs
    are vacuously sane. zlib itself has no SQL twin; this pins its
    invariants with a value the driver CAN hash."""
    d = load_table(spark, sf_dir, "documents")
    rt = TX.compression_roundtrip_udf(F.col("text"))
    r = TX.compression_ratio_udf(F.col("text"))
    return (
        d.select("source", F.length("text").alias("n"), rt.alias("rt"), r.alias("ratio"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("bool_and(rt)").alias("all_roundtrip"),
            F.expr(
                "bool_and(n < 64 OR (ratio > 0 AND ratio <= 2.0))"
            ).alias("all_ratio_sane"),
        )
        .orderBy("source")
    )


register(
    "compression_roundtrip_audit",
    _compression_roundtrip_audit,
    """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       true AS all_roundtrip, true AS all_ratio_sane
FROM documents
GROUP BY source
ORDER BY source
""",
)


def _bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-familiarity quality signal: how common a document's bigrams
    are across the corpus — the integer-count cousin of an n-gram LM
    perplexity score (natural text reuses common collocations; gibberish
    and boilerplate sit at the extremes). Per doc over its DISTINCT
    bigrams: document-frequency sum, mean df (familiarity), and the count
    of corpus-unique bigrams (df == 1).

    Scale shape: distinct (doc, bigram) explode -> one groupBy(bigram) for
    df (map-side combinable) -> join back on bigram -> one groupBy(doc).
    Everything integer until the final rounded division, so the oracle
    hash-matches exactly.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", TX.tokens(F.lower(F.col("text"))).alias("t")
    ).withColumn(
        "bgs",
        F.expr(
            "CASE WHEN size(t) < 2 THEN array() "
            "ELSE transform(sequence(1, size(t) - 1), "
            "i -> concat(element_at(t, CAST(i AS INT)), ' ', element_at(t, CAST(i + 1 AS INT)))) END"
        ),
    )
    # materialize the exploded (doc, bigram) set once: it feeds BOTH the
    # df aggregate and the join probe side, and Catalyst re-plans the
    # tokenize/explode subtree per consumer (same policy as the simhash /
    # tf-idf index materialization)
    doc_bg = base.select(
        "doc_id", F.explode(F.array_distinct("bgs")).alias("bg")
    ).localCheckpoint(eager=True)
    df_tbl = doc_bg.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("df"))
    per_doc = (
        doc_bg.join(df_tbl, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_bigrams"),
            F.sum("df").cast("long").alias("df_sum"),
            F.sum((F.col("df") == 1).cast("long")).cast("long").alias("n_corpus_unique"),
        )
    )
    fam = F.round(
        F.col("df_sum").cast("double") / F.col("n_distinct_bigrams"), 6
    )
    return (
        base.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_distinct_bigrams", F.lit(0)).alias("n_distinct_bigrams"),
            F.coalesce("df_sum", F.lit(0)).alias("df_sum"),
            F.coalesce("n_corpus_unique", F.lit(0)).alias("n_corpus_unique"),
            F.coalesce(fam, F.lit(0.0)).alias("familiarity"),
        )
        .orderBy("doc_id")
    )


register(
    "bigram_familiarity",
    _bigram_familiarity,
    f"""
WITH t AS (SELECT doc_id, {_LTOKS} AS toks FROM documents),
b AS (
  SELECT doc_id,
    CASE WHEN len(toks) < 2 THEN []
         ELSE [concat(toks[i], ' ', toks[i + 1]) FOR i IN range(1, len(toks))] END AS bgs
  FROM t
),
doc_bg AS (SELECT doc_id, unnest(list_distinct(bgs)) AS bg FROM b),
df_tbl AS (SELECT bg, CAST(count(*) AS BIGINT) AS df FROM doc_bg GROUP BY bg),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
         CAST(sum(df) AS BIGINT) AS df_sum,
         CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_corpus_unique
  FROM doc_bg JOIN df_tbl USING (bg)
  GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(n_distinct_bigrams, 0) AS n_distinct_bigrams,
       COALESCE(df_sum, 0) AS df_sum,
       COALESCE(n_corpus_unique, 0) AS n_corpus_unique,
       COALESCE(round(CAST(df_sum AS DOUBLE) / n_distinct_bigrams, 6), 0.0) AS familiarity
FROM b LEFT JOIN per_doc ON b.doc_id = per_doc.doc_id
ORDER BY b.doc_id
""",
)
