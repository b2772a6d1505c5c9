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


register(
    "doc_fingerprints",
    _doc_fingerprints,
    f"""
SELECT doc_id,
  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS md5_fp,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
    (acc, c) -> (acc * 31 + c) % {TX.ROLLING_HASH_MOD}
  ) AS rolling_fp
FROM documents
""",
)
