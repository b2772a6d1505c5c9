"""Corpus-curation queries: the batch operators a training-data pipeline
runs between "raw corpus" and "tokenized shards".

The reference engine has no analogue (it never inspects payloads,
`src/metric.rs:218-245`); these extend the engine the way SURVEY.md §7/M5
prescribes. Everything here is pure built-in expressions — per-row
projections and one aggregation shuffle at most — so the 100 TB story is
the scan itself:

- sampling filters evaluate next to the scan (no shuffle, no UDF);
- the histogram reduces to ~20 groups via map-side partial aggregation;
- window-based operators (packing, percentile gate) partition by a
  bounded-cardinality key (source / lang). At 100 TB a single source
  could still overload one task; the scale-out is a composite partition
  key (source, shard) — IMPLEMENTED for packing as the two-level
  distributed prefix sum `sequence_packing_scalable` (operators/
  pipeline.py packed_offsets_scalable, bit-identical to the plain
  window, proven by sharing its oracle) — and for the quality gate as
  the histogram-quantile threshold (`quality_percentile_gate_scalable`:
  integer micro-score histogram -> per-lang threshold -> scan-side
  filter; no corpus-sized window). See operators/skew.py for the
  general skew toolkit.

Determinism/oracle discipline: "random" sampling is md5-bucket based —
both engines produce identical lowercase hex for identical bytes, so the
sampled set is bit-for-bit reproducible (a property a production pipeline
wants anyway: re-runs select the same rows). Float outputs go through
exact integer/decimal arithmetic and round(...) before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kafka_topic_analyzer_spark.functions import text as TX
from kafka_topic_analyzer_spark.registry import register
from kafka_topic_analyzer_spark.sources.tables import load_table

# md5-derived uniform bucket: first 4 hex chars compared lexically against a
# threshold = floor(rate * 0x10000) in hex. Identical strings on both
# engines -> identical selection, no RNG state anywhere.
# coalesce to '' so NULL text sorts/compares identically on both engines:
# Spark windows default NULLS FIRST ascending, DuckDB NULLS LAST — an
# engine-default divergence the NULL-row fuzz fixture exposed
_MD5_PREFIX_SQL = "coalesce(substr(md5(text), 1, 4), '0000')"


def _md5_prefix(text: F.Column) -> F.Column:
    return TX.md5_bucket_prefix(text)


def _stratified_sample_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling audit: per-language target rates
    (en kept at 25%, everything else at 50% — the usual "downsample the
    over-represented stratum" move), realized counts and rates.

    Scale: the sample predicate is a scan-side filter (md5 + substring,
    whole-stage codegen); the audit aggregation is 4 groups. At 100 TB
    the selected subset would be written out partitioned — the predicate
    itself never shuffles.
    """
    d = load_table(spark, sf_dir, "documents")
    # thresholds: 25% = 0x4000, 50% = 0x8000 (exclusive upper bound)
    thresh = F.when(F.col("lang") == "en", F.lit("4000")).otherwise(F.lit("8000"))
    sampled = (_md5_prefix(F.col("text")) < thresh).cast("int")
    n = F.count(F.lit(1))
    n_samp = F.sum(sampled)
    return (
        d.groupBy("lang")
        .agg(
            n.alias("n_docs"),
            n_samp.cast("long").alias("n_sampled"),
            F.round(n_samp.cast("double") / n, 4).alias("realized_rate"),
        )
        .orderBy("lang")
    )


register(
    "stratified_sample_summary",
    _stratified_sample_summary,
    f"""
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN {_MD5_PREFIX_SQL} < (CASE WHEN lang = 'en' THEN '4000' ELSE '8000' END)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
  round(CAST(sum(CASE WHEN {_MD5_PREFIX_SQL} < (CASE WHEN lang = 'en' THEN '4000' ELSE '8000' END)
                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS realized_rate
FROM documents
GROUP BY lang
ORDER BY lang
""",
)


def _per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample: 3 docs per source, chosen by
    md5 order — the reproducible stand-in for per-stratum reservoir
    sampling (eval sets, human-review draws).

    Scale: one shuffle on source; row_number needs no global sort. With a
    skewed group the md5-order rank can instead be computed as a top-k
    per partition then re-ranked (bounded memory) — Spark's window
    already spills, so the plain form holds far past sf0.1.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(_md5_prefix(F.col("text")), F.col("doc_id"))
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("draw_rank"))
        .where(F.col("draw_rank") <= 3)
        .orderBy("source", "draw_rank")
    )


_PER_GROUP_SAMPLE_ORACLE = f"""
SELECT doc_id, source, CAST(draw_rank AS INT) AS draw_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY {_MD5_PREFIX_SQL}, doc_id) AS draw_rank
  FROM documents
) WHERE draw_rank <= 3
ORDER BY source, draw_rank
"""


def _per_group_sample_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-free twin of per_group_sample: the exact form's per-source
    row_number is a corpus-sized window partition at 100 TB (one task
    per source). The twin prunes each input task to its local 3-per-
    source minimum-md5 rows first, then ranks the bounded survivor set
    exactly (operators/ranks.py:topk_per_group) — the claim the exact
    form's docstring only described, made real and hash-proven: shares
    the oracle SQL VERBATIM."""
    from kafka_topic_analyzer_spark.operators.ranks import topk_per_group

    d = load_table(spark, sf_dir, "documents")
    return (
        topk_per_group(
            d.select("doc_id", "source", "text"),
            ["source"],
            [_md5_prefix(F.col("text")).asc(), F.col("doc_id").asc()],
            3,
            rank_col="draw_rank",
        )
        .select("doc_id", "source", "draw_rank")
        .orderBy("source", "draw_rank")
    )


register(
    "per_group_sample",
    _per_group_sample,
    _PER_GROUP_SAMPLE_ORACLE,
)
register(
    "per_group_sample_scalable",
    _per_group_sample_scalable,
    _PER_GROUP_SAMPLE_ORACLE,
)


def _event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram of events.value: 20 bins of width 25 over
    [0, 500), top bin clamped. Per-bin count + exact-decimal sum.

    Scale: partial aggregation reduces every scan task to <=20 rows
    before the (tiny) shuffle — the canonical map-side-combine win.
    """
    e = load_table(spark, sf_dir, "events")
    bin_id = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("int")
    return (
        e.groupBy(bin_id.alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .orderBy("bin_id")
    )


register(
    "event_value_histogram",
    _event_value_histogram,
    """
SELECT CAST(least(floor(value / 25.0), 19) AS INT) AS bin_id,
  CAST(count(*) AS BIGINT) AS n_events,
  round(min(value), 4) AS min_value,
  round(max(value), 4) AS max_value,
  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
FROM events
GROUP BY bin_id
ORDER BY bin_id
""",
)


def _quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the top quality quartile per language — the distribution-aware
    version of a fixed-threshold quality filter (robust to per-language
    score shifts). Emits the surviving docs with their percentile.

    Scale: percent_rank partitions by lang (bounded cardinality). The
    100 TB variant computes approx thresholds (approx_percentile per
    lang, a tiny aggregate), broadcasts them, and filters scan-side —
    same semantics minus exact tie handling; this exact form is the
    oracle-checked definition.
    """
    d = load_table(spark, sf_dir, "documents")
    q = TX.quality_score(F.col("text"))
    w = Window.partitionBy("lang").orderBy(F.col("quality_score"))
    return (
        d.select("doc_id", "lang", q.alias("quality_score"))
        .withColumn("pctile", F.round(F.percent_rank().over(w), 6))
        .where(F.col("pctile") >= 0.75)
        .orderBy("lang", "doc_id")
    )


_QSCORE = """round(0.5 * least(1.0, CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        ELSE len(string_split_regex(trim(text), '\\s+')) END AS DOUBLE) / 100.0)
  + 0.3 * (1.0 - round(CASE WHEN length(trim(text)) > 0
        THEN CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                  t -> lower(t) IN ('{stops}'))) AS DOUBLE)
             / len(string_split_regex(trim(text), '\\s+')) ELSE 0.0 END, 4))
  + 0.2 * (1.0 - round(CASE WHEN length(text) > 0
        THEN CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
             / length(text) ELSE 0.0 END, 4)), 6)""".format(
    stops="','".join(TX.EN_STOPWORDS)
)

register(
    "quality_percentile_gate",
    _quality_percentile_gate,
    f"""
WITH scored AS (SELECT doc_id, lang, {_QSCORE} AS quality_score FROM documents)
SELECT doc_id, lang, quality_score, pctile FROM (
  SELECT doc_id, lang, quality_score,
         round(percent_rank() OVER (PARTITION BY lang ORDER BY quality_score), 6) AS pctile
  FROM scored
) WHERE pctile >= 0.75
ORDER BY lang, doc_id
""",
)


def _quality_percentile_gate_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-free 100 TB form of the distribution-aware quality
    gate: instead of percent_rank over every row (one task per lang),
    derive the per-lang top-quartile THRESHOLD from a score histogram
    and filter scan-side — the classic histogram-quantile two-pass.

    Shape: scores quantize to exact integer micro-units (hash-safe — no
    float interpolation anywhere); the histogram groupBy is map-side
    combined and vocabulary-sized (distinct scores per lang); the
    cumulative window runs over the HISTOGRAM rows, not the corpus; the
    thresholds broadcast back null-safely and the keep-filter evaluates
    next to the scan. Threshold semantics: the largest score whose
    descending cumulative count reaches ceil(n/4) — the minimal
    top-by-value set that includes boundary ties (so it can keep
    slightly MORE than 25%, never less). NULL-quality docs (NULL text)
    are excluded by explicit policy on both engines — a quality gate
    cannot pass an unscorable doc.
    """
    d = load_table(spark, sf_dir, "documents")
    q = TX.quality_score(F.col("text"))
    scored = (
        d.select(
            "doc_id",
            "lang",
            F.round(q * 1000000).cast("long").alias("q_micro"),
        )
        .where(F.col("q_micro").isNotNull())
    )
    hist = scored.groupBy("lang", "q_micro").agg(F.count(F.lit(1)).alias("c"))
    n_by_lang = scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    cum_w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("q_micro"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    thr = (
        hist.withColumn("cum", F.sum("c").over(cum_w))
        .join(n_by_lang.withColumnRenamed("lang", "_nl"),
              F.col("lang").eqNullSafe(F.col("_nl")))
        .where(F.col("cum") >= F.ceil(F.col("n") / F.lit(4.0)))
        .groupBy("lang")
        .agg(F.max("q_micro").alias("thr"))
        .select(F.col("lang").alias("_tl"), "thr")
    )
    return (
        scored.join(F.broadcast(thr), F.col("lang").eqNullSafe(F.col("_tl")))
        .where(F.col("q_micro") >= F.col("thr"))
        .select("doc_id", "lang", "q_micro", "thr")
        .orderBy("lang", "doc_id")
    )


register(
    "quality_percentile_gate_scalable",
    _quality_percentile_gate_scalable,
    f"""
WITH scored AS (
  SELECT doc_id, lang, CAST(round(({_QSCORE}) * 1000000) AS BIGINT) AS q_micro
  FROM documents
),
nn AS (SELECT * FROM scored WHERE q_micro IS NOT NULL),
hist AS (SELECT lang, q_micro, CAST(count(*) AS BIGINT) AS c FROM nn GROUP BY 1, 2),
cum AS (
  SELECT lang, q_micro,
         CAST(sum(c) OVER (PARTITION BY lang ORDER BY q_micro DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM hist
),
n_by AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM nn GROUP BY 1),
thr AS (
  SELECT cum.lang, CAST(max(q_micro) AS BIGINT) AS thr
  FROM cum JOIN n_by ON cum.lang IS NOT DISTINCT FROM n_by.lang
  WHERE cum >= CAST(ceil(n / 4.0) AS BIGINT)
  GROUP BY cum.lang
)
SELECT doc_id, nn.lang AS lang, q_micro, thr
FROM nn JOIN thr ON nn.lang IS NOT DISTINCT FROM thr.lang
WHERE q_micro >= thr
ORDER BY lang, doc_id
""",
)


def _sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing plan: concatenate each source's docs in
    doc_id order and assign every doc the 2048-token window its first
    token lands in — the deterministic offset-packing a tokenizer shard
    writer executes.

    Scale: one window per source; integer-only arithmetic. Production
    form packs per (source, shard) so no single task owns a whole
    source; assignment math is unchanged.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tok = TX.token_count(F.col("text"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tok_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        d.select("doc_id", "source", n_tok.alias("n_tokens"))
        .withColumn("token_start", tok_before)
        .withColumn("seq_id", (F.col("token_start") / 2048).cast("long"))
        .withColumn("seq_offset", F.col("token_start") % 2048)
        .orderBy("source", "doc_id")
    )


_NTOK_SQL = """CAST(CASE WHEN length(trim(text)) = 0 THEN 0
  ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)"""

register(
    "sequence_packing",
    _sequence_packing,
    f"""
WITH sized AS (SELECT doc_id, source, {_NTOK_SQL} AS n_tokens FROM documents)
SELECT doc_id, source, n_tokens, token_start,
  CAST(floor(token_start / 2048) AS BIGINT) AS seq_id,
  token_start % 2048 AS seq_offset
FROM (
  -- DuckDB widens windowed sum(BIGINT) to HUGEINT; pin it back to BIGINT
  SELECT doc_id, source, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
  FROM sized
)
ORDER BY source, doc_id
""",
)


def _sequence_packing_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME packing plan as sequence_packing, computed by the
    two-level distributed prefix sum (operators/pipeline.py
    packed_offsets_scalable): rows split into 32 contiguous doc_id
    ranges, per-(source, shard) local running sums in parallel, shard
    bases from a tiny cumulative window, broadcast-joined back. A plain
    per-source window materializes each source in ONE task — the
    bottleneck this removes at 100 TB. Bit-identical output is the
    point: this query shares sequence_packing's oracle verbatim, so the
    driver hash proves the scalable plan computes exactly the
    single-window semantics."""
    from kafka_topic_analyzer_spark.operators.pipeline import (
        packed_offsets_scalable,
    )

    d = load_table(spark, sf_dir, "documents")
    n_tok = TX.token_count(F.col("text"))
    sized = d.select("doc_id", "source", n_tok.alias("n_tokens"))
    return (
        # shards auto-scale from the input row count (~1M rows/shard,
        # min 32) — the r8 sizing rule, SCALING.md
        packed_offsets_scalable(sized, "source", "doc_id", "n_tokens")
        .withColumn("seq_id", (F.col("token_start") / 2048).cast("long"))
        .withColumn("seq_offset", F.col("token_start") % 2048)
        .select(
            "doc_id", "source", "n_tokens", "token_start", "seq_id", "seq_offset"
        )
        .orderBy("source", "doc_id")
    )


register(
    "sequence_packing_scalable",
    _sequence_packing_scalable,
    f"""
WITH sized AS (SELECT doc_id, source, {_NTOK_SQL} AS n_tokens FROM documents)
SELECT doc_id, source, n_tokens, token_start,
  CAST(floor(token_start / 2048) AS BIGINT) AS seq_id,
  token_start % 2048 AS seq_offset
FROM (
  SELECT doc_id, source, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
  FROM sized
)
ORDER BY source, doc_id
""",
)


def _packing_fragmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source packing FRAGMENTATION audit: how many documents cross a
    context-window boundary under the 2048-token packing — the shard
    writer's attention-mask diagnostic (a doc spanning windows either gets
    truncated, re-padded, or needs cross-window attention masking; the
    crossing rate tells the owner which packing policy the corpus can
    afford). ``span_windows`` = windows a doc's tokens touch; docs with
    0 or 1 token span exactly one window by definition.

    Built ON the scale path: offsets come from ``packed_offsets_scalable``
    (the same two-level prefix sum the production writer runs), then one
    source-sized map-combinable aggregate. The oracle mirrors the exact
    single-window semantics — the hash doubles as one more proof the
    sharded prefix sum equals the window form.
    """
    from kafka_topic_analyzer_spark.operators.pipeline import (
        packed_offsets_scalable,
    )
    from kafka_topic_analyzer_spark.queries.lm_quality import _r6

    d = load_table(spark, sf_dir, "documents")
    n_tok = TX.token_count(F.col("text"))
    sized = d.select("doc_id", "source", n_tok.alias("n_tokens"))
    spans = packed_offsets_scalable(sized, "source", "doc_id", "n_tokens").select(
        "source",
        F.floor(F.col("token_start") / 2048).cast("long").alias("s0"),
        F.floor(
            (F.col("token_start") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
            / 2048
        )
        .cast("long")
        .alias("s1"),
    )
    return (
        spans.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("s1") > F.col("s0")).cast("long"))
            .cast("long")
            .alias("n_crossing"),
            F.max(F.col("s1") - F.col("s0") + 1).cast("long").alias("max_span_windows"),
        )
        .select(
            "source",
            "n_docs",
            "n_crossing",
            _r6(F.col("n_crossing").cast("double") / F.col("n_docs")).alias(
                "crossing_rate"
            ),
            "max_span_windows",
        )
        .orderBy(F.asc_nulls_last("source"))
    )


register(
    "packing_fragmentation",
    _packing_fragmentation,
    f"""
WITH sized AS (SELECT doc_id, source, {_NTOK_SQL} AS n_tokens FROM documents),
off AS (
  SELECT source, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
  FROM sized
),
spans AS (
  SELECT source,
         CAST(floor(token_start / 2048) AS BIGINT) AS s0,
         CAST(floor((token_start + greatest(n_tokens, 1) - 1) / 2048) AS BIGINT) AS s1
  FROM off
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s1 > s0 THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing,
       floor((CAST(sum(CASE WHEN s1 > s0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS crossing_rate,
       CAST(max(s1 - s0 + 1) AS BIGINT) AS max_span_windows
FROM spans
GROUP BY source
ORDER BY source NULLS LAST
""",
)


def _training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of the full shard-pipeline selection (exact dedup -> quality
    gate -> deterministic downsample; operators/pipeline.py): per-language
    doc/token counts. The same selection feeds build_training_shards'
    parquet writer, so hash-matching this manifest oracle-checks the whole
    pipeline's selection logic end to end."""
    from kafka_topic_analyzer_spark.operators.pipeline import shard_manifest

    return shard_manifest(load_table(spark, sf_dir, "documents"))


register(
    "training_shard_manifest",
    _training_shard_manifest,
    rf"""
WITH scored AS (
  SELECT doc_id, lang,
    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
    {_NTOK_SQL} AS n_tokens,
    {_QSCORE} AS quality,
    {_MD5_PREFIX_SQL} AS bucket
  FROM documents
  WHERE text IS NOT NULL  -- explicit NULL-text policy: no trainable tokens
),
dedup AS (
  SELECT * FROM (
    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep FROM scored
  ) WHERE doc_id = keep
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_fp
FROM dedup
WHERE quality >= 0.5 AND bucket < '8000'
GROUP BY lang
ORDER BY lang
""",
)


CHUNK_CHARS = 200
CHUNK_STRIDE = 150  # 50-char overlap between adjacent chunks


def _doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping character chunking: windows of CHUNK_CHARS
    every CHUNK_STRIDE chars (start < len, so the tail chunk may be
    short; empty docs yield no chunks). Pure scan-side explode — chunk
    count, not corpus size, is the only row amplification."""
    d = load_table(spark, sf_dir, "documents")
    n_chunks = F.ceil(F.length("text").cast("double") / CHUNK_STRIDE).cast("int")
    # sequence(0, -1) would DESCEND, so empty docs are filtered first
    chunks = d.where(F.length("text") > 0).select(
        "doc_id",
        F.explode(
            F.expr(
                f"sequence(0L, cast(ceil(length(text) / double({CHUNK_STRIDE})) as long) - 1L)"
            )
        ).alias("chunk_idx"),
        F.col("text"),
    )
    chunk_text = F.substring(
        F.col("text"), F.col("chunk_idx").cast("int") * CHUNK_STRIDE + 1, CHUNK_CHARS
    )
    return (
        chunks.select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx").cast("long") * CHUNK_STRIDE).alias("chunk_start"),
            chunk_text.alias("chunk_text"),
            F.length(chunk_text).cast("long").alias("chunk_len"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


register(
    "doc_chunking",
    _doc_chunking,
    f"""
WITH c AS (
  SELECT doc_id, text, unnest(range(0, CAST(ceil(length(text) / {CHUNK_STRIDE}.0) AS BIGINT))) AS chunk_idx
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
  CAST(chunk_idx AS BIGINT) AS chunk_idx,
  CAST(chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
  substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_CHARS}) AS chunk_text,
  CAST(length(substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_CHARS})) AS BIGINT) AS chunk_len
FROM c ORDER BY doc_id, chunk_idx
""",
)


def _source_char_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF-rung demo with an oracle: exact-integer median absolute
    deviation per source (operators/grouped.py char_dispersion_udaf)."""
    from kafka_topic_analyzer_spark.operators.grouped import source_char_dispersion

    return source_char_dispersion(load_table(spark, sf_dir, "documents"))


register(
    "source_char_dispersion",
    _source_char_dispersion,
    """
WITH m AS (
  SELECT source, count(*) AS n_docs,
         CAST(round(2 * median(n_chars)) AS BIGINT) AS med2
  FROM documents GROUP BY source
)
SELECT d.source, CAST(m.n_docs AS BIGINT) AS n_docs,
       CAST(sum(abs(2 * d.n_chars - m.med2)) AS BIGINT) AS total_abs_dev_x2
FROM documents d JOIN m ON d.source IS NOT DISTINCT FROM m.source
GROUP BY d.source, m.n_docs
ORDER BY d.source
""",
)


def _per_lang_length_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas rung with an oracle: per-language
    min-max normalized doc length (operators/grouped.py)."""
    from kafka_topic_analyzer_spark.operators.grouped import per_group_minmax_norm

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return per_group_minmax_norm(d, "lang", "n_chars", "len_norm").orderBy("doc_id")


register(
    "per_lang_length_norm",
    _per_lang_length_norm,
    """
WITH w AS (
  SELECT doc_id, lang, n_chars,
         min(n_chars) OVER (PARTITION BY lang) AS lo,
         max(n_chars) OVER (PARTITION BY lang) AS hi
  FROM documents
)
SELECT doc_id, lang,
  CASE WHEN hi = lo THEN 0.0
       ELSE floor((CAST(n_chars - lo AS DOUBLE) / (hi - lo)) * 1000000.0 + 0.5)
            / 1000000.0 END AS len_norm
FROM w ORDER BY doc_id
""",
)


def _source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights: per-source deterministic keep-rate that
    reshapes the natural token distribution toward a uniform target
    share (the pre-training mixture step). keep_rate = min(1, target /
    natural); exact-integer token sums, one tiny aggregate — the rates
    then drive the md5-bucket sampler scan-side at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(TX.token_count(F.col("text"))).alias("total_tokens")
    )
    total = Window.partitionBy()
    natural = F.col("total_tokens").cast("double") / F.sum("total_tokens").over(total)
    n_sources = F.count(F.lit(1)).over(total)
    target = F.lit(1.0) / n_sources
    keep = F.least(F.lit(1.0), target / natural)
    return (
        per_source.select(
            "source",
            "total_tokens",
            F.round(natural, 6).alias("natural_share"),
            F.round(target, 6).alias("target_share"),
            F.round(keep, 6).alias("keep_rate"),
            F.floor(keep * F.col("total_tokens")).cast("long").alias("expected_tokens"),
        )
        .orderBy("source")
    )


register(
    "source_mixing_weights",
    _source_mixing_weights,
    f"""
WITH per_source AS (
  SELECT source, CAST(sum({_NTOK_SQL}) AS BIGINT) AS total_tokens
  FROM documents GROUP BY source
),
shares AS (
  SELECT source, total_tokens,
    CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER () AS nat_share,
    1.0 / count(*) OVER () AS tgt_share
  FROM per_source
)
SELECT source, total_tokens,
  round(nat_share, 6) AS natural_share,
  round(tgt_share, 6) AS target_share,
  round(least(1.0, tgt_share / nat_share), 6) AS keep_rate,
  CAST(floor(least(1.0, tgt_share / nat_share) * total_tokens) AS BIGINT) AS expected_tokens
FROM shares ORDER BY source
""",
)


def _corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus overview — the dashboard headline a curation run
    opens with: volume, token mass, exact-dup rate, language/source
    breadth, mean quality. Single scan, one global aggregate."""
    d = load_table(spark, sf_dir, "documents")
    q = TX.quality_score(F.col("text")).cast("decimal(18,6)")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.token_count(F.col("text"))).alias("total_tokens"),
        F.countDistinct(TX.md5_fingerprint(F.col("text"))).alias("n_unique_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.sum(q).cast("double") / F.count(F.lit(1)), 6).alias("mean_quality"),
    )


register(
    "corpus_summary",
    _corpus_summary,
    rf"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum({_NTOK_SQL}) AS BIGINT) AS total_tokens,
  CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS BIGINT)
    AS n_unique_docs,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
  round(CAST(sum(CAST({_QSCORE} AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
    AS mean_quality
FROM documents
""",
)


def _mixed_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end mixture application: the per-source keep-rates from
    source_mixing_weights applied through the deterministic md5 bucket
    (keep iff bucket < floor(rate * 0x10000)), audited as realized
    per-source token counts. The rates are a 20-row broadcast join onto
    the scan-side filter — the selection itself never shuffles."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", TX.token_count(F.col("text"))
    )
    per_source = d.groupBy("source").agg(F.sum("n_tokens").alias("total_tokens"))
    w = Window.partitionBy()
    keep = F.least(
        F.lit(1.0),
        (F.lit(1.0) / F.count(F.lit(1)).over(w))
        / (F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w)),
    )
    rates = per_source.select(
        "source", F.floor(keep * 65536).cast("long").alias("bucket_bound")
    )
    bucket = F.conv(F.substring(F.md5(F.encode(F.col("text"), "UTF-8")), 1, 4), 16, 10).cast(
        "long"
    )
    return (
        d.join(F.broadcast(rates), "source")
        .where(bucket < F.col("bucket_bound"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("kept_tokens"),
        )
        .orderBy("source")
    )


register(
    "mixed_sample_audit",
    _mixed_sample_audit,
    f"""
WITH sized AS (
  SELECT source, text, {_NTOK_SQL} AS n_tokens FROM documents
),
per_source AS (
  SELECT source, sum(n_tokens) AS total_tokens FROM sized GROUP BY source
),
rates AS (
  SELECT source,
    CAST(floor(least(1.0,
      (1.0 / count(*) OVER ())
      / (CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER ())) * 65536) AS BIGINT)
      AS bucket_bound
  FROM per_source
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_kept,
  CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
FROM sized JOIN rates USING (source)
WHERE CAST('0x' || substr(md5(text), 1, 4) AS INTEGER) < bucket_bound
GROUP BY source
ORDER BY source
""",
)


# train/val/test boundaries on the md5 16-bit prefix: [0, 0xF000) train,
# [0xF000, 0xF800) val, [0xF800, 0x10000) test  (93.75 / 3.125 / 3.125)
_SPLIT_VAL, _SPLIT_TEST = "f000", "f800"


def _dataset_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test holdout split audit — the assignment
    machinery every training corpus needs: content-hash bucketing means a
    document lands in the SAME split on every re-run and in every
    pipeline (and exact duplicates land in the same split, so no
    train/test leakage through dups). Per (source, split): counts and
    token mass.

    Scale: the split expression is a scan-side codegen projection; the
    audit is a ~60-group aggregation with map-side combine. The real
    pipeline uses the same predicate as a partition column on write.
    """
    d = load_table(spark, sf_dir, "documents")
    pfx = _md5_prefix(F.col("text"))
    split = (
        F.when(pfx < F.lit(_SPLIT_VAL), F.lit("train"))
        .when(pfx < F.lit(_SPLIT_TEST), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select("source", split.alias("split"), TX.token_count(F.col("text")).alias("n_tok"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("source", "split")
    )


register(
    "dataset_split_summary",
    _dataset_split_summary,
    f"""
WITH s AS (
  SELECT source,
         CASE WHEN {_MD5_PREFIX_SQL} < '{_SPLIT_VAL}' THEN 'train'
              WHEN {_MD5_PREFIX_SQL} < '{_SPLIT_TEST}' THEN 'val'
              ELSE 'test' END AS split,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok
  FROM documents
)
SELECT source, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM s
GROUP BY source, split
ORDER BY source, split
""",
)


def _quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft quality sampling audit: each doc is kept with probability equal
    to its quality score — the "soft filter" alternative to a hard quality
    gate (low-quality text is downsampled, not eliminated, preserving
    distributional coverage). Deterministic: keep iff the doc's md5 16-bit
    bucket falls below floor(quality * 65536), so re-runs keep the same
    rows and the audit is oracle-reproducible. Per source: doc count, kept
    count, realized keep rate, mean quality (decimal-exact sum).

    Scale: the keep predicate is a scan-side codegen projection (md5 +
    conv + compare); the audit is a tiny per-source aggregation.
    """
    d = load_table(spark, sf_dir, "documents")
    q = TX.quality_score(F.col("text"))
    bucket = F.conv(_md5_prefix(F.col("text")), 16, 10).cast("long")
    kept = (bucket < F.floor(q * F.lit(65536.0)).cast("long")).cast("long")
    return (
        d.select("source", q.alias("q"), kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.round(F.sum("kept").cast("double") / F.count(F.lit(1)), 6).alias(
                "keep_rate"
            ),
            F.round(
                F.sum(F.col("q").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_quality"),
        )
        .orderBy("source")
    )


register(
    "quality_weighted_sample",
    _quality_weighted_sample,
    f"""
WITH s AS (
  SELECT source, {_QSCORE} AS q,
         CASE WHEN CAST('0x' || {_MD5_PREFIX_SQL} AS BIGINT)
                   < CAST(floor({_QSCORE} * 65536.0) AS BIGINT)
              THEN 1 ELSE 0 END AS kept
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       round(CAST(sum(kept) AS DOUBLE) / count(*), 6) AS keep_rate,
       round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_quality
FROM s
GROUP BY source
ORDER BY source
""",
)


# ---------------------------------------------------------------------------
# Z-order (Morton) layout audit — multi-dimensional data clustering


ZORDER_BITS = 8  # 8 bits per dimension -> 16-bit z-values, 2^16 cells
ZORDER_BUCKETS = 16  # audit granularity: z-range div 4096


def _z_interleave_terms(ux: str, tx: str, bits: int = ZORDER_BITS) -> str:
    """Bit-interleave SQL terms shared verbatim by Spark and DuckDB: both
    engines evaluate `&`, `<<` and integer `+` identically on BIGINT. The
    `>>` operator requires Spark >= 4.0 (it does not parse at all on Spark
    3.x — substitute shiftright() there); this repo pins pyspark 4.1.2.
    ``bits`` must match the caller's per-dimension normalization range
    (2^bits) or high-order bits silently fall out of the key."""
    return " + ".join(
        f"(((({ux}) >> {i}) & 1) << {2 * i}) + (((({tx}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )


def _zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code (Z-order) clustering audit over ``events``.

    The 100 TB story is data layout, not compute: sorting a write by the
    interleaved key z(user_bucket, hour_bucket) co-locates rows that are
    close in BOTH dimensions, so parquet min/max footer stats prune files
    for predicates on either column — the same trick Delta/Iceberg
    OPTIMIZE ZORDER applies. This audit computes the key and reports how
    rows distribute over z-ranges (the file-boundary proxy): per bucket,
    row count plus the user/hour spans a file holding that bucket would
    advertise in its footer.

    Plan: z is a pure-projection codegen expression next to the scan; the
    audit aggregate is one 16-group partial-agg shuffle. Writing the
    layout itself is ``df.repartitionByRange(n, "z").sortWithinPartitions
    ("z").write`` — range partition on z, no extra shuffle beyond the
    writer's own.
    """
    e = load_table(spark, sf_dir, "events")
    tsec = F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("long")
    z = (
        e.withColumn("ux", F.pmod(F.col("user_id"), F.lit(256)))
        .withColumn("tx", F.pmod(F.floor(tsec / F.lit(3600)), F.lit(256)).cast("long"))
        .withColumn("z", F.expr(_z_interleave_terms("ux", "tx")))
    )
    return (
        z.groupBy(F.expr(f"z div 4096").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("z").alias("min_z"),
            F.max("z").alias("max_z"),
            F.min("ux").alias("min_user_bucket"),
            F.max("ux").alias("max_user_bucket"),
            F.min("tx").alias("min_hour_bucket"),
            F.max("tx").alias("max_hour_bucket"),
        )
        .orderBy("z_bucket")
    )


_Z_TS = "CAST(floor(epoch(ts)) AS BIGINT)"

register(
    "zorder_layout_audit",
    _zorder_layout_audit,
    f"""
WITH base AS (
  SELECT user_id,
         ((user_id % 256) + 256) % 256 AS ux,
         ((({_Z_TS} // 3600) % 256) + 256) % 256 AS tx
  FROM events
),
zed AS (
  SELECT user_id, ux, tx, {_z_interleave_terms("ux", "tx")} AS z FROM base
)
SELECT CAST(z // 4096 AS BIGINT) AS z_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(min(z) AS BIGINT) AS min_z,
       CAST(max(z) AS BIGINT) AS max_z,
       CAST(min(ux) AS BIGINT) AS min_user_bucket,
       CAST(max(ux) AS BIGINT) AS max_user_bucket,
       CAST(min(tx) AS BIGINT) AS min_hour_bucket,
       CAST(max(tx) AS BIGINT) AS max_hour_bucket
FROM zed
GROUP BY 1
ORDER BY 1
""",
)


# Zone-map pruning audit — what the Z-order layout is FOR


_PRUNE_FILES_BITS = 10  # 64 files: z div 1024 (zorder) / tx div 4 (linear)
_UX_LO, _UX_HI = 32, 47  # 16 of 256 user buckets
_TX_LO, _TX_HI = 64, 95  # 32 of 256 hour buckets


def _layout_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified zone-map (min/max footer) pruning: the same 2-D box
    predicate (user_bucket in [32,47] AND hour_bucket in [64,95]) scanned
    under TWO 64-file layouts — Z-ordered (files = z div 1024) vs linear
    time-ordered (files = hour_bucket div 4, what a naive append produces).

    Each layout's per-file min/max (ux, tx) spans are what parquet footers
    would advertise; a file is PRUNED when its span box misses the
    predicate box. The two output rows put a number on why
    zorder_layout_audit's layout exists: rows_scanned under Z-order is a
    fraction of the linear layout's for the same rows_matched (identical
    by construction — pruning never changes the answer, only the I/O).
    Plan: one projection + two 64-group aggregates over it — the audit
    itself is footer-metadata-sized, exactly like the real pruning
    decision at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    tsec = F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("long")
    base = (
        e.withColumn("ux", F.pmod(F.col("user_id"), F.lit(256)))
        .withColumn("tx", F.pmod(F.floor(tsec / F.lit(3600)), F.lit(256)).cast("long"))
        .withColumn("z", F.expr(_z_interleave_terms("ux", "tx")))
        .withColumn(
            "is_match",
            F.col("ux").between(_UX_LO, _UX_HI) & F.col("tx").between(_TX_LO, _TX_HI),
        )
    )

    def audit(layout: str, file_id):
        fstats = (
            base.groupBy(file_id.alias("file_id"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col("is_match"), 1).otherwise(0))
                .cast("long")
                .alias("n_match"),
                F.min("ux").alias("min_ux"),
                F.max("ux").alias("max_ux"),
                F.min("tx").alias("min_tx"),
                F.max("tx").alias("max_tx"),
            )
            .withColumn(
                "ovl",
                ~(
                    (F.col("max_ux") < _UX_LO)
                    | (F.col("min_ux") > _UX_HI)
                    | (F.col("max_tx") < _TX_LO)
                    | (F.col("min_tx") > _TX_HI)
                ),
            )
        )
        agged = fstats.agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.when(~F.col("ovl"), 1).otherwise(0))
            .cast("long")
            .alias("n_files_pruned"),
            F.sum(F.when(F.col("ovl"), 1).otherwise(0))
            .cast("long")
            .alias("n_files_scanned"),
            F.sum("n_rows").cast("long").alias("rows_total"),
            F.sum(F.when(F.col("ovl"), F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("rows_matched"),
        )
        return agged.withColumn("layout", F.lit(layout)).select(
            "layout", "n_files", "n_files_pruned", "n_files_scanned",
            "rows_total", "rows_scanned", "rows_matched",
        )

    zed = audit("zorder", F.expr("z div 1024"))
    lin = audit("linear", F.expr("tx div 4"))
    return zed.unionByName(lin).orderBy("layout")


def _layout_audit_sql(layout: str, file_expr: str) -> str:
    return f"""
  SELECT '{layout}' AS layout,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(CASE WHEN NOT ovl THEN 1 ELSE 0 END) AS BIGINT) AS n_files_pruned,
         CAST(sum(CASE WHEN ovl THEN 1 ELSE 0 END) AS BIGINT) AS n_files_scanned,
         CAST(sum(n_rows) AS BIGINT) AS rows_total,
         CAST(sum(CASE WHEN ovl THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
         CAST(sum(n_match) AS BIGINT) AS rows_matched
  FROM (
    SELECT {file_expr} AS file_id, count(*) AS n_rows,
           sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS n_match,
           NOT (max(ux) < {_UX_LO} OR min(ux) > {_UX_HI}
                OR max(tx) < {_TX_LO} OR min(tx) > {_TX_HI}) AS ovl
    FROM zed GROUP BY 1
  )
"""


register(
    "layout_pruning_audit",
    _layout_pruning_audit,
    f"""
WITH base AS (
  SELECT user_id,
         ((user_id % 256) + 256) % 256 AS ux,
         ((({_Z_TS} // 3600) % 256) + 256) % 256 AS tx
  FROM events
),
zed AS (
  SELECT ux, tx, {_z_interleave_terms("ux", "tx")} AS z,
         (ux BETWEEN {_UX_LO} AND {_UX_HI} AND tx BETWEEN {_TX_LO} AND {_TX_HI}) AS is_match
  FROM base
)
{_layout_audit_sql("zorder", "z // 1024")}
UNION ALL
{_layout_audit_sql("linear", "tx // 4")}
ORDER BY layout
""",
)


# ---------------------------------------------------------------------------
# Data-validation passes for the corpus tables (the events expectations
# pattern extended to documents/embeddings: every invariant in ONE
# conditional-aggregate scan; adding a check adds a column, never a read).
# Each entry is (name, spark_expr, duck_expr) counting VIOLATIONS — the two
# dialects share text where possible and diverge only where the engines name
# a function differently (size vs len).


_DOC_CHECKS: tuple[tuple[str, str, str], ...] = (
    ("null_doc_id", "doc_id IS NULL", "doc_id IS NULL"),
    ("null_text", "text IS NULL", "text IS NULL"),
    (
        "n_chars_mismatch",
        "coalesce(n_chars, -1) <> coalesce(length(text), -1)",
        "coalesce(n_chars, -1) <> coalesce(length(text), -1)",
    ),
    (
        "unknown_lang",
        "lang IS NULL OR lang NOT IN ('de','en','es','fr','zh')",
        "lang IS NULL OR lang NOT IN ('de','en','es','fr','zh')",
    ),
    ("null_source", "source IS NULL", "source IS NULL"),
    ("negative_chars", "coalesce(n_chars, 0) < 0", "coalesce(n_chars, 0) < 0"),
)

_EMB_CHECKS: tuple[tuple[str, str, str], ...] = (
    ("null_vec_id", "vec_id IS NULL", "vec_id IS NULL"),
    ("null_embedding", "embedding IS NULL", "embedding IS NULL"),
    (
        "wrong_dim",
        "embedding IS NOT NULL AND size(embedding) <> 64",
        "embedding IS NOT NULL AND len(embedding) <> 64",
    ),
    ("null_label", "label IS NULL", "label IS NULL"),
    (
        "label_out_of_range",
        "coalesce(label, -1) NOT BETWEEN 0 AND 999",
        "coalesce(label, -1) NOT BETWEEN 0 AND 999",
    ),
)


def _quality_checks(table: str, id_col: str, checks):
    """Build the (spark_fn, oracle_sql) pair for one table's expectation
    pass; a duplicate-id check (count vs count DISTINCT — not a row
    predicate) rides the same single aggregation."""

    def spark_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = load_table(spark, sf_dir, table)
        aggs = [
            F.sum(F.when(F.expr(sp), 1).otherwise(0)).cast("long").alias(name)
            for name, sp, _ in checks
        ] + [
            F.expr(f"count(*) - count(DISTINCT {id_col})")
            .cast("long")
            .alias(f"dup_{id_col}"),
            F.count(F.lit(1)).alias("_n"),
        ]
        row = t.agg(*aggs)
        names = [name for name, _, _ in checks] + [f"dup_{id_col}"]
        stacked = row.selectExpr(
            "_n",
            "stack({}, {}) AS (check, n_violations)".format(
                len(names), ", ".join(f"'{n}', {n}" for n in names)
            ),
        )
        return stacked.select(
            "check",
            "n_violations",
            F.col("_n").alias("n_rows"),
            F.round(
                F.col("n_violations").cast("double") / F.col("_n"), 6
            ).alias("violation_rate"),
        ).orderBy("check")

    names = [name for name, _, _ in checks] + [f"dup_{id_col}"]
    arms = "\nUNION ALL ".join(
        f'SELECT \'{n}\' AS "check", {n} AS n_violations, CAST(n AS BIGINT) AS n_rows, '
        f"round(CAST({n} AS DOUBLE) / n, 6) AS violation_rate FROM agg"
        for n in names
    )
    sql = f"""
WITH agg AS (
  SELECT count(*) AS n,
    {", ".join(f"CAST(sum(CASE WHEN {du} THEN 1 ELSE 0 END) AS BIGINT) AS {name}" for name, _, du in checks)},
    CAST(count(*) - count(DISTINCT {id_col}) AS BIGINT) AS dup_{id_col}
  FROM {table}
)
{arms}
ORDER BY "check"
"""
    return spark_fn, sql


_doc_checks_fn, _doc_checks_sql = _quality_checks("documents", "doc_id", _DOC_CHECKS)
register("documents_quality_checks", _doc_checks_fn, _doc_checks_sql)

_emb_checks_fn, _emb_checks_sql = _quality_checks("embeddings", "vec_id", _EMB_CHECKS)
register("embeddings_quality_checks", _emb_checks_fn, _emb_checks_sql)


def _quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate calibration table: for every candidate threshold t in
    {0.0, 0.1, ..., 0.9}, how many documents and how much token mass a
    ``quality >= t`` filter would keep. This is the knob-tuning artifact a
    curation run produces BEFORE committing to a gate (pick t off this
    table to hit a target token budget), the sweep cousin of the single
    fixed gate in ``quality_percentile_gate``.

    Scale story: one scan. Docs bucket by floor(q*10) and aggregate to
    ≤10 rows (partial, map-side combinable); the per-threshold cumulative
    "kept" numbers come from a window over those 10 rows — never a
    rescan per threshold (the naive sweep is T full passes). The
    threshold grid is generated and left-joined so all 10 rows exist even
    when a quality band is empty.

    Determinism: bucket/cumulative arithmetic is pure int64; retention
    ratios derive from exact integer pairs via one double division,
    identical on both engines. The q*10 bucket boundary is the same IEEE
    multiply of the same 6-digit-rounded score everywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    # Explicit NULL-text policy: a doc with no text scores 0.0 (bucket 0,
    # kept only by the trivial threshold) and carries 0 tokens. Without
    # the guard quality_score(NULL) evaluates to 1.0 on both engines
    # (least() skips the NULL length credit) and a text-less doc would
    # pass a `quality >= 0.9` gate.
    q = F.when(F.col("text").isNull(), F.lit(0.0)).otherwise(
        TX.quality_score(F.col("text"))
    )
    bucket = F.least(F.floor(q * 10), F.lit(9)).cast("int")
    per = (
        d.select(
            bucket.alias("bucket"),
            F.coalesce(TX.token_count(F.col("text")), F.lit(0)).alias("n_tok"),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("toks"))
    )
    grid = spark.range(10).select(F.col("id").cast("int").alias("bucket"))
    j = grid.join(per, "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
        F.coalesce(F.col("toks"), F.lit(0)).alias("toks"),
    )
    cum = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = j.select(
        "bucket",
        F.col("n_docs").alias("n_docs_bucket"),
        F.sum("n_docs").over(cum).alias("docs_kept"),
        F.sum("toks").over(cum).alias("tokens_kept"),
        F.sum("n_docs").over(tot).alias("total_docs"),
        F.sum("toks").over(tot).alias("total_toks"),
    )
    return c.select(
        F.round(F.col("bucket") / 10.0, 1).alias("threshold"),
        "n_docs_bucket",
        "docs_kept",
        "tokens_kept",
        F.round(F.col("docs_kept").cast("double") / F.col("total_docs"), 6).alias(
            "doc_retention"
        ),
        F.round(F.col("tokens_kept").cast("double") / F.col("total_toks"), 6).alias(
            "token_retention"
        ),
    ).orderBy("threshold")


register(
    "quality_threshold_sweep",
    _quality_threshold_sweep,
    f"""
WITH scored AS (
  -- NULL-text policy: quality 0.0 (bucket 0), 0 tokens
  SELECT CASE WHEN text IS NULL THEN 0.0 ELSE {_QSCORE} END AS q,
         COALESCE({_NTOK_SQL}, CAST(0 AS BIGINT)) AS n_tok
  FROM documents
),
b AS (
  SELECT CAST(least(floor(q * 10), 9) AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS toks
  FROM scored GROUP BY 1
),
grid AS (SELECT CAST(g AS INT) AS bucket FROM unnest(range(0, 10)) AS t(g)),
j AS (
  SELECT grid.bucket,
         COALESCE(n_docs, CAST(0 AS BIGINT)) AS n_docs,
         COALESCE(toks, CAST(0 AS BIGINT)) AS toks
  FROM grid LEFT JOIN b USING (bucket)
),
c AS (
  SELECT bucket, n_docs AS n_docs_bucket,
         sum(n_docs) OVER (ORDER BY bucket DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS docs_kept,
         sum(toks) OVER (ORDER BY bucket DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tokens_kept,
         sum(n_docs) OVER () AS total_docs,
         sum(toks) OVER () AS total_toks
  FROM j
)
SELECT round(bucket / 10.0, 1) AS threshold,
       n_docs_bucket,
       CAST(docs_kept AS BIGINT) AS docs_kept,
       CAST(tokens_kept AS BIGINT) AS tokens_kept,
       round(CAST(docs_kept AS DOUBLE) / total_docs, 6) AS doc_retention,
       round(CAST(tokens_kept AS DOUBLE) / total_toks, 6) AS token_retention
FROM c
ORDER BY threshold
""",
)


def _lang_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed language-sampling weights: p_l proportional to
    natural_share^0.5 — the multilingual mixture step published LLM
    pipelines apply so high-resource languages stop drowning out the tail
    (mT5/XLM-R sample with alpha in [0.2, 0.7]; alpha = 0.5 is chosen
    here because x^0.5 IS sqrt, the one power IEEE-754 guarantees
    correctly rounded — x^0.3 via pow/exp/ln is libm-dependent and would
    break hash parity, the same discipline that keeps ln out of the
    tf-idf and BM25 scores).

    Determinism: natural shares derive per-row from exact int64 token
    sums; each sqrt is rounded to 6 digits and the normalizing sum
    accumulates in DECIMAL (exact, order-independent — a double sum over
    the window would depend on row order). One tiny aggregate; the
    resulting rates drive the scan-side md5-bucket sampler at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.sum(TX.token_count(F.col("text"))).alias("total_tokens")
    )
    total = Window.partitionBy()
    natural = F.col("total_tokens").cast("double") / F.sum("total_tokens").over(total)
    sm = F.round(F.sqrt(natural), 6)
    denom = F.sum(sm.cast("decimal(18,6)")).over(total).cast("double")
    smoothed = sm / denom
    return (
        per_lang.select(
            "lang",
            "total_tokens",
            F.round(natural, 6).alias("natural_share"),
            F.round(smoothed, 6).alias("smoothed_share"),
            F.round(smoothed / natural, 6).alias("boost"),
        )
        .orderBy("lang")
    )


register(
    "lang_temperature_mix",
    _lang_temperature_mix,
    f"""
WITH per_lang AS (
  SELECT lang, CAST(sum({_NTOK_SQL}) AS BIGINT) AS total_tokens
  FROM documents GROUP BY lang
),
shares AS (
  SELECT lang, total_tokens,
         CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER () AS nat,
         round(sqrt(CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER ()), 6) AS sm
  FROM per_lang
),
normed AS (
  SELECT lang, total_tokens, nat,
         sm / CAST(sum(CAST(sm AS DECIMAL(18,6))) OVER () AS DOUBLE) AS smoothed
  FROM shares
)
SELECT lang, total_tokens,
       round(nat, 6) AS natural_share,
       round(smoothed, 6) AS smoothed_share,
       round(smoothed / nat, 6) AS boost
FROM normed ORDER BY lang
""",
)
