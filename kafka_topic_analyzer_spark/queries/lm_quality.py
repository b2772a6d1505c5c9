"""Language-model quality scoring over ``documents`` (LLM-pipeline operators).

The CCNet / RefinedWeb curation stage this models: score every document
against a corpus-trained language model and use the score to gate or
re-weight training data. A full KenLM 5-gram model is not SQL-expressible,
but its standard large-scale proxy — a corpus-trained UNIGRAM model — is:
train = one token-count aggregate over the corpus; score = join each token
occurrence to its corpus probability and average the surprisal
(-ln p(token)) per document. Low mean surprisal = common, fluent text;
high = rare-token soup (gibberish, code dumps, wrong-language residue).

Reference scope note: the reference (kafka-topic-analyzer, Rust CLI) has
no text pipeline — these operators are part of the training-data extension
surface the build brief prescribes, built on the same documents table and
oracle discipline as queries/text.py.

Float-parity discipline (same as similarity.py): every per-item double is
``round(.., k)`` then cast ``decimal`` BEFORE the order-nondeterministic
SUM, so the aggregate is exact and the driver hash cannot be flipped by
summation order; the only doubles projected are final rounded divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_topic_analyzer_spark.functions import text as TX
from kafka_topic_analyzer_spark.registry import register
from kafka_topic_analyzer_spark.sources.tables import load_table

# Lowercased whitespace tokens — mirrors functions/text.py tokens() on
# lower(text); the DuckDB twin matches queries/text.py's _LTOKS.
_LTOKS = r"""CASE WHEN length(trim(lower(text))) = 0 THEN []
            ELSE string_split_regex(trim(lower(text)), '\s+') END"""

# Word-shingle width and the document-frequency bar above which a shingle
# counts as boilerplate (RefinedWeb strips spans duplicated across many
# pages; df>=5 at k=3 is the calibrated non-trivial signal on the synthetic
# corpus — 151 hot shingles at sf0.01).
BOILER_K = 3
BOILER_MIN_DF = 5


def _spark_ltoks() -> F.Column:
    t = F.trim(F.lower(F.col("text")))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def _r6(x: F.Column) -> F.Column:
    """Tie-safe 6-decimal round: floor(x*1e6 + 0.5)/1e6 — the same IEEE
    multiply/add/floor/divide on both engines (quantize_int8's rule).
    round()'s half-way behavior differs between Spark (shortest-decimal
    HALF_UP) and DuckDB (binary-value), and quotients of 6-dp DECIMAL
    sums by small integer counts land on 7th-decimal ties routinely
    (fuzz: ssum 8.000682 / 4 = 2.0001705)."""
    return F.floor(x * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def _r6_sql(expr: str) -> str:
    """DuckDB twin of _r6 — identical op sequence, identical doubles."""
    return f"floor(({expr}) * 1e6 + 0.5) / 1e6"


def _unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean token surprisal under the corpus unigram LM (nats).

    The quality score a CCNet-style filter thresholds on. Per token type
    the surprisal ``ln(total/cnt)`` is computed ONCE on the count table
    (rounded to 6 decimals, then decimal(18,6)); each occurrence joins to
    that value and the per-doc SUM is exact decimal arithmetic — order
    cannot perturb the driver hash. ``max_surprisal`` flags the single
    rarest token in the doc (the gibberish spike a mean can hide).

    Scale shape: occurrences never collect — one map-combinable
    groupBy(tok) trains the LM; the 1-row corpus total is a broadcast
    cross join; the occurrence->prob lookup is a join on ``tok`` that AQE
    converts to broadcast while the vocab is small (~31 here; a 100 TB
    corpus vocab of ~10-100M rows shuffle-joins on the same key). Final
    per-doc aggregate is map-side combinable.
    """
    d = load_table(spark, sf_dir, "documents")
    occ = d.select("doc_id", F.explode(_spark_ltoks()).alias("tok"))
    counts = occ.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    surp = counts.crossJoin(total).select(
        "tok",
        F.round(F.log(F.col("total").cast("double") / F.col("cnt")), 6)
        .cast("decimal(18,6)")
        .alias("surp"),
    )
    per_doc = (
        occ.join(surp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("surp").alias("ssum"),
            F.max("surp").alias("smax"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(
                _r6(F.col("ssum").cast("double") / F.col("n_tokens")),
                F.lit(0.0),
            ).alias("mean_surprisal"),
            F.coalesce(F.col("smax").cast("double"), F.lit(0.0)).alias(
                "max_surprisal"
            ),
        )
        .orderBy("doc_id")
    )


register(
    "unigram_logprob_quality",
    _unigram_logprob_quality,
    f"""
WITH occ AS (
  SELECT doc_id, unnest({_LTOKS}) AS tok FROM documents
),
counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM occ GROUP BY tok),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
surp AS (
  SELECT tok,
         CAST(round(ln(CAST(total AS DOUBLE) / cnt), 6) AS DECIMAL(18,6)) AS surp
  FROM counts CROSS JOIN tot
),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         sum(surp) AS ssum,
         max(surp) AS smax
  FROM occ JOIN surp USING (tok)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
       COALESCE(floor((CAST(ssum AS DOUBLE) / n_tokens) * 1e6 + 0.5) / 1e6, 0.0) AS mean_surprisal,
       COALESCE(CAST(smax AS DOUBLE), 0.0) AS max_surprisal
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
ORDER BY d.doc_id
""",
)


def _source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution
    (nats) — the domain-shift diagnostic behind data-mixing decisions:
    a source whose token distribution diverges hard from the corpus mean
    either needs its own mixing weight or is contaminated.

    KL(P_s || P) = (1/n_s) * sum_t c_st * ln((c_st * N) / (c_t * n_s)),
    exact-integer counts inside the ln; each term is rounded to 9 decimals
    and summed as decimal(38,9) (order-proof), with the single double
    division deferred to the final projection.

    Scale shape: two map-combinable aggregates — groupBy(source, tok) then
    the corpus groupBy(tok) derived FROM it (never a second corpus scan);
    per-source totals and the 1-row N are broadcast-sized; the only real
    shuffle joins on ``tok``.
    """
    d = load_table(spark, sf_dir, "documents")
    st = (
        d.select("source", F.explode(_spark_ltoks()).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c_st"))
    )
    corpus = st.groupBy("tok").agg(F.sum("c_st").cast("long").alias("c_t"))
    n_s = st.groupBy("source").agg(F.sum("c_st").cast("long").alias("n_s"))
    big_n = corpus.agg(F.sum("c_t").cast("long").alias("big_n"))
    terms = (
        st.join(corpus, "tok")
        .join(F.broadcast(n_s), "source")
        .crossJoin(F.broadcast(big_n))
        .select(
            "source",
            "n_s",
            F.round(
                F.col("c_st").cast("double")
                * F.log(
                    (F.col("c_st").cast("double") * F.col("big_n").cast("double"))
                    / (F.col("c_t").cast("double") * F.col("n_s").cast("double"))
                ),
                9,
            )
            .cast("decimal(38,9)")
            .alias("term"),
        )
    )
    return (
        terms.groupBy("source", "n_s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum("term").alias("tsum"),
        )
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "vocab_size",
            _r6(F.col("tsum").cast("double") / F.col("n_s")).alias("kl_nats"),
        )
        .orderBy("source")
    )


register(
    "source_unigram_kl",
    _source_unigram_kl,
    f"""
WITH occ AS (
  SELECT source, unnest({_LTOKS}) AS tok FROM documents
),
st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c_st FROM occ GROUP BY source, tok),
corpus AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok),
ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY source),
tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS big_n FROM corpus),
terms AS (
  SELECT source, n_s,
         CAST(round(CAST(c_st AS DOUBLE) *
                    ln((CAST(c_st AS DOUBLE) * CAST(big_n AS DOUBLE)) /
                       (CAST(c_t AS DOUBLE) * CAST(n_s AS DOUBLE))), 9)
              AS DECIMAL(38,9)) AS term
  FROM st JOIN corpus USING (tok) JOIN ns USING (source) CROSS JOIN tot
)
SELECT source,
       n_s AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab_size,
       floor((CAST(sum(term) AS DOUBLE) / n_s) * 1e6 + 0.5) / 1e6 AS kl_nats
FROM terms
GROUP BY source, n_s
ORDER BY source
""",
)


def _boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc boilerplate coverage: the fraction of word-{BOILER_K}-gram
    positions whose shingle occurs in >= {BOILER_MIN_DF} distinct
    documents — the signal RefinedWeb-style cleaners strip (headers,
    navigation, license blocks repeat verbatim across pages; original
    prose does not). ``substring_dup_spans`` is the pair-level view of the
    same phenomenon; this is the per-document gate a curation pipeline
    filters on.

    Scale shape: shingle positions are pure JVM expressions (sequence +
    slice + concat_ws, no UDF); document frequency is one
    groupBy(shingle) with a distinct pre-step; instead of materializing a
    hot-shingle set and joining twice, every position joins its shingle's
    df ONCE and boilerplate positions are a conditional aggregate
    (``df >= bar``) — the same single-scan sweep shape as
    near_dup_threshold_sweep. All-integer until the final division, so
    the hash is arithmetic-exact.
    """
    k, bar = BOILER_K, BOILER_MIN_DF
    d = load_table(spark, sf_dir, "documents")
    pos = (
        d.select("doc_id", _spark_ltoks().alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"CASE WHEN size(t) < {k} THEN array() "
                    f"ELSE transform(sequence(1, size(t) - {k - 1}), "
                    f"i -> concat_ws(' ', slice(t, CAST(i AS INT), {k}))) END"
                )
            ).alias("sh"),
        )
    )
    df_tbl = (
        pos.distinct()
        .groupBy("sh")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    per_doc = (
        pos.join(df_tbl, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_positions"),
            F.sum((F.col("df") >= bar).cast("long")).cast("long").alias("n_boiler"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_positions", F.lit(0)).cast("long").alias("n_positions"),
            F.coalesce("n_boiler", F.lit(0)).cast("long").alias("n_boiler"),
            F.coalesce(
                _r6(F.col("n_boiler").cast("double") / F.col("n_positions")),
                F.lit(0.0),
            ).alias("boiler_coverage"),
        )
        .orderBy("doc_id")
    )


register(
    "boilerplate_coverage",
    _boilerplate_coverage,
    f"""
WITH t AS (SELECT doc_id, {_LTOKS} AS toks FROM documents),
pos AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) < {BOILER_K} THEN []
                ELSE [array_to_string(toks[i:i + {BOILER_K - 1}], ' ')
                      FOR i IN range(1, len(toks) - {BOILER_K} + 2)] END) AS sh
  FROM t
),
df_tbl AS (
  SELECT sh, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, sh FROM pos) GROUP BY sh
),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_positions,
         CAST(sum(CASE WHEN df >= {BOILER_MIN_DF} THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
  FROM pos JOIN df_tbl USING (sh)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(n_positions, 0) AS BIGINT) AS n_positions,
       CAST(COALESCE(n_boiler, 0) AS BIGINT) AS n_boiler,
       COALESCE(floor((CAST(n_boiler AS DOUBLE) / n_positions) * 1e6 + 0.5) / 1e6, 0.0) AS boiler_coverage
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
ORDER BY d.doc_id
""",
)


# ---------------------------------------------------------------------------
# curation_funnel — sequential gate-survival audit
# ---------------------------------------------------------------------------

# Gate constants, fixed so the funnel is reproducible run-to-run. Calibrated
# on the synthetic corpus so every gate visibly drops documents at sf0.01
# AND sf0.1 (lang-unknown ~9%, quality<0.6 ~13%, boiler>=1/4 a handful,
# surprisal>3.5 ~1.7%) — a real pipeline would read these from config.
FUNNEL_QUALITY_MIN = 0.6
FUNNEL_BOILER_NUM = 1  # boiler gate: coverage < 1/4, tested as integers
FUNNEL_BOILER_DEN = 4  # (den*n_boiler < num*n_positions -> float-free)
FUNNEL_SURP_MAX = 3.5  # mean unigram surprisal cap (nats)


def _curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential curation-funnel audit: where documents die.

    The one-page diagnostic a training-data pipeline owner reads before
    re-cutting a corpus: documents flow through the standard gate order
    (language identified -> quality score -> boilerplate coverage ->
    unigram surprisal) and each row reports how many entered the gate,
    how many survived it, and the cumulative yield. Sequential semantics:
    a document is evaluated at gate k only if it passed gates < k, so
    ``dropped`` attributes each loss to the FIRST gate that caught it —
    the number that tells you which knob to turn.

    Built from the already-proven per-doc signals (predicted_lang /
    quality_score from functions/text.py, boilerplate + surprisal from
    this module); gate survivorship is ONE conditional aggregate over the
    per-doc flag frame (sum of gate-prefix conjunctions), and the 5-row
    funnel is exploded from that single aggregate row — never one pass
    per gate. The boiler gate compares ``4*n_boiler < 1*n_positions`` in
    exact integers; the surprisal gate thresholds the 6-decimal rounded
    mean, so both engines agree at the boundary.

    Scale shape: three column-pruned scans of documents (flags, shingle
    positions, token occurrences), two doc_id-keyed left joins, then a
    map-side-combinable aggregate to ONE row. Signal frames are the same
    shapes proven in boilerplate_coverage / unigram_logprob_quality.
    """
    k, bar = BOILER_K, BOILER_MIN_DF
    d = load_table(spark, sf_dir, "documents")

    base = d.select(
        "doc_id",
        (TX.predicted_lang(F.col("text")) != "unknown").alias("lang_ok"),
        (TX.quality_score(F.col("text")) >= F.lit(FUNNEL_QUALITY_MIN)).alias("q_ok"),
    )

    pos = d.select("doc_id", _spark_ltoks().alias("t")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(t) < {k} THEN array() "
                f"ELSE transform(sequence(1, size(t) - {k - 1}), "
                f"i -> concat_ws(' ', slice(t, CAST(i AS INT), {k}))) END"
            )
        ).alias("sh"),
    )
    df_tbl = pos.distinct().groupBy("sh").agg(F.count(F.lit(1)).cast("long").alias("df"))
    boiler = (
        pos.join(df_tbl, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_positions"),
            F.sum((F.col("df") >= bar).cast("long")).cast("long").alias("n_boiler"),
        )
    )

    occ = d.select("doc_id", F.explode(_spark_ltoks()).alias("tok"))
    counts = occ.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    surp = counts.crossJoin(total).select(
        "tok",
        F.round(F.log(F.col("total").cast("double") / F.col("cnt")), 6)
        .cast("decimal(18,6)")
        .alias("surp"),
    )
    ms = (
        occ.join(surp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("surp").alias("ssum"),
        )
        .select(
            "doc_id",
            _r6(F.col("ssum").cast("double") / F.col("n_toks")).alias("ms"),
        )
    )

    n_pos = F.coalesce(F.col("n_positions"), F.lit(0))
    n_boil = F.coalesce(F.col("n_boiler"), F.lit(0))
    flags = (
        base.join(boiler, "doc_id", "left")
        .join(ms, "doc_id", "left")
        .select(
            F.col("lang_ok"),
            F.col("q_ok"),
            # a doc too short to shingle has no boilerplate -> passes;
            # otherwise coverage < NUM/DEN tested in exact integers
            (
                (n_pos == 0)
                | (n_boil * FUNNEL_BOILER_DEN < n_pos * FUNNEL_BOILER_NUM)
            ).alias("b_ok"),
            (F.coalesce(F.col("ms"), F.lit(0.0)) <= F.lit(FUNNEL_SURP_MAX)).alias(
                "s_ok"
            ),
        )
    )

    one = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.col("lang_ok").cast("long")).cast("long").alias("n1"),
        F.sum((F.col("lang_ok") & F.col("q_ok")).cast("long")).cast("long").alias("n2"),
        F.sum((F.col("lang_ok") & F.col("q_ok") & F.col("b_ok")).cast("long"))
        .cast("long")
        .alias("n3"),
        F.sum(
            (F.col("lang_ok") & F.col("q_ok") & F.col("b_ok") & F.col("s_ok")).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n4"),
    )
    stage = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("gate_order"),
                F.lit(name).alias("gate"),
                F.col(ev).cast("long").alias("evaluated"),
                F.col(sv).cast("long").alias("survivors"),
            )
            for i, (name, ev, sv) in enumerate(
                [
                    ("ingest", "n0", "n0"),
                    ("lang_identified", "n0", "n1"),
                    ("quality_min", "n1", "n2"),
                    ("boilerplate_max", "n2", "n3"),
                    ("surprisal_max", "n3", "n4"),
                ]
            )
        ]
    )
    return (
        one.select(F.col("n0"), F.explode(stage).alias("s"))
        .select(
            F.col("s.gate_order").alias("gate_order"),
            F.col("s.gate").alias("gate"),
            F.col("s.evaluated").alias("evaluated"),
            F.col("s.survivors").alias("survivors"),
            (F.col("s.evaluated") - F.col("s.survivors")).cast("long").alias("dropped"),
            F.when(F.col("s.evaluated") > 0,
                   _r6(F.col("s.survivors").cast("double") / F.col("s.evaluated")))
            .otherwise(F.lit(0.0))
            .alias("survival_rate"),
            F.when(F.col("n0") > 0,
                   _r6(F.col("s.survivors").cast("double") / F.col("n0")))
            .otherwise(F.lit(0.0))
            .alias("cumulative_rate"),
        )
        .orderBy("gate_order")
    )


def _funnel_oracle() -> str:
    # mirror the Spark gates from the proven SQL twins in queries/text.py
    from kafka_topic_analyzer_spark.queries.text import (
        _LANG_PRED,
        _NTOK,
        _PUNCT,
        _STOP_HITS,
    )

    k, bar = BOILER_K, BOILER_MIN_DF
    q_sql = f"""round(0.5 * least(1.0, CAST({_NTOK} AS DOUBLE) / 100.0)
      + 0.3 * (1.0 - round(CASE WHEN {_NTOK} > 0
                THEN CAST({_STOP_HITS} AS DOUBLE) / {_NTOK} ELSE 0.0 END, 4))
      + 0.2 * (1.0 - round(CASE WHEN length(text) > 0
                THEN CAST({_PUNCT} AS DOUBLE) / length(text) ELSE 0.0 END, 4)), 6)"""
    return f"""
WITH base AS (
  SELECT doc_id,
         ({_LANG_PRED}) <> 'unknown' AS lang_ok,
         ({q_sql}) >= {FUNNEL_QUALITY_MIN} AS q_ok
  FROM documents
),
t AS (SELECT doc_id, {_LTOKS} AS toks FROM documents),
pos AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) < {k} THEN []
                ELSE [array_to_string(toks[i:i + {k - 1}], ' ')
                      FOR i IN range(1, len(toks) - {k} + 2)] END) AS sh
  FROM t
),
df_tbl AS (
  SELECT sh, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, sh FROM pos) GROUP BY sh
),
boiler AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_positions,
         CAST(sum(CASE WHEN df >= {bar} THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
  FROM pos JOIN df_tbl USING (sh)
  GROUP BY doc_id
),
occ AS (SELECT doc_id, unnest({_LTOKS}) AS tok FROM documents),
counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM occ GROUP BY tok),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
surp AS (
  SELECT tok,
         CAST(round(ln(CAST(total AS DOUBLE) / cnt), 6) AS DECIMAL(18,6)) AS surp
  FROM counts CROSS JOIN tot
),
msf AS (
  SELECT doc_id, floor((CAST(sum(surp) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS ms
  FROM occ JOIN surp USING (tok) GROUP BY doc_id
),
flags AS (
  SELECT lang_ok, q_ok,
         (COALESCE(n_positions, 0) = 0 OR
          COALESCE(n_boiler, 0) * {FUNNEL_BOILER_DEN}
            < COALESCE(n_positions, 0) * {FUNNEL_BOILER_NUM}) AS b_ok,
         COALESCE(ms, 0.0) <= {FUNNEL_SURP_MAX} AS s_ok
  FROM base LEFT JOIN boiler USING (doc_id) LEFT JOIN msf USING (doc_id)
),
one AS (
  SELECT CAST(count(*) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN lang_ok AND q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN lang_ok AND q_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         CAST(sum(CASE WHEN lang_ok AND q_ok AND b_ok AND s_ok THEN 1 ELSE 0 END) AS BIGINT) AS n4
  FROM flags
),
rows_ AS (
  SELECT CAST(0 AS BIGINT) AS gate_order, 'ingest' AS gate, n0 AS evaluated, n0 AS survivors, n0 FROM one
  UNION ALL SELECT 1, 'lang_identified', n0, n1, n0 FROM one
  UNION ALL SELECT 2, 'quality_min', n1, n2, n0 FROM one
  UNION ALL SELECT 3, 'boilerplate_max', n2, n3, n0 FROM one
  UNION ALL SELECT 4, 'surprisal_max', n3, n4, n0 FROM one
)
SELECT gate_order, gate,
       CAST(evaluated AS BIGINT) AS evaluated,
       CAST(survivors AS BIGINT) AS survivors,
       CAST(evaluated - survivors AS BIGINT) AS dropped,
       CASE WHEN evaluated > 0
            THEN floor((CAST(survivors AS DOUBLE) / evaluated) * 1e6 + 0.5) / 1e6 ELSE 0.0 END AS survival_rate,
       CASE WHEN n0 > 0
            THEN floor((CAST(survivors AS DOUBLE) / n0) * 1e6 + 0.5) / 1e6 ELSE 0.0 END AS cumulative_rate
FROM rows_
ORDER BY gate_order
"""


register("curation_funnel", _curation_funnel, _funnel_oracle())
