"""Text-analysis column expressions for the ``documents`` table.

All built-in (JVM codegen, no Python UDFs): tokenization, quality metrics,
n-gram shingling, language-ID heuristic, fingerprints. Every expression has
an exactly-equivalent DuckDB formulation (queries/text.py) so the oracle can
hash-match. Designed for 100 TB: pure per-row projections — no shuffle at
all until a downstream aggregate asks for one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, functions as F

# Marker stopwords per language for the n-gram/stopword heuristic. Order
# matters: ties resolve to the first language listed (deterministic).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "es": ["la", "el", "de", "los", "que", "y"],
    "fr": ["le", "les", "des", "et", "une", "dans"],
    "de": ["der", "die", "das", "und", "ein", "nicht"],
}

EN_STOPWORDS = ["the", "a", "an", "of", "and", "to", "is", "in", "that", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty text -> empty array (not [''])."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


# GPT-2-ish pre-tokenizer shape: letter runs, single digits, punctuation
# runs — a deterministic stand-in for BPE vocab size estimation that both
# regex engines (Java / RE2) interpret identically.
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count via the BPE-style pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_REGEX), F.lit(0))).cast(
        "long"
    )


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def avg_token_len(text: Column) -> Column:
    """Mean token length in chars; 0.0 for empty docs. Double division of
    two exact ints — deterministic across engines."""
    n = token_count(text)
    total = F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
    return F.round(
        F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0)), 4
    )


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    n = F.size(toks)
    return F.round(
        F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0)), 4
    )


def punct_ratio(text: Column) -> Column:
    """Share of chars outside [a-z0-9 whitespace] after lowercasing."""
    n = F.length(text)
    punct = F.length(F.regexp_replace(F.lower(text), r"[a-z0-9\s]", ""))
    return F.round(
        F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0)), 4
    )


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: length credit + lexical mix credit.

    Mirrors the shape of published LLM-corpus quality filters (length,
    stopword density, symbol share) with a deterministic linear formula.
    """
    length_credit = F.least(F.lit(1.0), token_count(text).cast("double") / 100.0)
    stop = stopword_ratio(text)
    punct = punct_ratio(text)
    return F.round(
        0.5 * length_credit + 0.3 * (1.0 - stop) + 0.2 * (1.0 - punct), 6
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-stopword hit count per candidate language."""
    toks = tokens(F.lower(text))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(text: Column) -> Column:
    """Argmax language with deterministic first-listed tiebreak; 'unknown'
    when no marker hits at all."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    # build reversed so the FIRST language in LANG_MARKERS wins ties
    for lang in reversed(list(scores)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


# Cleaning pass, in application order. Tag stripping runs first so text
# NOT wrapped in tags survives even when angle brackets appear unpaired.
HTML_TAG_REGEX = r"<[^<>]*>"
CONTROL_CHAR_REGEX = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def clean_text(text: Column) -> Column:
    """Corpus-prep normalization: strip HTML-ish tags and control chars,
    collapse whitespace, trim. Pure codegen projection — the standard
    first pass of a web-scrape ingest, applied before fingerprinting or
    quality scoring."""
    no_tags = F.regexp_replace(text, HTML_TAG_REGEX, " ")
    no_ctrl = F.regexp_replace(no_tags, CONTROL_CHAR_REGEX, " ")
    return F.trim(F.regexp_replace(no_ctrl, r"\s+", " "))


# PII patterns chosen for Java-regex / RE2 agreement: character classes,
# bounded repetition and ASCII \b only (no lookaround, no backreferences).
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_REGEX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_REGEX = r"\+?\d[\d ().-]{7,}\d"


def redact_pii(text: Column) -> Column:
    """Redact emails, IPv4 addresses and phone-like digit runs with typed
    placeholder tokens. Order matters and is part of the contract:
    emails first (they embed digits and dots), then IPs (a dotted-digit
    phone lookalike), then phones — each stage scans the previous
    stage's output, so the placeholder tokens (no digits) can't
    re-trigger a later pattern."""
    s = F.regexp_replace(text, EMAIL_REGEX, "<EMAIL>")
    s = F.regexp_replace(s, IPV4_REGEX, "<IP>")
    return F.regexp_replace(s, PHONE_REGEX, "<PHONE>")


def md5_fingerprint(text: Column) -> Column:
    """Exact-dedup fingerprint: md5 of lowercase/whitespace-normalized text."""
    return F.md5(F.encode(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), "UTF-8"))


ROLLING_HASH_MOD = 2147483647  # 2^31-1, keeps acc*31+c < 2^36 (no overflow)


def rolling_hash(text: Column) -> Column:
    """Order-sensitive polynomial fingerprint over UTF-8 code points.

    acc = (acc*31 + ascii(char)) mod (2^31-1), left fold — the document
    fingerprinting primitive (distinct from md5: cheap to compute
    incrementally and locality-free). Same fold is expressible in DuckDB
    via list_reduce for oracle parity.
    """
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % ROLLING_HASH_MOD,
    )


def rolling_hash_udf(text: Column) -> Column:
    """Vectorized twin of :func:`rolling_hash` — identical VALUES by
    construction (the fold is exact int64 modular arithmetic, so any
    evaluation strategy agrees bit-for-bit; nothing floating here).

    Strings decode to codepoint matrices (UTF-32) once per Arrow batch;
    the fold runs vectorized across rows, sequential over positions.
    The expression form evaluates an interpreted lambda per character —
    measured ~5-10x slower on corpus-scale hashing. NULL in -> NULL out,
    matching ``aggregate`` over a NULL array.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _roll(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="Int64")
        null_mask = s.isna()
        vals = ["" if pd.isna(x) else x for x in s]
        lens = np.array([len(x) for x in vals], dtype=np.int64)
        width = max(int(lens.max()), 1)
        cp = np.zeros((len(vals), width), dtype=np.int64)
        for i, st in enumerate(vals):
            if st:
                cp[i, : len(st)] = np.frombuffer(
                    st.encode("utf-32-le"), dtype=np.uint32
                )
        acc = np.zeros(len(vals), dtype=np.int64)
        for pos in range(width):
            active = pos < lens
            acc[active] = (acc[active] * 31 + cp[active, pos]) % ROLLING_HASH_MOD
        out = pd.Series(acc, dtype="Int64")
        out[null_mask.to_numpy()] = pd.NA
        return out

    return _roll(text)


def md5_bucket_prefix(text: Column) -> Column:
    """First 4 hex chars of md5(utf8(text)) — the deterministic sampling
    bucket. NULL text coalesces to '0000' (a valid minimal hex bucket):
    leaving it NULL would drop NULL docs from every rate gate on the
    Spark side while engine-default NULL ordering (Spark NULLS FIRST,
    DuckDB NULLS LAST) scrambles rank-based draws. SQL mirror:
    coalesce(substr(md5(text), 1, 4), '0000')."""
    return F.coalesce(
        F.substring(F.md5(F.encode(text, "UTF-8")), 1, 4), F.lit("0000")
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined), for Jaccard/MinHash dedup.

    NULL text yields an EMPTY array, explicitly: with a NULL token array,
    ``greatest(n - k, -1)`` skips the NULL operand, ``sequence(0, -1)``
    DESCENDS to two indices, and ``concat_ws`` renders the NULL slices as
    ``''`` — every NULL doc would get the identical sentinel shingle set
    and cluster together in LSH dedup (caught by the NULL-row fuzz
    fixture)."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    return F.when(n.isNull() | (n < k), F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def compression_ratio_udf(text: Column) -> Column:
    """Gopher-style compressibility signal: zlib-compressed size over
    raw UTF-8 size (repetitive/boilerplate text compresses far below
    ~0.4; high-entropy junk stays near 1). zlib has no SQL analogue, so
    the registered query is rows-only with unit tests pinning the
    planted-extremes ordering. Arrow-batched pandas UDF — the C zlib
    dominates, Python overhead is per-batch."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        def one(t: str | None) -> float:
            if not t:
                return 1.0
            raw = t.encode("utf-8")
            return round(len(zlib.compress(raw, 6)) / len(raw), 6)

        return s.map(one)

    return _ratio(text)


def compression_roundtrip_udf(text: Column) -> Column:
    """True iff ``zlib.decompress(zlib.compress(utf8)) == utf8`` — the
    lossless-codec invariant the compression_quality signal rests on.
    Exists for the driver-hashable audit query (a codec/encoding
    regression flips the boolean and the audit's value-hash goes red).
    NULL/empty text trivially passes."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _rt(s: pd.Series) -> pd.Series:
        def one(t: str | None) -> bool:
            if not t:
                return True
            raw = t.encode("utf-8")
            return zlib.decompress(zlib.compress(raw, 6)) == raw

        return s.map(one)

    return _rt(text)
