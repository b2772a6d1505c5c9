"""Frequency / membership sketches and pre-shuffle join planning.

The reference engine keeps one exact in-memory hash table per topic
(`src/metric.rs` key cardinality); at 100 TB the planning questions a
pipeline actually asks — "which keys are heavy?", "is this fact row even
worth shuffling?", "how big will this self-join be?" — are answered with
SKETCHES built map-side and merged associatively, plus exact per-key
censuses that are orders of magnitude smaller than the rows themselves.

Everything here is deterministic and engine-portable by construction: the
hash family is md5-prefix arithmetic (identical hex on Spark and DuckDB —
the same discipline as the md5-bucket sampler, queries/curation.py), so
every sketch cell, bloom bit, and estimate is bit-for-bit reproducible and
oracle-checkable. No UDFs anywhere — pure codegen expressions beside the
scan, then one small-key aggregation:

- ``cms_*``: Count-Min sketch (Cormode & Muthukrishnan 2005) — d hash
  rows x w counters; point estimate = min over rows; overestimate-only.
  Cells are built from the per-key census (one shuffle over distinct
  keys), NOT by exploding the raw scan d times.
- ``bloom_*``: classic k-hash Bloom filter as a DISTINCT bit-position
  relation. The serving pattern is scan-side semi-join pruning: broadcast
  the (<= m)-row bit table against the fact scan's hash projections and
  drop non-members BEFORE the shuffle — what Spark's runtime bloom
  (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does inside AQE,
  re-expressed explicitly so the false-positive economics are auditable.
- ``selfjoin_skew_forecast``: exact per-key output-size forecast for a
  keyed self-join (the dedup candidate generator): |out_k| = cnt_k^2,
  computed from the census WITHOUT running the join — the number a
  planner needs to decide salting before committing to the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hash32",
    "cms_cells",
    "cms_estimates",
    "bloom_positions",
    "bloom_probe_flags",
    "selfjoin_skew_forecast",
    "HASH32_SQL",
]

# Count-Min geometry used by the registered queries: d rows of w counters.
CMS_DEPTH = 4
CMS_WIDTH = 512

# Bloom geometry: k salted hashes into m bits.
BLOOM_K = 3
BLOOM_M = 8192


def hash32(key: Column, salt: int | str) -> Column:
    """Salted 32-bit uniform hash: first 8 hex chars of md5("{salt}:{key}").

    Identical on DuckDB as ``HASH32_SQL`` — md5 produces the same lowercase
    hex for the same UTF-8 bytes on both engines, and an 8-char prefix fits
    a BIGINT exactly (max 0xFFFFFFFF).
    """
    s = F.concat(F.lit(f"{salt}:"), key.cast("string"))
    return F.conv(F.substring(F.md5(F.encode(s, "UTF-8")), 1, 8), 16, 10).cast("long")


def HASH32_SQL(key_expr: str, salt_expr: str) -> str:
    """DuckDB mirror of :func:`hash32`; ``salt_expr`` may be a column."""
    return (
        f"CAST('0x' || substr(md5(CAST({salt_expr} AS VARCHAR) || ':' || "
        f"CAST({key_expr} AS VARCHAR)), 1, 8) AS BIGINT)"
    )


def _positions(key: Column, n_hashes: int, modulus: int | Column) -> list[Column]:
    return [F.pmod(hash32(key, j), F.lit(modulus) if isinstance(modulus, int) else modulus) for j in range(n_hashes)]


def cms_cells(
    keyed_counts: DataFrame,
    key: str,
    cnt: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the Count-Min cell relation (row_j, col_j, cell_total) from a
    per-key census.

    One explode of depth structs per DISTINCT key (not per raw row), then a
    <= depth*width-group aggregation — map-side combinable, constant-size
    state regardless of corpus size. At 100 TB the census itself is the
    only real shuffle; the sketch is metadata.
    """
    rc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("row_j"),
                    F.pmod(hash32(F.col(key), j), F.lit(width)).alias("col_j"),
                )
                for j in range(depth)
            ]
        )
    ).alias("rc")
    return (
        keyed_counts.select(rc, F.col(cnt))
        .select("rc.row_j", "rc.col_j", cnt)
        .groupBy("row_j", "col_j")
        .agg(F.sum(cnt).cast("long").alias("cell_total"))
    )


def cms_estimates(
    candidates: DataFrame,
    cells: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each candidate key against the sketch: est =
    min over the d rows of the counter the key hashes to. Candidates carry
    their other columns through; the cell relation is broadcast (<= d*w
    rows)."""
    rc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("row_j"),
                    F.pmod(hash32(F.col(key), j), F.lit(width)).alias("col_j"),
                )
                for j in range(depth)
            ]
        )
    ).alias("rc")
    probes = candidates.select(*candidates.columns, rc).select(
        *candidates.columns, "rc.row_j", "rc.col_j"
    )
    # LEFT join + coalesce(0): a candidate key absent from the census may
    # hash to cells no census key touched — those cells simply don't exist
    # in the (sparse) cell relation, but their CMS counter value is 0. An
    # inner join would take the min over only the non-empty cells
    # (inflated) and drop the key entirely when ALL its cells are empty
    # (advisor r13). Member keys are unaffected: every cell they hash to
    # holds at least their own count, so no NULL ever reaches their min.
    return (
        probes.join(F.broadcast(cells), ["row_j", "col_j"], "left")
        .groupBy(*candidates.columns)
        .agg(
            F.min(F.coalesce(F.col("cell_total"), F.lit(0)))
            .cast("long")
            .alias("est_cnt")
        )
    )


def bloom_positions(
    keys: DataFrame,
    key: str,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Set bits: the DISTINCT hash positions of every key under k salted
    hashes — the Bloom filter as a (<= m)-row relation, broadcastable."""
    pos = F.explode(F.array(*_positions(F.col(key), k, m))).alias("pos")
    return keys.select(pos).distinct()


def bloom_probe_flags(
    fact: DataFrame,
    key: str,
    bloom: DataFrame,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Annotate ``fact`` with ``bloom_pass``: true iff ALL k positions of
    ``key`` are set. k broadcast left-joins against the bit relation — the
    fact side never shuffles, which is the entire point of scan-side
    pruning."""
    reserved = {c for j in range(k) for c in (f"_bp{j}", f"_bm{j}")}
    clash = reserved & set(fact.columns)
    if clash:
        # withColumn would silently overwrite (then drop) a caller column
        # of the same name, corrupting data instead of failing (advisor
        # r13) — refuse loudly.
        raise ValueError(
            f"bloom_probe_flags: fact already has reserved column(s) {sorted(clash)}"
        )
    out = fact
    flags = []
    for j, p in enumerate(_positions(F.col(key), k, m)):
        pname, mname = f"_bp{j}", f"_bm{j}"
        side = bloom.select(F.col("pos").alias(pname), F.lit(1).alias(mname))
        out = out.withColumn(pname, p).join(F.broadcast(side), pname, "left")
        flags.append(F.col(mname).isNotNull())
    passed = flags[0]
    for f in flags[1:]:
        passed = passed & f
    return out.withColumn("bloom_pass", passed).drop(
        *[c for j in range(k) for c in (f"_bp{j}", f"_bm{j}")]
    )


def selfjoin_skew_forecast(df: DataFrame, key: str, top_n: int = 15) -> DataFrame:
    """Exact per-key output forecast for a self-join on ``key`` (the
    blocked-dedup candidate generator): each key with cnt rows contributes
    cnt^2 pairs. One census shuffle; no join is executed. ``share_bp`` is
    the key's integer basis-point share of the total forecast output — the
    salting decision input (a key near 10000 bp means ONE reducer would
    build nearly the whole output)."""
    cnts = df.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    # ACCUMULATE in DECIMAL(38,0) (advisor r14): squaring and summing in
    # BIGINT silently wraps under Spark's non-ANSI arithmetic once a key
    # exceeds ~3e9 rows or the per-key contributions sum past 2^63 —
    # exactly the extreme-skew regime this forecast exists for. DuckDB's
    # sum(BIGINT) natively widens to HUGEINT, so the decimal accumulation
    # is also what keeps both engines agreeing. The EMITTED
    # pair_contribution column stays BIGINT for schema/hash stability;
    # its own ~3e9-rows-per-key ceiling (9.2e18) is the one remaining
    # bound and is documented here — past it the Spark column goes NULL
    # on the cast while share_bp (computed fully in decimal) stays exact.
    pc_dec = F.col("n_rows").cast("decimal(19,0)") * F.col("n_rows").cast(
        "decimal(19,0)"
    )
    contrib = cnts.withColumn("_pc_dec", pc_dec.cast("decimal(38,0)")).withColumn(
        "pair_contribution", F.col("_pc_dec").cast("long")
    )
    total = contrib.agg(
        F.sum("_pc_dec").cast("decimal(38,0)").alias("_total_dec")
    ).select("_total_dec", F.col("_total_dec").cast("long").alias("total_pairs"))
    return (
        contrib.crossJoin(F.broadcast(total))
        .withColumn(
            # the *10000 product overflows BIGINT once a key holds ~30M+
            # rows (pc up to ~9.2e18, *1e4 = 9.2e22) — exactly the
            # extreme-skew regime this forecast exists for at 100 TB
            # (advisor r13). DECIMAL(38,0) holds 1e38; integral div on
            # decimals matches DuckDB's HUGEINT // bit-for-bit (both are
            # exact floor division on exact integers).
            "share_bp",
            F.expr("CAST((_pc_dec * 10000) div _total_dec AS BIGINT)"),
        )
        .drop("_pc_dec", "_total_dec")
        .orderBy(F.desc("pair_contribution"), key)
        .limit(top_n)
    )
