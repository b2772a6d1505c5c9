"""Z-order layout: prove the Morton-sorted write actually tightens parquet
footer min/max stats — the mechanism file pruning runs on.

The audit query (queries/curation.py zorder_layout_audit) reports the
clustering; this test performs the PRODUCTION write both ways
(naturally-ordered vs repartitionByRange(z) + sortWithinPartitions(z)) and
inspects the real footers with pyarrow: summed per-file value spans on BOTH
dimensions must shrink under the z layout, i.e. a predicate on either
column prunes more files.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _per_file_spans(path: str, col: str) -> list[int]:
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(
                [md.schema.column(i).name for i in range(md.num_columns)].index(col)
            ).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append(hi - lo)
    return spans


def test_zorder_write_tightens_footer_stats(spark):
    from kafka_topic_analyzer_spark.queries.curation import _z_interleave_terms
    from kafka_topic_analyzer_spark.sources.tables import load_table

    e = load_table(spark, SF_SMOKE, "events")
    tsec = F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("long")
    hour = F.floor(tsec / F.lit(3600)).cast("long")
    base = e.select(F.col("user_id").alias("u"), hour.alias("h"))
    # production z-ordering min-max-normalizes each dimension onto the full
    # 8-bit range first (Delta's OPTIMIZE ZORDER uses range/rank quantiles)
    # — otherwise a low-cardinality dimension only occupies low interleave
    # bits and gets no pruning benefit
    lims = base.agg(
        F.min("u").alias("u_lo"), F.max("u").alias("u_hi"),
        F.min("h").alias("h_lo"), F.max("h").alias("h_hi"),
    )
    z = (
        base.crossJoin(F.broadcast(lims))
        .withColumn("ux", F.expr("(u - u_lo) * 256 div (u_hi - u_lo + 1)"))
        .withColumn("tx", F.expr("(h - h_lo) * 256 div (h_hi - h_lo + 1)"))
        .withColumn("z", F.expr(_z_interleave_terms("ux", "tx")))
        .select("ux", "tx", "z")
    )
    n_files = 8
    with tempfile.TemporaryDirectory() as tmp:
        plain, zsorted = os.path.join(tmp, "plain"), os.path.join(tmp, "zsorted")
        # Baseline layout: whatever order the scan produces, hashed into files
        z.repartition(n_files).write.parquet(plain)
        # Z layout: range-partition on z, sort within each file
        z.repartitionByRange(n_files, "z").sortWithinPartitions("z").write.parquet(
            zsorted
        )
        for col in ("ux", "tx"):
            plain_span = sum(_per_file_spans(plain, col))
            zed_span = sum(_per_file_spans(zsorted, col))
            # each dimension's summed per-file span must tighten: a filter
            # on that column overlaps fewer files' [min, max] windows
            assert zed_span < plain_span, (
                f"z layout did not tighten {col}: {zed_span} vs {plain_span}"
            )
