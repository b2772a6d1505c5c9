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
    from kafka_topic_analyzer_spark.operators.pipeline import zordered_events
    from kafka_topic_analyzer_spark.sources.tables import load_table

    # the shared production recipe: min-max-normalized dims + Morton key
    # (operators/pipeline.py zordered_events — bench.py probes the same
    # frame for row-group skip counts)
    z = zordered_events(load_table(spark, SF_SMOKE, "events"))
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


def test_zorder_skips_rowgroups_on_selective_predicates(spark):
    """The PAYOFF claim, not just the layout: under a selective band
    predicate, a footer-stats reader must skip strictly more row groups
    in the z-sorted layout than in the natural one — on EACH single
    dimension and on their 2-D intersection (bench.py publishes the same
    counts at sf0.1 as zorder_rowgroup_skips)."""
    from kafka_topic_analyzer_spark.operators.pipeline import (
        rowgroup_band_skips,
        zordered_events,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    z = zordered_events(load_table(spark, SF_SMOKE, "events"))
    with tempfile.TemporaryDirectory() as tmp:
        plain_p, zed_p = os.path.join(tmp, "plain"), os.path.join(tmp, "z")
        z.repartition(16).write.parquet(plain_p)
        z.repartitionByRange(16, "z").sortWithinPartitions("z").write.parquet(zed_p)
        plain = rowgroup_band_skips(plain_p, 120, 136)
        zed = rowgroup_band_skips(zed_p, 120, 136)
    for key in ("ux", "tx", "both"):
        assert zed[key] > plain[key], (key, plain, zed)
    # the 2-D predicate compounds: at least half the row groups skip
    assert zed["both"] * 2 >= zed["total"], zed


def test_band_skips_treats_missing_stats_as_overlap(tmp_path):
    """A parquet file written WITHOUT column statistics (or missing the
    band columns entirely) must count as non-skippable, matching real
    footer-stats reader semantics — not raise (advisor r7)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_topic_analyzer_spark.operators.pipeline import rowgroup_band_skips

    nostats = str(tmp_path / "nostats")
    (tmp_path / "nostats").mkdir()
    t = pa.table({"ux": [1, 2, 3], "tx": [4, 5, 6]})
    pq.write_table(t, nostats + "/part-0.parquet", write_statistics=False)
    res = rowgroup_band_skips(nostats, 100, 200)
    assert res["total"] >= 1
    assert res["ux"] == res["tx"] == res["both"] == 0

    nocol = str(tmp_path / "nocol")
    (tmp_path / "nocol").mkdir()
    pq.write_table(pa.table({"other": [1, 2]}), nocol + "/part-0.parquet")
    res2 = rowgroup_band_skips(nocol, 100, 200)
    assert res2["ux"] == res2["tx"] == res2["both"] == 0


def test_layout_pruning_audit_invariants(spark):
    """The zone-map audit's two layouts agree on the answer (rows_matched)
    while the Z-ordered layout scans no more rows than the linear one —
    pruning changes I/O, never results."""
    from kafka_topic_analyzer_spark.queries.curation import _layout_pruning_audit

    rows = {r["layout"]: r for r in _layout_pruning_audit(spark, SF_SMOKE).collect()}
    assert set(rows) == {"zorder", "linear"}
    z, lin = rows["zorder"], rows["linear"]
    assert z["rows_matched"] == lin["rows_matched"]
    assert z["rows_total"] == lin["rows_total"]
    assert z["rows_scanned"] <= lin["rows_scanned"]
    for r in (z, lin):
        # every matching row lives in a scanned file
        assert r["rows_matched"] <= r["rows_scanned"] <= r["rows_total"]
        assert r["n_files_pruned"] + r["n_files_scanned"] == r["n_files"]
