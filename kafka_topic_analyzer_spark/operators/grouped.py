"""Grouped Python extension rungs (SURVEY.md §2.11 ladder, with receipts).

Two demos completing the documented escape-hatch ladder — each does real
work a built-in can't express as directly, and each is oracle-matched
because its arithmetic is engine-portable:

* ``char_dispersion_udaf`` — a GROUPED_AGG ``pandas_udf`` (the UDAF
  rung): total absolute deviation from the group median, in doubled
  integer units (2·median of ints is always integral, so the whole
  computation stays exact int64 — no libm, no float summation order).
* ``per_group_minmax_norm`` — a grouped-map ``applyInPandas`` (the
  UDTF-like rung): per-group min-max normalization with floor(+0.5)
  rounding (same engine-portable rounding as vectors.quantize_int8).

Scale: both shuffle once on the group key; the Python stage receives
Arrow batches per group. applyInPandas materializes each GROUP in one
pandas frame — fine for bounded groups (languages, sources), wrong for
unbounded ones; that caveat is the documented reason aggregations
prefer the UDAF/built-in rungs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def char_dispersion_udaf(v: pd.Series) -> int:
    """Sum over the group of |2*x - 2*median(x)| — exact int64."""
    x = v.to_numpy(dtype=np.int64)
    if len(x) == 0:
        return 0
    med2 = int(round(2 * float(np.median(x))))  # 2*median of ints is integral
    return int(np.abs(2 * x - med2).sum())


@pandas_udf("long")
def _group_size_udaf(v: pd.Series) -> int:
    return int(len(v))


def source_char_dispersion(docs: DataFrame) -> DataFrame:
    """Per-source doc-length dispersion via the UDAF rung. Spark refuses
    to mix GROUPED_AGG pandas UDFs with JVM aggregates in one agg(), so
    the count is a pandas UDAF too."""
    return (
        docs.groupBy("source")
        .agg(
            _group_size_udaf(F.col("n_chars")).alias("n_docs"),
            char_dispersion_udaf(F.col("n_chars")).alias("total_abs_dev_x2"),
        )
        .orderBy("source")
    )


def per_group_minmax_norm(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "norm"
) -> DataFrame:
    """Grouped-map applyInPandas: (x - min) / (max - min) per group,
    floor(+0.5)-rounded to 6 places; constant groups normalize to 0."""
    schema = f"doc_id long, {group_col} string, {out_col} double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype=np.float64)
        lo, hi = x.min(), x.max()
        n = np.zeros_like(x) if hi == lo else (x - lo) / (hi - lo)
        n = np.floor(n * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], group_col: pdf[group_col], out_col: n}
        )

    return df.groupBy(group_col).applyInPandas(norm, schema)
