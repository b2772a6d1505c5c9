"""Text-format ingest: JSONL / CSV readers with an explicit schema and an
explicit bad-record policy.

The reference ingests exactly one format (the Kafka wire record,
``src/kafka.rs:60-131``); a corpus pipeline also swallows line-delimited
dumps (Common-Crawl-style JSONL, vendor CSV drops). Two rules make those
scans safe at 100 TB:

- ALWAYS pass a schema. Inference (`inferSchema`/sampling) is a full extra
  pass over the data before the real job starts, and its result can drift
  between runs as the data changes — the exact failure class the parquet
  loader's normalizers guard against (`sources/tables.py`).
- ALWAYS decide what a malformed line does. ``PERMISSIVE`` keeps the row
  with nulls and captures the raw line in ``corrupt_col`` (audit it, don't
  lose it); ``DROPMALFORMED`` silently shrinks the corpus; ``FAILFAST``
  kills the job on the first bad byte. The default here is PERMISSIVE +
  a captured corrupt column, because "how many lines were bad" is itself
  a data-quality signal a pipeline should aggregate.

Both readers parallelize by input split like any file scan (JSON/CSV are
splittable when uncompressed / block-compressed); filters still push into
the scan for CSV/JSON column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if any(f.name == CORRUPT_COL for f in schema.fields):
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Line-delimited JSON with explicit schema and bad-record capture."""
    use = _with_corrupt(schema) if mode == "PERMISSIVE" else schema
    return (
        spark.read.schema(use)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with explicit schema and bad-record capture (no inferSchema pass)."""
    use = _with_corrupt(schema) if mode == "PERMISSIVE" else schema
    return (
        spark.read.schema(use)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def corrupt_line_stats(df: DataFrame) -> DataFrame:
    """1-row data-quality summary for a PERMISSIVE read: total lines, bad
    lines, and the first bad sample (deterministic min) for the audit log.

    Spark refuses scans whose referenced columns are ONLY the internal
    corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the per-field
    non-null count below references a data column, which both satisfies
    that rule and reports how many lines parsed the field.
    """
    from pyspark.sql import functions as F

    first_field = next(c for c in df.columns if c != CORRUPT_COL)
    bad = F.col(CORRUPT_COL).isNotNull()
    return df.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.col(first_field)).alias("n_first_field_parsed"),
        F.sum(bad.cast("long")).alias("n_corrupt"),
        F.min(F.when(bad, F.col(CORRUPT_COL))).alias("first_corrupt"),
    )


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """ORC scan — the other columnar interchange format a pipeline inherits
    from Hive-era warehouses. Same scan properties as parquet (predicate
    pushdown via file/stripe min-max stats, column pruning, splittable by
    stripe), so everything downstream treats it identically; pass a schema
    to pin column types against drift between drops (ORC has no PERMISSIVE
    corrupt-capture — a type mismatch fails the scan, which for a binary
    columnar format is the safe default).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
