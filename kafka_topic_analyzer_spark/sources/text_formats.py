"""Line-oriented text formats (JSONL) for the documents corpus.

Raw training corpora commonly arrive as JSONL; this is the ingest/egress
pair for it. Scale rules encoded here:

* **Explicit schema always** — schema inference reads the data twice and
  samples nondeterministically; at 100 TB both are incidents. The schema
  is the documents contract (sources/tables.py).
* **No multiline JSON** — one object per line keeps the format splittable
  (a 1 TB file still parallelizes by byte range); multiline JSON forces
  whole-file parsing. ``lineSep`` stays default '\\n'.
* **Compression by codec extension** on write (``.zst``/``.gz`` name the
  codec); gzip is NOT splittable — at scale prefer zstd or none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL documents corpus with the fixed contract schema.

    Delegates to the generic reader (sources/files.py) in FAILFAST mode:
    PERMISSIVE + ``_corrupt_record`` would silently null bad rows, and a
    training corpus where silent row loss poisons downstream stats wants
    ingest corruption loud. Callers that prefer to audit instead use
    ``files.read_jsonl(..., mode="PERMISSIVE")`` + ``corrupt_line_stats``.
    """
    from kafka_topic_analyzer_spark.sources.files import read_jsonl

    return read_jsonl(spark, path, DOCUMENTS_SCHEMA, mode="FAILFAST")


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """Write the documents frame as JSONL (one object per line)."""
    df.select([f.name for f in DOCUMENTS_SCHEMA.fields]).write.mode(
        "overwrite"
    ).json(path)
