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

    PERMISSIVE mode + ``_corrupt_record`` would silently null bad rows;
    FAILFAST makes ingest corruption loud — the right default for a
    training corpus where silent row loss poisons downstream stats.
    """
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """Write the documents frame as JSONL (one object per line)."""
    df.select([f.name for f in DOCUMENTS_SCHEMA.fields]).write.mode(
        "overwrite"
    ).json(path)
