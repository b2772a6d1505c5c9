"""Output sinks: partitioned parquet with explicit file-size control.

The reference's only sink is a stdout table (`src/main.rs:123-179`); a
training-data engine also has to WRITE corpus shards. The failure modes at
100 TB are file-count explosions (every task x every hive partition writes
a file) and giant single files (one task owns a hot partition). This
writer pins both:

- ``repartition(partition_cols)`` routes each output hive-partition to one
  task set, so a partition gets ~1 file per shuffle partition it occupies
  instead of one per upstream task (the small-files fix);
- ``maxRecordsPerFile`` caps the other direction — an oversized task rolls
  over to new files at a predictable row count (the giant-file fix);
- optional ``sort_within_partitions`` orders rows inside each file (better
  column compression + range-prunable downstream scans).

Deterministic layout, no driver-side data movement, works unchanged on a
real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_shards(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    sort_within_partitions: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as parquet shards with bounded file sizes.

    ``partition_by`` produces hive-style directories; rows are shuffled by
    those columns first so each directory is written by few tasks.
    """
    out = df
    if partition_by:
        out = out.repartition(*partition_by)
    if sort_within_partitions:
        out = out.sortWithinPartitions(*sort_within_partitions)
    writer = out.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
