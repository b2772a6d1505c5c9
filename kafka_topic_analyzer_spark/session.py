"""SparkSession construction tuned for this engine.

Local-mode defaults target the test harness (local[N], one JVM); the same
settings are sane on a real cluster (AQE on, UTC, Arrow on). Callers that
already hold a session (e.g. the verify driver) use :func:`prepare_session`
to apply the *runtime-settable* confs the engine depends on.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs every entry point applies defensively. The
# testdata `events.parquet` carries TIMESTAMP(NANOS) which Spark only reads
# with the legacy nanos-as-long conf; sessionTZ=UTC keeps timestamp semantics
# aligned with the DuckDB oracle.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def prepare_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-provided session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Static conf on this build — leave whatever the session has.
            pass
    # A vanilla session keeps the 200-partition shuffle default, which on
    # local test scales means ~200 near-empty tasks per shuffle (and 200
    # state-store partitions per streaming agg — AQE can't coalesce those).
    # Right-size to the actual parallelism, but never override an explicit
    # non-default choice.
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            cores = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 8)))
    except Exception:
        pass
    return spark


from contextlib import contextmanager


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Temporarily pin ``spark.sql.shuffle.partitions`` (restored on exit).

    Bounded streaming twins use this to right-size STATE STORE count: a
    stateful operator creates one state store per shuffle partition, and on
    the small bounded inputs the per-store bring-up (checkpoint dirs,
    snapshot files) dominates wall time — 32 stores for a few thousand
    rows is pure overhead. Results are partition-count-independent (hash
    partitioning by key; watermarks/windows don't observe layout), so
    correctness and oracle parity are unaffected. On a real unbounded
    deployment the default (cores-sized) setting stands.
    """
    try:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
    except Exception:
        prev = None
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def get_spark(app_name: str = "kafka_topic_analyzer_spark") -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return prepare_session(spark)
