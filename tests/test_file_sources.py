"""JSONL/CSV ingest: schema'd roundtrips and the bad-record policy."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_topic_analyzer_spark.sources.files import (
    CORRUPT_COL,
    corrupt_line_stats,
    read_csv,
    read_jsonl,
)
from kafka_topic_analyzer_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def _events(spark):
    return load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type"
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.select(*SCHEMA.fieldNames()).orderBy("event_id").collect()]


def test_jsonl_roundtrip(spark):
    src = _events(spark)
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "ev.jsonl")
        src.write.json(p)
        back = read_jsonl(spark, p, SCHEMA)
        assert CORRUPT_COL in back.columns
        assert _sorted_rows(back) == _sorted_rows(src)
        stats = corrupt_line_stats(back).collect()[0]
        assert stats.n_corrupt == 0


def test_csv_roundtrip(spark):
    src = _events(spark)
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "ev.csv")
        src.write.option("header", "true").csv(p)
        back = read_csv(spark, p, SCHEMA)
        assert _sorted_rows(back) == _sorted_rows(src)


def test_jsonl_bad_lines_captured_not_lost(spark):
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "mixed.jsonl")
        with open(p, "w") as f:
            f.write('{"event_id": 1, "user_id": 7, "event_type": "click"}\n')
            f.write("not json at all\n")
            f.write('{"event_id": 2, "user_id": 8, "event_type": "view"}\n')
        back = read_jsonl(spark, p, SCHEMA)
        stats = corrupt_line_stats(back).collect()[0]
        assert stats.n_lines == 3
        assert stats.n_corrupt == 1
        assert "not json" in stats.first_corrupt
        good = back.where(F.col(CORRUPT_COL).isNull())
        assert {r.event_id for r in good.collect()} == {1, 2}


def test_jsonl_failfast_raises(spark):
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "bad.jsonl")
        with open(p, "w") as f:
            f.write('{"event_id": 1}\n')
            f.write("garbage\n")
        with pytest.raises(Exception):
            read_jsonl(spark, p, SCHEMA, mode="FAILFAST").collect()


def test_orc_roundtrip_and_pushdown(spark):
    from kafka_topic_analyzer_spark.sources.files import read_orc

    src = _events(spark)
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "ev.orc")
        src.write.orc(p)
        back = read_orc(spark, p, SCHEMA)
        assert _sorted_rows(back) == _sorted_rows(src)
        # predicate must reach the ORC scan (stripe-level pruning at scale)
        plan = (
            back.where("event_id = 1")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters" in plan and "event_id" in plan
