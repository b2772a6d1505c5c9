"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This is a faster local mirror of the driver's sf0.01 gate; the full-scale
check runs in CI (the driver) per round.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_util import assert_parity


def _specs():
    from kafka_topic_analyzer_spark.registry import all_queries

    return [(n, s) for n, s in sorted(all_queries().items()) if s.oracle is not None]


@pytest.mark.parametrize("name,spec", _specs(), ids=[n for n, _ in _specs()])
def test_oracle_parity(spark, duck, name, spec):
    duck.register_sf(SF_SMOKE)
    spark_df = spec.spark(spark, SF_SMOKE)
    duck_df = duck.execute(spec.oracle).df()
    assert_parity(spark_df, duck_df, name)


def test_all_queries_have_runner(spark):
    from kafka_topic_analyzer_spark.registry import all_queries

    for name, spec in all_queries().items():
        df = spec.spark(spark, SF_SMOKE)
        assert df.columns, name
