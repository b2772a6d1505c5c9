"""Python UDTF rung of the extensibility ladder (SURVEY.md §2.11).

The engine's ladder is: built-in Columns → vectorized pandas_udf →
mapInPandas → applyInPandasWithState. Spark 4 adds table functions
(one row in, many rows out) as a first-class Python extension point;
this module demonstrates it with a sentence splitter whose semantics
are pinned 1:1 against the pure built-in expression used by the
``sentence_stats`` oracle query (tests/test_extensions.py) — the UDTF
is the extension-API showcase, the built-in composition is the hot
path an operator should actually ship.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_BOUNDARY = re.compile(r"[.!?]+")


@udtf(returnType="idx int, sentence string")
class SentenceSplitUDTF:
    """Split text on [.!?]+ runs; emit (index, trimmed sentence) rows,
    skipping empties — identical to the built-in
    filter(transform(split(...), trim), length > 0) pipeline."""

    def eval(self, text: str | None):  # noqa: D102 - framework signature
        if text is None:
            return
        idx = 0
        for part in _BOUNDARY.split(text):
            p = part.strip()
            if p:
                yield idx, p
                idx += 1


def register_udtfs(spark: SparkSession) -> None:
    """Register table functions for SQL LATERAL use."""
    spark.udtf.register("sentence_split", SentenceSplitUDTF)
