"""As-of (time-travel) join — a custom operator Spark lacks natively.

Composed from built-ins (SURVEY.md escape-hatch ladder, step (a)): tag
both sides, union, and take ``last(right_payload, ignorenulls)`` over a
per-key window ordered by (ts, side) — right rows sort before left rows
at equal timestamps, so "most recent right row with ``r.ts <= l.ts``"
falls out of one shuffle + one sort, with no join explosion and no range
predicate. This is the scalable distributed as-of: shuffle keys are the
join keys, state per key is one struct, skew behaves like any keyed
window (AQE/salting applies).

DuckDB has a native ``ASOF JOIN``, which the query layer uses as the
oracle — the composed plan must reproduce the built-in's semantics
exactly (ties on the right side pre-deduplicated to keep both engines
deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right.ts <= left.ts`` within the same ``key`` (left join: no match
    -> NULL payload).

    ``right`` must be unique per (key, ts) — pre-aggregate if not;
    ``tiebreak`` orders left rows deterministically within equal ts.
    """
    l_tagged = left.withColumn("_side", F.lit(1))
    r_tagged = right.select(
        key,
        ts,
        F.struct(*[F.col(c) for c in right_payload]).alias("_payload"),
    ).withColumn("_side", F.lit(0))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .drop("_side", "_payload")
    )
