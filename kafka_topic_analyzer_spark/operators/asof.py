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

    NULL semantics (matches SQL ``ASOF JOIN``, whose ``l.key = r.key AND
    r.ts <= l.ts`` predicates are never true on NULL): right rows with a
    NULL key or NULL ts are never match candidates — filtered here,
    because the window's ``partitionBy`` would otherwise group NULL keys
    together and attribute NULL-key right rows to NULL-key left rows.
    Left rows with a NULL key or ts come out unmatched (NULL payload):
    with the right side filtered, a NULL-key partition holds no
    candidates, and a NULL-ts left row sorts NULLS-FIRST before every
    candidate. Found by the registry fuzz (NULL-user click/purchase pair
    matched on Spark, not in DuckDB's native ASOF).
    """
    l_tagged = left.withColumn("_side", F.lit(1))
    r_tagged = (
        right.where(F.col(key).isNotNull() & F.col(ts).isNotNull())
        .select(
            key,
            ts,
            F.struct(*[F.col(c) for c in right_payload]).alias("_payload"),
        )
        .withColumn("_side", F.lit(0))
    )
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


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_size: int,
) -> DataFrame:
    """Point-in-interval join without the O(|points| x |intervals|) blowup.

    A naive theta-join on ``start <= p < end`` gives Spark nothing to
    hash on (BroadcastNestedLoop at best). Binning restores an equi-key:
    each interval explodes to the bins it overlaps, each point maps to
    exactly ONE bin, the join runs on the bin id, and the exact range
    predicate filters inside the (tiny) bin-local candidate set. Each
    (point, interval) match is produced exactly once — by the point's
    own bin — so no dedup pass is needed. ``bin_size`` close to the
    typical interval length keeps the explode factor ~2.
    """
    binned_points = points.withColumn(
        "_bin", F.floor(F.col(point_col) / bin_size).cast("long")
    )
    binned_intervals = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_size).cast("long"),
                # end exclusive: a point at exactly `end` never matches
                F.floor((F.col(end_col) - 1) / bin_size).cast("long"),
            )
        ),
    )
    return (
        binned_points.join(binned_intervals, "_bin")
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_bin")
    )
