"""Vector expressions over ``array<float>`` embedding columns.

All math is done in DOUBLE with strictly sequential left folds
(``F.aggregate``), which is bit-identical to DuckDB's ``list_reduce`` —
that's what makes cosine scores oracle-hashable. Element-wise ops stay
JVM-side (higher-order functions); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def _fold_sum(arr: Column) -> Column:
    # sequential left fold: 0.0 + x1 + x2 + ... (order-stable, engine-portable)
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(as_double(a), as_double(b), lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
