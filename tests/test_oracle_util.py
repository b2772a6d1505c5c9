"""The local parity gate must be at least as strict as the driver's hash.

Round-8 lesson: the driver's canonical hash distinguishes int64 from
float64 even when the values are numerically identical (an uncast DuckDB
``sum(BIGINT)`` → HUGEINT → pandas float64 vs Spark's int64 failed
``vocab_coverage_curve`` at the driver while the builder's selfcheck —
whose ``canonicalize`` normalizes integral floats — called it green).
These tests pin the hardened gate: a deliberately-uncast oracle frame now
FAILS locally, while the genuine nullable-int64→float64 pandas artifact
(NaN present on both sides) still passes.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_util import canonicalize, dtype_leaks


class _FakeSparkDF:
    """assert_parity only calls .toPandas(); stub it for unit scope."""

    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def toPandas(self) -> pd.DataFrame:
        return self._pdf


def test_uncast_hugeint_oracle_fails_even_with_equal_values():
    from tests.oracle_util import assert_parity

    sp = pd.DataFrame({"k": [1, 2], "total": pd.array([27165, 3], dtype="int64")})
    # DuckDB HUGEINT sum materialized by .df(): float64, integral values
    du = pd.DataFrame({"k": [1, 2], "total": pd.array([27165.0, 3.0], dtype="float64")})
    assert dtype_leaks(sp, du) == ["total"]
    with pytest.raises(AssertionError, match="dtype leak"):
        assert_parity(_FakeSparkDF(sp), du, "deliberately_uncast")


def test_leak_is_symmetric():
    sp = pd.DataFrame({"v": pd.array([1.0, 2.0], dtype="float64")})
    du = pd.DataFrame({"v": pd.array([1, 2], dtype="int64")})
    assert dtype_leaks(sp, du) == ["v"]


def test_nullable_widening_artifact_still_passes():
    """A Spark long column with a NULL widens to float64-with-NaN on BOTH
    engines' pandas frames (values match ⇒ NULLs match) — no leak, and the
    integral-float normalization keeps the value compare green."""
    from tests.oracle_util import assert_parity

    sp = pd.DataFrame({"v": pd.array([1.0, float("nan")], dtype="float64")})
    du = pd.DataFrame({"v": pd.array([1.0, float("nan")], dtype="float64")})
    assert dtype_leaks(sp, du) == []
    assert_parity(_FakeSparkDF(sp), du, "nullable_artifact")


def test_matching_int_dtypes_pass():
    sp = pd.DataFrame({"v": pd.array([5, 6], dtype="int64")})
    du = pd.DataFrame({"v": pd.array([5, 6], dtype="int32")})
    assert dtype_leaks(sp, du) == []


def test_canonicalize_still_normalizes_integral_floats():
    out = canonicalize(pd.DataFrame({"v": [2745024.0]}))
    assert out["v"].iloc[0] == "2745024"
