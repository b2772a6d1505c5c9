"""Order-insensitive Spark↔DuckDB result comparison (mimics the driver gate)."""

from __future__ import annotations

import math

import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows — hash-stable."""
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            # integral floats render as integers: pandas widens a NULLABLE
            # int64 column to float64 (toPandas of a Spark long with one
            # NULL), and '2745024.000000' vs DuckDB's int '2745024' would
            # be a dtype artifact, not a value divergence
            if v.is_integer() and abs(v) < 2**53:
                return str(int(v))
            # driver-style value canonicalization: fixed decimal repr
            return f"{v:.6f}"
        if isinstance(v, bytes):
            return v.hex()
        if pd.isna(v):
            return "∅"
        if isinstance(v, bool):
            return str(bool(v))
        return str(v)

    # astype(object) AFTER the map: values are already strings, but on an
    # EMPTY frame map() preserves the numeric dtypes, and DataFrame.equals
    # treats two empty frames with different dtypes as unequal — an
    # artifact, not a divergence (both engines returned zero rows)
    out = df.map(norm).astype(object)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def dtype_leaks(sp_raw: pd.DataFrame, du_raw: pd.DataFrame) -> list:
    """Columns where one engine yields an integer dtype and the other a float.

    ``canonicalize`` normalizes integral floats to int strings (a genuine
    pandas artifact when a NULLABLE int64 widens to float64), but that same
    normalization masks uncast oracle aggregates — DuckDB ``sum(BIGINT)``
    returns HUGEINT, which ``.df()`` materializes as float64, while Spark
    returns int64. The driver's canonical hash distinguishes those dtypes
    (r8 ``vocab_coverage_curve`` FAIL), so the local gate must too. An
    int-vs-float dtype pair can never be the nullable artifact: a NULL in
    the column widens BOTH engines' frames to float (and an engine-side
    NULL asymmetry is a value divergence anyway), so every hit here is an
    uncast oracle projection (missing ``CAST(... AS BIGINT)``) or a Spark
    result typed differently from its oracle. Returns the offending
    column names; callers treat non-empty as FAIL even when the
    normalized values match.
    """
    leaks = []
    for c in sorted(set(sp_raw.columns) & set(du_raw.columns)):
        a, b = sp_raw[c].dtype, du_raw[c].dtype
        a_int = pd.api.types.is_integer_dtype(a)
        b_int = pd.api.types.is_integer_dtype(b)
        a_flt = pd.api.types.is_float_dtype(a)
        b_flt = pd.api.types.is_float_dtype(b)
        if (a_int and b_flt) or (a_flt and b_int):
            leaks.append(c)
    return leaks


def assert_parity(spark_df, duck_rel_df: pd.DataFrame, name: str = "") -> None:
    sp_raw = spark_df.toPandas()
    leaks = dtype_leaks(sp_raw, duck_rel_df)
    assert not leaks, (
        f"{name}: int-vs-float dtype leak in columns {leaks} — uncast oracle "
        f"aggregate (DuckDB HUGEINT/DOUBLE vs Spark integer)? The driver "
        f"hash rejects this even when values match; CAST the projection."
    )
    sp = canonicalize(sp_raw)
    du = canonicalize(duck_rel_df)
    assert list(sp.columns) == list(du.columns), (
        f"{name}: column mismatch spark={list(sp.columns)} duck={list(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duck={len(du)}"
    if not sp.equals(du):
        diff_mask = (sp != du).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch, first diffs:\n"
            f"spark:\n{sp[diff_mask].head(5)}\nduck:\n{du[diff_mask].head(5)}"
        )
