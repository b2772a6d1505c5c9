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


def assert_parity(spark_df, duck_rel_df: pd.DataFrame, name: str = "") -> None:
    sp = canonicalize(spark_df.toPandas())
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
