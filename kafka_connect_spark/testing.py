"""Shared test utilities: canonicalize + compare Spark/DuckDB results the
way the driver's t2 harness does (column-name sort, order-insensitive rows,
floats rounded to 1e-6, timestamps at ms precision)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.floor("ms")
        elif s.dtype == object:
            df[c] = s.map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of problems; empty list == match."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        ]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        # representation guard (the x41/p14 bug class): DuckDB returns
        # HUGEINT/unCAST wide aggregates as float64 while Spark emits int64
        # — values can match here yet hash differently in the driver's
        # representation-level check. Flag int-vs-float kind mixes unless
        # the float side is only float because of NULL promotion.
        ak, bk = av.dtype.kind, bv.dtype.kind
        if {ak, bk} == {"i", "f"}:
            floats = av if ak == "f" else bv
            if not floats.isna().any():
                problems.append(
                    f"dtype kind mismatch in {c!r}: spark={av.dtype} duck={bv.dtype}"
                    " (unCAST DuckDB HUGEINT? wrap the aggregate in CAST(... AS BIGINT))"
                )
                continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            ok = np.allclose(
                av.astype(float).fillna(-9e99),
                bv.astype(float).fillna(-9e99),
                atol=1e-6,
                rtol=0,
            )
        else:
            ok = av.astype(str).equals(bv.astype(str))
        if not ok:
            bad = (av.astype(str) != bv.astype(str)).idxmax() if len(av) else 0
            problems.append(
                f"values differ in {c!r}: e.g. row {bad}: spark={av.iloc[bad]!r} duck={bv.iloc[bad]!r}"
            )
    return problems
