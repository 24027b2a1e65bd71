"""Cross-engine-deterministic rounding.

``round(x, s)`` is an engine-correctness hazard for hash-checked outputs:
Spark rounds the exact BigDecimal value of the double (HALF_UP) while DuckDB
multiplies and rounds in double — on half-boundary values the two differ by
1 ulp (and on tiny negatives by -0.0 vs 0.0), which a value-representation
hash catches even when the inputs were bit-identical (this made p14_deriv
driver-red in round 5 while p15, the same idiom, passed by luck).

``floor(x*10^s + 0.5)/10^s`` instead composes only IEEE-754 ops (*, +,
floor, /) that every engine evaluates bit-identically, so identical inputs
give identical rounded doubles everywhere — Spark, DuckDB, and numpy
(:func:`npround` for the pandas-UDF paths). NaN and out-of-range magnitudes
pass through unchanged in all three implementations, keeping parity where
Spark's floor→long conversion would otherwise produce 0/saturation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def _dround_guard(scale: int) -> float:
    # Above 2^52 / 10^scale the scaled value's ulp exceeds 1: rounding at
    # ``scale`` is a mathematical no-op, and floor()'s long conversion
    # would saturate (Spark) where DuckDB's double floor doesn't. Return
    # the input unchanged past this bound — in every engine.
    return 2.0**52 / 10.0**scale


def dround(col: Column, scale: int = 4) -> Column:
    """Deterministic round-half-up for double columns (Spark side)."""
    p = F.lit(10.0**scale)
    passthru = F.isnan(col) | (F.abs(col) >= F.lit(_dround_guard(scale)))
    return F.when(passthru, col).otherwise(
        F.floor(col * p + F.lit(0.5)).cast("double") / p
    )


def dround_sql(expr: str, scale: int = 4) -> str:
    """DuckDB twin of :func:`dround` — same guard, same IEEE ops."""
    p = repr(10.0**scale)
    g = repr(_dround_guard(scale))
    return (
        f"CASE WHEN isnan({expr}) OR abs({expr}) >= {g} THEN ({expr}) "
        f"ELSE floor(({expr}) * {p} + 0.5) / {p} END"
    )


def npround(x: np.ndarray, scale: int = 6) -> np.ndarray:
    """numpy twin of :func:`dround` for pandas-UDF / applyInPandas paths
    (``np.round`` is half-EVEN and computed differently — it would diverge
    from the SQL twins exactly where round() does)."""
    p = 10.0**scale
    out = np.floor(x * p + 0.5) / p
    passthru = ~np.isfinite(x) | (np.abs(x) >= _dround_guard(scale))
    return np.where(passthru, x, out)
