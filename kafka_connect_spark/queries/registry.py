"""Query registry — the engine's declared, checkable surface.

Every operator from SURVEY.md §2 registers here as a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle SQL string over the same parquet tables. The driver hash-matches
Spark vs DuckDB at sf0.01 (CORRECTNESS_r{N}.json).

Determinism rules (FIXTURES.md §4) are enforced at registration sites:
- no rand()/current_timestamp() in checked queries;
- double aggregations go through ``dsum``/``davg`` (exact decimal
  accumulation, order-independent in both engines, then rounded);
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

_DEC = "decimal(38,6)"


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` => driver runs a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


# Deterministic rounding lives in functions.rounding (usable from both the
# functions/ layer and here without an import cycle); re-exported for the
# query modules.
from ..functions.rounding import dround, dround_sql  # noqa: E402  (re-export)


def dsum(col: Column, scale: int = 4) -> Column:
    """Order-independent SUM over doubles.

    Plain double SUM is association-order-dependent, so Spark and DuckDB can
    disagree in the last ulps. Accumulating in DECIMAL(38,6) is exact (and
    therefore order-independent) in both engines; the result is cast back to
    double and rounded via :func:`dround`.
    """
    return dround(F.sum(col.cast(_DEC)).cast("double"), scale)


def dsum_sql(expr: str, scale: int = 4) -> str:
    return dround_sql(f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)", scale)


def davg(col: Column, scale: int = 4) -> Column:
    """AVG via exact decimal sum / count — see ``dsum``."""
    return dround(
        F.sum(col.cast(_DEC)).cast("double") / F.count(F.lit(1)), scale
    )


def davg_sql(expr: str, scale: int = 4) -> str:
    return dround_sql(
        f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)", scale
    )
