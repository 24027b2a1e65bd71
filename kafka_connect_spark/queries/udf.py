"""X15 — user-defined function surface (SURVEY.md §2.6): row-at-a-time
Python UDF, Arrow-vectorized pandas UDF (scalar + grouped agg), and
applyInPandas (grouped map). Each is hash-checked against a pure-SQL
equivalent of the same function.

Performance ordering (SURVEY.md 'UDFs are the slow path'): built-in JVM
expression > pandas UDF (Arrow batches, ~10-100x over row-at-a-time) >
Python UDF (per-row pickling). The row-at-a-time variant exists for API
parity; hot paths use the built-ins (see functions/)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf

from ..catalog import load
from .registry import dround_sql, query


@query(
    "x15_pandas_udf_scalar",
    oracle=f"""
    SELECT event_id, {dround_sql("ln(1 + abs(value))", 6)} AS log_value
    FROM events ORDER BY event_id
    """,
)
def x15_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batch in, numpy out)."""
    import numpy as np

    @pandas_udf("double")
    def log1p_abs(v: pd.Series) -> pd.Series:
        from ..functions.rounding import npround

        return pd.Series(npround(np.log1p(np.abs(v.to_numpy())), 6))

    events = load(spark, sf_dir, "events")
    return events.select("event_id", log1p_abs("value").alias("log_value")).orderBy(
        "event_id"
    )


@query(
    "x15b_python_udf",
    oracle="""
    SELECT c_custkey, c_name || ':' || CAST(length(c_name) AS VARCHAR) AS tagged
    FROM customer ORDER BY c_custkey
    """,
)
def x15b_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the slow path, kept off hot paths."""

    @udf(T.StringType())
    def tag(name: str) -> str:
        return f"{name}:{len(name)}"

    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", tag("c_name").alias("tagged")).orderBy("c_custkey")


@query(
    "x15c_pandas_udf_grouped_agg",
    oracle=f"""
    SELECT event_type, {dround_sql("avg(value)", 4)} AS mean_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def x15c_pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF surface)."""

    @pandas_udf("double")
    def mean4(v: pd.Series) -> float:
        import math

        # deterministic floor-idiom round (see functions.rounding): Python's
        # round() is half-EVEN and diverges from the SQL twin on boundaries
        return math.floor(float(v.mean()) * 1e4 + 0.5) / 1e4

    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(mean4("value").alias("mean_value"))
        .orderBy("event_type")
    )


@query(
    "x15d_apply_in_pandas",
    oracle=f"""
    SELECT event_id, event_type,
           {dround_sql("value - avg(value) OVER (PARTITION BY event_type)", 4)} AS centered
    FROM events ORDER BY event_id
    """,
)
def x15d_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map (UDTF-ish surface): per-group mean-centering.
    Each group arrives as one pandas frame — the custom-stateful-operator
    escape hatch when built-ins can't express the semantics."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["event_id", "event_type"]].copy()
        from ..functions.rounding import npround

        out["centered"] = npround((pdf["value"] - pdf["value"].mean()).to_numpy(), 4)
        return out

    events = load(spark, sf_dir, "events")
    return (
        events.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(center, "event_id long, event_type string, centered double")
        .orderBy("event_id")
    )
