"""Skew- and shuffle-management utilities for 100 TB plans.

- ``salted_join``        hot-key equi-join: the skewed (big) side gets a
                         per-row salt, the other side is replicated across
                         all salts, and the join key becomes (key, salt) —
                         a hot key's rows spread over ``n_salts`` reducers
                         instead of one straggler. AQE's skew-join split
                         handles moderate skew automatically; salting is
                         for the pathological keys AQE can't split (e.g. a
                         single key bigger than an executor).
- ``write_bucketed`` /   co-located joins: two tables bucketed by the same
  ``bucketed_join_ready`` key and count join WITHOUT a shuffle (no Exchange
                         in the plan) — the right layout for repeated
                         fact-fact joins at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the ``skewed`` side.

    Deterministic: the salt is a hash of the skewed side's full row (not
    rand()), so replays produce identical partitioning. The ``other`` side
    is exploded n_salts times — keep it the smaller input."""
    salt = F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = left.join(right, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16
) -> None:
    """Persist as a bucketed table: co-partitioned AND co-sorted by key, so
    equi-joins between tables bucketed the same way skip the shuffle."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange (broadcast
    exchanges don't count) — test helper for asserting co-located joins."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
