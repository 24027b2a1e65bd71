"""Derived-partsupp invariants (x246-x248's shared input): the stride
construction must yield exactly 4 DISTINCT suppliers per part (the
q <= S/4 distinctness argument), valid key ranges, and value bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.queries.relational import derived_partsupp


def test_four_distinct_suppliers_per_part(spark, sf_dir):
    ps = derived_partsupp(spark, sf_dir)
    n_parts = load(spark, sf_dir, "part").count()
    assert ps.count() == 4 * n_parts
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == 4 * n_parts
    per = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("k")
    )
    assert per.filter(F.col("k") != 4).count() == 0


def test_key_and_value_ranges(spark, sf_dir):
    ps = derived_partsupp(spark, sf_dir)
    n_supp = load(spark, sf_dir, "supplier").count()
    bad = ps.filter(
        (F.col("ps_suppkey") < 0)
        | (F.col("ps_suppkey") >= n_supp)
        | (F.col("ps_availqty") < 1)
        | (F.col("ps_availqty") > 9999)
        | (F.col("ps_supplycost_cents") < 100)
        | (F.col("ps_supplycost_cents") > 99999)
    ).count()
    assert bad == 0
