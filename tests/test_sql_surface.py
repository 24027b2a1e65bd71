"""Structural checks for the non-hashable SQL surface (SURVEY.md §2.4):
Q1 DDL, Q7 TRUNCATE analog, Q8 current_timestamp default, X5 approximate
count-distinct tolerance, and the Spark-side exposition parser."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.streaming.metrics import exposition_to_df, to_exposition


def test_q1_create_table_ddl(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS users_ddl")
    spark.sql(
        f"""
        CREATE TABLE users_ddl (
          id INT, name VARCHAR(255), updated_at TIMESTAMP, private_info STRING
        ) USING parquet LOCATION '{tmp_path}/users_ddl'
        """
    )
    try:
        fields = {f.name: f.dataType.simpleString() for f in spark.table("users_ddl").schema}
        assert fields == {
            "id": "int",
            "name": "string",
            "updated_at": "timestamp",
            "private_info": "string",
        }
    finally:
        spark.sql("DROP TABLE users_ddl")


def test_q7_truncate_as_overwrite(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(10).write.parquet(p)
    spark.range(0).write.mode("overwrite").parquet(p)  # TRUNCATE analog
    assert spark.read.parquet(p).count() == 0


def test_q8_current_timestamp_default(spark):
    """current_timestamp() is banned from checked queries (nondeterministic);
    structurally it must be a constant within a query (per-query timestamp,
    like a DEFAULT applied per INSERT batch)."""
    row = spark.range(100).select(F.current_timestamp().alias("ts")).distinct()
    assert row.count() == 1


def test_x5_approx_count_distinct_tolerance(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    approx = li.agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("a")).collect()[0]["a"]
    assert abs(approx - exact) / exact < 0.1


def test_percentile_matches_duckdb(spark, duck, sf_dir):
    """Exact percentile (interpolating): Spark percentile == DuckDB
    quantile_cont — kept as a test (not an oracle query) because the
    interpolation arithmetic is engine-internal and only approximately
    portable."""
    li = load(spark, sf_dir, "lineitem")
    s = li.agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m")).collect()[0]["m"]
    d = duck.sql("SELECT quantile_cont(l_extendedprice, 0.5) FROM lineitem").fetchone()[0]
    assert abs(s - d) < 1e-6


def test_exposition_parses_in_spark(spark):
    text = to_exposition(
        [
            {"name": "num_input_rows", "labels": {"query": "q1"}, "value": 100.0},
            {"name": "batch_duration_ms", "labels": {}, "value": 12.5},
        ]
    )
    rows = exposition_to_df(spark, text).collect()
    got = {(r["name"], r["value"]) for r in rows}
    assert got == {("num_input_rows", 100.0), ("batch_duration_ms", 12.5)}
    labeled = [r for r in rows if r["name"] == "num_input_rows"][0]
    assert 'query="q1"' in labeled["labels"]


def test_percentile_approx_tolerance(spark, sf_dir):
    """The 100 TB percentile path: percentile_approx (t-digest, mergeable
    map-side sketch) stays within a tight band of the exact per-group sort
    — the trade documented in x23_percentiles' docstring."""
    from kafka_connect_spark.catalog import load
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    both = (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("exact"),
            F.expr("percentile_approx(value, 0.5, 1000)").alias("approx"),
            F.expr("percentile(value, 0.97)").alias("lo99"),
            F.expr("percentile_approx(value, 0.99, 1000)").alias("approx99"),
            F.max("value").alias("mx"),
        )
        .collect()
    )
    assert both
    for r in both:
        # median: tight value band (dense region of the distribution)
        assert abs(r["approx"] - r["exact"]) <= 0.05 * (abs(r["exact"]) + 1.0)
        # tail: the sketch guarantees RANK accuracy, not value accuracy —
        # p99-approx must land within the [p97, max] rank window
        assert r["lo99"] <= r["approx99"] <= r["mx"]
