"""Fixture-table catalog.

The driver materializes deterministic parquet tables under
``/root/testdata/sf{0.001,0.01,0.1}/`` (TESTDATA.md). Every query in
``kafka_connect_spark.queries`` loads through here so the scan path is
uniform: parquet source => columnar vectorized read, with Catalyst pushing
filters and pruning columns into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Parquet => predicate pushdown + column pruning
    reach the scan for free (verify with .explain: PushedFilters/ReadSchema).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright; read it as long (legacy conf) and truncate to
    microseconds — the same truncation DuckDB applies, so oracle comparisons
    see identical instants."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
