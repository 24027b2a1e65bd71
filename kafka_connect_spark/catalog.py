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

    ``events.ts`` has drifted across fixture generations: early fixtures
    stored parquet TIMESTAMP(NANOS) — rejected by the vectorized reader, so
    the session sets ``spark.sql.legacy.parquet.nanosAsLong`` and the column
    surfaces as bigint — while current fixtures store plain timestamp[us].
    Branch on the OBSERVED dtype rather than assuming a generation; the
    nanos branch truncates to microseconds, the same truncation DuckDB
    applies, so oracle comparisons see identical instants either way."""
    if name == "events":
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) != "true":
            # Sessions not built by get_spark() (bare tests, driver harness)
            # still need the conf before the read or a legacy nanos fixture
            # fails at scan time.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_dtype = dict(df.dtypes)["ts"]
        if ts_dtype == "bigint":  # legacy nanos-as-long fixture
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if ts_dtype == "timestamp_ntz":
            # Fixture instants are UTC wall-clock; the session timezone is
            # UTC, so NTZ -> LTZ cast preserves the instant and both fixture
            # generations yield identical TIMESTAMP values.
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df  # already timestamp — pass through
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_parallel(
    spark: SparkSession, sf_dir: str, name: str, min_partitions: int | None = None
) -> DataFrame:
    """``load()`` plus guaranteed scan parallelism for CPU-heavy per-row
    operators (tokenize/shingle/hash/sort-per-document shapes).

    Parquet cannot split below row-group granularity, and the test fixtures
    are single-row-group files — so a heavy map stage would serialize on ONE
    task while 31 cores idle. The repartition here is CONDITIONAL: it fires
    only when the planned scan has fewer splits than the target, so at
    production scale (thousands of row groups / files) it is a no-op and no
    shuffle is added. The guarded shuffle it does add on tiny inputs moves
    less data than one row group by definition."""
    df = load(spark, sf_dir, name)
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
