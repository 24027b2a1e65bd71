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
from pyspark.sql.types import StructType

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

# Parquet schema memo (r15 optimization, guide §1/§6): a bare
# ``spark.read.parquet(path)`` infers the schema by submitting a one-task
# footer-read JOB on every call — measured ~0.27s each, and the bench's
# ~330 queries x 3 reps x 1-2 load() calls re-pay it every rep. The
# SCHEMA is metadata, identical for every read of the same fixture file,
# so it is memoized per (sf_dir, table [, nanos-conf for events]) and
# passed to ``spark.read.schema(...)`` — no inference job after the first
# read of a table. This caches no DATA and no results: every query still
# scans the parquet in full. ``events`` keys on the nanosAsLong conf too,
# since that conf changes how a legacy-nanos fixture's ``ts`` surfaces.
_SCHEMA_CACHE: dict[tuple[str, str, str], StructType] = {}


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    conf = ""
    if name == "events":
        conf = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "") or ""
    key = (sf_dir, name, conf)
    schema = _SCHEMA_CACHE.get(key)
    path = f"{sf_dir}/{name}.parquet"
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


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
        df = _read(spark, sf_dir, name)
        ts_dtype = dict(df.dtypes)["ts"]
        if ts_dtype == "bigint":  # legacy nanos-as-long fixture
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if ts_dtype == "timestamp_ntz":
            # Fixture instants are UTC wall-clock; the session timezone is
            # UTC, so NTZ -> LTZ cast preserves the instant and both fixture
            # generations yield identical TIMESTAMP values.
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df  # already timestamp — pass through
    return _read(spark, sf_dir, name)


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
    if _planned_scan_partitions(spark, f"{sf_dir}/{name}.parquet") < target:
        df = df.repartition(target)
    return df


def _planned_scan_partitions(spark: SparkSession, path: str) -> int:
    """The scan split count Spark will plan for ``path`` — computed from
    file sizes with FilePartition.maxSplitBytes' own formula instead of
    ``df.rdd.getNumPartitions()``, which forces full physical planning of
    a throwaway RDD pipeline (~0.15s per call; r15 measurement). Falls
    back to the RDD path for non-local URIs. Same guard semantics: at
    production scale (many files / row groups) the count exceeds any
    sane target and ``load_parallel`` adds no shuffle."""
    import math
    import os

    files: list[int] = []
    try:
        if os.path.isfile(path):
            files = [os.path.getsize(path)]
        elif os.path.isdir(path):
            files = [
                os.path.getsize(os.path.join(root, f))
                for root, _dirs, names in os.walk(path)
                for f in names
                if f.endswith(".parquet")
            ]
    except OSError:
        pass
    if not files:  # non-local / unreadable: keep the exact planner answer
        return spark.read.parquet(path).rdd.getNumPartitions()
    conf = spark.conf
    max_split = int(conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    open_cost = int(conf.get("spark.sql.files.openCostInBytes", "4194304"))
    min_parts = int(
        conf.get(
            "spark.sql.files.minPartitionNum",
            str(spark.sparkContext.defaultParallelism),
        )
    )
    total = sum(files) + open_cost * len(files)
    bytes_per_core = total / max(min_parts, 1)
    split = min(max_split, max(open_cost, int(bytes_per_core)))
    return sum(max(1, math.ceil(size / split)) for size in files)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
