"""SparkSession factory.

Defaults mirror the harness environment (local[32], 128 GiB) but every knob
is sized for the real target: a multi-executor cluster reading ~100 TB.
AQE handles runtime re-planning (skew joins, partition coalescing); shuffle
partition count is a starting point that AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kafka-connect-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # these matter more than any static setting.
        .config("spark.sql.adaptive.enabled", "true")
        # Heap: PySpark's default driver memory is 1g — far too small for a
        # local[32] JVM that is simultaneously driver and all executors
        # (scale probes at >= 4x sf0.1 OOM there). Must be set before the
        # JVM launches; no-op for an already-running session.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # Arrow for any pandas-UDF path (similarity / multimodal operators).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables (region/nation at any SF; customer at test SF)
        # should broadcast rather than shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # Legacy fixture generations stored events.ts as TIMESTAMP(NANOS),
        # which the vectorized reader rejects; with this conf those columns
        # surface as bigint and catalog.load() converts them. Current
        # fixtures (timestamp[us]) are unaffected by the conf.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
