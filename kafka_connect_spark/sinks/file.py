"""K1 — FileStreamSink analog (reference README.md:37-39,
FileStreamSinkConnector.class: FILE_CONFIG + flush on offset commit).

Batch: ``df.write``; streaming: ``writeStream`` with a checkpoint — the
checkpoint IS the offset-commit/flush contract (exactly-once for file
sinks: output files are recorded per epoch and readers see only committed
epochs via the sink metadata log)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def file_sink(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "append") -> None:
    df.write.format(fmt).mode(mode).save(path)


def streaming_file_sink(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    trigger_available_now: bool = True,
):
    """Returns the started StreamingQuery."""
    w = (
        sdf.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def file_stats(spark, path: str) -> "DataFrame":
    """Per-file size report for a parquet dataset via the ``_metadata``
    hidden column (no filesystem listing from the driver — the scan tasks
    observe their own files, so this works identically on object stores).
    One row per data file: (file_path, file_size, n_rows)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    return (
        df.select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_size"),
        )
        .groupBy("file_path", "file_size")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def small_file_report(spark, path: str, small_bytes: int = 8 * 1024 * 1024) -> dict:
    """Dataset-level small-file audit: total files/bytes/rows and how many
    files fall under ``small_bytes`` — the trigger metric for compaction
    (a 100 TB table that ingests streaming microbatches accretes
    thousands of KB-scale files; scan cost is per-file, so read
    amplification grows with file count, not data size)."""
    from pyspark.sql import functions as F

    row = (
        file_stats(spark, path)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("file_size").alias("total_bytes"),
            F.sum("n_rows").alias("n_rows"),
            F.sum((F.col("file_size") < small_bytes).cast("long")).alias("n_small"),
        )
        .collect()[0]  # bounded: one summary row
    )
    return {k: int(row[k]) for k in ("n_files", "total_bytes", "n_rows", "n_small")}


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> dict:
    """Small-file compaction with an atomic directory swap.

    Rewrites the dataset into ceil(total_bytes / target_file_bytes) files
    (for partitioned layouts: one writer task per partition value, so each
    partition directory collapses to a single file), staging into a
    sibling temp dir and swapping via rename — readers never observe a
    half-compacted table, and a crash leaves either the old or the new
    directory intact. Returns before/after file counts.

    At scale this is the standard maintenance job between a streaming
    ingest (many epoch-sized files) and interactive scans; the rewrite is
    one shuffle-free coalesce when shrinking file count, and the swap cost
    is metadata-only."""
    import math
    import os
    import shutil

    before = small_file_report(spark, path)
    n_target = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compact.tmp"
    bak = path.rstrip("/") + ".compact.bak"
    shutil.rmtree(tmp, ignore_errors=True)
    if partition_by:
        # hash-cluster on the partition columns: every partition value's rows
        # land in one task => exactly one file per partition directory
        w = df.repartition(*partition_by).write.partitionBy(*partition_by)
    else:
        w = df.coalesce(n_target).write
    w.mode("overwrite").parquet(tmp)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    after = small_file_report(spark, path)
    assert after["n_rows"] == before["n_rows"], "compaction must not change rows"
    return {"before": before, "after": after, "target_files": n_target}
