"""Scan-layout control: range-sorted writes for data skipping.

At 100 TB the cheapest query is the one that never reads the file: parquet
footers carry per-column min/max, and engines (Spark included) prune row
groups/files whose stats exclude the predicate. That only helps if the
layout CLUSTERS key ranges per file — a hash-partitioned write spreads
every key range across every file and makes the stats useless.

``write_range_sorted`` produces the skipping-friendly layout:
range-partition on the key (one total ordering across files, Spark samples
range bounds), sort within partitions (tight row-group stats), write.
``file_key_ranges`` / ``skipping_effectiveness`` read the evidence back
from the layout itself — per-file key min/max via the ``_metadata`` hidden
column, and the fraction of files a point/range predicate can skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_range_sorted(df: DataFrame, path: str, key: str, n_files: int) -> None:
    """Write ``df`` as ``n_files`` parquet files globally range-clustered
    on ``key``: file i holds a contiguous key range disjoint from file
    j's (up to range-bound sampling), and rows inside each file are
    sorted — so both file-level AND row-group-level min/max stats are
    tight. This is the write-side half of data skipping; the read side
    is free (every parquet reader already prunes on stats)."""
    (
        df.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_key_ranges(spark, path: str, key: str) -> DataFrame:
    """Per-file (min, max, rows) of ``key`` — the skipping stats, read
    through the scan itself (``_metadata.file_path``), so it works the
    same on a local dir or an object store."""
    df = spark.read.parquet(path)
    return (
        df.groupBy(F.col("_metadata.file_path").alias("file_path"))
        .agg(
            F.min(key).alias("key_min"),
            F.max(key).alias("key_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def skipping_effectiveness(spark, path: str, key, lo, hi=None) -> dict:
    """How many files a predicate ``key = lo`` (or BETWEEN lo AND hi)
    must read under this layout, by the file-level stats. Returns
    {n_files, n_needed, skip_ratio} — skip_ratio ~ (n-1)/n on a
    range-sorted layout vs ~0 on a hash layout."""
    hi = lo if hi is None else hi
    ranges = file_key_ranges(spark, path, key).collect()  # one row per file
    needed = sum(1 for r in ranges if r["key_min"] <= hi and r["key_max"] >= lo)
    n = len(ranges)
    return {
        "n_files": n,
        "n_needed": needed,
        "skip_ratio": round(1 - needed / n, 4) if n else 0.0,
    }
