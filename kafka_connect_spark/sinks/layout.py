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


def morton_code(x, y, bits: int = 16):
    """Interleave the low ``bits`` of two non-negative int columns into one
    Z-order (Morton) key, pure JVM bit arithmetic: bit i of x lands at
    position 2i, bit i of y at 2i+1. Columns must already be quantized to
    [0, 2^bits) ranks — use ``_rank_quantize`` for arbitrary domains."""
    x = x if isinstance(x, F.Column) else F.col(x)
    y = y if isinstance(y, F.Column) else F.col(y)
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(x.cast("long").bitwiseAND(F.lit(1 << i)), i)
        ).bitwiseOR(F.shiftleft(y.cast("long").bitwiseAND(F.lit(1 << i)), i + 1))
    return code


def _rank_quantize(df: DataFrame, col: str, bits: int, out: str) -> DataFrame:
    """Quantize an arbitrary numeric column to [0, 2^bits) cells by
    approx-quantile boundaries — equi-depth, so every Z-curve cell holds
    comparable row counts even on skewed domains. One percentile_approx
    agg (mergeable sketch, no global sort — an ntile window would move
    the whole table to one partition) broadcast back as a boundary array;
    the cell id is the count of boundaries <= value, an O(2^bits)
    JVM-side array filter per row."""
    n_cells = 1 << bits
    qs = [i / n_cells for i in range(1, n_cells)]
    bounds = df.agg(
        F.percentile_approx(col, qs, 10_000).alias(f"_bounds_{out}")
    )
    c = F.col(col)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            out, F.size(F.filter(F.col(f"_bounds_{out}"), lambda b: b <= c))
        )
        .drop(f"_bounds_{out}")
    )


def write_zorder(
    df: DataFrame, path: str, key_x: str, key_y: str, n_files: int, bits: int = 10
) -> None:
    """Write ``df`` Z-order-clustered on TWO keys: rank-quantize each key,
    interleave into a Morton code, range-partition + sort on the code.
    A single-key range sort gives perfect skipping on that key and none
    on the other; the Z-curve's locality gives usable file-level min/max
    on BOTH keys at once (each file covers a small rectangle of the 2-D
    space, up to curve jumps). This is the same layout discipline as
    Delta/Iceberg OPTIMIZE ZORDER BY, built from stock DataFrame ops."""
    q = _rank_quantize(_rank_quantize(df, key_x, bits, "_qx"), key_y, bits, "_qy")
    z = q.withColumn("_z", morton_code(F.col("_qx"), F.col("_qy"), bits))
    (
        z.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_qx", "_qy", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )
