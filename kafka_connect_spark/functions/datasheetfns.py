"""Incremental corpus-datasheet maintenance.

x93 (queries/text.py) computes the per-source datasheet in one scan. A
continuously-fed corpus (the x37 incremental-dedup setting) should not
rescan 100 TB per crawl batch: every datasheet column except the
exact-duplicate counts is a decomposable aggregate (sum / count / min /
max fold associatively), and the distinct-content count folds too IF the
state carries the per-(source, content-hash) seen-set — which the
incremental-dedup pipeline already materializes as its fingerprint index
(16 bytes/doc, the x37 contract).

``datasheet_state(df)``      -> (source, h) distinct hash index + the
                                 decomposable per-source partials.
``fold_batch(state, batch)`` -> new state: partials add, the hash index
                                 unions (anti-join keeps it distinct).
``datasheet_from_state``     -> the x93-shaped report.

Tests (tests/test_datasheet.py) fold the fixture in chunks and assert
the folded report equals the one-shot x93 output frame-for-frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_rows(df: DataFrame) -> DataFrame:
    n_tokens = F.size(F.split("text", " ")).cast("long")
    return df.select(
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.md5("text").alias("h"),
    )


def datasheet_state(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Initial state from a corpus slice: (partials, hash_index)."""
    rows = _doc_rows(df)
    partials = rows.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )
    hash_index = rows.select("source", "h").distinct()
    return partials, hash_index


def fold_batch(
    state: tuple[DataFrame, DataFrame], batch: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Fold one crawl batch into the state. Cost tracks |batch| plus one
    key-only anti-join against the hash index — never a corpus rescan.
    All partial columns fold associatively (sum+sum, min(min), max(max));
    the index unions only genuinely-new hashes."""
    partials, hash_index = state
    b_partials, b_index = datasheet_state(batch)
    merged = (
        partials.unionByName(b_partials)
        .groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.min("min_tokens").alias("min_tokens"),
            F.max("max_tokens").alias("max_tokens"),
        )
    )
    new_hashes = b_index.join(hash_index, ["source", "h"], "left_anti")
    return merged, hash_index.unionByName(new_hashes)


def datasheet_from_state(state: tuple[DataFrame, DataFrame]) -> DataFrame:
    """Render the x93-shaped report from the folded state."""
    partials, hash_index = state
    uniq = hash_index.groupBy("source").agg(F.count(F.lit(1)).alias("n_unique"))
    return (
        partials.join(uniq, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_unique",
            (F.col("n_docs") - F.col("n_unique")).alias("n_exact_dups"),
            "min_tokens",
            "max_tokens",
            F.floor(F.col("n_tokens") * F.lit(1_000_000) / F.col("n_docs"))
            .cast("long")
            .alias("tokens_per_doc_ppm"),
        )
        .orderBy("source")
    )
