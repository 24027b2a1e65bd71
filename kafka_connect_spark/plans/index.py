"""ann_index_write / ann_index_search — the similarity family's OUTPUT
stage: build the IVF inverted-file index ONCE (centroid codebook +
cell-partitioned posting lists + manifest, all parquet) and serve
top-k queries FROM THE ARTIFACT, reading only the probed cells.

x13c runs IVF end-to-end in one job (build + search fused); a serving
system builds once and answers many query batches. This module splits
that seam the way plans/curate.py and plans/pack.py split theirs:

- ``ann_index_write``: codebook via the shared, seed-deterministic
  ``simfns.kmeans_centroids`` (optionally Lloyd-refined over the whole
  corpus with ``kmeans_refine_distributed``), one assignment pass tags
  every vector's max-cosine cell, postings land as parquet
  PARTITIONED BY cell with the rerank inputs (unit-ready vector +
  norm) stored in the row — an index stores its vectors. The manifest
  records codebook, seed, and per-cell occupancy (dataset-card style).

- ``ann_index_search``: assigns each query its ``n_probe`` nearest
  cells, then reads the postings with a literal ``cell IN (...)``
  filter — STATIC PARTITION PRUNING, so the scan touches only the
  probed cell directories. At 100 TB this is the whole point of the
  artifact: a query batch probing 8 of 1024 cells reads <1% of the
  postings, and the pruning is visible in the plan (PartitionFilters,
  asserted in tests/test_ann_index.py). The exact-cosine rerank is the
  same dround(6) + neighbor_id tie-break contract as x13/x13c, so
  search-from-disk is pinned ROW-FOR-ROW equal to the in-memory
  ``ivf_cosine_topk`` under the same codebook.

The union of probed cells collects to the driver (bounded by
n_centroids — the codebook size, never the corpus) to make the pruning
filter a literal; the codebook itself is |cells| x dim rows, also
bounded."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .curate import MANIFEST_NAME

POSTINGS = "postings"
CENTROIDS = "centroids"


def _assign_udf(cents: np.ndarray, n_assign: int):
    """Max-cosine cell assignment (top ``n_assign`` cells) as an
    Arrow-batched pandas UDF; the codebook is closed over (pickled with
    the function — broadcast-once, same pattern as ivf_cosine_topk)."""

    @pandas_udf("array<long>")
    def assign(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        sims = mat @ cents.T / np.linalg.norm(mat, axis=1, keepdims=True)
        top = np.argsort(-sims, axis=1)[:, :n_assign]
        return pd.Series(list(top.astype(np.int64)))

    return assign


def _load_codebook(spark: SparkSession, index_dir: str) -> np.ndarray:
    rows = (
        spark.read.parquet(os.path.join(index_dir, CENTROIDS))
        .orderBy("cell")
        .collect()  # bounded: n_centroids rows
    )
    cents = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def ann_index_write(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_centroids: int = 16,
    seed: int = 42,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus: DataFrame | None = None,
) -> dict:
    """Build the IVF index artifact under ``out_dir``: the centroid
    codebook (``centroids/`` parquet), the cell-partitioned posting
    lists (``postings/`` parquet, partitioned by cell, each row carrying
    the double vector + its norm so search never revisits the source
    table), and ``_MANIFEST.json``. Returns the manifest dict."""
    from ..catalog import load_parallel
    from ..functions.simfns import (
        kmeans_centroids,
        kmeans_refine_distributed,
        with_vec,
    )

    if corpus is None:
        corpus = load_parallel(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(corpus, n_centroids, id_col, vec_col, seed)
    if refine_iters:
        cents = kmeans_refine_distributed(corpus, cents, vec_col, iters=refine_iters)
    cents = np.ascontiguousarray(cents, dtype=np.float64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    assign1 = _assign_udf(cents, 1)
    postings = (
        with_vec(corpus, vec_col)
        .withColumn("cell", F.element_at(assign1(F.col("v")), 1))
        .select(F.col(id_col).alias("vec_id"), "v", "v_norm", "cell")
    )
    postings.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(out_dir, POSTINGS)
    )
    spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cents)],
        "cell long, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, CENTROIDS))

    occupancy = [
        row.asDict()
        for row in spark.read.parquet(os.path.join(out_dir, POSTINGS))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("cell")
        .collect()  # bounded: n_centroids rows
    ]
    manifest = {
        "op": "ann_index_write",
        "kind": "ivf-cosine",
        "source_dir": sf_dir,
        "n_centroids": int(n_centroids),
        "seed": int(seed),
        "refine_iters": int(refine_iters),
        "dim": int(cents.shape[1]),
        "n_vectors": sum(r["n_vectors"] for r in occupancy),
        "cells": occupancy,
        "rerank": "exact cosine, dround 6, ties by neighbor_id (x13 contract)",
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def ann_index_append(
    spark: SparkSession,
    index_dir: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Grow the index under its FROZEN codebook: assign the new vectors
    to their max-cosine cells and APPEND them to the cell-partitioned
    postings (parquet append into existing cell directories — no
    rebuild, no read of the existing postings). The codebook stays
    fixed — exactly how a serving IVF index absorbs a crawl between
    retrains; if occupancy skew grows (watch x289), rebuild with more
    centroids or a refine pass. Search results after appends equal a
    fresh fused run over the full corpus under the same codebook
    (pinned in tests/test_ann_index.py)."""
    from ..functions.simfns import with_vec

    cents = _load_codebook(spark, index_dir)
    (
        with_vec(new_vectors, vec_col)
        .withColumn("cell", F.element_at(_assign_udf(cents, 1)(F.col("v")), 1))
        .select(F.col(id_col).alias("vec_id"), "v", "v_norm", "cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, POSTINGS))
    )


def ann_index_stream_writer(
    sdf: DataFrame,
    index_dir: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming index maintenance: each microbatch of new vectors
    appends to the postings via :func:`ann_index_append` (foreachBatch
    — the codebook is read once per (re)start, frozen within the run).
    Returns the unstarted writeStream builder. Call
    :func:`refresh_manifest` after (or periodically) to bring the
    occupancy table in the manifest up to date — appends do not rewrite
    it."""

    def write(df: DataFrame, _batch_id: int) -> None:
        ann_index_append(
            df.sparkSession, index_dir, df, id_col=id_col, vec_col=vec_col
        )

    return sdf.writeStream.foreachBatch(write).option(
        "checkpointLocation", checkpoint
    )


def refresh_manifest(spark: SparkSession, index_dir: str) -> dict:
    """Recompute the manifest's occupancy table from the postings on
    disk (after appends); codebook-derived fields are preserved."""
    with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    occupancy = [
        row.asDict()
        for row in spark.read.parquet(os.path.join(index_dir, POSTINGS))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("cell")
        .collect()  # bounded: n_centroids rows
    ]
    manifest["cells"] = occupancy
    manifest["n_vectors"] = sum(r["n_vectors"] for r in occupancy)
    with open(os.path.join(index_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def ann_index_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine search FROM the written index: tag each query with
    its ``n_probe`` nearest codebook cells, scan ONLY those cells'
    posting partitions (literal IN filter -> static partition pruning),
    exact-rerank with the stored vectors. Row-for-row equal to
    ``ivf_cosine_topk(corpus, queries, centroids=codebook)`` — pinned in
    tests/test_ann_index.py."""
    from ..functions.rounding import dround
    from ..functions.simfns import dot, with_vec

    cents = _load_codebook(spark, index_dir)
    q_tag = (
        with_vec(queries, vec_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            F.col("v_norm").alias("q_norm"),
            F.explode(_assign_udf(cents, n_probe)(F.col("v"))).alias("cell"),
        )
    )
    probed = sorted(
        r["cell"]
        for r in q_tag.select("cell").distinct().collect()  # <= n_centroids rows
    )
    postings = spark.read.parquet(os.path.join(index_dir, POSTINGS)).filter(
        F.col("cell").isin(probed)
    )
    cos = dround(
        dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")), 6
    )
    ranked = (
        postings.join(q_tag, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos_sim").desc(), F.col("neighbor_id")
                )
            )
            .cast("long"),
        )
    )
    return ranked.filter(F.col("rank") <= k).orderBy("query_id", "rank")
