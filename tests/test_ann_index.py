"""ann_index_write / ann_index_search (plans/index.py) — the IVF index
ARTIFACT, pinned to the in-memory x13c path:

- search-from-disk returns row-for-row the same top-k as
  ``ivf_cosine_topk`` under the same codebook;
- the posting scan carries a partition filter on cell (the serving
  win: only probed cell directories are read);
- the manifest reconciles with the corpus (cell occupancy sums to the
  corpus, codebook is unit-norm, rebuildable bit-identically from the
  recorded seed).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.functions.simfns import ivf_cosine_topk, kmeans_centroids
from kafka_connect_spark.plans.index import (
    _load_codebook,
    ann_index_search,
    ann_index_write,
)

K, N_PROBE, N_CENTROIDS, SEED = 3, 8, 16, 42


def _build(spark, sf_dir, tmp_path, **kw):
    out = str(tmp_path / "ivf-index")
    manifest = ann_index_write(
        spark, sf_dir, out, n_centroids=N_CENTROIDS, seed=SEED, **kw
    )
    return out, manifest


def test_search_from_artifact_equals_in_memory_ivf(spark, sf_dir, tmp_path):
    """The serving path (read codebook, prune to probed cells, rerank
    from stored vectors) must equal ivf_cosine_topk run fused over the
    source table with the SAME codebook."""
    out, _ = _build(spark, sf_dir, tmp_path)
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)

    got = (
        ann_index_search(spark, out, queries, k=K, n_probe=N_PROBE)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    cb = _load_codebook(spark, out)
    want = (
        ivf_cosine_topk(
            emb, queries, k=K, n_probe=N_PROBE, centroids=cb
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_postings_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The search's posting scan must read only the probed cells: the
    physical plan shows a partition filter on cell, and the pruned
    partition count is <= the number of probed cells (< the codebook)."""
    out, manifest = _build(spark, sf_dir, tmp_path)
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 2)

    plan = ann_index_search(
        spark, out, queries, k=K, n_probe=2
    )._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        ln for ln in plan.splitlines() if "postings" in ln and "Scan" in ln
    ]
    assert scan_lines, plan
    assert "cell" in " ".join(scan_lines)
    # the cell IN (...) predicate must reach the scan as a partition
    # filter, not a post-scan Filter
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0], plan


def test_manifest_reconciles_and_codebook_is_deterministic(
    spark, sf_dir, tmp_path
):
    out, manifest = _build(spark, sf_dir, tmp_path)
    emb = load(spark, sf_dir, "embeddings")
    assert manifest["n_vectors"] == emb.count()
    assert sum(c["n_vectors"] for c in manifest["cells"]) == manifest["n_vectors"]
    assert manifest["dim"] == 64
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        assert json.load(f) == manifest

    # codebook on disk is unit-norm and rebuildable from the manifest's
    # seed alone — the reproducibility a serving fleet needs
    cb = _load_codebook(spark, out)
    assert np.allclose(np.linalg.norm(cb, axis=1), 1.0)
    rebuilt = kmeans_centroids(emb, manifest["n_centroids"], seed=manifest["seed"])
    rebuilt = rebuilt / np.linalg.norm(rebuilt, axis=1, keepdims=True)
    assert np.allclose(cb, rebuilt)


def test_append_grows_index_to_full_corpus_parity(spark, sf_dir, tmp_path):
    """Streaming index growth: build on the first half of the corpus,
    append the second half (batch append + the foreachBatch stream
    writer over a replay), refresh the manifest — search over the grown
    index equals the fused in-memory run over the FULL corpus under the
    same (frozen) codebook, and the manifest occupancy reconciles."""
    from kafka_connect_spark.plans.index import (
        ann_index_append,
        ann_index_stream_writer,
        refresh_manifest,
    )
    from kafka_connect_spark.sources.replay import (
        file_replay_stream,
        write_replay_files,
    )

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    half1 = emb.filter(F.col("vec_id") < n // 2)
    half2 = emb.filter(
        (F.col("vec_id") >= n // 2) & (F.col("vec_id") < 3 * n // 4)
    )
    half3 = emb.filter(F.col("vec_id") >= 3 * n // 4)
    out = str(tmp_path / "growing-index")
    ann_index_write(
        spark, sf_dir, out, n_centroids=N_CENTROIDS, seed=SEED, corpus=half1
    )
    # batch append
    ann_index_append(spark, out, half2)
    # streaming append (replayed microbatches)
    rd = str(tmp_path / "vec-stream")
    write_replay_files(half3, rd, 4, "vec_id")
    q = (
        ann_index_stream_writer(
            file_replay_stream(spark, rd, spark.read.parquet(rd).schema),
            out,
            str(tmp_path / "idx-ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    manifest = refresh_manifest(spark, out)
    assert manifest["n_vectors"] == n

    queries = emb.filter(F.col("vec_id") < 10)
    cb = _load_codebook(spark, out)
    got = (
        ann_index_search(spark, out, queries, k=K, n_probe=N_PROBE)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    want = (
        ivf_cosine_topk(emb, queries, k=K, n_probe=N_PROBE, centroids=cb)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_refined_codebook_roundtrips(spark, sf_dir, tmp_path):
    """Lloyd-refined build (refine_iters=1): the artifact stores the
    refined codebook, and search against it still equals the in-memory
    path under that codebook."""
    out = str(tmp_path / "ivf-index-refined")
    ann_index_write(
        spark, sf_dir, out, n_centroids=N_CENTROIDS, seed=SEED, refine_iters=1
    )
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cb = _load_codebook(spark, out)
    got = (
        ann_index_search(spark, out, queries, k=K, n_probe=N_PROBE)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    want = (
        ivf_cosine_topk(emb, queries, k=K, n_probe=N_PROBE, centroids=cb)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pq_index_search_equals_fused_x87_path(spark, sf_dir, tmp_path):
    """The PQ artifact (plans/pq.py): search-from-disk (stored codebook
    + stored codes, ADC scan + rerank-join over vectors/) equals the
    fused pq_topk run under the same codebook, and the manifest's
    compression accounting reconciles."""
    import json as _json
    import os as _os

    from kafka_connect_spark.functions.simfns import pq_topk
    from kafka_connect_spark.plans.pq import (
        load_pq_codebooks,
        pq_index_search,
        pq_index_write,
    )

    out = str(tmp_path / "pq-index")
    manifest = pq_index_write(spark, sf_dir, out, m=8, n_codes=16, seed=SEED)
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)

    got = (
        pq_index_search(spark, out, queries, k=K, oversample=8)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    books = load_pq_codebooks(spark, out)
    want = (
        pq_topk(emb, queries, k=K, oversample=8, books=books)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0

    # the stored codebook IS the seed-deterministic trainer's output,
    # and search without an explicit codebook (the pre-artifact x87
    # call) also agrees — full backward parity
    legacy = (
        pq_topk(emb, queries, k=K, oversample=8)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, legacy, check_dtype=False)

    assert manifest["n_vectors"] == emb.count()
    assert manifest["compression_x"] >= 32  # 8 x 4-bit codes vs 64 f32 dims
    with open(_os.path.join(out, "_MANIFEST.json")) as f:
        assert _json.load(f) == manifest
