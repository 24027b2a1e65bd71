"""pq_index_write / pq_index_search — the product-quantization index
artifact: train the PQ codebooks ONCE, encode the corpus to m small
codes per vector, and serve top-k queries from the CODE TABLE, reading
the full-precision vectors only for the tiny rerank subset.

The third serving artifact next to the IVF inverted file
(plans/index.py) and the packed corpus (plans/pack.py), completing the
x87 path's build/serve split the same way ann_index_write completed
x13c's. What the artifact buys at 100 TB: the codes table is ~64x
smaller than the float vectors (m=8 codes x 16 centroids = 8 x 4 bits
vs 64 float32 dims on the fixture shape), so the per-query ADC scan
reads 1/64th of the bytes a brute-force scan would — and the
full-precision vectors are read only by the rerank join over
k*oversample survivors per query. The manifest prices exactly that
(code bytes vs vector bytes, the compression ratio).

Sharing discipline (nothing can drift): codebooks via
``simfns._pq_codebooks`` (x87's trainer, seed-deterministic), encoding
via ``simfns.pq_encode_udf`` (the same UDF the fused path uses), and
search = ``simfns.pq_topk`` itself with the stored codebook + stored
codes injected (``books=``/``coded=``) — so search-from-artifact is
the fused x87 computation by construction, and the parity test
(tests/test_ann_index.py) pins it row-for-row."""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curate import MANIFEST_NAME

CODES = "codes"
VECTORS = "vectors"
CODEBOOKS = "codebooks"


def pq_index_write(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus: DataFrame | None = None,
) -> dict:
    """Build the PQ index artifact under ``out_dir``: ``codebooks/``
    (subspace, code, centroid), ``codes/`` (vec_id, codes — the ADC
    scan's whole input), ``vectors/`` (vec_id, embedding — rerank
    only), and ``_MANIFEST.json``. Returns the manifest dict."""
    from ..catalog import load_parallel
    from ..functions.simfns import _pq_codebooks, pq_encode_udf

    if corpus is None:
        corpus = load_parallel(spark, sf_dir, "embeddings")
    books = _pq_codebooks(corpus, id_col, vec_col, m, n_codes, seed)
    d = books.shape[2]

    encode = pq_encode_udf(books)
    corpus.select(
        F.col(id_col).alias("vec_id"),
        encode(F.col(vec_col).cast("array<double>")).alias("codes"),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, CODES))
    corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).write.mode("overwrite").parquet(os.path.join(out_dir, VECTORS))
    spark.createDataFrame(
        [
            (int(j), int(c), [float(x) for x in books[j, c]])
            for j in range(m)
            for c in range(n_codes)
        ],
        "subspace long, code long, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, CODEBOOKS)
    )

    n_vectors = spark.read.parquet(os.path.join(out_dir, CODES)).count()
    code_bits = max(1, (n_codes - 1).bit_length())
    code_bytes = n_vectors * m * code_bits // 8
    vector_bytes = n_vectors * (m * d) * 4  # float32 source shape
    manifest = {
        "op": "pq_index_write",
        "kind": "pq-adc",
        "source_dir": sf_dir,
        "m": int(m),
        "n_codes": int(n_codes),
        "code_bits": int(code_bits),
        "seed": int(seed),
        "dim": int(m * d),
        "n_vectors": int(n_vectors),
        "code_bytes": int(code_bytes),
        "vector_bytes": int(vector_bytes),
        "compression_x": vector_bytes // max(1, code_bytes),
        "rerank": "exact cosine, dround 6, ties by neighbor_id (x13 contract)",
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def load_pq_codebooks(spark: SparkSession, index_dir: str) -> np.ndarray:
    """The stored codebooks as the (m, n_codes, d) array pq_topk
    expects — bounded collect (m x n_codes rows)."""
    rows = (
        spark.read.parquet(os.path.join(index_dir, CODEBOOKS))
        .orderBy("subspace", "code")
        .collect()
    )
    m = 1 + max(r["subspace"] for r in rows)
    n_codes = 1 + max(r["code"] for r in rows)
    d = len(rows[0]["centroid"])
    books = np.empty((m, n_codes, d))
    for r in rows:
        books[r["subspace"], r["code"]] = np.asarray(
            r["centroid"], dtype=np.float64
        )
    return books


def pq_index_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    oversample: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine search FROM the written PQ index: the ADC scan runs
    over the stored ``codes/`` table (never re-encoding, never touching
    the vectors), and the exact rerank joins the ``vectors/`` table for
    the k*oversample survivors only. Literally ``simfns.pq_topk`` with
    the artifact's codebook and code table injected — row-for-row equal
    to the fused x87 path under the same codebook."""
    from ..functions.simfns import pq_topk

    books = load_pq_codebooks(spark, index_dir)
    coded = spark.read.parquet(os.path.join(index_dir, CODES)).select(
        F.col("vec_id").alias("neighbor_id"), "codes"
    )
    vectors = spark.read.parquet(os.path.join(index_dir, VECTORS))
    return pq_topk(
        vectors,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        oversample=oversample,
        books=books,
        coded=coded,
    )
