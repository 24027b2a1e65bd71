"""Similarity search over embedding columns (SURVEY.md §2.6 X13).

- ``cosine_topk``      exact brute force: broadcast the query set, nested-loop
                       join, JVM-side fold for the dot product, per-query top-k.
                       The right baseline whenever |queries| is small: cost is
                       |queries| x |corpus| with zero shuffle of the corpus.
- ``lsh_cosine_topk``  random-hyperplane LSH: bucket signatures via an
                       Arrow-batched pandas UDF (numpy matmul), equi-join on
                       (table, bucket), exact rerank of candidates only.
                       The 100 TB path: the corpus is scanned once to tag
                       buckets (embarrassingly parallel), and the join touches
                       only same-bucket pairs.

Exact-arithmetic discipline: dot products fold left-to-right over
double-cast arrays, matching the DuckDB oracle's list_dot_product; the
cosine is rounded to 6 decimals BEFORE ranking in both engines (via the
deterministic floor idiom in functions.rounding, identical in Spark, DuckDB
and numpy) so ranking never depends on sub-ulp differences."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .rounding import dround, npround


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of elementwise products (JVM-side, codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_vec(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Cast to array<double> and precompute the L2 norm once per vector."""
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn("v", v).withColumn("v_norm", F.sqrt(dot(F.col("v"), F.col("v"))))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Output: query_id, neighbor_id, cos_sim (rounded 6), rank (1-based).
    Ties after rounding break by neighbor_id ascending."""
    c = with_vec(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "v", "v_norm"
    )
    q = with_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")
    )
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    cos = dround(dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")), 6)
    ranked = pairs.select("query_id", "neighbor_id", cos.alias("cos_sim")).withColumn(
        "rank",
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(
                F.col("cos_sim").desc(), F.col("neighbor_id")
            )
        )
        .cast("long"),
    )
    return ranked.filter(F.col("rank") <= k).orderBy("query_id", "rank")


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos_sim >=
    threshold). Exact all-pairs — correct at any size, quadratic cost; the
    scale path swaps the pair generator for the LSH bucket join
    (``lsh_cosine_topk``'s candidate stage) and keeps this exact cosine as
    the verify step."""
    v = with_vec(df, vec_col)
    a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("v_norm").alias("na"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("v_norm").alias("nb"))
    cos = dround(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_pairs_blocked(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 16,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via block-matrix multiplication.

    Same output as ``cosine_pairs`` but vectorized: rows are hashed into
    ``n_blocks`` blocks; every unordered block pair (i<=j) becomes one
    applyInPandas group holding both blocks' vectors, and the group computes
    its full cosine sub-matrix with a single numpy float64 matmul. Each row
    is replicated n_blocks times to reach its pairs, so Arrow transfer is
    n_blocks x |corpus| vectors while compute stays O(n^2 / n_blocks^2) per
    task — pick n_blocks so a block pair fits executor memory. This is the
    all-pairs plan that survives scale; the O(n^2) JVM fold does not."""
    import numpy as np

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
    )
    # replicate each row to every block pair it participates in
    other = F.sequence(F.lit(0), F.lit(n_blocks - 1))
    replicated = base.select(
        "id",
        "v",
        "blk",
        F.explode(other).alias("ob"),
    ).select(
        "id",
        "v",
        "blk",
        F.least("blk", "ob").alias("bi"),
        F.greatest("blk", "ob").alias("bj"),
    ).dropDuplicates(["id", "bi", "bj"])

    empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})

    def block_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        a = pdf[pdf["blk"] == bi]
        if a.empty or (bi != bj and pdf[pdf["blk"] == bj].empty):
            return empty
        ids_a = a["id"].to_numpy()
        mat_a = np.stack(a["v"].to_numpy()).astype(np.float64)
        mat_a /= np.linalg.norm(mat_a, axis=1, keepdims=True)
        if bi == bj:
            sims = mat_a @ mat_a.T
            iu, ju = np.triu_indices(len(ids_a), k=1)
            id_a, id_b = ids_a[iu], ids_a[ju]
            cos = sims[iu, ju]
        else:
            b = pdf[pdf["blk"] == bj]
            ids_b = b["id"].to_numpy()
            mat_b = np.stack(b["v"].to_numpy()).astype(np.float64)
            mat_b /= np.linalg.norm(mat_b, axis=1, keepdims=True)
            sims = mat_a @ mat_b.T
            ii, jj = np.meshgrid(np.arange(len(ids_a)), np.arange(len(ids_b)), indexing="ij")
            id_a, id_b = ids_a[ii.ravel()], ids_b[jj.ravel()]
            cos = sims.ravel()
        cos = npround(cos, 6)
        keep = cos >= threshold
        lo = np.minimum(id_a[keep], id_b[keep])
        hi = np.maximum(id_a[keep], id_b[keep])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_sim": cos[keep]})

    return replicated.groupBy("bi", "bj").applyInPandas(
        block_pair, "id_a long, id_b long, cos_sim double"
    )


def seq_dot_block(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """All-pairs dot products with EXACTLY the left-to-right fold order of
    :func:`dot` (``F.aggregate``) and DuckDB's ``list_dot_product``: one
    vectorized multiply-add per dimension, so every (i, j) cell evaluates
    ``((0 + a0*b0) + a1*b1) + ...`` with the same IEEE-754 rounding at each
    step as the scalar folds. float32-sourced doubles make each product
    exact (24-bit x 24-bit significands fit in 53), so results are
    BIT-IDENTICAL to the JVM/DuckDB kernels — verified over all 124,750
    sf0.01 pairs — while running at numpy speed. (BLAS ``A @ B.T`` reorders
    the summation and is NOT bit-stable across engines; use this kernel
    wherever the cosine feeds a hash-checked rank or bucket.)"""
    acc = np.zeros((a.shape[0], b.shape[0]))
    for i in range(a.shape[1]):
        acc += a[:, i, None] * b[None, :, i]
    return acc


def seq_self_dot(a: np.ndarray) -> np.ndarray:
    """Per-row self dot product with the same sequential fold order as
    :func:`seq_dot_block` — the numpy twin of ``with_vec``'s norm."""
    acc = np.zeros(a.shape[0])
    for i in range(a.shape[1]):
        acc += a[:, i] * a[:, i]
    return acc


def _replicate_block_pairs(
    df: DataFrame, id_col: str, vec_col: str, n_blocks: int, extra_cols: list[str]
) -> DataFrame:
    """Hash rows into ``n_blocks`` blocks and replicate each row to every
    unordered block pair (bi <= bj) it participates in — the distributed
    all-pairs layout shared by the blocked cosine kernels: each
    applyInPandas group then holds two complete blocks and computes its
    sub-matrix locally, Arrow transfer is n_blocks x |corpus| vectors,
    compute is O(n^2 / n_blocks^2) per task, and no driver collect ever
    happens."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
        *extra_cols,
    )
    other = F.sequence(F.lit(0), F.lit(n_blocks - 1))
    return (
        base.select("*", F.explode(other).alias("ob"))
        .select(
            "id",
            "v",
            "blk",
            *extra_cols,
            F.least("blk", "ob").alias("bi"),
            F.greatest("blk", "ob").alias("bj"),
        )
        .dropDuplicates(["id", "bi", "bj"])
    )


def _auto_blocks(df: DataFrame, n_blocks: int | None) -> int:
    """Pick the block count from corpus size when unspecified: at least 8
    blocks (36 unordered pairs — keeps every core busy), growing as
    ~n/1500 so a block-pair submatrix stays ~1500x1500 regardless of
    corpus size (the round-6 auto-depth-LSH lesson: any FIXED partition
    parameter turns into a serial bottleneck at some multiple). Capped at
    64 since replication — and therefore Arrow transfer — is n_blocks x
    corpus bytes. The count() probe is one narrow column scan."""
    if n_blocks is not None:
        return n_blocks
    n = df.count()
    return max(8, min(64, -(-n // 1500)))


def cosine_bucket_histogram(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    bucket_scale: int = 10,
) -> DataFrame:
    """Exact all-pairs cosine bucket histogram — ``floor(c * scale)`` over
    every unordered pair (id_a < id_b), c shared-rounded to 6 decimals —
    computed as per-block-pair partial histograms over the sequential-fold
    kernel, then one tiny global sum. The histogram (21 rows) is the only
    thing shuffled; the n^2 pair set never materializes as rows anywhere.
    Bit-identical to the JVM fold + DuckDB list_dot_product plan it
    replaces (see :func:`seq_dot_block`)."""
    n_blocks = _auto_blocks(df, n_blocks)
    replicated = _replicate_block_pairs(df, id_col, vec_col, n_blocks, [])
    empty = pd.DataFrame({"cos_bucket": pd.Series([], dtype="int64"),
                          "n_pairs": pd.Series([], dtype="int64")})

    def block_hist(pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        a = pdf[pdf["blk"] == bi].sort_values("id")
        if a.empty:
            return empty
        ma = np.stack(a["v"].to_numpy()).astype("float64")
        na = np.sqrt(seq_self_dot(ma))
        if bi == bj:
            c = seq_dot_block(ma, ma) / (na[:, None] * na[None, :])
            iu, ju = np.triu_indices(len(a), k=1)
            cos = c[iu, ju]
        else:
            b = pdf[pdf["blk"] == bj].sort_values("id")
            if b.empty:
                return empty
            mb = np.stack(b["v"].to_numpy()).astype("float64")
            nb = np.sqrt(seq_self_dot(mb))
            cos = (seq_dot_block(ma, mb) / (na[:, None] * nb[None, :])).ravel()
        buckets = np.floor(npround(cos, 6) * bucket_scale).astype("int64")
        vals, counts = np.unique(buckets, return_counts=True)
        return pd.DataFrame({"cos_bucket": vals, "n_pairs": counts.astype("int64")})

    partials = replicated.groupBy("bi", "bj").applyInPandas(
        block_hist, "cos_bucket long, n_pairs long"
    )
    return (
        partials.groupBy("cos_bucket")
        .agg(F.sum("n_pairs").alias("n_pairs"))
        .orderBy("cos_bucket")
    )


def knn_candidates_blocked(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Per-vector exact k-nearest-cosine-neighbor candidates via the
    block-pair layout: each group emits every member row's LOCAL top-k
    against the opposite block (self-pairs excluded), and the global top-k
    is a second, tiny rank over <= k * n_blocks candidates per vector —
    the classic distributed brute-force kNN merge. Cosines ride the
    bit-exact sequential-fold kernel; local top-k uses the same
    (c desc, neighbor_id asc) order as the global rank, so the global
    winner set is exactly the all-pairs answer. Output columns: qid, nid,
    c (+ ``<col>_q``/``<col>_n`` for each requested extra column, each
    keeping its source Spark type)."""
    extra = list(extra_cols or [])
    n_blocks = _auto_blocks(df, n_blocks)
    replicated = _replicate_block_pairs(df, id_col, vec_col, n_blocks, extra)
    out_cols = (
        ["qid", "nid", "c"]
        + [f"{c}_q" for c in extra]
        + [f"{c}_n" for c in extra]
    )
    extra_types = {c: df.schema[c].dataType.simpleString() for c in extra}
    schema = ", ".join(
        ["qid long", "nid long", "c double"]
        + [f"{c}_q {extra_types[c]}" for c in extra]
        + [f"{c}_n {extra_types[c]}" for c in extra]
    )
    empty = pd.DataFrame({c: [] for c in out_cols})

    def one_side(qpdf, npdf, sims):
        # local top-k per row of sims: ties by neighbor id ascending —
        # columns are pre-sorted by id, stable argsort preserves that.
        cr = npround(sims, 6)
        kk = min(k, cr.shape[1])
        order = np.argsort(-cr, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(cr.shape[0]), kk)
        cols = order.ravel()
        keep = np.isfinite(cr[rows, cols])  # drop -inf self-pair sentinels
        rows, cols = rows[keep], cols[keep]
        out = {
            "qid": qpdf["id"].to_numpy()[rows].astype("int64"),
            "nid": npdf["id"].to_numpy()[cols].astype("int64"),
            "c": cr[rows, cols],
        }
        for c in qpdf.columns.intersection(extra):
            # keep the source dtype — Arrow coerces to the declared Spark
            # type per-column, so strings/doubles survive unmolested
            out[f"{c}_q"] = qpdf[c].to_numpy()[rows]
            out[f"{c}_n"] = npdf[c].to_numpy()[cols]
        return pd.DataFrame(out)

    def block_knn(pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        a = pdf[pdf["blk"] == bi].sort_values("id")
        if a.empty:
            return empty
        ma = np.stack(a["v"].to_numpy()).astype("float64")
        na = np.sqrt(seq_self_dot(ma))
        if bi == bj:
            if len(a) < 2:
                return empty
            sims = seq_dot_block(ma, ma) / (na[:, None] * na[None, :])
            np.fill_diagonal(sims, -np.inf)  # exclude self-pairs
            return one_side(a, a, sims)
        b = pdf[pdf["blk"] == bj].sort_values("id")
        if b.empty:
            return empty
        mb = np.stack(b["v"].to_numpy()).astype("float64")
        nb = np.sqrt(seq_self_dot(mb))
        sims = seq_dot_block(ma, mb) / (na[:, None] * nb[None, :])
        return pd.concat(
            [one_side(a, b, sims), one_side(b, a, sims.T)], ignore_index=True
        )

    return replicated.groupBy("bi", "bj").applyInPandas(block_knn, schema)


def lsh_cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int = 12,
    seed: int = 42,
    target_bucket: int = 256,
    center: bool = False,
    abtt: bool = False,
) -> DataFrame:
    """Embedding near-dup pairs AT SCALE: hyperplane-LSH bucket candidates,
    exact cosine verify. Same output contract as ``cosine_pairs`` /
    ``cosine_pairs_blocked`` (id_a < id_b, cos_sim >= threshold) but the
    join touches only same-bucket pairs instead of all |corpus|² — this is
    the declared pair generator at 100 TB, with the exact all-pairs kept
    as the verify stage / ground truth. The verify step recomputes exact
    cosine, so precision is 1.0 by construction; recall vs the exact pairs
    is asserted in tests/test_similarity.py.

    ``n_planes`` defaults to AUTO: ceil(log2(n / target_bucket)), floored
    at 4 — bucket depth must grow with the corpus or the operator stops
    being sub-quadratic. With a FIXED plane count, expected bucket size is
    n/2^p, so within-bucket candidate pairs grow ~n²/2^p: the scale probe
    measured alpha = 1.35 (94s at 16 x sf0.1) for fixed p=4, vs ~linear
    with bucket size pinned at ``target_bucket``. Auto costs one count()
    job; at the fixture SFs it resolves to p=4, identical to the old
    default (x12g outputs and recall tests unchanged)."""
    if n_planes is None:
        n = df.count()  # one cheap job; the alternative is a quadratic join
        n_planes = max(4, math.ceil(math.log2(max(n, 1) / target_bucket))) if n > target_bucket else 4
    # centering composes LAZILY in-plan (broadcast 1-row mean, zip_with
    # subtract — r14 ADVICE: no build-time job, no per-call recompute);
    # abtt=True additionally subtracts the PC1 projection in the UDF,
    # which DOES run two bounded build-time jobs (|dim|-row mean + the
    # 2080-row Gram — see pc1_vector_np; documented like the auto-
    # n_planes count job above).
    mean_row = mean_vector_col(df, vec_col) if (center or abtt) else None
    # presplit=True: every registered abtt consumer loads the corpus via
    # catalog.load_parallel, so the Gram builder's rdd-planning probe
    # (r15 finding: full physical planning per call) is skipped.
    u = pc1_vector_np(df, vec_col, presplit=True) if abtt else None
    planes = np.random.RandomState(seed).randn(n_tables, n_planes, dim)
    bucketize = _bucket_udf(planes, u=u)
    tagged = (
        _centered_hv(df, vec_col, mean_row)
        .withColumn("_bk", bucketize(F.col("_hv")))
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.transform(
                    F.col("_bk"),
                    lambda b, i: F.struct(i.alias("table"), b.alias("bucket")),
                )
            ).alias("tb"),
        )
        .select("id", "tb.table", "tb.bucket")
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    # r16 (guide §2.4/§2.5): the candidate dedup used .distinct(), whose
    # exchange AQE coalesced by BYTES (pair rows are 16 bytes; the 1 MB
    # minPartitionSize floor left the CPU-dense dedup+verify stages on 10
    # of 32 cores — measured in the x284 job timeline). Repartitioning by
    # id_a pins the session's declared shuffle width (user-specified
    # repartitions are exempt from AQE coalescing), and BOTH the pair
    # dedup and the downstream id_a vector join cluster by a superset/
    # subset of that key, so they reuse the single exchange instead of
    # adding their own. Output set identical (dedup keys unchanged);
    # measured 1.60x on the x284 shape at sf0.1.
    n_shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cands = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .repartition(n_shuffle, "id_a")
        .dropDuplicates(["id_a", "id_b"])
    )
    v = with_vec(df, vec_col)
    va = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("v_norm").alias("na"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("v_norm").alias("nb"))
    cos = dround(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def _bucket_udf(
    planes: np.ndarray,
    mean: np.ndarray | None = None,
    u: np.ndarray | None = None,
):
    """planes: (n_tables, n_planes, dim). Returns a pandas UDF mapping an
    embedding to an array of per-table bucket ids (sign-bit packing).
    With ``mean`` set, hyperplane signs are taken on the CENTERED vector
    (x - mean) — the all-but-the-top fix x275 justifies: sign(w.(x-m)) =
    sign(w.x - w.m), so centering only rebiases each plane; candidates
    still verify/rerank on the RAW cosine, keeping output contracts.
    (The production LSH builders now center LAZILY in-plan and call this
    with mean=None; the parameter stays for direct consumers like the
    candidate-mass probes.) With ``u`` set (x286's PC1 of the centered
    corpus), the FULL All-but-the-Top preprocessing applies before the
    signs: subtract the PC1 projection c*u, c = <x', u>/<u, u> rounded
    to 6 decimals (the same resolution x286's audit rounds its
    projection coefficient to; exact tie-rounding mode is irrelevant
    here — c only biases a hash choice, and candidates still rerank on
    the RAW cosine)."""
    n_tables, n_planes, _ = planes.shape
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    u_dot = float(u @ u) if u is not None else 0.0

    @pandas_udf("array<long>")
    def bucketize(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())  # (batch, dim)
        if mean is not None:
            mat = mat - mean
        if u is not None and u_dot > 0.0:
            c = np.round(mat @ u / u_dot, 6)
            mat = mat - np.outer(c, u)
        signs = np.einsum("bd,tpd->btp", mat, planes) > 0  # (batch, tables, planes)
        buckets = signs @ weights  # (batch, tables)
        return pd.Series(list(buckets.astype(np.int64)))

    return bucketize


def mean_vector_np(df: DataFrame, vec_col: str = "embedding") -> np.ndarray:
    """The davg-exact per-dimension mean vector (x275's builder, shared
    so the audit and the fix can never disagree): ONE posexplode scan +
    hash agg over the dim value domain, decimal(38,6) accumulation then
    dround(6), so every consumer holds the identical doubles regardless
    of partitioning. Bounded collect: |dim| rows (64 here)."""
    dims = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x")
    )
    m = (
        dims.groupBy("i")
        .agg(
            dround(
                F.sum(F.col("x").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mx")
        )
        .orderBy("i")
        .collect()
    )
    return np.array([r["mx"] for r in m], dtype=np.float64)


def mean_vector_col(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """``mean_vector_np``'s plan WITHOUT the driver collect: a LAZY 1-row
    DataFrame holding the davg-exact mean as an array<double> column
    ``mv`` — the in-plan form the LSH builders broadcast into their
    bucketize stage, so constructing a center=True query runs no job
    (r14 ADVICE: the build-time collect made x283/x284/x274b's builders
    side-effecting and recomputed the mean per call). Same decimal
    accumulation + dround(6), so consumers hold the identical doubles."""
    dims = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x")
    )
    m = dims.groupBy("i").agg(
        dround(
            F.sum(F.col("x").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mx")
    )
    return m.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list(named_struct('i', i,"
            " 'mx', mx))), s -> s.mx)"
        ).alias("mv")
    )


def _centered_hv(
    df: DataFrame, vec_col: str, mean_row: DataFrame | None
) -> DataFrame:
    """Attach ``_hv`` — the vector the LSH hyperplanes hash: the raw
    array<double> cast, or (mean_row given) the LAZILY mean-centered
    vector via a broadcast 1-row cross join + zip_with subtraction.
    float64 x - m is the identical arithmetic the old UDF-side closure
    ran, so bucket ids (and therefore every candidate set and output)
    are unchanged; only WHEN the mean is computed moves — into the
    query's own plan."""
    v = F.col(vec_col).cast("array<double>")
    if mean_row is None:
        return df.withColumn("_hv", v)
    return (
        df.crossJoin(F.broadcast(mean_row))
        .withColumn("_hv", F.zip_with(v, F.col("mv"), lambda x, y: x - y))
        .drop("mv")
    )


def gram_ppm_rows(
    df: DataFrame,
    vec_col: str = "embedding",
    mean: np.ndarray | None = None,
    dim: int = 64,
    presplit: bool = False,
) -> DataFrame:
    """The decimal-quantized upper-triangle Gram of the MEAN-CENTERED
    corpus as a LAZY (i, j, g) DataFrame — x286's Gram kernel, shared by
    the audit and the abtt bucketing so they can never disagree.

    r15 note (guide §1.1, "the ideal plan is usually slower at first"):
    a codegen'd posexplode self-join form was A/B'd against this in-row
    upper-triangle lambda fan-out on identical inputs — the join form's
    two exchanges + sort cost MORE than the interpreted lambda saves
    (1.7s vs 1.4s at sf0.1 on 32 splits; outputs asserted bit-equal), so
    the one-stage fan-out stays. What DOES matter is parallelism: on a
    single-split scan the fan-out serializes (~8s at sf0.1), so a
    guarded repartition spreads it when the input plans fewer splits
    than cores — a no-op at production split counts. Decimal sums are
    order-independent, so partitioning never changes g."""
    mean = mean_vector_np(df, vec_col) if mean is None else mean
    # r16: ``presplit=True`` lets a caller that ALREADY guaranteed scan
    # parallelism (catalog.load_parallel) skip the guard probe —
    # df.rdd.getNumPartitions() forces full physical planning of a
    # throwaway RDD pipeline per build (the r15 catalog finding, ~0.15s),
    # and every registered consumer (x286/x287) loads via load_parallel.
    if not presplit:
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    mv = F.array(*[F.lit(float(x)) for x in mean])
    cv = F.zip_with(
        F.col(vec_col).cast("array<double>"), mv, lambda x, y: x - y
    )
    hi = dim - 1
    pairs = df.select(cv.alias("cv")).select(
        F.explode(
            F.expr(
                f"""
                flatten(transform(sequence(0, {hi}), i ->
                  transform(sequence(i, {hi}), j -> struct(
                    i AS i, j AS j,
                    cast(element_at(cv, i + 1) * element_at(cv, j + 1)
                         as decimal(38,6)) AS xy))))
                """
            )
        ).alias("p")
    ).select("p.i", "p.j", "p.xy")
    return pairs.groupBy("i", "j").agg(
        (F.sum("xy") * 1_000_000).cast("decimal(38,0)").alias("g")
    )


def gram_ppm_dict(
    df: DataFrame,
    vec_col: str = "embedding",
    mean: np.ndarray | None = None,
    dim: int = 64,
    presplit: bool = False,
) -> dict[tuple[int, int], int]:
    """``gram_ppm_rows`` collected for driver-side consumers — keys
    (i, j) for i <= j, values g = 1e6 * sum over rows of the
    decimal(38,6)-quantized product cv_i * cv_j, as exact ints
    (decimal(38,0) in the plan == Python int here). Bounded collect:
    dim*(dim+1)/2 rows (2080 at 64)."""
    rows = gram_ppm_rows(
        df, vec_col, mean=mean, dim=dim, presplit=presplit
    ).collect()
    return {(int(r["i"]), int(r["j"])): int(r["g"]) for r in rows}


def _pc1_power_ppm(
    g_half: dict[tuple[int, int], int], dim: int = 64, iters: int = 3
) -> np.ndarray:
    """x286's integer-ppm power iteration, replayed in PYTHON INTS on the
    collected Gram: arbitrary-precision int arithmetic equals the plan's
    decimal(38,0) exactly, and sign * (abs(w) * 1e6 // m) mirrors the
    sign-safe floor `div` — so this helper, x286's Spark plan, and
    x286's DuckDB oracle all hold the bit-identical eigenvector (pinned
    in tests/test_similarity.py against a Spark-side decimal replay).
    Same unrolled shape as x286: 3 renorms, the final matvec unused;
    returns u = val / 1e6 as float64."""
    G = [[0] * dim for _ in range(dim)]
    for (i, j), g in g_half.items():
        G[i][j] = g
        G[j][i] = g  # exact mirror: G_ij and G_ji sum the same products
    w = [sum(G[d]) * 1_000_000 for d in range(dim)]
    val = [0] * dim
    for _ in range(iters):
        m = max(abs(x) for x in w)
        if m == 0:  # degenerate all-zero centered corpus
            return np.zeros(dim, dtype=np.float64)
        val = [
            (-1 if x < 0 else 1) * ((abs(x) * 1_000_000) // m) for x in w
        ]
        w = [
            sum(G[d][j] * val[j] for j in range(dim)) for d in range(dim)
        ]
    return np.array(val, dtype=np.float64) / 1e6


def pc1_vector_np(
    df: DataFrame,
    vec_col: str = "embedding",
    mean: np.ndarray | None = None,
    dim: int = 64,
    presplit: bool = False,
) -> np.ndarray:
    """The top principal direction of the mean-centered corpus — x286's
    u, factored like ``mean_vector_np`` for consumers that need the
    vector driver-side (the abtt bucketing). Documented BUILD-TIME work,
    all bounded: one |dim|-row mean collect (skipped when ``mean`` is
    passed), one corpus scan collecting the 2080-row Gram, then O(dim²)
    Python-int power iterations that mirror x286's decimal plan
    bit-exactly. The iteration is inherently sequential (each matvec
    needs the previous renorm), so unlike the mean this CANNOT be
    composed lazily in-plan without x286's eager checkpoints — the
    driver-side form is the honest one here."""
    mean = mean_vector_np(df, vec_col) if mean is None else mean
    return _pc1_power_ppm(
        gram_ppm_dict(df, vec_col, mean=mean, dim=dim, presplit=presplit),
        dim=dim,
        iters=3,
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 2048,
    iters: int = 8,
) -> np.ndarray:
    """Spherical k-means over a deterministic corpus sample, driver-side.

    The sample is the ``sample_size`` lowest-id rows (a TakeOrdered — bounded
    driver transfer regardless of corpus size; at 100 TB a `.sample(seed)`
    would spread IO better but lose run-to-run determinism, which the
    correctness gate needs). Lloyd iterations run in numpy on unit vectors:
    assign by max cosine, update = normalized mean; empty clusters keep
    their previous centroid. Returns (n_centroids, dim) unit rows."""
    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("id")
        .limit(sample_size)
        .collect()
    )
    mat = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)].copy()
    if len(cents) < n_centroids:  # degenerate tiny corpus: pad with random dirs
        pad = rng.randn(n_centroids - len(cents), mat.shape[1])
        cents = np.vstack([cents, pad / np.linalg.norm(pad, axis=1, keepdims=True)])
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def kmeans_refine_distributed(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    iters: int = 2,
) -> np.ndarray:
    """Distributed Lloyd refinement of a centroid codebook over the WHOLE
    corpus — the scale complement to ``kmeans_centroids``' bounded driver
    sample (a 2048-row sample seeds well but its centroids only reflect
    the sampled region; at 100 TB the sample is a vanishing fraction).

    Per iteration: (1) a pandas-UDF batch matmul assigns every vector to
    its max-cosine centroid (centroids closed over — broadcast-once);
    (2) per-(cluster, dim) component sums via posexplode + hash agg with
    map-side partials — the shuffle carries k*d partial rows, never
    vectors; (3) the k*d sum/count table (bounded, independent of corpus
    size) collects to the driver, which renormalizes. Component sums
    quantize to DECIMAL so the refined codebook is bit-reproducible
    run-to-run regardless of partitioning — the determinism the
    correctness gate and any codebook-reuse pipeline need. Empty clusters
    keep their previous centroid."""
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    for _ in range(iters):
        cc = cents  # rebind: the UDF closes over THIS iteration's codebook

        @pandas_udf("long")
        def assign(emb: pd.Series) -> pd.Series:
            mat = np.stack(emb.to_numpy()).astype(np.float64)
            sims = mat @ cc.T / np.linalg.norm(mat, axis=1, keepdims=True)
            return pd.Series(np.argmax(sims, axis=1).astype(np.int64))

        tagged = corpus.select(
            assign(F.col(vec_col).cast("array<double>")).alias("cl"),
            F.posexplode(F.col(vec_col)).alias("i", "xf"),
        )
        sums = (
            tagged.groupBy("cl", "i")
            .agg(
                F.sum(F.col("xf").cast("double").cast("decimal(38,12)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()  # k*d rows — bounded by the codebook, not the corpus
        )
        new = cents.copy()
        acc = np.zeros_like(cents)
        cnt = np.zeros(len(cents), dtype=np.int64)
        for r in sums:
            acc[r["cl"], r["i"]] = float(r["s"])
            cnt[r["cl"]] = r["n"]
        for c in range(len(cents)):
            if cnt[c]:
                v = acc[c] / cnt[c]
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    new[c] = v / nrm
        cents = new
    return cents


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 8,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into Voronoi cells
    around fixed centroids; a query searches only its ``n_probe`` nearest
    cells. The other classic ANN scale path next to hyperplane LSH
    (x13b): one map pass tags cells, the join touches probed cells only.

    Centroids default to spherical k-means over a deterministic corpus
    sample (``kmeans_centroids``); pass ``centroids`` to reuse a trained
    codebook. The matrix is built ONCE on the driver and closed over by the
    assign UDF (pickled to executors with the function — the broadcast-once
    pattern), never reconstructed per Arrow batch."""
    if centroids is None:
        centroids = kmeans_centroids(corpus, n_centroids, id_col, vec_col, seed)
    if refine_iters:
        # distributed Lloyd over the WHOLE corpus (see kmeans_refine_distributed)
        centroids = kmeans_refine_distributed(
            corpus, centroids, vec_col, iters=refine_iters
        )
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    def make_assign(n_assign: int):
        @pandas_udf("array<long>")
        def assign(emb: pd.Series) -> pd.Series:
            mat = np.stack(emb.to_numpy()).astype(np.float64)
            sims = mat @ cents.T / np.linalg.norm(mat, axis=1, keepdims=True)
            top = np.argsort(-sims, axis=1)[:, :n_assign]
            return pd.Series(list(top.astype(np.int64)))

        return assign

    c_tag = corpus.withColumn(
        "cell", F.explode(make_assign(1)(F.col(vec_col).cast("array<double>")))
    ).select(F.col(id_col).alias("neighbor_id"), "cell")
    q_tag = queries.withColumn(
        "cell", F.explode(make_assign(n_probe)(F.col(vec_col).cast("array<double>")))
    ).select(F.col(id_col).alias("query_id"), "cell")
    cand = (
        c_tag.join(q_tag, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = with_vec(corpus, vec_col).select(F.col(id_col).alias("neighbor_id"), "v", "v_norm")
    q = with_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")
    )
    cos = dround(dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")), 6)
    ranked = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
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


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    center: bool = False,
    abtt: bool = False,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidates, exact rerank.

    Recall grows with n_tables (any shared bucket makes a candidate);
    precision of the candidate set grows with n_planes. Verified against
    ``cosine_topk`` in tests/test_similarity.py (recall@k bound).
    ``center=True`` hashes on mean-centered vectors (x275's
    all-but-the-top fix; the CORPUS mean, composed lazily in-plan via
    ``mean_vector_col`` and applied to corpus and query tags alike — no
    build-time job, r14 ADVICE) — on an anisotropic corpus the raw
    planes mostly agree with sign(w.mean), collapsing vectors into few
    giant buckets; centering spreads them, buying the same recall from
    a smaller candidate set. ``abtt=True`` is the FULL All-but-the-Top
    preprocessing (x286's audit acted on): also subtract the PC1
    projection before taking signs — this path runs two bounded
    build-time jobs (see ``pc1_vector_np``). The rerank cosine stays
    RAW in every mode."""
    mean_row = mean_vector_col(corpus, vec_col) if (center or abtt) else None
    u = pc1_vector_np(corpus, vec_col, presplit=True) if abtt else None
    planes = np.random.RandomState(seed).randn(n_tables, n_planes, dim)
    bucketize = _bucket_udf(planes, u=u)

    def tag(df: DataFrame, prefix: str) -> DataFrame:
        tagged = _centered_hv(df, vec_col, mean_row).withColumn(
            "_buckets", bucketize(F.col("_hv"))
        )
        t = F.explode(
            F.transform(
                F.col("_buckets"),
                lambda b, i: F.struct(i.alias("table"), b.alias("bucket")),
            )
        )
        return tagged.select(F.col(id_col).alias(f"{prefix}_id"), t.alias("tb")).select(
            f"{prefix}_id", "tb.table", "tb.bucket"
        )

    cand = (
        tag(corpus, "neighbor")
        .join(tag(queries, "query"), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = with_vec(corpus, vec_col).select(F.col(id_col).alias("neighbor_id"), "v", "v_norm")
    q = with_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")
    )
    cos = dround(dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")), 6)
    ranked = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
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


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    """Row-normalize with the sequential-fold norm (``seq_self_dot``) so
    every path that feeds the greedy keep decision shares bit-identical
    per-row arithmetic — normalization is elementwise, so a row's unit
    vector is the same whether it is met in the one-group path, a
    domination check, or a within-block matmul."""
    return mat / np.sqrt(seq_self_dot(mat))[:, None]


def _greedy_keep(sims: np.ndarray, threshold: float) -> np.ndarray:
    """keep[i] = no kept j < i with sims[i, j] >= threshold; greedy over
    the (pre-sorted) id order makes the kept set unique and
    order-independent — the lexicographically-first maximal independent
    set of the >=threshold similarity graph."""
    n = sims.shape[0]
    keep = np.ones(n, dtype=bool)
    for i in range(1, n):
        if (sims[i, :i][keep[:i]] >= threshold).any():
            keep[i] = False
    return keep


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    seed: int = 42,
    max_cluster_rows: int = 4096,
    block_rows: int = 2048,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    k-means the embedding space, then dedup WITHIN each cluster only —
    greedy keep-first: a vector is dropped iff some lower-id vector in the
    SAME cluster has cosine >= threshold. Returns (id, cluster, keep).

    Why this shape survives 100 TB: the only all-pairs work is per-cluster,
    so compute is sum(n_c^2) — k is chosen to cap the AVERAGE n_c, exactly
    how the published pipeline ran on LAION-scale corpora. The codebook
    comes from the bounded deterministic driver sample (kmeans_centroids);
    assignment is one Arrow-batched map pass. Within-cluster pairs are a
    SUBSET of the exact near-dup pair set, so precision vs the exact twin
    is 1.0 by construction (asserted in tests/test_similarity.py along
    with seed-determinism); recall is the cross-cluster-miss tradeoff the
    method accepts for linearity.

    Skew path: a cluster whose size exceeds ``max_cluster_rows`` — a
    boilerplate template with millions of near-identical docs is dedup's
    EXPECTED adversarial input — no longer lands one unbounded
    applyInPandas task. Oversized clusters run a block-sequential greedy:
    rows are id-ordered and cut into ``block_rows`` blocks; each round,
    (a) block-vs-kept-prefix domination is a distributed block x chunk
    matmul fan-out (every task holds <= 2 x block_rows vectors), (b) the
    survivors' within-block greedy is one bounded local group, and (c)
    newly kept rows append to the kept prefix as a new bounded chunk
    (localCheckpoint'ed per round to cap lineage). Driver rounds =
    ceil(max n_c / block_rows) — sequential in rounds because greedy
    keep-first is (it is the lex-first MIS, P-complete in general), but
    every round's work is fully distributed and memory-bounded. On the
    adversarial near-clique the kept prefix stays tiny, so each round is
    one cheap block x 1-chunk check. All cosine cells ride the bit-exact
    sequential-fold kernel (``seq_dot_block``) in BOTH paths, so the
    blocked path provably reproduces the one-group keep set (asserted in
    tests/test_similarity.py by forcing a fixture cluster through it)."""
    cents = kmeans_centroids(
        df, n_clusters, id_col=id_col, vec_col=vec_col, seed=seed
    )

    @pandas_udf("long")
    def assign(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series(np.argmax(mat @ cents.T, axis=1).astype(np.int64))

    # one assignment pass, shared: the size probe below and the dedup
    # path(s) all read `tagged`, and without a checkpoint each would
    # re-run the Arrow assign UDF over the full corpus (the r8->r9 x71
    # bench regression). localCheckpoint stores the same (id, v,
    # cluster) bytes the groupBy shuffle moves anyway — executor-local,
    # partition-parallel, no driver involvement.
    tagged = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        assign(F.col(vec_col).cast("array<double>")).alias("cluster"),
    ).localCheckpoint(eager=True)

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", ignore_index=True)
        mat = _norm_rows(np.stack(pdf["v"].to_numpy()).astype(np.float64))
        keep = _greedy_keep(npround(seq_dot_block(mat, mat), 6), threshold)
        return pd.DataFrame(
            {"id": pdf["id"], "cluster": pdf["cluster"], "keep": keep}
        )

    out_schema = "id long, cluster long, keep boolean"
    # bounded probe: n_clusters rows — which clusters exceed the cap
    sizes = tagged.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_c"))
    big_ids = [
        r["cluster"]
        for r in sizes.filter(F.col("n_c") > max_cluster_rows).collect()
    ]
    small = tagged
    if big_ids:
        small = tagged.filter(~F.col("cluster").isin(big_ids))
    small_out = small.groupBy("cluster").applyInPandas(dedup_cluster, out_schema)
    if not big_ids:
        return small_out
    return small_out.unionByName(
        _semantic_dedup_blocked(
            tagged.filter(F.col("cluster").isin(big_ids)),
            threshold,
            block_rows,
        )
    )


def _semantic_dedup_blocked(
    tagged: DataFrame, threshold: float, block_rows: int
) -> DataFrame:
    """Block-parallel greedy keep-first over oversized clusters; input is
    (id, v, cluster). Produces the exact keep set of the one-group greedy
    with every task bounded at <= 2 x block_rows vectors.

    Round structure (the part that makes the adversarial near-clique
    CHEAP, not just safe): each round first domination-checks EVERY still-
    undecided row against the whole kept prefix in one distributed
    block x chunk fan-out — dominated rows are decided keep=False
    immediately, wherever they sit in the id order — and only then runs
    the local greedy on the FIRST surviving block per cluster. On a mega-
    cluster of near-identical rows, round 1 keeps one row and round 2
    dominates everything else at once: 2 rounds total, independent of
    cluster size. The worst case (an oversized cluster with NO similar
    pairs) degrades to ceil(n_c / block_rows) rounds of distributed
    all-pairs checks — which is the irreducible work of exact greedy
    dedup on such input, just never concentrated on one task."""
    w = Window.partitionBy("cluster").orderBy("id")
    undecided = tagged.withColumn(
        "blk", ((F.row_number().over(w) - 1) / block_rows).cast("int")
    ).localCheckpoint(eager=True)

    dom_schema = "id long, dom boolean"

    def dom_check(pdf: pd.DataFrame) -> pd.DataFrame:
        # self-enforcing task bound: one candidate block + one kept chunk
        assert len(pdf) <= 2 * block_rows, (
            f"dom_check group of {len(pdf)} rows violates the"
            f" <= 2 x block_rows ({2 * block_rows}) bound"
        )
        c = pdf[pdf["role"] == "c"].sort_values("id")
        k = pdf[pdf["role"] == "k"]
        if c.empty or k.empty:
            return pd.DataFrame({"id": c["id"].astype("int64"), "dom": False})
        mc = _norm_rows(np.stack(c["v"].to_numpy()).astype(np.float64))
        mk = _norm_rows(np.stack(k["v"].to_numpy()).astype(np.float64))
        sims = npround(seq_dot_block(mc, mk), 6)
        return pd.DataFrame(
            {
                "id": c["id"].to_numpy().astype("int64"),
                "dom": (sims >= threshold).any(axis=1),
            }
        )

    def local_greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", ignore_index=True)
        mat = _norm_rows(np.stack(pdf["v"].to_numpy()).astype(np.float64))
        keep = _greedy_keep(npround(seq_dot_block(mat, mat), 6), threshold)
        return pd.DataFrame(
            {"id": pdf["id"], "cluster": pdf["cluster"], "keep": keep}
        )

    kept: DataFrame | None = None  # (cluster, id, v, kc) — kc = chunk idx
    acc: DataFrame | None = None
    rnd = 0
    while not undecided.isEmpty():
        cand = undecided.select("cluster", "blk", "id", "v")
        if kept is not None:
            # fan every undecided BLOCK out to every kept chunk of its
            # cluster: candidates keep their blk, kept chunks replicate
            # across the cluster's candidate blocks, and the dom check
            # groups on (cluster, blk, kc) — one candidate block + one
            # kept chunk per task, <= 2 x block_rows rows, even when one
            # mega-cluster holds every undecided row (the round-2
            # adversarial near-clique)
            chunks = kept.select("cluster", "kc").distinct()
            blks = cand.select("cluster", "blk").distinct()
            crep = cand.join(chunks, "cluster").select(
                "cluster", "blk", "kc", "id", "v", F.lit("c").alias("role")
            )
            krep = kept.join(blks, "cluster").select(
                "cluster", "blk", "kc", "id", "v", F.lit("k").alias("role")
            )
            dom = (
                crep.unionByName(krep)
                .groupBy("cluster", "blk", "kc")
                .applyInPandas(dom_check, dom_schema)
                .groupBy("id")
                .agg(F.max("dom").alias("dom"))
            )
            cand = cand.join(dom, "id", "left").withColumn(
                "dom", F.coalesce("dom", F.lit(False))
            )
        else:
            cand = cand.withColumn("dom", F.lit(False))
        dominated = cand.filter("dom").select(
            "id", "cluster", F.lit(False).alias("keep")
        )
        survivors = cand.filter("NOT dom").drop("dom")
        # the first surviving block per cluster is fully decidable now:
        # every lower-id row is either kept (checked above) or dropped
        head = survivors.join(
            survivors.groupBy("cluster").agg(F.min("blk").alias("blk")),
            ["cluster", "blk"],
        )
        decided = head.select("cluster", "id", "v").groupBy("cluster").applyInPandas(
            local_greedy, "id long, cluster long, keep boolean"
        )
        round_out = decided.unionByName(dominated).localCheckpoint(eager=True)
        acc = round_out if acc is None else acc.unionByName(round_out)
        new_kept = head.join(
            round_out.filter("keep").select("id"), "id", "left_semi"
        ).select("cluster", "id", "v", F.lit(rnd).alias("kc"))
        kept = (
            new_kept if kept is None else kept.unionByName(new_kept)
        ).localCheckpoint(eager=True)
        undecided = undecided.join(
            round_out.select("id"), "id", "left_anti"
        ).localCheckpoint(eager=True)
        rnd += 1
    return acc.select("id", "cluster", "keep")


def mips_topk_brute(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by INNER PRODUCT (maximum-inner-product search): the
    recommendation/retrieval scoring where vector length matters —
    cosine's normalization is wrong there. Same broadcast nested-loop
    shape as ``cosine_topk``; score = dot product rounded 6 before
    ranking, ties by neighbor_id (the exact-arithmetic discipline all
    checked rankings use). This is the ground-truth/verify stage; the
    scale path is ``mips_topk_lsh``."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    ip = dround(dot(F.col("qv"), F.col("v")), 6)
    ranked = pairs.select("query_id", "neighbor_id", ip.alias("ip")).withColumn(
        "rank",
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(
                F.col("ip").desc(), F.col("neighbor_id")
            )
        )
        .cast("long"),
    )
    return ranked.filter(F.col("rank") <= k).orderBy("query_id", "rank")


def mips_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate MIPS via the norm-augmentation reduction (Bachrach et
    al., RecSys'14; Neyshabur & Srebro, ICML'15): append one dimension so
    every corpus vector becomes unit-norm — x' = [x/M, sqrt(1-(|x|/M)^2)]
    with M = max corpus norm, q' = [q, 0] — which makes augmented-cosine
    ranking IDENTICAL to inner-product ranking. The existing
    hyperplane-LSH candidate machinery then applies unchanged to MIPS:
    bucket the augmented vectors, equi-join on (table, bucket), exact
    inner-product rerank of candidates only. M comes from one scalar agg
    over the corpus (a bounded driver probe, like the LSH auto-depth
    count). Recall vs ``mips_topk_brute`` is asserted in
    tests/test_similarity.py; candidates-only join is the 100 TB path."""
    m_norm = corpus.select(
        F.sqrt(F.max(dot(F.col(vec_col).cast("array<double>"), F.col(vec_col).cast("array<double>")))).alias("m")
    ).collect()[0]["m"]
    planes = np.random.RandomState(seed).randn(n_tables, n_planes, dim + 1)
    bucketize = _bucket_udf(planes)

    v = F.col(vec_col).cast("array<double>")
    c_aug = F.concat(
        F.transform(v, lambda x: x / F.lit(m_norm)),
        F.array(
            F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - dot(v, v) / F.lit(m_norm * m_norm)))
        ),
    )
    q_aug = F.concat(v, F.array(F.lit(0.0)))

    def tag(df: DataFrame, aug, prefix: str) -> DataFrame:
        tagged = df.withColumn("_buckets", bucketize(aug))
        t = F.explode(
            F.transform(
                F.col("_buckets"),
                lambda b, i: F.struct(i.alias("table"), b.alias("bucket")),
            )
        )
        return tagged.select(F.col(id_col).alias(f"{prefix}_id"), t.alias("tb")).select(
            f"{prefix}_id", "tb.table", "tb.bucket"
        )

    cand = (
        tag(corpus, c_aug, "neighbor")
        .join(tag(queries, q_aug, "query"), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), v.alias("v"))
    q = queries.select(F.col(id_col).alias("query_id"), v.alias("qv"))
    ip = dround(dot(F.col("qv"), F.col("v")), 6)
    ranked = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", ip.alias("ip"))
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("ip").desc(), F.col("neighbor_id")
                )
            )
            .cast("long"),
        )
    )
    return ranked.filter(F.col("rank") <= k).orderBy("query_id", "rank")


def _pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    n_codes: int,
    seed: int,
    sample_size: int = 2048,
    iters: int = 8,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou, Douze & Schmid,
    TPAMI'11): split the (unit-normalized) vector into ``m`` subspaces and
    run plain L2 Lloyd per subspace on the bounded deterministic driver
    sample (the kmeans_centroids policy). Returns (m, n_codes, dim/m)."""
    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("id")
        .limit(sample_size)
        .collect()
    )
    mat = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    d = mat.shape[1] // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, n_codes, d))
    for j in range(m):
        sub = mat[:, j * d : (j + 1) * d]
        cents = sub[rng.choice(len(sub), size=min(n_codes, len(sub)), replace=False)].copy()
        if len(cents) < n_codes:
            cents = np.vstack([cents, rng.randn(n_codes - len(cents), d) * 0.01])
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode_udf(books: np.ndarray):
    """PQ encoder as an Arrow-batched pandas UDF: per subspace, the
    nearest-codebook-centroid index of the unit-normalized vector.
    Shared verbatim between pq_topk's inline encode and the PQ index
    artifact's build pass (plans/pq.py) so stored codes can never
    drift from the fused path's."""
    m, _, d = books.shape

    @pandas_udf("array<int>")
    def encode(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        codes = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            sub = mat[:, j * d : (j + 1) * d]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return encode


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    oversample: int = 8,
    books: np.ndarray | None = None,
    coded: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k via product quantization + asymmetric
    distance computation (ADC), exact rerank of the survivors.
    Pass ``books`` to reuse a trained codebook (the PQ index artifact's
    reuse path, mirroring ivf_cosine_topk's ``centroids``).

    Why this is the third ANN scale path next to LSH (x13b) and IVF
    (x13c): the corpus is ENCODED ONCE to ``m`` small codes per vector
    (here 8 codes x 16 centroids = 8 x 4 bits — a 64x compression of the
    64-dim float32 fixture vector), and the scan side of every query
    touches only the code table: per Arrow batch, approximate scores are
    ``m`` table lookups per vector (LUT built per query from the
    codebooks — numpy fancy-indexing, no per-row Python), each batch
    yields its local top candidates, one global rank keeps
    ``k*oversample``, and only those few rows ever join back to the
    full vectors for the exact rerank. At 100 TB the full-precision
    vectors are read exactly twice (encode, rerank-subset) and never
    shuffled. Seed-deterministic => rows-only check + recall tests.

    Parameter discipline (measured, docs/SCALING.md round-7 recall
    probe): recall's binding constraint is CODE RESOLUTION, not the
    candidate pool — 4-bit codes cap recall@3 at ~0.43 on the 64-dim
    fixture while 8-bit codes (``n_codes=256``, the PQ-paper default)
    reach 0.90; ``oversample`` must also grow with the corpus
    (~ n/2000). The 16-code default here exists because the fixture's
    500-vector table cannot train 256-centroid subspace codebooks
    non-degenerately; at production scale use m=8 x 256 codes."""
    if books is None:
        books = _pq_codebooks(corpus, id_col, vec_col, m, n_codes, seed)
    m, d = books.shape[0], books.shape[2]  # the codebook is authoritative

    if coded is None:
        encode = pq_encode_udf(books)
        coded = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            encode(F.col(vec_col).cast("array<double>")).alias("codes"),
        )

    q_rows = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("qid")
        .collect()
    )
    q_ids = np.array([r["qid"] for r in q_rows])
    q_mat = np.stack([np.asarray(r["v"], dtype=np.float64) for r in q_rows])
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    # ADC lookup tables: lut[q, j, c] = q_sub . codebook[j][c]
    lut = np.einsum("qjd,jcd->qjc", q_mat.reshape(len(q_mat), m, d), books)
    cap = k * oversample

    def score(batches):
        for pdf in batches:
            ids = pdf["neighbor_id"].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy())  # (batch, m)
            # approx[q, b] = sum_j lut[q, j, codes[b, j]]
            approx = lut[:, np.arange(m)[None, :], codes].sum(axis=2)  # (nq, batch)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                mask = ids != q_ids[qi]
                order = np.lexsort((ids[mask], -approx[qi][mask]))[:cap]
                sel = np.flatnonzero(mask)[order]
                out_q.append(np.full(len(sel), q_ids[qi]))
                out_n.append(ids[sel])
                out_s.append(approx[qi][sel])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "approx": np.concatenate(out_s),
                }
            )

    local = coded.mapInPandas(score, "query_id long, neighbor_id long, approx double")
    wg = Window.partitionBy("query_id").orderBy(F.col("approx").desc(), "neighbor_id")
    cand = (
        local.withColumn("arank", F.row_number().over(wg))
        .filter(F.col("arank") <= cap)
        .select("query_id", "neighbor_id")
    )
    c = with_vec(corpus, vec_col).select(F.col(id_col).alias("neighbor_id"), "v", "v_norm")
    q = with_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")
    )
    cos = dround(dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")), 6)
    ranked = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
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


def covariance_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Single-pass X^T X partials for full d x d covariance/correlation —
    the 100 TB physical shape behind queries/similarity.py::x154 (which
    pins the semantics on 8 dims with exact decimal sums).

    Each Arrow batch contributes one (n, sum-vector, flattened X^T X)
    row via a numpy matmul; partials are pure sums, so the driver (or a
    final single-row agg) combines #partitions tiny rows into the exact
    moment matrix no matter how the corpus was partitioned — one scan,
    no shuffle of vector data, d^2 doubles per partition on the wire.
    """
    import numpy as np
    import pandas as pd

    def part(batches):
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    return df.select(vec_col).mapInPandas(
        part, "n long, s array<double>, ss array<double>"
    )


def correlation_matrix(df: DataFrame, vec_col: str = "embedding"):
    """Combine :func:`covariance_partials` into the full d x d Pearson
    correlation matrix (numpy, driver-side — the partial table is
    #partitions rows of d^2 doubles, bounded and tiny)."""
    import numpy as np

    parts = covariance_partials(df, vec_col).toPandas()
    n = int(parts["n"].sum())
    s = np.add.reduce([np.asarray(v) for v in parts["s"]])
    ss = np.add.reduce([np.asarray(v) for v in parts["ss"]])
    d = s.shape[0]
    g = ss.reshape(d, d)
    cov = g - np.outer(s, s) / n
    std = np.sqrt(np.diag(cov))
    return cov / np.outer(std, std), n


def mmr_diversified_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k_candidates: int = 20,
    k_final: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance re-rank: exact top-``k_candidates``
    cosine retrieval per query, then the greedy MMR selection of
    ``k_final`` results trading relevance against redundancy
    (Carbonell & Goldstein 1998): pick argmax of
    ``lam * rel(i) - (1-lam) * max_{s in selected} sim(i, s)``.

    Scale shape: the EXPENSIVE stage is candidate generation, which is
    the pluggable ANN path (brute-force here; ``lsh_cosine_topk`` /
    ``ivf_cosine_topk`` at scale); the MMR loop itself only ever sees
    ``k_candidates`` rows per query inside one ``applyInPandas`` group,
    so re-rank cost is O(queries * k^2) floats and parallelizes per
    query — the corpus is never touched again after retrieval.

    Determinism: relevance uses the candidate stage's 6-dp-rounded
    cosine; pairwise sims and scores are rounded to 9 dp inside the
    loop before comparison and ties break on ascending id, so the
    selection is stable across partitionings and runs.

    Output: query_id, mmr_rank (1-based), neighbor_id, rel_cos,
    mmr_score (the score at selection time; rank-1 row's score is its
    pure relevance).
    """
    import numpy as np
    import pandas as pd

    cands = cosine_topk(
        corpus, queries, k=k_candidates, id_col=id_col, vec_col=vec_col
    )
    emb = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("emb")
    )
    j = cands.join(emb, "neighbor_id").select(
        "query_id", "neighbor_id", "cos_sim", "emb"
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        ids = pdf["neighbor_id"].to_numpy()
        rel = pdf["cos_sim"].to_numpy(dtype=np.float64)
        mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        sims = np.round((mat @ mat.T) / np.outer(norms, norms), 9)
        n = len(ids)
        chosen: list[int] = []
        scores: list[float] = []
        avail = np.ones(n, dtype=bool)
        for _ in range(min(k_final, n)):
            if chosen:
                red = sims[:, chosen].max(axis=1)
                sc = np.round(lam * rel - (1.0 - lam) * red, 9)
            else:
                sc = np.round(rel, 9)
            sc_masked = np.where(avail, sc, -np.inf)
            best = sc_masked.max()
            # ties break on ascending id: ids are sorted, argmax returns
            # the first (lowest-id) maximal element
            pick_i = int(np.argmax(sc_masked == best))
            chosen.append(pick_i)
            scores.append(float(sc_masked[pick_i]))
            avail[pick_i] = False
        qid = pdf["query_id"].iloc[0]
        return pd.DataFrame(
            {
                "query_id": [qid] * len(chosen),
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int64),
                "neighbor_id": ids[chosen],
                "rel_cos": rel[chosen],
                "mmr_score": np.round(scores, 9),
            }
        )

    out_schema = (
        "query_id long, mmr_rank long, neighbor_id long, "
        "rel_cos double, mmr_score double"
    )
    return (
        j.groupBy("query_id")
        .applyInPandas(pick, schema=out_schema)
        .orderBy("query_id", "mmr_rank")
    )


def lsh_knn_graph(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int | None = 4,
    n_tables: int = 12,
    seed: int = 42,
    center: bool = False,
    abtt: bool = False,
    target_bucket: int = 256,
) -> DataFrame:
    """The directed k-NN graph over the WHOLE corpus via LSH candidates —
    x274b's engine (and the self-join sibling of ``lsh_cosine_topk``,
    which broadcasts a small query set; here every vector is a query, so
    the candidate join is a shuffle equi-join on (table, bucket) and
    nothing corpus-sized is ever broadcast). Edges rank by the RAW
    dround(6) cosine with neighbor-id tie-breaks; a vector whose buckets
    hold fewer than k mates simply emits fewer edges (the honest LSH
    behavior the recall tests measure).

    Output: (query_id, neighbor_id, cos_sim, rank<=k). At 100 TB this is
    one tag pass + one bucket self-join + a WindowGroupLimit top-k — the
    exact x12g cost envelope with directed pairs kept both ways.
    ``center=True`` composes the mean lazily in-plan (mean_vector_col —
    no build-time job, r14 ADVICE); ``abtt=True`` adds the PC1-projection
    subtraction (two bounded build-time jobs, see pc1_vector_np).
    ``n_planes=None`` resolves the depth like ``lsh_cosine_pairs``' auto
    rule — bucket size pinned at ~``target_bucket`` so the self-join's
    candidate volume grows ~n*bucket, not n²/2^p (the scale form
    scripts/scale_probe.py measures; the registered x274b keeps its
    explicit p=4 for fixture determinism)."""
    if n_planes is None:
        n = corpus.count()  # one cheap job, same trade as lsh_cosine_pairs
        n_planes = (
            max(4, math.ceil(math.log2(max(n, 1) / target_bucket)))
            if n > target_bucket
            else 4
        )
    mean_row = mean_vector_col(corpus, vec_col) if (center or abtt) else None
    u = pc1_vector_np(corpus, vec_col, presplit=True) if abtt else None
    planes = np.random.RandomState(seed).randn(n_tables, n_planes, dim)
    bucketize = _bucket_udf(planes, u=u)
    tagged = (
        _centered_hv(corpus, vec_col, mean_row)
        .withColumn("_bk", bucketize(F.col("_hv")))
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.transform(
                    F.col("_bk"),
                    lambda b, i: F.struct(i.alias("table"), b.alias("bucket")),
                )
            ).alias("tb"),
        )
        .select("id", "tb.table", "tb.bucket")
    )
    # r16 (guide §2.4/§2.5): same candidate-stage fix as lsh_cosine_pairs —
    # pin the dedup exchange at the session shuffle width (AQE's byte-based
    # coalescing starved the CPU-dense dedup/cosine stages to 10 tasks) and
    # key it by query_id so the dedup, the query_id vector join AND the
    # top-k window all reuse ONE exchange (hash(query_id) satisfies every
    # downstream clustering). Output identical; 1.65x on x274b at sf0.1.
    n_shuffle = int(
        corpus.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    cand = (
        tagged.select(F.col("id").alias("query_id"), "table", "bucket")
        .join(
            tagged.select(F.col("id").alias("neighbor_id"), "table", "bucket"),
            ["table", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .repartition(n_shuffle, "query_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    c = with_vec(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "v", "v_norm"
    )
    q = with_vec(corpus, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("v_norm").alias("q_norm"),
    )
    cos = dround(
        dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(c, "neighbor_id")
        .join(q, "query_id")
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
