"""Similarity-search query surface (SURVEY.md §2.6 X13) over ``embeddings``.

Brute-force cosine top-k is the hash-checked baseline (cosine rounded to 6
decimals before ranking in BOTH engines, ties by neighbor_id — see
functions/simfns.py). The LSH variant is the scale path: deterministic
given its seed, checked rows-only + recall-tested in tests/test_similarity.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, load_parallel
from ..functions.simfns import cosine_topk, ivf_cosine_topk, lsh_cosine_topk
from .registry import davg, davg_sql, dround, dround_sql, dsum, dsum_sql, query


_COS_SQL = dround_sql(
    "list_dot_product(q.qv, e.v) / "
    "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))", 6
)


@query(
    "x13_ann_bruteforce_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    pairs AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_COS_SQL} AS cos_sim
      FROM q, e WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, CAST(row_number() OVER
        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM pairs
    ) WHERE rank <= 3 ORDER BY query_id, rank
    """,
)
def x13_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 neighbors for query vectors vec_id < 10."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(emb, queries, k=3)


@query("x13c_ann_ivf_topk")  # seed-deterministic; rows-only check
def x13c_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style top-3 (16 cells, probe 8): Voronoi-cell candidate join +
    exact rerank — the inverted-file ANN scale path."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_cosine_topk(emb, queries, k=3, n_centroids=16, n_probe=8)


@query("x289_ivf_cell_occupancy")  # seed-deterministic; rows-only check
def x289_ivf_cell_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-occupancy balance audit of the IVF codebook the index
    artifact partitions by (plans/index.py ann_index_write — x13c's
    16-cell / seed-42 codebook): per cell, vectors assigned, corpus
    share in ppm, and the skew ratio vs perfect balance in ppm. The
    number that decides whether the inverted file actually bounds a
    probe's read cost — a cell at 10x balance means n_probe=8 can touch
    most of the corpus, and the fix (more centroids, or a Lloyd refine
    pass over the full corpus) shows up directly in this table.

    Plan: ONE assignment pass (Arrow-batched max-cosine pandas UDF,
    codebook closed over) + one 16-row hash agg — linear, nothing
    corpus-sized moves. Rows-only like x13c: the codebook is numpy
    k-means, not SQL-expressible."""
    from ..functions.simfns import kmeans_centroids
    from ..plans.index import _assign_udf

    emb = load(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, 16)
    import numpy as np

    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    occ = (
        emb.select(
            F.element_at(
                _assign_udf(cents, 1)(F.col("embedding").cast("array<double>")), 1
            ).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    )
    tot = occ.agg(
        F.sum("n_vectors").alias("n"), F.count(F.lit(1)).alias("n_cells")
    )
    return (
        occ.crossJoin(F.broadcast(tot))
        .select(
            "cell",
            "n_vectors",
            F.expr("cast(n_vectors * 1000000 div n as bigint)").alias(
                "share_ppm"
            ),
            F.expr(
                "cast(n_vectors * n_cells * 1000000 div n as bigint)"
            ).alias("skew_ratio_ppm"),
        )
        .orderBy("cell")
    )


@query("x293_pq_code_utilization")  # seed-deterministic; rows-only check
def x293_pq_code_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook-utilization audit of the PQ index artifact (x289's
    analog for plans/pq.py): per subspace, the distinct codes actually
    USED, the hottest code's share in ppm, and dead codes (trained
    centroids no vector maps to — wasted bits that argue for fewer
    codes or a retrain). A near-uniform code histogram is what makes
    the ADC scan's 4-bit compression lossless-ish in recall terms; a
    collapsed subspace (one hot code) means that subspace carries no
    information and recall pays for it.

    Plan: ONE encode pass (x87's Arrow-batched pq_encode_udf, codebook
    closed over) + posexplode of the m codes per vector + one
    (subspace, code) hash agg folded to m rows — linear, nothing
    corpus-sized moves. Rows-only like x87/x289: the codebook is numpy
    k-means."""
    from ..functions.simfns import _pq_codebooks, pq_encode_udf

    emb = load(spark, sf_dir, "embeddings")
    books = _pq_codebooks(emb, "vec_id", "embedding", 8, 16, 42)
    encode = pq_encode_udf(books)
    codes = emb.select(
        F.posexplode(
            encode(F.col("embedding").cast("array<double>"))
        ).alias("subspace", "code")
    )
    per_code = codes.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = per_code.groupBy("subspace").agg(
        F.sum("n").alias("nv"),
        F.count(F.lit(1)).cast("long").alias("codes_used"),
        F.max("n").alias("hot_n"),
    )
    return (
        tot.select(
            F.col("subspace").cast("long").alias("subspace"),
            "codes_used",
            (F.lit(16) - F.col("codes_used")).cast("long").alias("dead_codes"),
            F.expr("cast(hot_n * 1000000 div nv as bigint)").alias(
                "hot_code_ppm"
            ),
        )
        .orderBy("subspace")
    )


@query("x13b_ann_lsh_topk")  # seed-deterministic; rows-only check
def x13b_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-3 (12 tables x 4 planes): bucket via an
    Arrow-batched pandas UDF, candidate equi-join, exact rerank. The 100 TB
    plan: corpus tagged in one map pass; join touches same-bucket pairs only."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_cosine_topk(emb, queries, k=3, dim=64, n_planes=4, n_tables=12)


_SQ_SQL = dround_sql("CAST(x AS DOUBLE) * CAST(x AS DOUBLE)", 6)


@query(
    "x35_embedding_array_ops",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(list_sum(list_transform(embedding, x ->
                 CAST({_SQ_SQL}
                      AS DECIMAL(38,6)))) AS DOUBLE) AS sum_sq,
           array_to_string(list_transform(embedding[1:4], x ->
                 CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS VARCHAR)),
                 ',') AS head_sig,
           CAST(len(list_filter(embedding, x -> x < 0)) AS INT) AS n_negative
    FROM embeddings
    WHERE vec_id < 500
    ORDER BY vec_id
    """,
)
def x35_embedding_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise array operations over the embedding column WITHOUT
    exploding: higher-order functions (transform / filter / aggregate) run
    JVM-side inside whole-stage codegen — the map-side shape feature
    normalization takes at 100 TB (no posexplode row blowup, no shuffle).
    Hash-safe cross-engine: squares are rounded once per element then
    accumulated in DECIMAL (order-free exact sum); the head signature
    quantizes floats to integers before string-joining, so no float
    formatting is compared."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    sum_sq = F.aggregate(
        F.transform("embedding", lambda v: dround(v.cast("double") * v.cast("double"), 6).cast("decimal(38,6)")),
        F.lit(0).cast("decimal(38,6)"),
        lambda acc, v: acc + v,
    ).cast("double")
    head_sig = F.array_join(
        F.transform(
            F.slice("embedding", 1, 4),
            lambda v: F.floor(v.cast("double") * 1000).cast("bigint").cast("string"),
        ),
        ",",
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        sum_sq.alias("sum_sq"),
        head_sig.alias("head_sig"),
        F.size(F.filter("embedding", lambda v: v < F.lit(0.0))).alias("n_negative"),
    ).orderBy("vec_id")


@query(
    "x61_centroid_outliers",
    oracle=f"""
    WITH pos AS (
      SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)),
    cen AS (SELECT label, i, SUM(CAST(x AS DECIMAL(38,6))) AS S
            FROM pos GROUP BY label, i),
    cn AS (SELECT label,
                  SUM(CAST(CAST(S AS DOUBLE) * CAST(S AS DOUBLE)
                           AS DECIMAL(38,12))) AS s2
           FROM cen GROUP BY label),
    pv AS (SELECT p.vec_id, p.label,
                  SUM(CAST(p.x * CAST(c.S AS DOUBLE) AS DECIMAL(38,12))) AS dots,
                  SUM(CAST(p.x * p.x AS DECIMAL(38,12))) AS v2
           FROM pos p JOIN cen c ON p.label = c.label AND p.i = c.i
           GROUP BY p.vec_id, p.label)
    SELECT pv.vec_id, pv.label,
           {dround_sql("CAST(dots AS DOUBLE) / (sqrt(CAST(v2 AS DOUBLE)) * sqrt(CAST(s2 AS DOUBLE)))", 6)}
             AS cos_centroid,
           {dround_sql("CAST(dots AS DOUBLE) / (sqrt(CAST(v2 AS DOUBLE)) * sqrt(CAST(s2 AS DOUBLE)))", 6)} < 0.5
             AS is_outlier
    FROM pv JOIN cn ON pv.label = cn.label
    ORDER BY vec_id
    """,
)
def x61_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anomaly audit: cosine of every vector to its
    LABEL's centroid, flagging low-cohesion outliers — the curation pass
    that catches mislabeled/contaminated clusters before training. The
    centroid is kept UNNORMALIZED as per-dimension decimal sums (cosine is
    scale-invariant, so cos(v, S) == cos(v, S/n) — dividing by n would
    only introduce a cross-engine decimal-division ulp). Plan: one
    posexplode + two hash aggs on (label, dim) — never a vector×vector
    join; the per-label norm table (|labels| rows) broadcasts. Every sum
    quantizes products to DECIMAL so accumulation order is engine-exact;
    the final cosine is one division of bit-identical doubles."""
    e = load(spark, sf_dir, "embeddings")
    pos = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "xf")
    ).select("vec_id", "label", "i", F.col("xf").cast("double").alias("x"))
    cen = pos.groupBy("label", "i").agg(
        F.sum(F.col("x").cast("decimal(38,6)")).alias("S")
    )
    sd = F.col("S").cast("double")
    cn = cen.groupBy("label").agg(
        F.sum((sd * sd).cast("decimal(38,12)")).alias("s2")
    )
    pv = (
        pos.join(cen, ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("x") * sd).cast("decimal(38,12)")).alias("dots"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("v2"),
        )
    )
    cos = dround(
        F.col("dots").cast("double")
        / (F.sqrt(F.col("v2").cast("double")) * F.sqrt(F.col("s2").cast("double"))),
        6,
    )
    return (
        pv.join(F.broadcast(cn), "label")
        .select(
            "vec_id",
            "label",
            cos.alias("cos_centroid"),
            (cos < 0.5).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


_IP_SQL = dround_sql("list_dot_product(q.qv, e.v)", 6)


@query(
    "x79_mips_bruteforce_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    pairs AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_IP_SQL} AS ip
      FROM q, e WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, ip, rank FROM (
      SELECT *, CAST(row_number() OVER
        (PARTITION BY query_id ORDER BY ip DESC, neighbor_id) AS BIGINT) AS rank
      FROM pairs
    ) WHERE rank <= 3 ORDER BY query_id, rank
    """,
)
def x79_mips_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact maximum-inner-product top-3 for query vectors vec_id < 10 —
    the retrieval scoring where vector magnitude matters (cosine's
    normalization would be wrong). Ground truth for the augmented-LSH
    variant x79b."""
    from ..functions.simfns import mips_topk_brute

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return mips_topk_brute(emb, queries, k=3)


@query("x79b_mips_lsh_topk")  # seed-deterministic; rows-only check + recall test
def x79b_mips_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIPS top-3 via the norm-augmentation reduction: one appended
    dimension turns inner-product ranking into cosine ranking on
    unit-norm vectors, so the hyperplane-LSH candidate machinery applies
    to MIPS unchanged (functions/simfns.py: mips_topk_lsh). Candidates
    bucket-join only; exact inner-product rerank."""
    from ..functions.simfns import mips_topk_lsh

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return mips_topk_lsh(emb, queries, k=3, n_tables=16)


@query("x87_ann_pq_topk")  # seed-deterministic; rows-only check + recall test
def x87_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-3 (8 subspaces x 16 codes + ADC
    lookup-table scoring, exact rerank of k*8 survivors) — the
    memory-bound ANN scale path next to LSH (x13b) and IVF (x13c): the
    query-side scan reads 8 codes per vector instead of 64 floats
    (functions/simfns.py: pq_topk)."""
    from ..functions.simfns import pq_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return pq_topk(emb, queries, k=3)


@query(
    "x119_embedding_quality_audit",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    m AS (SELECT label, vec_id,
                 CAST(FLOOR(sqrt(list_dot_product(v, v)) * 1000) AS BIGINT)
                   AS norm_mils,
                 CAST(len(list_filter(v, x -> x = 0)) AS BIGINT) AS n_zero_dims,
                 CAST(len(v) AS BIGINT) AS dim
          FROM e),
    r AS (SELECT *, row_number() OVER (PARTITION BY label ORDER BY norm_mils, vec_id)
                   AS rn,
                 count(*) OVER (PARTITION BY label) AS n
          FROM m)
    SELECT label, CAST(max(n) AS BIGINT) AS n_vectors,
           CAST(max(dim) AS BIGINT) AS dim,
           CAST(min(norm_mils) AS BIGINT) AS min_norm_mils,
           CAST(max(norm_mils) AS BIGINT) AS max_norm_mils,
           CAST(min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN norm_mils END) AS BIGINT) AS median_norm_mils,
           CAST(sum(CASE WHEN norm_mils = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_degenerate,
           CAST(sum(n_zero_dims) AS BIGINT) AS total_zero_dims
    FROM r GROUP BY label ORDER BY label
    """,
)
def x119_embedding_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table quality gate (the x40 constraint-report idea for
    vector columns): per label — vector counts, dimensionality, norm
    extrema and nearest-rank median (norms quantized to integer mils so
    the median construction is BIGINT-exact), degenerate zero-norm
    vectors, and dead (zero) dimensions. The checks every similarity/
    ANN pipeline should run before trusting cosine math: zero norms
    divide by zero downstream, dead dims waste index bits. One map pass
    + one per-label window + one agg."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    from ..functions.simfns import dot

    m = emb.select(
        "label",
        "vec_id",
        F.floor(F.sqrt(dot(v, v)) * 1000).cast("long").alias("norm_mils"),
        F.size(F.filter(v, lambda x: x == 0)).cast("long").alias("n_zero_dims"),
        F.size(v).cast("long").alias("dim"),
    )
    wr = Window.partitionBy("label").orderBy("norm_mils", "vec_id")
    r = m.select(
        "label",
        "norm_mils",
        "n_zero_dims",
        "dim",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("label")).alias("n"),
    )
    return (
        r.groupBy("label")
        .agg(
            F.max("n").cast("long").alias("n_vectors"),
            F.max("dim").alias("dim"),
            F.min("norm_mils").alias("min_norm_mils"),
            F.max("norm_mils").alias("max_norm_mils"),
            F.min(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")).cast("long"),
                    F.col("norm_mils"),
                )
            )
            .cast("long")
            .alias("median_norm_mils"),
            F.sum((F.col("norm_mils") == 0).cast("long")).alias("n_degenerate"),
            F.sum("n_zero_dims").alias("total_zero_dims"),
        )
        .orderBy("label")
    )


@query(
    "x130_cosine_histogram",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    p AS (SELECT {dround_sql(
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))", 6)}
             AS c
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT CAST(FLOOR(c * 10) AS BIGINT) AS cos_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1 ORDER BY cos_bucket
    """,
)
def x130_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine distribution histogram (0.1-wide buckets over all
    embedding pairs) — the separation plot that says whether a near-dup
    threshold EXISTS at all: planted duplicates show as a detached
    high-cosine mode; a continuous right tail (this fixture, per
    docs/SCALING.md) means any threshold is a quantile choice, not a
    gap. Exact all-pairs is the fixture-scale plan; at 100 TB the same
    histogram comes from a uniform pair SAMPLE — x130b is that scale
    path, in code — since the distribution, not the pairs, is the
    deliverable. The pair sweep runs as block-pair partial histograms
    over the bit-exact sequential-fold numpy kernel
    (simfns.seq_dot_block — same IEEE rounding sequence as the JVM fold
    and DuckDB's list_dot_product, verified bit-equal on all sf0.01
    pairs), so only 21 histogram rows ever shuffle and the n^2 pair set
    never materializes as rows. Bucketing floors the shared-rounded
    cosine — engine-exact."""
    from ..functions.simfns import cosine_bucket_histogram

    emb = load(spark, sf_dir, "embeddings")
    return cosine_bucket_histogram(emb)


@query(
    "x130b_cosine_histogram_sampled",
    oracle=f"""
    WITH h AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                      CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
               FROM embeddings),
    s AS (SELECT vec_id, v FROM (
            SELECT vec_id, v, row_number() OVER (ORDER BY hv, vec_id) AS rn FROM h)
          WHERE rn <= 128),
    p AS (SELECT {dround_sql(
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))", 6)}
             AS c
          FROM s a JOIN s b ON a.vec_id < b.vec_id)
    SELECT CAST(FLOOR(c * 10) AS BIGINT) AS cos_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1 ORDER BY cos_bucket
    """,
)
def x130b_cosine_histogram_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x130's 100 TB scale path, in code: the histogram over a
    DETERMINISTIC uniform vertex sample (m=128 vectors = 8,128 pairs)
    instead of all n^2/2 pairs. Sample = top-m by md5 clock on vec_id
    (the x57 idiom — reproducible across runs AND engines, no rand()),
    so every pair has equal inclusion probability (m/n)^2 and the bucket
    histogram is an unbiased estimate of the full pair distribution up to
    a known constant. Plan: one narrow scan projecting (vec_id, md5) ->
    TakeOrdered(m) -> all-pairs among m rows (broadcast self-join, O(m^2)
    work INDEPENDENT of corpus size — growth is the scan, alpha ~= 0).
    Hash-checked against a DuckDB oracle applying the identical sample."""
    from ..functions.dedupfns import token_hash60
    from ..functions.simfns import dot, with_vec

    emb = load(spark, sf_dir, "embeddings")
    v = with_vec(emb)
    hv = token_hash60(F.col("vec_id").cast("string"))
    # r16 (guide §1.2): norms are per-ROW values; computing them inside
    # the pair expression re-ran two 64-element folds per PAIR (the m^2
    # block runs as one task). Same expression per row => bit-identical
    # doubles; only WHERE it evaluates moves. Applied to every m^2
    # sample block (x130b/x152/x274/x275).
    s = (
        v.select("vec_id", "v", hv.alias("hv"))
        .orderBy("hv", "vec_id")  # TakeOrderedAndProject, not a full sort
        .limit(128)
        .select("vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nv"))
    )
    a = s.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nv").alias("na"))
    b = s.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nv").alias("nb"))
    cos = dround(
        dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        6,
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(F.floor(cos * 10).cast("long").alias("cos_bucket"))
        .groupBy("cos_bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("cos_bucket")
    )


@query(
    "x145_knn_label_consistency",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    p AS (SELECT a.vec_id AS qid, a.label AS ql, b.label AS nl,
                 {dround_sql(
                     "list_dot_product(a.v, b.v) / "
                     "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))", 6)}
                   AS c,
                 b.vec_id AS nid
          FROM e a JOIN e b ON a.vec_id <> b.vec_id),
    r AS (SELECT qid, ql, nl,
                 row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS rk
          FROM p),
    k AS (SELECT qid, ql,
                 CAST(sum(CASE WHEN nl = ql THEN 1 ELSE 0 END) AS BIGINT) AS agree
          FROM r WHERE rk <= 5 GROUP BY qid, ql)
    SELECT ql AS label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(agree) AS BIGINT) AS sum_agree,
           CAST(sum(agree) * 1000000 // (count(*) * 5) AS BIGINT) AS consistency_ppm
    FROM k GROUP BY ql ORDER BY label
    """,
)
def x145_knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit via k-nearest-neighbor label agreement: for every
    vector, how many of its 5 exact cosine neighbors share its label,
    rolled up per label as an exact ppm — the standard embedding-space
    diagnostic that separates mislabeled points (low agreement inside an
    otherwise-tight class) from genuinely diffuse classes (uniformly
    mediocre agreement). Runs the full exact neighbor ranking at fixture
    scale (this is the audit/ground-truth stage, like x13 vs x13b); at
    100 TB the identical per-label rollup consumes ANN candidates
    (LSH/IVF/PQ) instead of the all-pairs ranking — the agreement ppm
    then carries the measured recall bound from docs/SCALING.md's
    round-7 probe. Execution is the distributed brute-force kNN merge:
    block-pair groups emit per-query LOCAL top-5 candidates over the
    bit-exact sequential-fold kernel (simfns.knn_candidates_blocked),
    and a second rank over <= 5 * n_blocks candidates per query picks
    the global set — identical to the all-pairs window by top-k
    containment. Ranks use the shared dround + neighbor-id tie-break,
    so both engines pick identical neighbor sets."""
    from ..functions.simfns import knn_candidates_blocked

    emb = load(spark, sf_dir, "embeddings")
    cand = knn_candidates_blocked(emb, k=5, extra_cols=["label"])
    r = (
        cand.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.col("c").desc(), "nid")
            ),
        )
        .filter(F.col("rk") <= 5)
    )
    k = r.groupBy("qid", F.col("label_q").alias("ql")).agg(
        F.sum((F.col("label_n") == F.col("label_q")).cast("long")).alias("agree")
    )
    return (
        k.groupBy(F.col("ql").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("agree").alias("sum_agree"),
            F.floor(F.sum("agree") * 1_000_000 / (F.count(F.lit(1)) * 5))
            .cast("long")
            .alias("consistency_ppm"),
        )
        .orderBy("label")
    )


@query(
    "x149_dim_robust_stats",
    oracle="""
    WITH pos AS (SELECT vec_id, i - 1 AS dim,
                        CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS mils
                 FROM embeddings, range(1, 65) t(i)),
    r AS (SELECT dim, mils,
                 row_number() OVER (PARTITION BY dim ORDER BY mils, vec_id) AS rn,
                 count(*) OVER (PARTITION BY dim) AS n
          FROM pos),
    med AS (SELECT dim, CAST(max(n) AS BIGINT) AS n,
                   CAST(min(CASE WHEN rn = (n + 1) // 2 THEN mils END) AS BIGINT) AS med_mils
            FROM r GROUP BY dim),
    dev AS (SELECT pos.dim, abs(pos.mils - med.med_mils) AS adev, pos.vec_id
            FROM pos JOIN med ON med.dim = pos.dim),
    r2 AS (SELECT dim, adev,
                  row_number() OVER (PARTITION BY dim ORDER BY adev, vec_id) AS rn,
                  count(*) OVER (PARTITION BY dim) AS n
           FROM dev)
    SELECT med.dim AS dim, med.n, med.med_mils,
           CAST(min(CASE WHEN r2.rn = (r2.n + 1) // 2 THEN r2.adev END) AS BIGINT)
             AS mad_mils
    FROM r2 JOIN med ON med.dim = r2.dim
    GROUP BY med.dim, med.n, med.med_mils
    ORDER BY med.dim
    """,
)
def x149_dim_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension robust location/scale of the embedding table —
    nearest-rank median and MAD (median absolute deviation) in exact
    integer mils — the outlier-immune statistics a whitening/clipping
    stage needs (x119's mean/min/max audit is moment-based; one corrupt
    vector with a 10^6 coordinate drags a mean but not a median).
    Nearest-rank (not interpolated) so both engines pick the identical
    element; values quantize to mils BEFORE ranking (the shared floor
    idiom). Plan: one posexplode to (dim, mils) rows, rank windows
    partitioned by dim (64 independent partitions), a broadcast med
    join, second rank pass for MAD. At 100 TB per-dim medians come from
    a per-dim histogram agg (values are bounded mils integers — exact
    median from counts, no global sort); the window form here is the
    fixture-exact twin of that plan."""
    emb = load(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    ).select(
        "vec_id", "dim", F.floor(F.col("x") * 1000).cast("long").alias("mils")
    )
    wr = Window.partitionBy("dim").orderBy("mils", "vec_id")
    wc = Window.partitionBy("dim")
    r = pos.select(
        "dim", "mils",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    med = r.groupBy("dim").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(
                F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("mils")
            )
        ).cast("long").alias("med_mils"),
    )
    dev = pos.join(F.broadcast(med.select("dim", "med_mils")), "dim").select(
        "dim", "vec_id", F.abs(F.col("mils") - F.col("med_mils")).alias("adev")
    )
    wr2 = Window.partitionBy("dim").orderBy("adev", "vec_id")
    r2 = dev.select(
        "dim", "adev",
        F.row_number().over(wr2).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n2"),
    )
    mad = r2.groupBy("dim").agg(
        F.min(
            F.when(
                F.col("rn") == F.floor((F.col("n2") + 1) / 2), F.col("adev")
            )
        ).cast("long").alias("mad_mils"),
    )
    return (
        med.join(mad, "dim")
        .select("dim", "n", "med_mils", "mad_mils")
        .orderBy("dim")
    )


@query(
    "x152_dim_truncation_fidelity",
    oracle=f"""
    WITH h AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                      CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
               FROM embeddings),
    s AS (SELECT vec_id, v, v[1:32] AS vh FROM (
            SELECT vec_id, v, row_number() OVER (ORDER BY hv, vec_id) AS rn FROM h)
          WHERE rn <= 128),
    p AS (SELECT
            {dround_sql(
                "list_dot_product(a.v, b.v) / "
                "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))", 6)}
              AS cf,
            {dround_sql(
                "list_dot_product(a.vh, b.vh) / "
                "(sqrt(list_dot_product(a.vh, a.vh)) * sqrt(list_dot_product(b.vh, b.vh)))", 6)}
              AS ch
          FROM s a JOIN s b ON a.vec_id < b.vec_id)
    SELECT CAST(FLOOR(cf * 10) AS BIGINT) AS cos_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           {davg_sql("round(abs(cf - ch), 6)", 6)} AS avg_abs_err,
           {dround_sql("max(round(abs(cf - ch), 6))", 6)} AS max_abs_err
    FROM p GROUP BY cos_bucket ORDER BY cos_bucket
    """,
)
def x152_dim_truncation_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka / truncated-dimension fidelity audit: how well does cosine
    on the FIRST 32 of 64 dimensions track full-dimension cosine? Modern
    embedding models are trained so prefixes stay usable (MRL,
    arXiv:2205.13147); before switching an ANN index to truncated vectors
    at 100 TB (half the bytes, twice the cache hit rate) this query
    measures what that costs: per full-cosine decile, the mean and max
    absolute cosine error of the truncated variant. Same deterministic
    md5-clock vertex sample as x130b (m=128 => 8,128 pairs, O(m^2) work
    independent of corpus size; the only corpus-size-dependent cost is the
    narrow (vec_id, md5) scan feeding TakeOrdered). Hash-checked against a
    DuckDB oracle applying the identical sample and slicing."""
    from ..functions.dedupfns import token_hash60
    from ..functions.simfns import dot, with_vec

    emb = load(spark, sf_dir, "embeddings")
    v = with_vec(emb)
    hv = token_hash60(F.col("vec_id").cast("string"))
    s = (
        v.select("vec_id", "v", hv.alias("hv"))
        .orderBy("hv", "vec_id")  # TakeOrderedAndProject, not a full sort
        .limit(128)
        .select("vec_id", "v", F.slice("v", 1, 32).alias("vh"))
        # r16: per-row norms (see x130b) — bit-identical, evaluated m not m^2 times
        .withColumn("nv", F.sqrt(dot(F.col("v"), F.col("v"))))
        .withColumn("nh", F.sqrt(dot(F.col("vh"), F.col("vh"))))
    )
    a = s.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("vh").alias("ha"),
        F.col("nv").alias("na"), F.col("nh").alias("nha"),
    )
    b = s.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("vh").alias("hb"),
        F.col("nv").alias("nb"), F.col("nh").alias("nhb"),
    )
    cf = dround(
        dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        6,
    )
    ch = dround(
        dot(F.col("ha"), F.col("hb")) / (F.col("nha") * F.col("nhb")),
        6,
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(cf.alias("cf"), ch.alias("ch"))
        .select(
            F.floor(F.col("cf") * 10).cast("long").alias("cos_bucket"),
            F.col("cf"),
            dround(F.abs(F.col("cf") - F.col("ch")), 6).alias("err"),
        )
        .groupBy("cos_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            davg(F.col("err"), 6).alias("avg_abs_err"),
            dround(F.max("err"), 6).alias("max_abs_err"),
        )
        .orderBy("cos_bucket")
    )


@query(
    "x154_dim_correlation",
    oracle=f"""
    WITH u AS (SELECT vec_id, generate_subscripts(v8, 1) - 1 AS d, unnest(v8) AS val
               FROM (SELECT vec_id, CAST(embedding AS DOUBLE[])[1:8] AS v8
                     FROM embeddings)),
    p AS (SELECT a.d AS dim_i, b.d AS dim_j, a.val AS x, b.val AS y
          FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.d < b.d),
    g AS (SELECT dim_i, dim_j, CAST(count(*) AS DOUBLE) AS n,
                 {dsum_sql("x", 6)} AS sx, {dsum_sql("y", 6)} AS sy,
                 {dsum_sql("x * y", 6)} AS sxy,
                 {dsum_sql("x * x", 6)} AS sxx, {dsum_sql("y * y", 6)} AS syy
          FROM p GROUP BY dim_i, dim_j)
    SELECT dim_i, dim_j,
           {dround_sql(
               "(n * sxy - sx * sy) / "
               "(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))", 6)} AS corr
    FROM g ORDER BY dim_i, dim_j
    """,
)
def x154_dim_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between embedding dimensions (the
    redundancy diagnostic behind PCA/whitening decisions: highly correlated
    dims waste index bits and distort L2 neighborhoods). Checked on the
    first 8 dims (28 pairs) with the exact-decimal dsum idiom so Spark and
    DuckDB agree bit-for-bit; the full d x d version is the SAME single
    pass with d(d-1)/2 accumulators — at 100 TB the right physical shape
    is mapInPandas partial X^T X per Arrow batch (one (d,d) numpy matmul
    per batch, d^2 doubles per partition shuffled, corpus scanned once),
    which tests/test_similarity.py exercises against this query's numbers.
    No self-join anywhere: pair products are generated per row inside a
    JVM higher-order transform, so the only shuffle is the 28-group agg."""
    emb = load(spark, sf_dir, "embeddings")
    ds = F.slice(F.col("embedding").cast("array<double>"), 1, 8)
    pairs = (
        emb.select(ds.alias("ds"))
        .select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(sequence(0, 6), i ->
                      transform(sequence(i + 1, 7), j -> struct(
                        i AS dim_i, j AS dim_j,
                        element_at(ds, i + 1) AS x,
                        element_at(ds, j + 1) AS y))))
                    """
                )
            ).alias("p")
        )
        .select("p.dim_i", "p.dim_j", "p.x", "p.y")
    )
    g = pairs.groupBy("dim_i", "dim_j").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(F.col("x"), 6).alias("sx"),
        dsum(F.col("y"), 6).alias("sy"),
        dsum(F.col("x") * F.col("y"), 6).alias("sxy"),
        dsum(F.col("x") * F.col("x"), 6).alias("sxx"),
        dsum(F.col("y") * F.col("y"), 6).alias("syy"),
    )
    corr = dround(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (
            F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        ),
        6,
    )
    return (
        g.select(
            F.col("dim_i").cast("long").alias("dim_i"),
            F.col("dim_j").cast("long").alias("dim_j"),
            corr.alias("corr"),
        ).orderBy("dim_i", "dim_j")
    )


@query(
    "x157_label_silhouette",
    oracle="""
    WITH u AS (SELECT vec_id, label,
                      generate_subscripts(v, 1) - 1 AS dim,
                      CAST(floor(unnest(v) * 1000000) AS BIGINT) AS val_u
               FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings)),
    c AS (SELECT label AS clabel, dim,
                 CAST((sum(val_u) - ((sum(val_u) % count(*) + count(*))
                       % count(*))) // count(*) AS BIGINT) AS cval_u
          FROM u GROUP BY label, dim),
    d AS (SELECT u.vec_id, u.label, c.clabel,
                 sum((u.val_u - c.cval_u) * (u.val_u - c.cval_u)) AS dist2
          FROM u JOIN c ON c.dim = u.dim
          GROUP BY u.vec_id, u.label, c.clabel),
    ab AS (SELECT vec_id, label,
                  min(CASE WHEN clabel = label THEN dist2 END) AS own,
                  min(CASE WHEN clabel <> label THEN dist2 END) AS other
           FROM d GROUP BY vec_id, label),
    s AS (SELECT vec_id, label,
                 round(CAST(CAST(other - own AS DOUBLE)
                       / greatest(own, other) AS DOUBLE), 6) AS sil
          FROM ab)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
           round(CAST(CAST(SUM(CAST(sil AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*) AS DOUBLE), 4) AS avg_silhouette,
           CAST(sum(CASE WHEN sil < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_misplaced
    FROM s GROUP BY label ORDER BY label
    """,
)
def x157_label_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label silhouette audit on the embedding table (squared-L2
    variant): own-centroid distance vs nearest-other-centroid distance,
    s = (b - a) / max(a, b). The cluster-coherence gate to run before
    trusting `label` for stratified sampling / mixture planning (x142,
    x151) — a label with low or negative silhouette is not a usable
    stratum. All math is exact integer micro-units (coordinates floored
    to 1e-6, centroids by exact BIGINT floor-division, distances as
    BIGINT sums) so Spark and DuckDB agree bit-for-bit. Scale shape:
    centroids are a k x d aggregate (tiny — 10x64 here) broadcast into a
    zip_with fold per vector, so the corpus is scanned once with NO
    n x k x d shuffle; at 100 TB that is one narrow map pass plus a
    per-label agg."""
    emb = load(spark, sf_dir, "embeddings")
    vu = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * F.lit(1_000_000.0)).cast("long"),
    )
    base = emb.select("vec_id", "label", vu.alias("vu"))
    pos = base.select(
        "label", F.posexplode("vu").alias("dim", "val_u")
    )
    # exact floor-division (both engines): (s - ((s % n + n) % n)) / n
    cent = (
        pos.groupBy("label", "dim")
        .agg(F.sum("val_u").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("label").alias("clabel"),
            "dim",
            F.expr("CAST((s - ((s % n + n) % n)) DIV n AS BIGINT)").alias("cval_u"),
        )
    )
    carr = (
        cent.groupBy("clabel")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cval_u"))).alias("ps"))
        .select("clabel", F.expr("transform(ps, t -> t.cval_u)").alias("cu"))
    )
    d = base.crossJoin(F.broadcast(carr)).select(
        "vec_id",
        "label",
        "clabel",
        F.aggregate(
            F.zip_with(F.col("vu"), F.col("cu"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ).alias("dist2"),
    )
    ab = d.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("dist2"))).alias("own"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("dist2"))).alias("other"),
    )
    sil = dround(
        (F.col("other") - F.col("own")).cast("double")
        / F.greatest(F.col("own"), F.col("other")),
        6,
    )
    return (
        ab.select("label", sil.alias("sil"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            davg(F.col("sil"), 4).alias("avg_silhouette"),
            F.sum((F.col("sil") < 0).cast("long")).alias("n_misplaced"),
        )
        .orderBy("label")
    )


@query(
    "x203_power_iteration_pc1",
    oracle=f"""
    WITH u AS (SELECT vec_id, generate_subscripts(v8, 1) - 1 AS d,
                      unnest(v8) AS val
               FROM (SELECT vec_id, CAST(embedding AS DOUBLE[])[1:8] AS v8
                     FROM embeddings)),
    p AS (SELECT a.d AS i, b.d AS j,
                 CAST(a.val * b.val AS DECIMAL(38,6)) AS xy
          FROM u a JOIN u b ON a.vec_id = b.vec_id),
    g AS (SELECT i, j, CAST(sum(xy) * 1000000 AS HUGEINT) AS g
          FROM p GROUP BY 1, 2),
    w1 AS (SELECT i AS d, CAST(sum(g * 1000000) AS HUGEINT) AS w
           FROM g GROUP BY 1),
    m1 AS (SELECT max(abs(w)) AS m FROM w1),
    v1 AS (SELECT d, (CASE WHEN w < 0 THEN -1 ELSE 1 END)
                     * (abs(w) * 1000000 // m) AS val FROM w1, m1),
    w2 AS (SELECT g.i AS d, CAST(sum(g.g * v1.val) AS HUGEINT) AS w
           FROM g JOIN v1 ON g.j = v1.d GROUP BY 1),
    m2 AS (SELECT max(abs(w)) AS m FROM w2),
    v2 AS (SELECT d, (CASE WHEN w < 0 THEN -1 ELSE 1 END)
                     * (abs(w) * 1000000 // m) AS val FROM w2, m2),
    w3 AS (SELECT g.i AS d, CAST(sum(g.g * v2.val) AS HUGEINT) AS w
           FROM g JOIN v2 ON g.j = v2.d GROUP BY 1),
    m3 AS (SELECT max(abs(w)) AS m FROM w3),
    v3 AS (SELECT d, (CASE WHEN w < 0 THEN -1 ELSE 1 END)
                     * (abs(w) * 1000000 // m) AS val FROM w3, m3),
    w4 AS (SELECT g.i AS d, CAST(sum(g.g * v3.val) AS HUGEINT) AS w
           FROM g JOIN v3 ON g.j = v3.d GROUP BY 1),
    ray AS (SELECT CAST(sum(CAST(v3.val AS HUGEINT) * w4.w) AS HUGEINT) AS num,
                   CAST(sum(CAST(v3.val AS HUGEINT) * v3.val) AS HUGEINT) AS den
            FROM v3 JOIN w4 ON v3.d = w4.d)
    SELECT CAST(v3.d AS BIGINT) AS dim,
           CAST(v3.val AS BIGINT) AS eigvec_ppm,
           {dround_sql("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)", 6)}
             AS rayleigh_ppm
    FROM v3, ray ORDER BY dim
    """,
)
def x203_power_iteration_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding second-moment (Gram)
    matrix by THREE unrolled power iterations — the x168 PageRank
    discipline applied to PCA: an iterative float algorithm made
    hash-checkable by running every step in exact integer arithmetic.
    PC1 is the whitening/indexing diagnostic x154's pairwise
    correlations motivate: a dominant direction means index bits are
    being spent on one redundant axis (Matryoshka truncation, PQ
    codebook allocation, and mean-centering decisions all read it).

    Exactness scheme: G_ij accumulates decimal-quantized products (the
    x154 dsum idiom) and is scaled to integer ppm; each iteration is an
    exact integer matvec (products cast to decimal(38,0)/HUGEINT BEFORE
    multiplying — the x167/x182 overflow rule, good to ~1e12 rows), then
    renormalized to +-1e6 by sign-safe floor division on NON-NEGATIVE
    operands (sign * (abs(w) * 1e6 div max|w|)) so Spark's
    truncate-toward-zero `div` and DuckDB's floor `//` agree; ties at
    w = 0 take +1 via an explicit CASE in both engines (duck's sign()
    returns 0 there). The Rayleigh quotient v3.G.v3 / v3.v3 estimates
    lambda_1 in G-ppm units with the query's single double division,
    rounded once. Plan shape at 100 TB: ONE corpus pass builds the d x d
    Gram via per-row JVM pair generation (64 accumulators; the full
    d = 64 version is the same pass with 4096, or x154's mapInPandas
    X^T X kernel); the iterations then run on the 8-row eigenvector
    table — broadcast joins, no corpus access, no driver loop beyond 3
    fixed rounds."""
    emb = load(spark, sf_dir, "embeddings")
    ds = F.slice(F.col("embedding").cast("array<double>"), 1, 8)
    pairs = (
        emb.select(ds.alias("ds"))
        .select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(sequence(0, 7), i ->
                      transform(sequence(0, 7), j -> struct(
                        i AS i, j AS j,
                        cast(element_at(ds, i + 1) * element_at(ds, j + 1)
                             as decimal(38,6)) AS xy))))
                    """
                )
            ).alias("p")
        )
        .select("p.i", "p.j", "p.xy")
    )
    # ONE corpus pass, materialized: without the checkpoint every matvec
    # and every renorm max re-derives the Gram from the corpus (the lazy
    # plan held 86 parquet scans) — with it, iterations are pure 64-row
    # jobs. Same executor-local semantics as x71's shared-assignment fix.
    g = (
        pairs.groupBy("i", "j")
        .agg((F.sum("xy") * 1_000_000).cast("decimal(38,0)").alias("g"))
        .localCheckpoint(eager=True)
    )
    sgn = F.when(F.col("w") < 0, F.lit(-1)).otherwise(F.lit(1))
    renorm = (
        sgn.cast("decimal(38,0)")
        * F.expr("abs(w) * 1000000 div m").cast("decimal(38,0)")
    ).alias("val")

    # v0 = all-ones (x 1e6): the first matvec folds it in as a constant
    v = g.groupBy(F.col("i").alias("d")).agg(
        F.sum(F.col("g") * F.lit(1_000_000)).cast("decimal(38,0)").alias("w")
    )
    for _ in range(3):
        # 8-row checkpoint per round: the renorm max forks the lineage
        # (m and vn both read v), and without it each fork replays the
        # whole iteration history
        v = v.localCheckpoint(eager=True)
        m = v.agg(F.max(F.abs(F.col("w"))).alias("m"))
        vn = v.crossJoin(F.broadcast(m)).select("d", renorm)
        # next matvec (the 3rd loop pass computes w4 for the Rayleigh
        # quotient; vn after the 3rd renorm is v3)
        v = (
            g.join(F.broadcast(vn), g["j"] == vn["d"])
            .groupBy(F.col("i").alias("d"))
            .agg(F.sum(F.col("g") * F.col("val")).cast("decimal(38,0)").alias("w"))
        )
        v3 = vn
    w4 = v
    ray = (
        v3.join(w4, "d")
        .agg(
            F.sum(F.col("val") * F.col("w")).cast("decimal(38,0)").alias("num"),
            F.sum(F.col("val") * F.col("val")).cast("decimal(38,0)").alias("den"),
        )
    )
    return (
        v3.crossJoin(F.broadcast(ray))
        .select(
            F.col("d").cast("long").alias("dim"),
            F.col("val").cast("long").alias("eigvec_ppm"),
            dround(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("rayleigh_ppm"),
        )
        .orderBy("dim")
    )


@query(
    "x211_scalar_quantization_audit",
    oracle=f"""
    WITH u AS (SELECT vec_id, generate_subscripts(v, 1) - 1 AS d,
                      unnest(v) AS val
               FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings)),
    st AS (SELECT d, min(val) AS mn, max(val) AS mx,
                  CAST(count(*) AS BIGINT) AS n
           FROM u GROUP BY d HAVING max(val) > min(val)),
    q AS (SELECT u.d, st.n, u.val,
                 floor((u.val - st.mn) * 255.0 / (st.mx - st.mn)) AS code,
                 st.mn + (floor((u.val - st.mn) * 255.0 / (st.mx - st.mn))
                          + 0.5) * (st.mx - st.mn) / 255.0 AS vq,
                 st.mx - st.mn AS rng
          FROM u JOIN st ON u.d = st.d)
    SELECT CAST(d AS BIGINT) AS dim, n,
           CAST(count(DISTINCT code) AS BIGINT) AS levels,
           {dround_sql("max(rng)", 6)} AS rng,
           {davg_sql("abs(val - vq)", 6)} AS mean_abs_err,
           {dround_sql("max(abs(val - vq))", 6)} AS max_abs_err
    FROM q GROUP BY d, n ORDER BY dim
    """,
)
def x211_scalar_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization error audit per embedding dimension: the
    storage-compression decision PQ (x87) and Matryoshka truncation
    (x152) don't cover — uniform 256-level quantization of each dim to
    its own [min, max] range, reporting levels actually used, range,
    and mean/max absolute reconstruction error (midpoint dequant). This
    is the audit run before shipping int8 embeddings to an ANN index:
    dims whose max error rivals their neighbors' separation need more
    bits or per-block scales. Cross-engine exactness: codes come from
    floor() over an identical IEEE expression tree (the dround rationale
    — no round() anywhere), error stats ride the dsum/davg decimal
    accumulators, constant dims are excluded by the same HAVING in both
    engines. Plan: one (dim) hash agg for ranges, broadcast back onto
    one posexplode pass, one (dim) agg out — two corpus-width passes,
    64-row output, no shuffle wider than the dim key."""
    emb = load(spark, sf_dir, "embeddings")
    u = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "d", "val"
        ),
    )
    st = (
        u.groupBy("d")
        .agg(
            F.min("val").alias("mn"),
            F.max("val").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("mx") > F.col("mn"))
    )
    code = F.floor((F.col("val") - F.col("mn")) * 255.0 / (F.col("mx") - F.col("mn")))
    q = u.join(F.broadcast(st), "d").select(
        "d",
        "n",
        "val",
        code.alias("code"),
        (
            F.col("mn")
            + (code + 0.5) * (F.col("mx") - F.col("mn")) / 255.0
        ).alias("vq"),
        (F.col("mx") - F.col("mn")).alias("rng"),
    )
    return (
        q.groupBy("d", "n")
        .agg(
            F.countDistinct("code").cast("long").alias("levels"),
            dround(F.max("rng"), 6).alias("rng"),
            davg(F.abs(F.col("val") - F.col("vq")), 6).alias("mean_abs_err"),
            dround(F.max(F.abs(F.col("val") - F.col("vq"))), 6).alias(
                "max_abs_err"
            ),
        )
        .select(
            F.col("d").cast("long").alias("dim"),
            F.col("n").cast("long").alias("n"),
            "levels",
            "rng",
            "mean_abs_err",
            "max_abs_err",
        )
        .orderBy("dim")
    )


@query(
    "x221_jl_projection_distortion",
    oracle=f"""
    WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
                      CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                           AS BIGINT) AS q
               FROM embeddings WHERE vec_id < 100),
    sgn AS (SELECT r // 16 AS i, r % 16 AS j,
                   CASE WHEN ((1103515245 * r + 12345) % 2147483648)
                        // 65536 % 2 = 0 THEN 1 ELSE -1 END AS s
            FROM (SELECT unnest(range(1024)) AS r)),
    proj AS (SELECT u.vec_id, sgn.j,
                    CAST(sum(u.q * sgn.s) AS BIGINT) AS p
             FROM u JOIN sgn ON sgn.i = u.i
             GROUP BY 1, 2),
    dp AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                  CAST(sum(CAST(a.p - b.p AS DECIMAL(38,0)) * (a.p - b.p))
                       AS DECIMAL(38,0)) AS d2p
           FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
           GROUP BY 1, 2),
    dq AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                  CAST(sum(CAST(a.q - b.q AS DECIMAL(38,0)) * (a.q - b.q))
                       AS DECIMAL(38,0)) AS d2o
           FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
           GROUP BY 1, 2),
    r AS (SELECT dp.va, dp.vb,
                 CAST(dp.d2p AS DOUBLE) / (16.0 * CAST(dq.d2o AS DOUBLE))
                     AS ratio
          FROM dp JOIN dq ON dq.va = dp.va AND dq.vb = dp.vb
          WHERE dq.d2o > 0)
    SELECT CAST(least(FLOOR(ratio * 4), 12) AS BIGINT) AS ratio_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           {dsum_sql("ratio", 6)} AS sum_ratio
    FROM r GROUP BY 1 ORDER BY ratio_bucket
    """,
)
def x221_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss audit: project the 64-dim embeddings to 16
    dims with a DETERMINISTIC Rademacher (+-1) matrix and histogram the
    pairwise squared-distance ratio ||Px||^2/(k*||x||^2) over a fixed
    probe pair set — the measurement that tells you whether the cheap
    16-dim index (x152 truncation keeps the FIRST dims; JL keeps
    EXPECTED distances for arbitrary vectors) is safe to build the ANN
    candidate stage on. Exactness: coordinates quantize to integers
    (floor(x*1e6)), the sign matrix is a 1024-row LCG closed form both
    engines compute bit-identically, so projections, distances and
    every ratio are IEEE-deterministic; buckets floor exact doubles.
    Plan: the projection is one broadcast join + hash agg (linear,
    shuffle-free at any corpus size — the matrix is 1 KB); the
    distortion PROBE fixes |pairs| = 4950 (vec_id < 100), so audit cost
    is constant regardless of corpus scale. Identical-vector pairs
    (zero distance) are excluded from ratios by definition."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    u = e.select(
        "vec_id",
        F.posexplode("embedding").alias("i", "val"),
    ).select(
        "vec_id",
        "i",
        F.floor(F.col("val").cast("double") * 1_000_000).alias("q"),
    )
    sgn = spark.range(1024).select(
        F.floor(F.col("id") / 16).alias("i"),
        (F.col("id") % 16).alias("j"),
        F.when(
            F.expr(
                "((1103515245 * id + 12345) % 2147483648) div 65536 % 2"
            )
            == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("s"),
    )
    proj = (
        u.join(F.broadcast(sgn), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("q") * F.col("s")).alias("p"))
    )
    pa = proj.select(
        F.col("vec_id").alias("va"), "j", F.col("p").alias("p_a")
    )
    pb = proj.select(
        F.col("vec_id").alias("vb"), "j", F.col("p").alias("p_b")
    )
    dp = (
        pa.join(pb, "j")
        .filter(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(
            F.sum(
                (F.col("p_a") - F.col("p_b")).cast("decimal(38,0)")
                * (F.col("p_a") - F.col("p_b"))
            ).alias("d2p")
        )
    )
    qa = u.select(F.col("vec_id").alias("va"), "i", F.col("q").alias("q_a"))
    qb = u.select(F.col("vec_id").alias("vb"), "i", F.col("q").alias("q_b"))
    dq = (
        qa.join(qb, "i")
        .filter(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(
            F.sum(
                (F.col("q_a") - F.col("q_b")).cast("decimal(38,0)")
                * (F.col("q_a") - F.col("q_b"))
            ).alias("d2o")
        )
    )
    ratio = F.col("d2p").cast("double") / (16.0 * F.col("d2o").cast("double"))
    return (
        dp.join(dq, ["va", "vb"])
        .filter(F.col("d2o") > 0)
        .select(ratio.alias("ratio"))
        .groupBy(
            F.least(F.floor(F.col("ratio") * 4), F.lit(12))
            .cast("long")
            .alias("ratio_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            dsum(F.col("ratio"), 6).alias("sum_ratio"),
        )
        .orderBy("ratio_bucket")
    )


@query("x229_mmr_diversified_topk")
def x229_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval: for each of 10 probe queries, exact
    top-20 cosine candidates re-ranked to a diversified top-5 (lambda =
    0.7) — the redundancy-aware result list retrieval-augmented
    pipelines want when the naive top-k is five copies of the same
    near-dup (x12f finds those dups; MMR routes AROUND them at query
    time). No SQL oracle (greedy sequential selection is not
    SQL-expressible); correctness rides tests/test_mmr.py: equality
    against a pure-Python reference on the same candidates, run-to-run
    determinism, and the diversity property (MMR set's mean pairwise
    cosine <= relevance-only top-5's). Scale: candidate generation is
    the pluggable ANN stage; the re-rank is O(k^2) per query inside one
    applyInPandas group. See functions/simfns.py:mmr_diversified_topk."""
    from ..functions.simfns import mmr_diversified_topk

    e = load(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 100)
    queries = e.filter(F.col("vec_id") < 10)
    return mmr_diversified_topk(corpus, queries, 20, 5, 0.7)


@query(
    "x251_embedding_parity_drift",
    oracle=f"""
    WITH u AS (SELECT vec_id % 2 AS par, label,
                      generate_subscripts(v, 1) - 1 AS dim,
                      CAST(floor(unnest(v) * 1000000) AS BIGINT) AS val_u
               FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings)),
    s AS (SELECT label, dim,
                 CAST(sum(CASE WHEN par = 0 THEN val_u ELSE 0 END)
                      AS HUGEINT) AS s0,
                 CAST(sum(CASE WHEN par = 1 THEN val_u ELSE 0 END)
                      AS HUGEINT) AS s1
          FROM u GROUP BY label, dim),
    n AS (SELECT label,
                 CAST(count(DISTINCT CASE WHEN par = 0 THEN vec_id END)
                      AS BIGINT) AS n0,
                 CAST(count(DISTINCT CASE WHEN par = 1 THEN vec_id END)
                      AS BIGINT) AS n1
          FROM (SELECT vec_id, vec_id % 2 AS par, label FROM embeddings)
          GROUP BY label),
    g AS (SELECT label,
                 CAST(sum(s0 * s1) AS HUGEINT) AS sxy,
                 CAST(sum(s0 * s0) AS HUGEINT) AS sxx,
                 CAST(sum(s1 * s1) AS HUGEINT) AS syy
          FROM s GROUP BY label)
    SELECT g.label, n.n0, n.n1,
           {dround_sql(
               "CAST(g.sxy AS DOUBLE)"
               " / (sqrt(CAST(g.sxx AS DOUBLE))"
               "    * sqrt(CAST(g.syy AS DOUBLE)))", 6)} AS centroid_cos,
           {dround_sql(
               "(sqrt(CAST(g.sxx AS DOUBLE)) / n.n0)"
               " / (sqrt(CAST(g.syy AS DOUBLE)) / n.n1)", 6)} AS norm_ratio
    FROM g JOIN n ON n.label = g.label
    ORDER BY g.label
    """,
)
def x251_embedding_parity_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding drift between the two vec_id-parity halves of
    the corpus — the stand-in for 'crawl snapshot A vs snapshot B' that
    answers the monitoring question an embedding-backed pipeline must
    keep asking: did the encoder/data shift move the class centroids?
    (cos near 1 + norm_ratio near 1 = stable; either drifting flags
    re-embedding or upstream drift BEFORE the ANN index quietly
    degrades.) Exactness: components quantize to integer micro-units
    (the x157 centroid idiom), and centroid cosine needs NO division by
    counts — cos(c0, c1) equals the cosine of the per-dim SUM vectors,
    so both engines compare exact integer dot products and only the
    final sqrt/divide is IEEE, rounded once. Products ride HUGEINT /
    decimal(38,0) (per-dim sums are corpus-sized). Plan: one
    posexplode pass -> (label, dim) hash agg (|labels| x d rows), then
    a |labels|-row reduction; the parity split is a free map-side
    expression, never a second scan."""
    emb = load(spark, sf_dir, "embeddings")
    u = emb.select(
        (F.col("vec_id") % 2).alias("par"),
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    ).select(
        "par",
        "label",
        "dim",
        F.floor(F.col("v") * 1000000).cast("long").alias("val_u"),
    )
    s = u.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("par") == 0, F.col("val_u")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s0"),
        F.sum(F.when(F.col("par") == 1, F.col("val_u")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s1"),
    )
    n = emb.groupBy("label").agg(
        F.sum((1 - F.col("vec_id") % 2)).cast("long").alias("n0"),
        F.sum(F.col("vec_id") % 2).cast("long").alias("n1"),
    )
    g = s.groupBy("label").agg(
        F.sum(F.col("s0") * F.col("s1")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("s0") * F.col("s0")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("s1") * F.col("s1")).cast("decimal(38,0)").alias("syy"),
    )
    return (
        g.join(F.broadcast(n), "label")
        .select(
            "label",
            "n0",
            "n1",
            dround(
                F.col("sxy").cast("double")
                / (
                    F.sqrt(F.col("sxx").cast("double"))
                    * F.sqrt(F.col("syy").cast("double"))
                ),
                6,
            ).alias("centroid_cos"),
            dround(
                (F.sqrt(F.col("sxx").cast("double")) / F.col("n0"))
                / (F.sqrt(F.col("syy").cast("double")) / F.col("n1")),
                6,
            ).alias("norm_ratio"),
        )
        .orderBy("label")
    )


_PAIR_COS_SQL = dround_sql(
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))", 6
)


@query(
    "x274_knn_hubness_audit",
    oracle=f"""
    WITH h AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                      CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)),
                           1, 15) AS BIGINT) AS hv
               FROM embeddings),
    s AS (SELECT vec_id, v FROM (
            SELECT vec_id, v, row_number() OVER (ORDER BY hv, vec_id) AS rn
            FROM h)
          WHERE rn <= 256),
    p AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                 {_PAIR_COS_SQL} AS c
          FROM s a JOIN s b ON a.vec_id <> b.vec_id),
    r AS (SELECT qid, nid, row_number() OVER
              (PARTITION BY qid ORDER BY c DESC, nid) AS rk
          FROM p),
    deg AS (SELECT s.vec_id,
                   CAST(count(r.qid) AS BIGINT) AS in_degree
            FROM s LEFT JOIN (SELECT qid, nid FROM r WHERE rk <= 5) r
              ON r.nid = s.vec_id
            GROUP BY s.vec_id)
    SELECT in_degree, CAST(count(*) AS BIGINT) AS n_vectors
    FROM deg GROUP BY in_degree ORDER BY in_degree
    """,
)
def x274_knn_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN hubness audit (Radovanovic et al. 2010): the in-degree
    distribution of the directed k=5 cosine-NN graph over a
    DETERMINISTIC 256-vector sample (the x130b md5-clock idiom). In a
    well-conditioned embedding space in-degree concentrates near k; a
    heavy right tail ("hub" vectors that appear in everyone's top-k)
    predicts degraded retrieval precision and biased near-dup clustering
    BEFORE x13/x71 are run — and the fix (centering, whitening) is
    exactly what x275 measures. The left mass at in_degree=0
    ("anti-hubs") is the same pathology's mirror.

    Engine parity: cosine is dround(6)-shared, rank ties break by
    neighbor id, the sample is the md5 clock — no rand() anywhere. Plan:
    the sample is a TakeOrdered(256) over a narrow projection; the pair
    matrix is a broadcast self-join among 256 rows (O(m^2) work,
    INDEPENDENT of corpus size — the corpus contributes one scan); the
    top-5 is a WindowGroupLimit under the per-query rank window; the
    in-degree is one hash agg + a broadcast left join back to the sample
    (zero in-degree rows are REAL rows, not absent). At 100 TB the
    sample stays 256 and the plan cost is the scan — the histogram is
    the deliverable, per x130b's argument. For an exact full-corpus
    hubness census the same rank+count composition rides x13b's LSH
    candidate join instead of the all-pairs block."""
    from ..functions.dedupfns import token_hash60
    from ..functions.simfns import dot, with_vec

    emb = load(spark, sf_dir, "embeddings")
    v = with_vec(emb)
    hv = token_hash60(F.col("vec_id").cast("string"))
    s = (
        v.select("vec_id", "v", hv.alias("hv"))
        .orderBy("hv", "vec_id")
        .limit(256)
        # r16: per-row norms (see x130b) — the 256^2 block ran three
        # 64-element folds per pair on ONE task (1.0s serial, measured);
        # bit-identical doubles, evaluated m not m^2 times
        .select("vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nv"))
    )
    a = s.select(F.col("vec_id").alias("qid"), F.col("v").alias("va"), F.col("nv").alias("na"))
    b = s.select(F.col("vec_id").alias("nid"), F.col("v").alias("vb"), F.col("nv").alias("nb"))
    cos = dround(
        dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        6,
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("nid"))
    top = (
        a.join(F.broadcast(b), F.col("qid") != F.col("nid"))
        .select("qid", "nid", cos.alias("c"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "nid")
    )
    deg = (
        s.select("vec_id")
        .join(F.broadcast(top), s["vec_id"] == top["nid"], "left")
        .groupBy("vec_id")
        .agg(F.count("qid").cast("long").alias("in_degree"))
    )
    return (
        deg.groupBy("in_degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("in_degree")
    )


@query(
    "x275_anisotropy_audit",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    dims AS (SELECT vec_id, CAST(i AS INT) AS i, v[i] AS x
             FROM e, unnest(range(1, len(v) + 1)) t(i)),
    m AS (SELECT i, {dround_sql(
        "CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)", 6)} AS mx
          FROM dims GROUP BY i),
    mv AS (SELECT list(mx ORDER BY i) AS mv FROM m),
    h AS (SELECT vec_id, v,
                 CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)),
                      1, 15) AS BIGINT) AS hv
          FROM e),
    s AS (SELECT vec_id, v FROM (
            SELECT vec_id, v, row_number() OVER (ORDER BY hv, vec_id) AS rn
            FROM h)
          WHERE rn <= 128),
    c AS (SELECT vec_id, v,
                 list_transform(range(1, len(v) + 1),
                                i -> v[i] - mv.mv[i]) AS cv
          FROM s, mv),
    p AS (SELECT {dround_sql(
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * "
        "sqrt(list_dot_product(b.v, b.v)))", 6)} AS cr,
                 {dround_sql(
        "list_dot_product(a.cv, b.cv) / "
        "(sqrt(list_dot_product(a.cv, a.cv)) * "
        "sqrt(list_dot_product(b.cv, b.cv)))", 6)} AS cc
          FROM c a JOIN c b ON a.vec_id < b.vec_id)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           {davg_sql("cr", 6)} AS avg_cos_raw,
           {davg_sql("cc", 6)} AS avg_cos_centered
    FROM p
    """,
)
def x275_anisotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy audit (Ethayarajh 2019; Mu & Viswanath
    2018 'All-but-the-Top'): the average pairwise cosine over a
    deterministic 128-vector sample, RAW versus after subtracting the
    full-corpus mean vector. A large raw average (vectors crowd a narrow
    cone) with a near-zero centered average means cosine thresholds are
    dominated by the common-mean component — near-dup cutoffs (x12f),
    ANN recall (x13), and hubness (x274) all inherit that distortion,
    and mean-centering is the one-line fix this audit justifies.

    Engine parity: the per-dimension mean is the house davg idiom
    (exact DECIMAL(38,6) accumulation, dround(6)) so both engines hold
    bit-identical mean vectors; centered elements are then single IEEE
    subtractions of identical doubles; both cosines are dround(6) before
    the decimal-accumulated average. Plan: ONE posexplode scan + hash
    agg builds the 64-row mean table, array_sort/collect re-packs it
    into a 1-row broadcast (bounded by dim, the registry's <=32K-row
    broadcast rule); the sample is TakeOrdered(128); the pair average is
    a broadcast self-join among 128 rows. Corpus growth touches only the
    mean scan — the O(m^2) block is constant-size at any corpus."""
    from ..functions.dedupfns import token_hash60
    from ..functions.simfns import dot, with_vec

    emb = load(spark, sf_dir, "embeddings")
    v = with_vec(emb).select("vec_id", "v")
    dims = v.select(
        "vec_id", F.posexplode("v").alias("i", "x")
    )
    m = dims.groupBy("i").agg(
        dround(
            F.sum(F.col("x").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mx")
    )
    mean_row = m.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list(named_struct('i', i,"
            " 'mx', mx))), s -> s.mx)"
        ).alias("mv")
    )
    hv = token_hash60(F.col("vec_id").cast("string"))
    s = (
        v.select("vec_id", "v", hv.alias("hv"))
        .orderBy("hv", "vec_id")
        .limit(128)
        .select("vec_id", "v")
        .crossJoin(F.broadcast(mean_row))
        .select(
            "vec_id",
            "v",
            F.zip_with("v", "mv", lambda x, y: x - y).alias("cv"),
        )
        # r16: per-row norms (see x130b) — bit-identical, evaluated m not m^2 times
        .withColumn("nv", F.sqrt(dot(F.col("v"), F.col("v"))))
        .withColumn("nc", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    )
    a = s.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("cv").alias("ca"),
        F.col("nv").alias("na"),
        F.col("nc").alias("nca"),
    )
    b = s.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("cv").alias("cb"),
        F.col("nv").alias("nb"),
        F.col("nc").alias("ncb"),
    )
    cr = dround(
        dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        6,
    )
    cc = dround(
        dot(F.col("ca"), F.col("cb")) / (F.col("nca") * F.col("ncb")),
        6,
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(cr.alias("cr"), cc.alias("cc"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            davg(F.col("cr"), 6).alias("avg_cos_raw"),
            davg(F.col("cc"), 6).alias("avg_cos_centered"),
        )
    )


@query("x283_ann_lsh_topk_centered")  # seed-deterministic; rows-only check
def x283_ann_lsh_topk_centered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x13b's LSH top-3 with MEAN-CENTERED bucketing — the x275
    anisotropy audit ACTED ON (Mu & Viswanath's all-but-the-top, the
    one-line fix that audit exists to justify): hyperplane signs taken
    on (x - corpus_mean) so the common-mean component stops deciding
    every plane, while candidates still rerank on the RAW dround(6)
    cosine (output contract identical to x13b; only candidate
    generation moves). The fixture is near-ISOTROPIC (x275 at sf0.1:
    avg raw cosine 0.0051 vs centered 0.0046), so here centering is
    verified as a SAFE no-op (recall 0.85 vs raw 0.83 at the same
    budget, candidate mass within 0.2%); the win it exists for —
    anisotropic production embedding spaces, where raw planes agree
    with sign(w.mean) and buckets balloon — is demonstrated on a
    PLANTED common-mean corpus in tests/test_similarity.py, where
    centering collapses the candidate mass back to the isotropic
    level at unchanged recall.

    Plan: x13b's plan + one posexplode mean scan (davg-exact, shared
    with x275 via simfns.mean_vector_np — |dim| collected rows); at
    100 TB the mean comes from the same single pass that tags buckets,
    and the candidate join SHRINKS (that is the point)."""
    from ..functions.simfns import lsh_cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_cosine_topk(
        emb, queries, k=3, dim=64, n_planes=4, n_tables=12, center=True
    )


@query("x274b_knn_hubness_full_lsh")  # seed-deterministic; rows-only check
def x274b_knn_hubness_full_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x274's hubness census over the FULL corpus — the path x274's
    docstring promises: the same rank+count composition riding x13b's
    LSH candidate machinery (simfns.lsh_knn_graph) instead of the
    256-sample all-pairs block. Every vector is a query; edges are the
    LSH-candidate top-5 by raw dround(6) cosine; the deliverable is the
    same (in_degree, n_vectors) histogram, now over every vector.
    Vectors whose buckets hold < 5 mates emit fewer out-edges — the
    histogram is of the graph LSH actually builds, which is what hubness
    distorts in production. Cross-checked on the sampled subgraph
    against x274's exact composition in tests/test_similarity.py.

    Plan: one tag pass, one (table, bucket) self-join, WindowGroupLimit
    top-5, one hash agg + left join back for the zero-in-degree rows —
    x12g's cost envelope; nothing corpus-sized broadcasts."""
    from ..functions.simfns import lsh_knn_graph

    # r16: load_parallel — the single-split fixture scan ran the tag UDF
    # AND the broadcast-probe side of the bucket self-join as ONE task
    # (2.1 s serial, measured in the stage table); the guarded repartition
    # spreads candidate production across the session's cores and is a
    # no-op at production split counts.
    emb = load_parallel(spark, sf_dir, "embeddings")
    g = lsh_knn_graph(emb, k=5, n_planes=4, n_tables=12)
    deg = (
        emb.select("vec_id")
        .join(
            g.select(F.col("neighbor_id").alias("vec_id"), "query_id"),
            "vec_id",
            "left",
        )
        .groupBy("vec_id")
        .agg(F.count("query_id").cast("long").alias("in_degree"))
    )
    return (
        deg.groupBy("in_degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("in_degree")
    )


_ABTT_COS_RAW = dround_sql(
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))",
    6,
)
_ABTT_COS_CEN = dround_sql(
    "list_dot_product(a.cv, b.cv) / "
    "(sqrt(list_dot_product(a.cv, a.cv)) * "
    "sqrt(list_dot_product(b.cv, b.cv)))",
    6,
)
_ABTT_COS_PV = dround_sql(
    "list_dot_product(a.pv, b.pv) / "
    "(sqrt(list_dot_product(a.pv, a.pv)) * "
    "sqrt(list_dot_product(b.pv, b.pv)))",
    6,
)


@query(
    "x286_all_but_top_audit",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    dims AS (SELECT vec_id, CAST(i AS INT) AS i, v[i] AS x
             FROM e, unnest(range(1, len(v) + 1)) t(i)),
    m AS (SELECT i, {dround_sql(
        "CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)", 6)} AS mx
          FROM dims GROUP BY i),
    mv AS (SELECT list(mx ORDER BY i) AS mv FROM m),
    c0 AS (SELECT vec_id,
                  list_transform(range(1, len(v) + 1),
                                 i -> v[i] - mv.mv[i]) AS cv,
                  v
           FROM e, mv),
    u0 AS (SELECT vec_id, generate_subscripts(cv, 1) - 1 AS d,
                  unnest(cv) AS val
           FROM c0),
    p AS (SELECT a.d AS i, b.d AS j,
                 CAST(a.val * b.val AS DECIMAL(38,6)) AS xy
          FROM u0 a JOIN u0 b ON a.vec_id = b.vec_id),
    g AS (SELECT i, j, CAST(sum(xy) * 1000000 AS HUGEINT) AS g
          FROM p GROUP BY 1, 2),
    w1 AS (SELECT i AS d, CAST(sum(g * 1000000) AS HUGEINT) AS w
           FROM g GROUP BY 1),
    m1 AS (SELECT max(abs(w)) AS m FROM w1),
    v1 AS (SELECT d, (CASE WHEN w < 0 THEN -1 ELSE 1 END)
                     * (abs(w) * 1000000 // m) AS val FROM w1, m1),
    w2 AS (SELECT g.i AS d, CAST(sum(g.g * v1.val) AS HUGEINT) AS w
           FROM g JOIN v1 ON g.j = v1.d GROUP BY 1),
    m2 AS (SELECT max(abs(w)) AS m FROM w2),
    v2 AS (SELECT d, (CASE WHEN w < 0 THEN -1 ELSE 1 END)
                     * (abs(w) * 1000000 // m) AS val FROM w2, m2),
    w3 AS (SELECT g.i AS d, CAST(sum(g.g * v2.val) AS HUGEINT) AS w
           FROM g JOIN v2 ON g.j = v2.d GROUP BY 1),
    m3 AS (SELECT max(abs(w)) AS m FROM w3),
    v3 AS (SELECT d, (CASE WHEN w < 0 THEN -1 ELSE 1 END)
                     * (abs(w) * 1000000 // m) AS val FROM w3, m3),
    uu AS (SELECT list_transform(list(val ORDER BY d),
                                 x -> CAST(x AS DOUBLE) / 1000000) AS ud
           FROM v3),
    h AS (SELECT vec_id, v, cv,
                 CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)),
                      1, 15) AS BIGINT) AS hv
          FROM c0),
    s AS (SELECT vec_id, v, cv FROM (
            SELECT vec_id, v, cv, row_number() OVER (ORDER BY hv, vec_id)
                AS rn FROM h)
          WHERE rn <= 128),
    pr AS (SELECT vec_id, v, cv,
                  {dround_sql(
        "list_dot_product(cv, uu.ud) / list_dot_product(uu.ud, uu.ud)", 6)}
                      AS c
           FROM s, uu),
    pj AS (SELECT vec_id, v, cv,
                  list_transform(range(1, len(cv) + 1),
                                 i -> cv[i] - c * uu.ud[i]) AS pv
           FROM pr, uu),
    p2 AS (SELECT {_ABTT_COS_RAW} AS cr, {_ABTT_COS_CEN} AS cc,
                  {_ABTT_COS_PV} AS cp
           FROM pj a JOIN pj b ON a.vec_id < b.vec_id)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           {davg_sql("cr", 6)} AS avg_cos_raw,
           {davg_sql("cc", 6)} AS avg_cos_centered,
           {davg_sql("cp", 6)} AS avg_cos_abtt
    FROM p2
    """,
)
def x286_all_but_top_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE All-but-the-Top audit (Mu & Viswanath 2018): x275
    measures mean-centering; this adds the second half — remove the top
    principal direction of the CENTERED corpus and measure the average
    pairwise cosine at all three stages (raw / centered / centered minus
    PC1) over the same deterministic 128-sample. A centered average near
    zero but an abtt average even closer (or a large drop between them)
    says the residual crowding lives in one dominant direction — the
    evidence that picks centering alone vs full abtt preprocessing for
    the ANN/near-dup thresholds upstream (x283/x284 implement the
    centering half; the PC1 step is the corresponding next fix).

    Exactness: the mean is the davg idiom (x275); PC1 is x203's THREE
    unrolled integer-ppm power iterations applied to the 64x64 Gram of
    the CENTERED corpus — every matvec in decimal/HUGEINT, renorm by
    sign-safe floor division, so both engines hold the bit-identical
    eigenvector; the projection coefficient c = <cv,u>/<u,u> is
    dround(6) BEFORE use in both engines, so the projected vectors are
    identical doubles (the <= 1e-6 residual vs the unrounded projection
    is far below the audit's 6-decimal resolution and buys airtight
    parity); all three cosines are dround(6) then decimal-averaged.

    Plan at 100 TB: ONE posexplode scan for the mean, ONE posexplode
    self-join scan for the Gram (simfns.gram_ppm_rows — whole-stage-
    codegen'd, map-side partial agg to 2080 rows), and a constant-size
    128-sample pair block. Corpus growth touches only the two scans.

    BUILD-TIME SIDE EFFECT (deliberate; the r13-ADVICE pattern, noted
    per the r14 verdict — r15 reshaped it): constructing this DataFrame
    runs TWO bounded jobs — the |dim|-row mean collect and the 2080-row
    Gram collect (simfns.mean_vector_np / gram_ppm_dict) — and replays
    the three power iterations in Python ints (_pc1_power_ppm), which
    tests/test_similarity.py pins bit-identical to the former in-plan
    decimal iteration (and the DuckDB oracle still runs its own decimal
    iteration, so the cross-engine check is intact). This replaces the
    r14 shape's eager Gram localCheckpoint + 3 per-iteration
    checkpoints: ~25 driver job rounds per construction became 2, and
    the 2080-row mirror/iteration joins left the per-rep plan entirely.
    The x287 abtt bucketing shares the exact same helpers."""
    from ..functions.dedupfns import token_hash60
    from ..functions.simfns import (
        _pc1_power_ppm,
        dot,
        gram_ppm_dict,
        mean_vector_np,
        with_vec,
    )

    # r15 optimization (guide §2.4/§2.5): load_parallel spreads the Gram
    # scan (single-row-group fixtures would run it as ONE task); the mean
    # and eigenvector are bounded driver-side values (64 + 2080 rows) and
    # enter the sample plan as LITERAL arrays — identical doubles, pinned
    # by the oracle at every SF.
    emb = load_parallel(spark, sf_dir, "embeddings")
    mean = mean_vector_np(emb)
    u = _pc1_power_ppm(gram_ppm_dict(emb, mean=mean, presplit=True))
    mv = F.array(*[F.lit(float(x)) for x in mean])
    ud_lit = F.array(*[F.lit(float(x)) for x in u])
    v = with_vec(emb).select("vec_id", "v")
    c0 = v.select(
        "vec_id",
        "v",
        F.zip_with("v", mv, lambda x, y: x - y).alias("cv"),
    )
    hv = token_hash60(F.col("vec_id").cast("string"))
    s = (
        c0.select("vec_id", "v", "cv", hv.alias("hv"))
        .orderBy("hv", "vec_id")
        .limit(128)
        .withColumn("ud", ud_lit)
    )
    c = dround(
        dot(F.col("cv"), F.col("ud")) / dot(F.col("ud"), F.col("ud")), 6
    )
    # two-step select: materialize c as a plain column first so the
    # transform lambda multiplies by a same-row scalar column
    pj = (
        s.withColumn("c", c)
        .select(
            "vec_id",
            "v",
            "cv",
            F.zip_with(
                "cv",
                F.expr("transform(ud, x -> x * c)"),
                lambda x, y: x - y,
            ).alias("pv"),
        )
    )
    # r16: per-row norms (see x130b) — the 128^2 block ran six
    # 64-element folds per pair; bit-identical doubles, evaluated m not
    # m^2 times
    pj = (
        pj.withColumn("nv", F.sqrt(dot(F.col("v"), F.col("v"))))
        .withColumn("ncv", F.sqrt(dot(F.col("cv"), F.col("cv"))))
        .withColumn("npv", F.sqrt(dot(F.col("pv"), F.col("pv"))))
    )
    a = pj.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("cv").alias("ca"),
        F.col("pv").alias("pa"),
        F.col("nv").alias("nva"),
        F.col("ncv").alias("nca"),
        F.col("npv").alias("npa"),
    )
    b = pj.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("cv").alias("cb"),
        F.col("pv").alias("pb"),
        F.col("nv").alias("nvb"),
        F.col("ncv").alias("ncb"),
        F.col("npv").alias("npb"),
    )

    def cos(x, y, nx, ny):
        return dround(
            dot(F.col(x), F.col(y)) / (F.col(nx) * F.col(ny)),
            6,
        )

    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            cos("va", "vb", "nva", "nvb").alias("cr"),
            cos("ca", "cb", "nca", "ncb").alias("cc"),
            cos("pa", "pb", "npa", "npb").alias("cp"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            davg(F.col("cr"), 6).alias("avg_cos_raw"),
            davg(F.col("cc"), 6).alias("avg_cos_centered"),
            davg(F.col("cp"), 6).alias("avg_cos_abtt"),
        )
    )
