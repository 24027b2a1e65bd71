"""Similarity search: LSH recall vs brute force; brute-force sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.functions.simfns import (
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
)


def test_bruteforce_topk_shape_and_order(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk(emb, queries, k=3).toPandas()
    assert len(out) == 5 * 3
    for _, grp in out.groupby("query_id"):
        assert list(grp["rank"]) == [1, 2, 3]
        assert list(grp["cos_sim"]) == sorted(grp["cos_sim"], reverse=True)
        assert (grp["neighbor_id"] != grp["query_id"].iloc[0]).all()


def test_lsh_recall_at_k(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=3).toPandas()
    approx = lsh_cosine_topk(emb, queries, k=3, n_planes=4, n_tables=12).toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall@3 = {recall:.2f}"


def test_lsh_pairs_subset_and_recall(spark, sf_dir):
    """lsh_cosine_pairs: every returned pair is a true near-dup pair (exact
    verify => precision 1.0), and recall vs exact all-pairs holds."""
    from kafka_connect_spark.functions.simfns import cosine_pairs, lsh_cosine_pairs

    emb = load(spark, sf_dir, "embeddings")
    exact = {(r.id_a, r.id_b) for r in cosine_pairs(emb, 0.4).collect()}
    approx = {(r.id_a, r.id_b) for r in lsh_cosine_pairs(emb, 0.4, n_planes=3, n_tables=16).collect()}
    assert approx <= exact  # precision 1.0 by construction
    assert exact, "fixture must contain near-dup pairs at 0.4"
    recall = len(approx) / len(exact)
    assert recall >= 0.5, f"LSH pair recall = {recall:.2f}"


def test_ivf_recall_at_k(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=3).toPandas()
    approx = ivf_cosine_topk(emb, queries, k=3, n_centroids=16, n_probe=8).toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    # k-means centroids (vs seeded-random) lifted recall ~0.72 -> ~0.83 at
    # n_probe=8 on the worst-case uniform-random fixture; bound locks that in
    assert recall >= 0.65, f"IVF recall@3 = {recall:.2f}"


def test_blocked_pairs_equal_fold_pairs(spark, sf_dir):
    """Block-matrix all-pairs == JVM-fold all-pairs (same ids, cosines
    within rounding) — the vectorized plan changes nothing but speed."""
    from kafka_connect_spark.functions.simfns import cosine_pairs, cosine_pairs_blocked

    emb = load(spark, sf_dir, "embeddings")
    a = cosine_pairs(emb, 0.3).toPandas().sort_values(["id_a", "id_b"], ignore_index=True)
    b = (
        cosine_pairs_blocked(emb, 0.3, n_blocks=4)
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    assert list(a["id_a"]) == list(b["id_a"]) and list(a["id_b"]) == list(b["id_b"])
    assert (abs(a["cos_sim"] - b["cos_sim"]) < 2e-6).all()


def test_lsh_is_deterministic(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    a = lsh_cosine_topk(emb, queries, k=3).toPandas()
    b = lsh_cosine_topk(emb, queries, k=3).toPandas()
    assert a.equals(b)


def test_kmeans_refine_deterministic_and_recall(spark, sf_dir):
    """Distributed Lloyd refinement: bit-reproducible run-to-run (decimal
    component sums — partitioning can't shift the codebook) and IVF recall
    with the refined whole-corpus codebook at least matches the
    sample-only codebook."""
    import numpy as np

    from kafka_connect_spark.functions.simfns import (
        kmeans_centroids,
        kmeans_refine_distributed,
    )

    emb = load(spark, sf_dir, "embeddings")
    base = kmeans_centroids(emb, 16)
    r1 = kmeans_refine_distributed(emb, base, iters=2)
    r2 = kmeans_refine_distributed(emb.repartition(7), base, iters=2)
    assert np.array_equal(r1, r2)  # bit-identical despite repartitioning
    assert not np.array_equal(r1, base)  # it actually moved the codebook

    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=3).toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}

    def recall(cents):
        approx = ivf_cosine_topk(
            emb, queries, k=3, centroids=cents, n_probe=8
        ).toPandas()
        a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
        return len(e & a) / len(e)

    assert recall(r1) >= recall(base) - 0.05  # refinement never hurts (tol)


def test_semantic_dedup_precision_determinism_recall(spark, sf_dir):
    """semantic_dedup: (1) every dropped vector has a true lower-id
    near-neighbor at the threshold (precision 1.0 — within-cluster pairs
    are a subset of the exact pair set); (2) the kept set is
    run-deterministic; (3) recall vs the exact greedy keep-first over ALL
    pairs stays above the cross-cluster-miss floor."""
    from kafka_connect_spark.functions.simfns import cosine_pairs, semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, 0.4, n_clusters=8).toPandas().sort_values("id")
    out2 = semantic_dedup(emb, 0.4, n_clusters=8).toPandas().sort_values("id")
    assert out.reset_index(drop=True).equals(out2.reset_index(drop=True))

    pairs = cosine_pairs(emb, 0.4).collect()
    has_lower = {}
    for r in pairs:  # id_a < id_b by contract
        has_lower.setdefault(r.id_b, set()).add(r.id_a)
    dropped = set(out[~out["keep"]]["id"])
    for d in dropped:
        assert d in has_lower, f"dropped {d} has no exact near-neighbor"

    # exact greedy keep-first over the full pair graph = recall reference
    exact_dropped = set()
    for r in sorted(pairs, key=lambda r: (r.id_b, r.id_a)):
        if r.id_a not in exact_dropped:
            exact_dropped.add(r.id_b)
    assert exact_dropped, "fixture must contain near-dup pairs at 0.4"
    recall = len(dropped & exact_dropped) / len(exact_dropped)
    assert recall >= 0.3, f"semantic dedup recall = {recall:.2f}"


def test_mips_brute_vs_cosine_differ(spark):
    """MIPS ranks by magnitude where cosine normalizes it away: a long
    slightly-misaligned vector must beat a short perfectly-aligned one
    under inner product, and lose under cosine."""
    from kafka_connect_spark.functions.simfns import cosine_topk, mips_topk_brute

    rows = [
        (0, [1.0, 0.0]),       # query
        (1, [0.5, 0.0]),       # short, perfectly aligned: cosine winner
        (2, [10.0, 3.0]),      # long, slightly off-axis: MIPS winner
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    ip = mips_topk_brute(df, q, k=1).collect()
    cos = cosine_topk(df, q, k=1).collect()
    assert ip[0].neighbor_id == 2 and ip[0].ip == 10.0
    assert cos[0].neighbor_id == 1


def test_mips_brute_ranks_descending(spark, sf_dir):
    from kafka_connect_spark.functions.simfns import mips_topk_brute

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    ip = mips_topk_brute(emb, queries, k=3).toPandas()
    assert len(ip) == 60
    for _, grp in ip.groupby("query_id"):
        assert list(grp["rank"]) == [1, 2, 3]
        assert list(grp["ip"]) == sorted(grp["ip"], reverse=True)


def test_mips_lsh_recall_and_determinism(spark, sf_dir):
    from kafka_connect_spark.functions.simfns import mips_topk_brute, mips_topk_lsh

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = mips_topk_brute(emb, queries, k=3).toPandas()
    a1 = mips_topk_lsh(emb, queries, k=3, n_tables=16).toPandas()
    a2 = mips_topk_lsh(emb, queries, k=3, n_tables=16).toPandas()
    assert a1.equals(a2)  # seed-deterministic
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in a1.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"augmented-LSH MIPS recall@3 = {recall:.2f}"


def test_pq_recall_and_determinism(spark, sf_dir):
    from kafka_connect_spark.functions.simfns import pq_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=3).toPandas()
    a1 = pq_topk(emb, queries, k=3).toPandas()
    a2 = pq_topk(emb, queries, k=3).toPandas()
    assert a1.equals(a2)  # seeded codebooks + deterministic ADC/selection
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in a1.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"PQ-ADC recall@3 = {recall:.2f}"
    for _, grp in a1.groupby("query_id"):
        assert list(grp["rank"]) == [1, 2, 3]


def test_x154_matches_mapinpandas_xtx(spark, sf_dir):
    """x154's exact-decimal 8-dim correlations agree with the full d x d
    single-pass mapInPandas X^T X path (the 100 TB shape its docstring
    promises) to well inside the decimal-rounding tolerance."""
    from kafka_connect_spark.functions.simfns import correlation_matrix
    from kafka_connect_spark.queries.similarity import x154_dim_correlation

    got = x154_dim_correlation(spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corr, n = correlation_matrix(emb)
    assert n == emb.count()
    for _, row in got.iterrows():
        i, j = int(row["dim_i"]), int(row["dim_j"])
        assert abs(corr[i, j] - row["corr"]) < 1e-3, (i, j)


def test_x157_silhouette_invariants(spark, sf_dir):
    """Silhouette values are bounded in [-1, 1] and the synthetic labeled
    clusters are coherent (positive average silhouette overall)."""
    from kafka_connect_spark.queries.similarity import x157_label_silhouette

    got = x157_label_silhouette(spark, sf_dir).toPandas()
    assert len(got) == 10
    assert (got["avg_silhouette"] <= 1.0).all()
    assert (got["avg_silhouette"] >= -1.0).all()
    assert (got["n_misplaced"] <= got["n_vectors"]).all()


def test_x152_truncation_err_nonnegative(spark, sf_dir):
    from kafka_connect_spark.queries.similarity import x152_dim_truncation_fidelity

    got = x152_dim_truncation_fidelity(spark, sf_dir).toPandas()
    assert got["n_pairs"].sum() == 128 * 127 // 2
    assert (got["avg_abs_err"] >= 0).all()
    assert (got["max_abs_err"] >= got["avg_abs_err"] - 1e-9).all()


def test_knn_candidates_blocked_nonint_extra_cols(spark, sf_dir):
    """extra_cols with string/double types keep their source Spark type
    (regression: the output schema used to hard-code long)."""
    from kafka_connect_spark.functions.simfns import knn_candidates_blocked

    emb = (
        load(spark, sf_dir, "embeddings")
        .limit(64)
        .withColumn("tag", F.concat(F.lit("g"), (F.col("label") % 3).cast("string")))
        .withColumn("w", F.col("label") * 0.5)
    )
    out = knn_candidates_blocked(
        emb, k=3, extra_cols=["tag", "w"], n_blocks=4
    )
    types = dict(out.dtypes)
    assert types["tag_q"] == "string" and types["tag_n"] == "string"
    assert types["w_q"] == "double" and types["w_n"] == "double"
    pdf = out.toPandas()
    assert len(pdf) > 0
    assert set(pdf["tag_q"]) <= {"g0", "g1", "g2"}
    assert (pdf["w_q"] * 2 % 1 == 0).all()


def test_semantic_dedup_blocked_path_reproduces_one_group_keep_set(spark, sf_dir):
    """Forcing fixture clusters through the oversized-cluster block path
    (max_cluster_rows far below every cluster size) yields the EXACT keep
    set of the one-group greedy — the skew path is a plan change, not a
    semantics change."""
    from kafka_connect_spark.functions.simfns import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    one = sorted(
        tuple(r) for r in semantic_dedup(emb, 0.4, n_clusters=8).collect()
    )
    blk = sorted(
        tuple(r)
        for r in semantic_dedup(
            emb, 0.4, n_clusters=8, max_cluster_rows=30, block_rows=16
        ).collect()
    )
    assert one == blk
    assert len(one) == emb.count()
    # the forced run really exercised multi-round blocking: clusters of
    # 500/8 ~ 62 rows cut into 16-row blocks => >= 2 rounds
    assert any(not k for (_, _, k) in one)


def _recall_vs_exact(exact_df, approx_df):
    e = {(r.query_id, r.neighbor_id) for r in exact_df.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx_df.itertuples()}
    return len(e & a) / len(e)


def _candidate_pair_mass(spark, emb, n_planes, n_tables, center, abtt=False):
    """Sum over (table, bucket) of C(n, 2): the pairs an LSH join at this
    budget actually probes — the denominator of the centered-vs-raw
    comparison. Uses the UDF-closure form of the preprocessing, which
    test_centered_hv_matches_udf_closure pins equal to the production
    in-plan path."""
    import numpy as np

    from kafka_connect_spark.functions.simfns import (
        _bucket_udf,
        mean_vector_np,
        pc1_vector_np,
    )

    mean = mean_vector_np(emb) if (center or abtt) else None
    u = pc1_vector_np(emb, mean=mean) if abtt else None
    planes = np.random.RandomState(42).randn(n_tables, n_planes, 64)
    bucketize = _bucket_udf(planes, mean, u)
    tagged = (
        emb.withColumn("_bk", bucketize(F.col("embedding").cast("array<double>")))
        .select(
            F.explode(
                F.transform(
                    F.col("_bk"),
                    lambda b, i: F.struct(i.alias("table"), b.alias("bucket")),
                )
            ).alias("tb")
        )
        .groupBy("tb.table", "tb.bucket")
        .count()
    )
    return tagged.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2)
    ).collect()[0][0]


def test_centered_lsh_noop_on_isotropic_fixture(spark, sf_dir):
    """The fixture is near-isotropic (x275: avg cosine ~0.005), so
    centering must be a near-no-op on candidate mass — within 2% at the
    identical (planes, tables) budget. This pins the SAFETY half of the
    x283/x284 claim; the anisotropic win is the planted test below."""
    emb = load(spark, sf_dir, "embeddings")
    raw = _candidate_pair_mass(spark, emb, 4, 12, center=False)
    cen = _candidate_pair_mass(spark, emb, 4, 12, center=True)
    assert abs(cen - raw) / raw < 0.02, f"centered {cen} vs raw {raw}"


def test_centered_lsh_collapses_planted_anisotropy(spark, sf_dir):
    """The x275 pathology, PLANTED: add a large common-mean component to
    every vector (the crowded-cone geometry of real embedding spaces).
    Raw hyperplanes then mostly agree with sign(w . mean) — buckets
    balloon and candidate mass explodes; centered bucketing must
    collapse it back near the isotropic level, while exact top-k
    neighbors (raw cosine on the shifted vectors) stay recoverable at
    the same budget."""
    emb = load(spark, sf_dir, "embeddings")
    # shift: +4.0 on every dimension (vectors are ~unit-scale entries,
    # so the mean dominates every individual vector's own direction)
    shifted = emb.withColumn(
        "embedding",
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x + F.lit(4.0)
        ),
    )
    raw = _candidate_pair_mass(spark, shifted, 4, 12, center=False)
    cen = _candidate_pair_mass(spark, shifted, 4, 12, center=True)
    iso = _candidate_pair_mass(spark, emb, 4, 12, center=False)
    assert raw > 3 * iso, f"planting failed to balloon buckets: {raw} vs {iso}"
    assert cen < raw / 2, f"centering failed to collapse: {cen} vs {raw}"
    assert cen < 2 * iso, f"centered mass {cen} far above isotropic {iso}"
    # recall on the shifted corpus at the same budget: centered must at
    # least match raw (raw's buckets are huge AND uninformative)
    q = shifted.filter(F.col("vec_id") < 20)
    exact = cosine_topk(shifted, q, k=3).toPandas()
    r_raw = _recall_vs_exact(
        exact, lsh_cosine_topk(shifted, q, k=3, n_planes=4, n_tables=12).toPandas()
    )
    r_cen = _recall_vs_exact(
        exact,
        lsh_cosine_topk(
            shifted, q, k=3, n_planes=4, n_tables=12, center=True
        ).toPandas(),
    )
    assert r_cen >= 0.5, f"centered recall {r_cen:.2f} (raw {r_raw:.2f})"


def test_centered_lsh_recall_reported_vs_raw(spark, sf_dir):
    """Centered-vs-raw recall at the SAME candidate budget (x283 vs
    x13b). Centering trades the raw variant's giant-bucket free recall
    for real pruning; the floor asserts the trade stays usable."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=3).toPandas()
    raw = lsh_cosine_topk(emb, queries, k=3, n_planes=4, n_tables=12).toPandas()
    cen = lsh_cosine_topk(
        emb, queries, k=3, n_planes=4, n_tables=12, center=True
    ).toPandas()
    r_raw = _recall_vs_exact(exact, raw)
    r_cen = _recall_vs_exact(exact, cen)
    # both recalls land in the committed artifact via this assertion
    # message when it ever trips
    assert r_cen >= 0.5, f"centered recall@3 = {r_cen:.2f} (raw {r_raw:.2f})"


def test_centered_pairs_precision_and_recall(spark, sf_dir):
    """x284: centered bucketing keeps the verify contract (subset of the
    exact pairs => precision 1.0) and a usable recall at x12g's budget."""
    from kafka_connect_spark.functions.simfns import cosine_pairs, lsh_cosine_pairs

    emb = load(spark, sf_dir, "embeddings")
    exact = {(r.id_a, r.id_b) for r in cosine_pairs(emb, 0.4).collect()}
    cen = {
        (r.id_a, r.id_b)
        for r in lsh_cosine_pairs(
            emb, 0.4, n_planes=3, n_tables=16, center=True
        ).collect()
    }
    assert cen <= exact
    assert exact
    recall = len(cen) / len(exact)
    assert recall >= 0.5, f"centered LSH pair recall = {recall:.2f}"


def test_centered_hv_matches_udf_closure(spark, sf_dir):
    """r15 laziness change (r14 ADVICE): the in-plan centering path
    (mean_vector_col broadcast + zip_with) must assign the IDENTICAL
    bucket ids the old UDF-closure path (mean_vector_np subtracted
    inside the pandas UDF) did — float64 x - m either way — so every
    center=True output (x283/x284/x274b) is unchanged by the rework."""
    import numpy as np

    from kafka_connect_spark.functions.simfns import (
        _bucket_udf,
        _centered_hv,
        mean_vector_col,
        mean_vector_np,
    )

    emb = load(spark, sf_dir, "embeddings")
    planes = np.random.RandomState(42).randn(6, 4, 64)
    old = emb.withColumn(
        "_bk",
        _bucket_udf(planes, mean_vector_np(emb))(
            F.col("embedding").cast("array<double>")
        ),
    )
    new = _centered_hv(emb, "embedding", mean_vector_col(emb)).withColumn(
        "_bk", _bucket_udf(planes)(F.col("_hv"))
    )
    o = {r.vec_id: list(r._bk) for r in old.select("vec_id", "_bk").collect()}
    n = {r.vec_id: list(r._bk) for r in new.select("vec_id", "_bk").collect()}
    assert o == n


def test_center_builder_runs_no_job(spark, sf_dir):
    """Building a center=True LSH query (explicit n_planes) must be
    side-effect-free — the r14 ADVICE finding this round fixed: plan
    dumps and registry sweeps construct every query, and a build-time
    collect turns each construction into a Spark job."""
    from kafka_connect_spark.functions.simfns import (
        lsh_cosine_pairs,
        lsh_cosine_topk,
        lsh_knn_graph,
    )

    emb = load(spark, sf_dir, "embeddings")
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup(None))
    lsh_cosine_pairs(emb, 0.4, n_planes=3, n_tables=4, center=True)
    lsh_cosine_topk(emb, emb.limit(5), k=3, n_planes=4, n_tables=4, center=True)
    lsh_knn_graph(emb, k=3, n_planes=4, n_tables=4, center=True)
    after = set(st.getJobIdsForGroup(None))
    assert before == after, f"builder ran jobs: {sorted(after - before)}"


def test_pc1_ppm_matches_spark_decimal_replay(spark, sf_dir):
    """simfns.pc1_vector_np replays x286's integer-ppm power iteration
    in Python ints; this pins it BIT-IDENTICAL to the Spark decimal
    plan: same Gram rows pushed back through x286's exact iteration
    expressions (decimal(38,0) sums, sign-safe floor div renorm), same
    final vector."""
    import numpy as np

    from kafka_connect_spark.functions.simfns import (
        _pc1_power_ppm,
        gram_ppm_dict,
    )

    emb = load(spark, sf_dir, "embeddings")
    gh = gram_ppm_dict(emb)
    upy = _pc1_power_ppm(gh)

    rows = [(i, j, str(g)) for (i, j), g in gh.items()]
    g_half = spark.createDataFrame(rows, "i int, j int, gs string").select(
        "i", "j", F.col("gs").cast("decimal(38,0)").alias("g")
    )
    g = g_half.unionAll(
        g_half.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "g"
        )
    )
    sgn = F.when(F.col("w") < 0, F.lit(-1)).otherwise(F.lit(1))
    renorm = (
        sgn.cast("decimal(38,0)")
        * F.expr("abs(w) * 1000000 div m").cast("decimal(38,0)")
    ).alias("val")
    vit = g.groupBy(F.col("i").alias("d")).agg(
        F.sum(F.col("g") * F.lit(1_000_000)).cast("decimal(38,0)").alias("w")
    )
    vn = None
    for _ in range(3):
        vit = vit.localCheckpoint(eager=True)
        mx = vit.agg(F.max(F.abs(F.col("w"))).alias("m"))
        vn = vit.crossJoin(F.broadcast(mx)).select("d", renorm)
        vit = (
            g.join(F.broadcast(vn), g["j"] == vn["d"])
            .groupBy(F.col("i").alias("d"))
            .agg(
                F.sum(F.col("g") * F.col("val"))
                .cast("decimal(38,0)")
                .alias("w")
            )
        )
    us = np.zeros(64)
    for r in vn.collect():
        us[r["d"]] = float(r["val"]) / 1e6
    assert np.array_equal(us, upy)


def _plant_pc1(emb):
    """A ZERO-MEAN dominant direction: +-32 * p (p = ones/8, so +-4 per
    dimension) by vec_id parity. The corpus mean is unchanged (the
    coefficients cancel exactly over the fixture's even id count), so
    mean-centering CANNOT see the planted structure — only PC1 removal
    can. This is the geometry x286 exists to detect: anisotropy in the
    covariance, not the mean."""
    signed = F.when(F.col("vec_id") % 2 == 0, F.lit(4.0)).otherwise(
        F.lit(-4.0)
    )
    return emb.withColumn(
        "embedding",
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x + signed
        ),
    )


def test_abtt_collapses_planted_pc1(spark, sf_dir):
    """The x287 claim, measured: on a planted-PC1 corpus (zero-mean
    dominant direction) centering leaves the candidate mass ballooned —
    the mean is unchanged so centered == raw here — while abtt
    (PC1-projection removal) collapses it back near the isotropic
    level at the identical (planes, tables) budget, with exact top-k
    still recoverable. Also pins that pc1_vector_np RECOVERS the
    planted direction (the 3-iteration power method converges when the
    eigengap is real — on the near-isotropic fixture the direction is
    ill-defined by construction and no directional claim is made)."""
    import numpy as np

    from kafka_connect_spark.functions.simfns import (
        lsh_cosine_topk,
        mean_vector_np,
        pc1_vector_np,
    )

    emb = load(spark, sf_dir, "embeddings")
    planted = _plant_pc1(emb)
    # the planted coefficients cancel: the mean is (near) the original —
    # up to one 1e-6 grid step where the float +-4.0 shift flips a
    # decimal(38,6) rounding tie
    m0 = mean_vector_np(emb)
    m1 = mean_vector_np(planted)
    assert float(np.max(np.abs(m1 - m0))) < 2e-6
    # pc1 recovers the planted direction p = ones/8
    u = pc1_vector_np(planted)
    p = np.ones(64) / 8.0
    cos_up = abs(float(u @ p) / (np.linalg.norm(u) * np.linalg.norm(p)))
    assert cos_up > 0.99, f"pc1 missed the planted direction: {cos_up:.4f}"

    iso = _candidate_pair_mass(spark, emb, 4, 12, center=False)
    cen = _candidate_pair_mass(spark, planted, 4, 12, center=True)
    ab = _candidate_pair_mass(spark, planted, 4, 12, center=False, abtt=True)
    assert cen > 3 * iso, f"planting failed to balloon buckets: {cen} vs {iso}"
    assert ab < cen / 2, f"abtt failed to collapse: {ab} vs centered {cen}"
    assert ab < 2 * iso, f"abtt mass {ab} far above isotropic {iso}"
    # recall at the same budget: abtt must stay usable where centered
    # buckets are huge AND uninformative
    q = planted.filter(F.col("vec_id") < 20)
    exact = cosine_topk(planted, q, k=3).toPandas()
    r_cen = _recall_vs_exact(
        exact,
        lsh_cosine_topk(
            planted, q, k=3, n_planes=4, n_tables=12, center=True
        ).toPandas(),
    )
    r_ab = _recall_vs_exact(
        exact,
        lsh_cosine_topk(
            planted, q, k=3, n_planes=4, n_tables=12, abtt=True
        ).toPandas(),
    )
    assert r_ab >= 0.5, f"abtt recall {r_ab:.2f} (centered {r_cen:.2f})"


def test_abtt_noop_on_isotropic_fixture(spark, sf_dir):
    """x287's SAFETY half, measured on the fixture (near-isotropic, no
    dominant direction — x286: avg centered cosine ~= avg abtt cosine):
    abtt candidate mass within 5% of centered at the identical budget,
    and pair recall vs exact within a few points of x284's."""
    from kafka_connect_spark.functions.simfns import (
        cosine_pairs,
        lsh_cosine_pairs,
    )

    emb = load(spark, sf_dir, "embeddings")
    cen = _candidate_pair_mass(spark, emb, 4, 12, center=True)
    ab = _candidate_pair_mass(spark, emb, 4, 12, center=False, abtt=True)
    assert abs(ab - cen) / cen < 0.05, f"abtt {ab} vs centered {cen}"
    exact = {(r.id_a, r.id_b) for r in cosine_pairs(emb, 0.4).collect()}
    got = {
        (r.id_a, r.id_b)
        for r in lsh_cosine_pairs(
            emb, 0.4, n_planes=3, n_tables=16, abtt=True
        ).collect()
    }
    assert got <= exact  # precision 1.0 by construction (raw verify)
    recall = len(got) / len(exact)
    assert recall >= 0.5, f"abtt LSH pair recall = {recall:.2f}"


def test_x274b_full_hubness_agrees_on_sample(spark, sf_dir):
    """x274b's LSH graph vs the exact graph, cross-checked where the
    exact answer exists: (1) the histogram is a partition of the corpus
    with <= 5k total edges; (2) for x274's 256 sampled vectors, the LSH
    top-5 over the FULL corpus hits a recall floor vs the exact
    full-corpus top-5 (brute force) — the sample is where the two
    compositions meet."""
    from kafka_connect_spark.functions.dedupfns import token_hash60
    from kafka_connect_spark.functions.simfns import lsh_knn_graph
    from kafka_connect_spark.queries import QUERIES

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    hist = QUERIES["x274b_knn_hubness_full_lsh"](spark, sf_dir).toPandas()
    assert hist["n_vectors"].sum() == n  # every vector has a row
    edges = (hist["in_degree"] * hist["n_vectors"]).sum()
    assert 0 < edges <= 5 * n
    # sampled cross-check
    sample = (
        emb.withColumn("hv", token_hash60(F.col("vec_id").cast("string")))
        .orderBy("hv", "vec_id")
        .limit(256)
        .drop("hv")
    )
    exact = cosine_topk(emb, sample, k=5).toPandas()
    g = lsh_knn_graph(emb, k=5, n_planes=4, n_tables=12).toPandas()
    sample_ids = {r.vec_id for r in sample.select("vec_id").collect()}
    approx = g[g["query_id"].isin(sample_ids)]
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"x274b sampled recall@5 = {recall:.2f}"
