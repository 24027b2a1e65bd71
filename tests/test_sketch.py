"""Misra–Gries heavy-hitter sketch (functions/sketchfns.py).

The fixture vocabulary is tiny, so the oracle row for x76 exercises the
plumbing but not the sketch regime. These tests build a Zipf-ish synthetic
stream whose vocabulary is far larger than the MG capacity and assert the
two properties the 100 TB claim rests on:

- candidate SUPERSET: every term with global count > N/(capacity+1)
  survives the per-partition pass (the mergeable-summaries pigeonhole);
- exact FINAL output: candidates + rescore equals the naive full
  wordcount, term for term and count for count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.functions.sketchfns import (
    frequent_terms_exact,
    misra_gries_candidates,
)


def _skewed_terms(spark, n_heavy=12, n_tail=5000, heavy_reps=400, parts=8):
    """12 heavy terms (400 occurrences each) drowned in a 5000-term tail
    (3 occurrences each): N = 19_800, vocab = 5_012."""
    heavy = (
        spark.range(n_heavy * heavy_reps)
        .select(F.concat(F.lit("hot_"), (F.col("id") % n_heavy)).alias("term"))
    )
    tail = (
        spark.range(n_tail * 3)
        .select(F.concat(F.lit("cold_"), (F.col("id") % n_tail)).alias("term"))
    )
    return heavy.unionAll(tail).repartition(parts)  # scatter terms across partitions


def test_mg_candidates_are_superset(spark):
    terms = _skewed_terms(spark)
    n = terms.count()
    capacity = 64  # vocab 5_012 >> capacity: genuine sketch regime
    cands = {r.term for r in misra_gries_candidates(terms, "term", capacity).collect()}
    assert len(cands) <= capacity * 8  # bounded by capacity x partitions
    truth = {
        r.term
        for r in terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * (capacity + 1) > n)
        .collect()
    }
    assert truth  # the heavy terms really do clear the threshold
    assert truth <= cands


def test_frequent_terms_exact_equals_naive(spark):
    terms = _skewed_terms(spark)
    denom = 65
    got = frequent_terms_exact(terms, "term", denom=denom, capacity=64).collect()
    n = terms.count()
    want = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * denom > F.lit(n))
        .orderBy("term")
        .collect()
    )
    assert [(r.term, r.cnt) for r in got] == [(r.term, r.cnt) for r in want]
    assert len(got) == 12  # exactly the planted heavy terms


def test_mg_single_partition_classic_bound(spark):
    # one partition, capacity 2, stream 6xA 4xB 2xC 1xD: A and B must survive
    terms = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 4 + [("c",)] * 2 + [("d",)],
        "term string",
    ).coalesce(1)
    cands = {r.term for r in misra_gries_candidates(terms, "term", 2).collect()}
    assert "a" in cands and "b" in cands and len(cands) <= 2


def test_x159_cms_never_undercounts(spark, sf_dir):
    """The CMS guarantee that makes the sketch usable at all: estimates are
    one-sided (est >= exact, always), and for the fixture's 4x1024 grid
    the top-20 overcounts stay far below the eps*N worst case."""
    from kafka_connect_spark.queries.text import x159_cms_token_frequency

    got = x159_cms_token_frequency(spark, sf_dir).toPandas()
    assert len(got) == 20
    assert (got["overcount"] >= 0).all()
    assert (got["cms_est"] >= got["exact_cnt"]).all()
    n_total = int(got["exact_cnt"].sum())  # lower bound on stream length
    # e/1024 * N is the standard eps*N bound; top tokens should sit well under
    assert (got["overcount"] <= 2.72 / 1024 * n_total * 20).all()


def test_x160_kmv_estimate_within_bounds(spark, sf_dir):
    """KMV with k=64 has relative standard error ~ 1/sqrt(k-2) ~ 12.7%; all
    fixture scopes must estimate within 5 sigma and the union scope must
    dominate every per-type scope in BOTH exact and estimated counts."""
    from kafka_connect_spark.queries.quality import x160_kmv_distinct_calibration

    got = x160_kmv_distinct_calibration(spark, sf_dir).toPandas()
    assert len(got) == 6
    for _, r in got.iterrows():
        rel = abs(r["kmv_estimate"] - r["exact_count"]) / r["exact_count"]
        assert rel < 5 / (63**0.5), (r["scope"], rel)
    u = got[got["scope"] == "*union*"].iloc[0]
    types = got[got["scope"] != "*union*"]
    assert (types["exact_count"] <= u["exact_count"]).all()


def test_x161_closure_planted_chain(spark):
    """Planted A~B~C chain: seed doc 1 reaches its near-dup 101 at hop 1
    and 101's near-dup 201 at hop 2, while an isolated doc never appears;
    the depth cap stops a longer chain at hop 3."""
    # sliding 24-token windows with stride 6 over a distinct-word stream:
    # adjacent windows share 16 of 22 trigrams (j = 16/28 = 0.57 >= 0.5),
    # windows two apart share 10 (j = 10/34 = 0.29 < 0.5) — a true chain.
    words = [f"w{i:03d}" for i in range(60)]
    win = lambda k: " ".join(words[6 * k : 6 * k + 24])  # noqa: E731
    chain = [
        (1, win(0)),    # seed (doc_id < 10)
        (101, win(1)),  # ~ seed (hop 1)
        (201, win(2)),  # ~ 101  (hop 2)
        (301, win(3)),  # ~ 201  (hop 3)
        (401, win(4)),  # ~ 301  (hop 4 — beyond cap)
        (999, "totally different words with zero shared trigrams at all ok"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in chain],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import kafka_connect_spark.catalog as cat
    import kafka_connect_spark.queries.dedup as dd
    from kafka_connect_spark.queries import QUERIES

    orig = cat.load
    try:
        cat.load = lambda s, d, name: df if name == "documents" else orig(s, d, name)
        dd.load = cat.load
        dd.load_parallel = lambda s, d, name, **kw: df
        out = {
            r["doc_id"]: r["hops"]
            for r in QUERIES["x161_contamination_closure"](spark, "unused").collect()
        }
    finally:
        cat.load = orig
        dd.load = orig
        from kafka_connect_spark.catalog import load_parallel as lp

        dd.load_parallel = lp
    assert out[1] == 0
    assert out[101] == 1
    assert out[201] == 2
    assert out[301] == 3
    assert 401 not in out  # depth cap
    assert 999 not in out  # disconnected


def test_x163_bloom_fpr_tracks_theory(spark, sf_dir):
    """Measured FP rate must sit in the same regime as the (b/m)^k theory
    given realized bit density — within 3x either way (binomial noise on a
    few-thousand-probe fixture), and the filter must never be degenerate
    (no bits, or saturated)."""
    from kafka_connect_spark.queries.text import x163_bloom_filter_calibration

    r = x163_bloom_filter_calibration(spark, sf_dir).collect()[0]
    assert 0 < r["n_bits_set"] < 65536
    assert r["n_probes"] > 10  # sf0.001's synthetic vocab is only ~31 tokens
    if r["theory_ppm"] >= 50:  # enough signal to compare regimes
        assert r["fpr_ppm"] <= 3 * r["theory_ppm"] + 100
        assert 3 * r["fpr_ppm"] + 100 >= r["theory_ppm"]


def test_x164_clique_vs_chain(spark):
    """A planted 4-clique of near-identical docs must yield C(4,3)=4
    triangles and coefficient 1; a planted 4-chain yields none. Together:
    4 triangles over clique wedges (12) + chain wedges (2)."""
    words = [f"w{i:03d}" for i in range(60)]
    clique = [(i, " ".join(words[:24]) + f" tail{i}") for i in range(1, 5)]
    # chain: stride-6 windows over a SECOND disjoint vocabulary
    words2 = [f"v{i:03d}" for i in range(60)]
    chain = [(10 + k, " ".join(words2[6 * k : 6 * k + 24])) for k in range(4)]
    df = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in clique + chain],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import kafka_connect_spark.catalog as cat
    import kafka_connect_spark.queries.dedup as dd
    from kafka_connect_spark.queries import QUERIES

    orig = cat.load
    try:
        cat.load = lambda s, d, name: df if name == "documents" else orig(s, d, name)
        dd.load = cat.load
        dd.load_parallel = lambda s, d, name, **kw: df
        r = QUERIES["x164_dup_graph_triangles"](spark, "unused").collect()[0]
    finally:
        cat.load = orig
        dd.load = orig
        from kafka_connect_spark.catalog import load_parallel as lp

        dd.load_parallel = lp
    assert r["n_edges"] == 6 + 3          # clique C(4,2) + chain 3
    assert r["n_triangles"] == 4          # clique C(4,3) only
    assert r["n_wedges"] == 12 + 2        # clique 4*C(3,2) + chain 2*C(2,2)
    assert abs(r["clustering_coeff"] - 3 * 4 / 14) < 1e-6
