"""Deduplication query surface (SURVEY.md §2.6 X12) over ``documents``.

Exact dedup, keep-first representative selection, exact n-gram Jaccard
pairs, and SimHash are hash-checked against DuckDB. MinHash-LSH is
seed-deterministic but not SQL-expressible => rows-only check + the recall
harness in tests/test_dedup.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, load_parallel
from ..functions.dedupfns import (
    content_hash,
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from ..functions.textfns import word_ngrams
from .registry import dround, dround_sql, query



# Cross-engine-deterministic rounding twins (see registry.dround): every
# jaccard/containment emission AND threshold filter uses the same idiom in
# both engines so boundary pairs can't diverge.
_J_SQL = dround_sql("inter / (sa.n + sb.n - inter)", 6)
_CA_SQL = dround_sql("inter / CAST(sa.n AS DOUBLE)", 6)
_CB_SQL = dround_sql("inter / CAST(sb.n AS DOUBLE)", 6)
_DUP_RATIO_SQL = dround_sql("1 - count(DISTINCT md5(text)) / CAST(count(*) AS DOUBLE)", 6)
_COS_PAIR_SQL = dround_sql(
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))", 6
)


@query(
    "x12_dedup_exact_count",
    oracle="SELECT count(DISTINCT md5(text)) AS distinct_docs FROM documents",
)
def x12_dedup_exact_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.agg(F.countDistinct(content_hash("text")).alias("distinct_docs"))


@query(
    "x12b_dedup_keep_first",
    oracle="""
    SELECT min(doc_id) AS doc_id, count(*) AS dup_count
    FROM documents GROUP BY md5(text) ORDER BY doc_id
    """,
)
def x12b_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the lowest-id representative per content group."""
    d = load(spark, sf_dir, "documents")
    return exact_dedup(d).orderBy("doc_id")


@query(
    "x12c_ngram_jaccard_pairs",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           {_J_SQL} AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE {_J_SQL} >= 0.5
    ORDER BY id_a, id_b
    """,
)
def x12c_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-duplicate pairs at threshold 0.5."""
    d = load_parallel(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, n=3, threshold=0.5).orderBy("id_a", "id_b")


_SIMHASH_BITS = 32
_votes = ", ".join(
    f"sum(((h >> {i}) & 1) * 2 - 1) AS v{i}" for i in range(_SIMHASH_BITS)
)
_pack = " + ".join(
    f"CASE WHEN v{i} >= 0 THEN {1 << i} ELSE 0 END" for i in range(_SIMHASH_BITS)
)


@query(
    "x12d_simhash",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    h AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h FROM tok),
    v AS (SELECT doc_id, {_votes} FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({_pack} AS BIGINT) AS simhash FROM v ORDER BY doc_id
    """,
)
def x12d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (cross-engine md5-derived token hash)."""
    d = load(spark, sf_dir, "documents")
    return simhash(d, bits=_SIMHASH_BITS).orderBy("doc_id")


@query(
    "x12f_embedding_near_dup",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            {_COS_PAIR_SQL} AS cos_sim
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.4 ORDER BY id_a, id_b
    """,
)
def x12f_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection at threshold 0.4 (the
    fixture's random vectors peak near 0.5; real embedding corpora use
    ~0.95+). Block-matrix exact all-pairs: numpy matmul per block pair via
    applyInPandas — the O(n^2) that scales by adding blocks."""
    from ..functions.simfns import cosine_pairs_blocked

    emb = load(spark, sf_dir, "embeddings")
    return cosine_pairs_blocked(emb, 0.4, n_blocks=16).orderBy("id_a", "id_b")


@query(
    "x12h_dup_clusters",
    oracle=f"""
    WITH RECURSIVE
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {_J_SQL} >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst
    )
    SELECT node AS doc_id, CAST(LEAST(node, MIN(r)) AS BIGINT) AS cluster
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def x12h_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, hash-checked: connected components over the exact
    3-gram-Jaccard pair graph (x12c), cluster id = min doc id — the
    canonical-document assignment a dedup pipeline actually needs. Spark
    runs hash-min label propagation (one shuffle join per round, rounds =
    component diameter); the oracle computes the same components with a
    recursive CTE."""
    from ..functions.dedupfns import dup_clusters

    d = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5)
    return dup_clusters(pairs).orderBy("doc_id")


@query("x12g_embedding_near_dup_lsh")  # seed-deterministic; rows-only check
def x12g_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB embedding near-dup plan: hyperplane-LSH bucket candidates
    + exact cosine verify (x12f's exact all-pairs is the verify-stage /
    ground-truth twin; this is the pair generator that replaces it at
    corpus scale). Precision 1.0 by construction; recall vs x12f asserted
    in tests/test_similarity.py."""
    from ..functions.simfns import lsh_cosine_pairs

    # r16: load_parallel — the single-split fixture scan serialized the
    # tag UDF + broadcast-probe candidate production on one task (the
    # x274b stage-table finding); no-op at production split counts.
    emb = load_parallel(spark, sf_dir, "embeddings")
    return lsh_cosine_pairs(emb, 0.4, n_planes=3, n_tables=16).orderBy("id_a", "id_b")


@query("x12i_lsh_dup_clusters")  # seed-deterministic; rows-only check
def x12i_lsh_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end 100 TB dedup pipeline: MinHash-LSH pair generation
    (x12e — band-bucket join, no all-pairs scan) composed with hash-min
    label propagation (x12h's cluster assignment). This is the composition
    a trillion-token corpus actually runs; x12h over exact pairs is its
    ground-truth twin. Cluster agreement with the exact pipeline is
    asserted in tests/test_dedup.py (LSH recall makes it rows-only here)."""
    from ..functions.dedupfns import dup_clusters

    d = load_parallel(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(d, num_hashes=64, bands=16, n=3, threshold=0.5)
    return dup_clusters(pairs).orderBy("doc_id")


@query("x12e_minhash_lsh_pairs")  # seed-deterministic; rows-only check
def x12e_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + 16-band LSH candidates, verified with exact Jaccard
    >= 0.5. Same output contract as x12c; recall vs the exact pairs is
    asserted in tests/test_dedup.py."""
    d = load_parallel(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(
        d, num_hashes=64, bands=16, n=3, threshold=0.5
    ).orderBy("id_a", "id_b")


@query(
    "x26_dup_ratio_report",
    oracle=f"""
    SELECT lang, count(*) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
           {_DUP_RATIO_SQL} AS dup_ratio
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def x26_dup_ratio_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus dedup AUDIT: per-language exact-duplicate ratio (1 -
    distinct-content / docs) — the QA report run before and after a dedup
    pass to quantify its effect. One hash agg with a distinct count on the
    16-byte content hash (not the text), so shuffle bytes stay tiny."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
            dround(
                1 - F.countDistinct(F.md5("text")) / F.count(F.lit(1)).cast("double"), 6
            ).alias("dup_ratio"),
        )
        .orderBy("lang")
    )


@query(
    "x37_incremental_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source, n_chars,
             md5(array_to_string(list_sort(list_distinct(
                 string_split(lower(text), ' '))), ' ')) AS h
      FROM documents
    ),
    ref AS (SELECT DISTINCT h FROM fp WHERE source <> 'src0'),
    new AS (SELECT * FROM fp WHERE source = 'src0'),
    kept AS (
      SELECT n.doc_id, n.source, n.n_chars,
             row_number() OVER (PARTITION BY n.h ORDER BY n.doc_id) AS rn
      FROM new n ANTI JOIN ref r ON n.h = r.h
    )
    SELECT doc_id, source, n_chars FROM kept WHERE rn = 1 ORDER BY doc_id
    """,
)
def x37_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a NEW crawl against the existing reference
    corpus — the every-snapshot op of a continuously-fed training pipeline
    (dedup new data against everything already ingested, then within
    itself). Key = the order-insensitive token-set fingerprint (x14e), so
    permuted boilerplate dedups too.

    100 TB shape: both sides reduce to their 16-byte fingerprints before
    any join, so the anti-join shuffles hashes, not documents (the
    reference side is distinct-ed first — at corpus scale that's the
    already-materialized dedup index, not a rescan). Within-batch
    keep-first is a rank window on the same hash. No all-pairs stage
    anywhere; a bloom filter on the reference hashes would push the
    anti-join map-side when the new batch is tiny vs the corpus."""
    from ..functions.textfns import fingerprint

    from pyspark.sql import Window

    d = load_parallel(spark, sf_dir, "documents")
    fp = d.select("doc_id", "source", "n_chars", fingerprint("text").alias("h"))
    new = fp.filter(F.col("source") == "src0")
    ref = fp.filter(F.col("source") != "src0").select("h").distinct()
    w = Window.partitionBy("h").orderBy("doc_id")
    return (
        new.join(ref, "h", "left_anti")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "x12j_cluster_size_histogram",
    oracle=f"""
    WITH RECURSIVE
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {_J_SQL} >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst
    ),
    comp AS (SELECT node, LEAST(node, MIN(r)) AS cluster FROM reach GROUP BY node),
    csize AS (SELECT cluster, count(*) AS cluster_size FROM comp GROUP BY cluster)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           count(*) AS n_clusters,
           CAST(SUM(cluster_size - 1) AS BIGINT) AS docs_removable
    FROM csize GROUP BY cluster_size ORDER BY cluster_size
    """,
)
def x12j_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-impact AUDIT over the cluster assignment (x12h): cluster-size
    histogram + how many docs a keep-one-per-cluster policy removes at
    each size — the report that sizes a dedup run's effect BEFORE the
    expensive rewrite pass. Two tiny hash aggs over the |clustered-docs|
    label table; the histogram is bounded by the largest dup cluster, so
    the result stays KB-sized at any corpus scale."""
    from ..functions.dedupfns import dup_clusters

    d = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5)
    comp = dup_clusters(pairs)
    return (
        comp.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum(F.col("cluster_size") - 1).alias("docs_removable"),
        )
        .orderBy("cluster_size")
    )


@query(
    "x43_containment_pairs",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           {_CA_SQL} AS containment_a,
           {_CB_SQL} AS containment_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE GREATEST({_CA_SQL}, {_CB_SQL}) >= 0.8
    ORDER BY id_a, id_b
    """,
)
def x43_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-subset detection (containment >= 0.8 in either direction) —
    catches short-doc-embedded-in-long-doc boilerplate that Jaccard's
    union denominator dilutes below any practical threshold. Same hashed
    shingle join as x12c (8-byte shuffle keys; the oracle recomputes with
    raw shingle strings)."""
    from ..functions.dedupfns import ngram_containment_pairs

    d = load_parallel(spark, sf_dir, "documents")
    return ngram_containment_pairs(d, n=3, threshold=0.8).orderBy("id_a", "id_b")


@query(
    "x43b_containment_pairs_capped",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    hot AS (SELECT sh FROM ex GROUP BY sh HAVING count(*) > 8),
    exj AS (SELECT doc_id, sh FROM ex ANTI JOIN hot USING (sh)),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM exj a JOIN exj b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           {{_CA_SQL}} AS containment_a,
           {{_CB_SQL}} AS containment_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE GREATEST({{_CA_SQL}}, {{_CB_SQL}}) >= 0.5
    ORDER BY id_a, id_b
    """.format(_CA_SQL=_CA_SQL, _CB_SQL=_CB_SQL),
)
def x43b_containment_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x43 with the df-cap engaged (max_shingle_freq=8): hot shingles leave
    the join side, |A| stays exact — the 100 TB boilerplate-skew guardrail,
    hash-checked against an oracle that applies the identical cap. Scores
    are lower bounds of x43's (one-sided bias; see
    functions/dedupfns.ngram_containment_pairs), so the threshold here is
    looser to keep the checked surface non-trivial."""
    from ..functions.dedupfns import ngram_containment_pairs

    d = load_parallel(spark, sf_dir, "documents")
    return ngram_containment_pairs(
        d, n=3, threshold=0.5, max_shingle_freq=8
    ).orderBy("id_a", "id_b")


@query(
    "x44_cross_source_dup_matrix",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {_J_SQL} >= 0.5)
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           count(*) AS dup_pairs
    FROM pairs JOIN documents da ON da.doc_id = id_a
               JOIN documents db ON db.doc_id = id_b
    GROUP BY 1, 2 ORDER BY source_a, source_b
    """,
)
def x44_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance audit: which SOURCES duplicate each other — near-dup pair
    counts per unordered source pair (mirror/scrape detection, licensing
    triage, crawl-overlap measurement). The matrix join touches only the
    pair list and a (doc_id, source) projection; |sources|² output rows."""
    from ..functions.dedupfns import ngram_jaccard_pairs

    d = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5)
    src = d.select("doc_id", "source")
    return (
        pairs.join(
            src.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "source", "src_a"
            ),
            "id_a",
        )
        .join(
            src.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "source", "src_b"
            ),
            "id_b",
        )
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("dup_pairs"))
        .orderBy("source_a", "source_b")
    )


# The x12h component CTE, reused by the canonical-selection query below so
# both ride the identical pair graph + connected components definition.
_COMP_CTE = f"""
    WITH RECURSIVE
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {_J_SQL} >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst
    ),
    comp AS (SELECT node AS doc_id, CAST(LEAST(node, MIN(r)) AS BIGINT) AS cluster
             FROM reach GROUP BY node)
"""


@query(
    "x70_dedup_keep_best",
    oracle=f"""
    {_COMP_CTE},
    allc AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster, d.n_chars
             FROM documents d LEFT JOIN comp c USING (doc_id)),
    r AS (SELECT *, row_number() OVER (PARTITION BY cluster
                                       ORDER BY n_chars DESC, doc_id) AS rn
          FROM allc)
    SELECT doc_id, cluster, CAST(n_chars AS BIGINT) AS n_chars,
           (rn = 1) AS keep
    FROM r ORDER BY doc_id
    """,
)
def x70_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: every document assigned to its
    near-dup cluster (x12h components; singletons form their own), then ONE
    representative kept per cluster — the HIGHEST-quality member (here
    n_chars as the quality proxy; ties to the lower doc_id), not merely the
    first seen. This is the decision step a curation pipeline actually
    ships: x12b's keep-first discards arbitrarily, keep-best discards the
    worse copy. Plan: the pair graph + label propagation ride x12h
    unchanged; the full-corpus assignment is one left join on doc_id and
    the winner pick is one row_number window partitioned by cluster —
    cluster cardinality bounds the sort runs, so the window never sees
    more than a duplicate group at a time."""
    from pyspark.sql import Window
    from ..functions.dedupfns import dup_clusters

    d = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5)
    comp = dup_clusters(pairs)
    allc = (
        d.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .withColumn("cluster", F.coalesce(F.col("cluster"), F.col("doc_id")))
    )
    w = Window.partitionBy("cluster").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        allc.withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster",
            F.col("n_chars").cast("long").alias("n_chars"),
            (F.col("rn") == 1).alias("keep"),
        )
        .orderBy("doc_id")
    )


@query("x71_semantic_dedup")  # kmeans codebook => not SQL-expressible; rows-only
def x71_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication over the embeddings table: k-means
    partition of the space, greedy keep-first within each cluster at
    cosine >= 0.4 (the fixture's near-dup band, matching x12f). The
    linear-cost semantic twin of the exact pair pipeline: precision-1.0
    drops (every dropped vector provably has an exact near-neighbor —
    asserted vs x12f's pair set in tests/test_similarity.py) with recall
    traded for never materializing cross-cluster pairs."""
    from ..functions.simfns import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, 0.4, n_clusters=8).orderBy("id")


@query(
    "x77_winnow_fingerprint_pairs",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, i - 1 AS pos, len(toks) - 4 AS ng,
            CAST('0x' || substring(md5(array_to_string(toks[i:i+4], ' ')), 1, 15)
                 AS BIGINT) AS h
          FROM d, unnest(range(1, len(toks) - 3)) t(i)
          WHERE len(toks) >= 8),
    w AS (SELECT doc_id, pos, ng,
            min(CAST(h AS HUGEINT) * 1099511627776 + (1099511627775 - pos))
              OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS pk
          FROM g),
    f AS (SELECT DISTINCT doc_id, CAST(pk // 1099511627776 AS BIGINT) AS h
          FROM w WHERE pos <= ng - 4),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS n_shared
          FROM f a JOIN f b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT doc_a, doc_b, n_shared FROM p WHERE n_shared >= 3
    ORDER BY doc_a, doc_b
    """,
)
def x77_winnow_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs by shared winnowing (MOSS) fingerprints
    — 5-token grams, window 4, >= 3 shared fingerprints. The sparse-index
    alternative to full-shingle self-joins (functions/dedupfns.py:
    winnow_fingerprints): ~2/(w+1) of the gram volume enters the join, with
    the SIGMOD'03 guarantee that any shared run of >= w+k-1 = 8 tokens still
    produces a shared fingerprint. Oracle mirrors the packed-ordinal
    window-min construction (HUGEINT vs DECIMAL(38,0))."""
    from ..functions.dedupfns import winnow_match_pairs

    d = load_parallel(spark, sf_dir, "documents")
    return winnow_match_pairs(d, k=5, w=4, min_shared=3).orderBy("doc_a", "doc_b")


@query(
    "x85_fuzzy_name_pairs",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY id_a, id_b
    """,
)
def x85_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-level record linkage: customer pairs within edit distance 1,
    found via deletion-neighborhood (FastSS) blocking — one equi-join on
    deletion variants plus exact levenshtein verification
    (functions/dedupfns.py: deletion_neighborhood_pairs), so the result
    is EXACT but the engine never scores all O(n²) pairs. The oracle IS
    the naive quadratic plan, which is the whole point of the blocking
    scheme. Feed the pairs into dup_clusters for identity groups (unit-
    tested on synthetic typos; this fixture's sequential names form one
    Hamming-connected component, which is not an interesting cluster)."""
    from ..functions.dedupfns import deletion_neighborhood_pairs

    # r15: load_parallel — the deletion-variant explode (|name|+1 variants
    # per row, hashed) is a CPU-heavy per-row stage that serialized on the
    # single-split customer scan (guide §2.5; the guard is a no-op at
    # production split counts)
    c = load_parallel(spark, sf_dir, "customer")
    return deletion_neighborhood_pairs(c, "c_custkey", "c_name").orderBy("id_a", "id_b")


@query(
    "x92_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {{J}} >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst
    ),
    comp AS (SELECT node AS doc_id, LEAST(node, MIN(r)) AS cluster
             FROM reach GROUP BY node),
    assign AS (
      SELECT d.doc_id,
             COALESCE(c.cluster, d.doc_id) AS grp
      FROM documents d LEFT JOIN comp c USING (doc_id)),
    splits AS (
      SELECT doc_id,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'train' ELSE 'val' END AS naive_split,
             CASE WHEN substring(md5(CAST(grp AS VARCHAR)), 1, 1) < '8'
                  THEN 'train' ELSE 'val' END AS safe_split
      FROM assign),
    leaks AS (
      SELECT
        CAST(sum(CASE WHEN sa.naive_split <> sb.naive_split THEN 1 ELSE 0 END)
             AS BIGINT) AS naive_leaks,
        CAST(sum(CASE WHEN sa.safe_split <> sb.safe_split THEN 1 ELSE 0 END)
             AS BIGINT) AS safe_leaks
      FROM pairs JOIN splits sa ON sa.doc_id = id_a
                 JOIN splits sb ON sb.doc_id = id_b)
    SELECT method, n_train, n_val, n_leaky_pairs FROM (
      SELECT 'cluster' AS method,
             CAST(count(*) FILTER (safe_split = 'train') AS BIGINT) AS n_train,
             CAST(count(*) FILTER (safe_split = 'val') AS BIGINT) AS n_val,
             (SELECT safe_leaks FROM leaks) AS n_leaky_pairs
      FROM splits
      UNION ALL
      SELECT 'naive',
             CAST(count(*) FILTER (naive_split = 'train') AS BIGINT),
             CAST(count(*) FILTER (naive_split = 'val') AS BIGINT),
             (SELECT naive_leaks FROM leaks)
      FROM splits)
    ORDER BY method
    """.replace("{J}", _J_SQL),
)
def x92_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: assign whole NEAR-DUP CLUSTERS (x12h
    components, singletons = their own group) to splits by a hash of the
    GROUP id, and report, for both this and the naive per-doc hash
    split, the split sizes and the number of near-dup pairs crossing the
    boundary. Cluster-based assignment makes cross-split leakage zero BY
    CONSTRUCTION (both endpoints of every pair share a component, hence
    a split); the naive split's nonzero count is the contamination a
    doc-level split silently ships into eval. The split hash is md5 of
    the id in both engines — reproducible, order-free, and stable as the
    corpus grows."""
    d = load_parallel(spark, sf_dir, "documents")
    return leakage_safe_split(d)


def leakage_safe_split(
    d: DataFrame, max_shingle_freq: int | None = None
) -> DataFrame:
    """x92 body, parameterized: ``max_shingle_freq`` plumbs the hot-shingle
    df-cap into the pair join (the x43b guardrail; default None keeps the
    oracle exact). At 100 TB set it to an absolute doc count (e.g. 10^4):
    capping only drops pairs supported solely by boilerplate shingles, so
    clusters can only SPLIT, never merge — the safe direction for leakage
    accounting is to also keep the reported pair set consistent with the
    clusters, which this does by capping both from the same call."""
    from ..functions.dedupfns import dup_clusters, ngram_jaccard_pairs

    pairs = (
        ngram_jaccard_pairs(d, n=3, threshold=0.5, max_shingle_freq=max_shingle_freq)
        .select("id_a", "id_b")
        # materialize ONCE: the pair set feeds both the component build and
        # the leak count — without truncation the shingle self-join (the
        # expensive stage) re-executes for the second consumer
        .localCheckpoint(eager=True)
    )
    comp = dup_clusters(pairs)
    assign = (
        d.select("doc_id")
        .join(comp, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("cluster"), F.col("doc_id")).alias("grp"))
    )

    def split_of(col):
        return F.when(
            F.substring(F.md5(col.cast("string")), 1, 1) < "8", "train"
        ).otherwise("val")

    splits = assign.select(
        "doc_id",
        split_of(F.col("doc_id")).alias("naive_split"),
        split_of(F.col("grp")).alias("safe_split"),
    )
    sa = splits.select(F.col("doc_id").alias("id_a"), F.col("naive_split").alias("na"), F.col("safe_split").alias("sa"))
    sb = splits.select(F.col("doc_id").alias("id_b"), F.col("naive_split").alias("nb"), F.col("safe_split").alias("sb"))
    leaks = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .agg(
            F.coalesce(F.sum((F.col("na") != F.col("nb")).cast("long")), F.lit(0)).alias("naive_leaks"),
            F.coalesce(F.sum((F.col("sa") != F.col("sb")).cast("long")), F.lit(0)).alias("safe_leaks"),
        )
    )
    counts = splits.agg(
        F.sum((F.col("safe_split") == "train").cast("long")).alias("c_train"),
        F.sum((F.col("safe_split") == "val").cast("long")).alias("c_val"),
        F.sum((F.col("naive_split") == "train").cast("long")).alias("n_train_"),
        F.sum((F.col("naive_split") == "val").cast("long")).alias("n_val_"),
    )
    both = counts.crossJoin(F.broadcast(leaks))
    # r16 (guide §2.4, the x281 stack discipline): the former 2-branch
    # union referenced `both` twice, so the splits/leaks pipelines
    # executed once per branch (the x92 job timeline showed both copies
    # running). A stack() unpivot of the single 1-row state has ONE
    # consumer — identical two output rows, upstream evaluated once.
    return (
        both.select(
            F.expr(
                "stack(2,"
                " 'cluster', c_train, c_val, safe_leaks,"
                " 'naive', n_train_, n_val_, naive_leaks)"
                " as (method, n_train, n_val, n_leaky_pairs)"
            )
        )
        .orderBy("method")
    )


@query(
    "x107_curation_pipeline_v2",
    oracle=f"""
    WITH RECURSIVE
    kept AS (
      SELECT doc_id, text, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
      WHERE len(string_split(text, ' ')) >= 20
        AND len(list_distinct(string_split(text, ' '))) * 1000000
              >= 300000 * len(string_split(text, ' '))),
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM kept),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {{J}} >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst),
    comp AS (SELECT node AS doc_id, LEAST(node, MIN(r)) AS cluster
             FROM reach GROUP BY node),
    assign AS (SELECT k.doc_id, k.n_tokens, k.n_chars, k.text,
                      COALESCE(c.cluster, k.doc_id) AS grp
               FROM kept k LEFT JOIN comp c USING (doc_id)),
    split AS (SELECT *,
                     CASE WHEN substring(md5(CAST(grp AS VARCHAR)), 1, 1) < '8'
                          THEN 'train' ELSE 'val' END AS split
              FROM assign)
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique
    FROM split GROUP BY split ORDER BY split
    """.replace("{J}", _J_SQL),
)
def x107_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline END-TO-END in one Spark plan: quality gate
    (length + lexical-diversity floors, exact integer predicates) ->
    near-dup clustering over the survivors (x12h components) ->
    leakage-safe cluster-hash train/val split (x92) -> per-split
    datasheet (x93's columns). This is the deliverable a training-data
    run actually produces — and because it is ONE lazily-composed plan,
    Catalyst sees the whole pipeline: the quality filter pushes into the
    single documents scan that feeds shingling, clustering, splitting
    and accounting alike. The oracle replays the identical composition
    through the recursive-CTE component oracle."""
    d = load_parallel(spark, sf_dir, "documents")
    return curation_pipeline_v2(d)


def curation_pipeline_v2(
    d: DataFrame, max_shingle_freq: int | None = None
) -> DataFrame:
    """x107 body, parameterized: ``max_shingle_freq`` plumbs the
    hot-shingle df-cap into the near-dup pair join (x43b guardrail;
    default None keeps the oracle exact). At 100 TB a boilerplate shingle
    shared by 10^6 surviving docs would otherwise dominate the one
    shuffle in this plan; capped clusters can only split (one-sided),
    which for a SPLIT assignment errs toward more, smaller groups —
    never toward leaking a true near-dup pair INTO one cluster that the
    uncapped run would have separated."""
    from ..functions.dedupfns import dup_clusters, ngram_jaccard_pairs

    toks = F.split("text", " ")
    kept = d.filter(
        (F.size(toks) >= 20)
        & (
            F.size(F.array_distinct(toks)).cast("long") * 1_000_000
            >= 300_000 * F.size(toks).cast("long")
        )
    ).select("doc_id", "text", "n_chars", F.size(toks).cast("long").alias("n_tokens"))
    pairs = ngram_jaccard_pairs(
        kept, n=3, threshold=0.5, max_shingle_freq=max_shingle_freq
    ).select("id_a", "id_b")
    comp = dup_clusters(pairs)
    assign = kept.join(comp, "doc_id", "left").select(
        "doc_id",
        "text",
        "n_chars",
        "n_tokens",
        F.coalesce(F.col("cluster"), F.col("doc_id")).alias("grp"),
    )
    split = assign.withColumn(
        "split",
        F.when(F.substring(F.md5(F.col("grp").cast("string")), 1, 1) < "8", "train")
        .otherwise("val"),
    )
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
        )
        .orderBy("split")
    )


@query(
    "x109_threshold_sensitivity",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    j AS (SELECT {{J}} AS jac FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b),
    th AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold)
    SELECT threshold,
           CAST(count(*) FILTER (jac >= threshold) AS BIGINT) AS n_pairs
    FROM th LEFT JOIN j ON TRUE
    GROUP BY threshold ORDER BY threshold
    """.replace("{J}", _J_SQL),
)
def x109_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold sensitivity curve: near-dup pair counts at five
    Jaccard thresholds from ONE pair computation — the tuning table that
    decides a dedup campaign's threshold (too low deletes paraphrases,
    too high keeps boilerplate), produced without re-running the
    pipeline per candidate value. The pair set is computed once (the
    x12c join) AT THE GRID MINIMUM (threshold=0.5) — pairs below the
    lowest reported threshold can never be counted, so materializing
    them (the round-6 shape, threshold=0.0) only inflated the rows fed
    to the counting stage ~40x; output is provably identical. The
    filter and the count compare use the same dround'd jaccard in both
    engines so boundary pairs land identically. The final left join
    from the 5-row threshold table restores zero-count rows when the
    corpus has NO near-dup pairs (mirrors the oracle's LEFT JOIN ON
    TRUE — a shape divergence the r6 advisor caught)."""
    from ..functions.dedupfns import ngram_jaccard_pairs

    d = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5).select("jaccard")
    th = spark.createDataFrame(
        [(0.5,), (0.6,), (0.7,), (0.8,), (0.9,)], "threshold double"
    )
    counts = (
        F.broadcast(th)
        .crossJoin(pairs)
        .groupBy("threshold")
        .agg(
            F.sum((F.col("jaccard") >= F.col("threshold")).cast("long")).alias(
                "np_"
            )
        )
    )
    return (
        th.join(counts, "threshold", "left")
        .select(
            "threshold", F.coalesce(F.col("np_"), F.lit(0)).alias("n_pairs")
        )
        .orderBy("threshold")
    )


@query(
    "x113_novelty_score",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    df AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY sh),
    j AS (SELECT ex.doc_id,
                 CAST(count(*) AS BIGINT) AS n_shingles,
                 CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
          FROM ex JOIN df USING (sh) GROUP BY ex.doc_id)
    SELECT doc_id, n_shingles, n_novel,
           CAST(n_novel * 1000000 // n_shingles AS BIGINT) AS novelty_ppm
    FROM j ORDER BY doc_id
    """,
)
def x113_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a document's distinct
    3-gram shingles that appear in NO other document (df = 1) — the
    inverse of the contamination/boilerplate signals: high novelty marks
    content the corpus hasn't seen (keep), near-zero novelty marks pure
    recombination (dedup/downweight candidates x12/x43 then adjudicate).
    Exact ppm integers; the df table is the same shingle wordcount the
    dedup family already computes, so at 100 TB this rides that
    materialization — one explode, one df hash agg, one join-back."""
    d = load_parallel(spark, sf_dir, "documents")
    from ..functions.dedupfns import shingles

    ex = d.select("doc_id", F.explode(shingles("text", 3)).alias("sh"))
    df_ = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    j = (
        ex.join(df_, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_novel"),
        )
    )
    return (
        j.select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.floor(F.col("n_novel") * 1_000_000 / F.col("n_shingles"))
            .cast("long")
            .alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


@query(
    "x126_subset_edges",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(count(*) AS BIGINT) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id <> b.doc_id
              GROUP BY 1, 2)
    SELECT id_a AS contained_doc, id_b AS container_doc,
           inter, sa.n AS n_contained, sb.n AS n_container
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE inter * 10 >= sa.n * 9
      AND inter * 2 < sb.n
    ORDER BY contained_doc, container_doc
    """,
)
def x126_subset_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED near-subset edges: document A is (mostly) contained in a
    substantially larger document B — quote, extract, or derivative-work
    detection, which symmetric Jaccard (x12c) and symmetric containment
    (x43) both blur (x43 keeps the pair; this orients it). The asymmetry
    predicate is pure cross-multiplied integers (|A∩B|·10 >= |A|·9 and
    |A∩B|·2 < |B|) on the same shingle-join machinery; the ordered
    (contained -> container) pair is the provenance edge a lineage graph
    ingests. (Zero rows on this fixture — its duplicates are twins, not
    subsets; the planted-subset unit test in test_dedup.py is the
    behavioral evidence.)"""
    from ..functions.dedupfns import subset_edges

    d = load_parallel(spark, sf_dir, "documents")
    return subset_edges(d).orderBy("contained_doc", "container_doc")


@query(
    "x127_pair_signal_panel",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(count(*) AS BIGINT) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    hh AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h
           FROM tk),
    vv AS (SELECT doc_id, {_votes} FROM hh GROUP BY doc_id),
    sim AS (SELECT doc_id, CAST({_pack} AS BIGINT) AS simhash FROM vv),
    pairs AS (SELECT id_a, id_b, inter, sa.n AS n_a, sb.n AS n_b,
                     {_J_SQL} AS jaccard
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b)
    SELECT id_a, id_b, inter, n_a, n_b, jaccard,
           {dround_sql("inter / CAST(n_a AS DOUBLE)", 6)} AS containment_a,
           {dround_sql("inter / CAST(n_b AS DOUBLE)", 6)} AS containment_b,
           CAST(bit_count(xor(pa.simhash, pb.simhash)) AS BIGINT)
             AS simhash_hamming
    FROM pairs
    JOIN sim pa ON pa.doc_id = id_a
    JOIN sim pb ON pb.doc_id = id_b
    WHERE jaccard >= 0.5
    ORDER BY id_a, id_b
    """,
)
def x127_pair_signal_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup adjudication panel: for every candidate pair, ALL the
    signal families side by side — shingle intersection and sizes,
    Jaccard, both containments, and SimHash Hamming distance — the
    table a human (or a downstream rule) reads to decide drop vs keep
    vs extract when the signals disagree (high containment + low
    Jaccard = extract; low Hamming + low Jaccard = template). One
    shingle self-join feeds every set metric; SimHash joins in as two
    64-bit columns and one bit_count(xor). The integration matters:
    three families computed consistently on one pass, not three
    pipelines."""
    from ..functions.dedupfns import shingles, simhash

    d = load_parallel(spark, sf_dir, "documents")
    ex = d.select("doc_id", F.explode(shingles("text", 3)).alias("sh"))
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    sim = simhash(d, bits=_SIMHASH_BITS)
    pa = sim.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sim_a"))
    pb = sim.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sim_b"))
    p = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            dround(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= 0.5)
        .join(pa, "id_a")
        .join(pb, "id_b")
    )
    return p.select(
        "id_a",
        "id_b",
        "inter",
        "n_a",
        "n_b",
        "jaccard",
        dround(F.col("inter") / F.col("n_a"), 6).alias("containment_a"),
        dround(F.col("inter") / F.col("n_b"), 6).alias("containment_b"),
        F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("long").alias(
            "simhash_hamming"
        ),
    ).orderBy("id_a", "id_b")


@query(
    "x131_cluster_source_purity",
    oracle=f"""
    WITH RECURSIVE
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {{J}} >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst),
    comp AS (SELECT node AS doc_id, LEAST(node, MIN(r)) AS cluster
             FROM reach GROUP BY node),
    cm AS (SELECT c.cluster, d.source, CAST(count(*) AS BIGINT) AS n
           FROM comp c JOIN documents d USING (doc_id)
           GROUP BY c.cluster, d.source),
    agg AS (SELECT cluster,
                   CAST(sum(n) AS BIGINT) AS cluster_size,
                   CAST(count(*) AS BIGINT) AS n_sources,
                   CAST(max(n) AS BIGINT) AS majority_n
            FROM cm GROUP BY cluster)
    SELECT cluster, cluster_size, n_sources,
           CAST(majority_n * 1000000 // cluster_size AS BIGINT) AS purity_ppm
    FROM agg ORDER BY cluster
    """.replace("{{J}}", "{J}").replace("{J}", _J_SQL),
)
def x131_cluster_source_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SOURCE purity: per near-dup cluster, how many
    sources it spans and the majority-source share — pure clusters mean
    intra-source duplication (re-posts, pagination); impure ones mean
    cross-source copying (syndication, scraping), which changes both the
    dedup keep-policy (x70) and the provenance story (x44 aggregates
    this per source PAIR; this is the per-cluster view). Rides x12h's
    components + one join to source + two hash aggs; purity is an exact
    ppm integer."""
    from ..functions.dedupfns import dup_clusters, ngram_jaccard_pairs

    d = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5).select("id_a", "id_b")
    comp = dup_clusters(pairs)
    cm = (
        comp.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("cluster", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = cm.groupBy("cluster").agg(
        F.sum("n").alias("cluster_size"),
        F.count(F.lit(1)).alias("n_sources"),
        F.max("n").alias("majority_n"),
    )
    return (
        agg.select(
            "cluster",
            "cluster_size",
            "n_sources",
            F.floor(F.col("majority_n") * 1_000_000 / F.col("cluster_size"))
            .cast("long")
            .alias("purity_ppm"),
        )
        .orderBy("cluster")
    )


@query(
    "x137_dup_distance_audit",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {{J}} >= 0.5),
    mx AS (SELECT max(doc_id) AS md FROM documents),
    d AS (SELECT CASE
            WHEN (id_b - id_a) * 100 <= md THEN 'within_1pct'
            WHEN (id_b - id_a) * 10 <= md THEN 'within_10pct'
            ELSE 'far' END AS distance_band
          FROM pairs CROSS JOIN mx)
    SELECT distance_band, CAST(count(*) AS BIGINT) AS n_pairs
    FROM d GROUP BY distance_band ORDER BY distance_band
    """.replace("{{J}}", "{J}").replace("{J}", _J_SQL),
)
def x137_dup_distance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-locality audit: how far apart in crawl order (doc_id
    distance, banded at 1% / 10% of the corpus span) near-dup pairs sit
    — THE scale-planning input for dedup: if duplicates cluster within
    1%, a sliding-window dedup over the ingest order replaces the
    global self-join (a 100x cheaper plan); a heavy 'far' band means
    only the global bucketed join is sound. Band bounds are
    cross-multiplied integers off a 1-row broadcast scalar."""
    from ..functions.dedupfns import ngram_jaccard_pairs

    d = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5).select("id_a", "id_b")
    mx = d.agg(F.max("doc_id").alias("md"))
    dist = F.col("id_b") - F.col("id_a")
    band = (
        F.when(dist * 100 <= F.col("md"), "within_1pct")
        .when(dist * 10 <= F.col("md"), "within_10pct")
        .otherwise("far")
    )
    return (
        pairs.crossJoin(F.broadcast(mx))
        .select(band.alias("distance_band"))
        .groupBy("distance_band")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("distance_band")
    )


@query(
    "x139_dup_substring_mass",
    oracle="""
    WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, source,
                 CAST('0x' || substring(
                      md5(array_to_string(toks[i:i+9], ' ')), 1, 15) AS BIGINT) AS h
          FROM d, unnest(range(1, len(toks) - 8)) t(i) WHERE len(toks) >= 10),
    df AS (SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS ndocs
           FROM g GROUP BY h)
    SELECT source,
           CAST(count(DISTINCT g.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_positions,
           CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_positions,
           CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS dup_ppm
    FROM g JOIN df USING (h)
    GROUP BY source ORDER BY source
    """,
)
def x139_dup_substring_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication mass per source (the corpus-level audit
    behind Lee et al. 2021's 'Deduplicating Training Data Makes Language
    Models Better'): the fraction of 10-token gram POSITIONS whose gram
    occurs in at least one OTHER document — i.e. how much of each
    source's token stream is verbatim text shared across documents.
    Complements x113 (novelty counts DISTINCT shingles; this weights by
    occurrence mass, which is what the training loss actually sees) and
    x93 (whole-doc exact dups; this catches partial copies a doc-hash
    misses).

    Plan: one exploded gram scan hashed to 8-byte keys -> distinct-doc df
    per gram (hash agg) -> join back -> per-source conditional sums. The
    same two-shuffle shape as x113; no pair join anywhere, so corpus
    growth is linear in gram volume. ppm is exact integer floor-division
    in both engines."""
    from ..functions.dedupfns import token_hash60

    d = load_parallel(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # r15: word_ngrams (per-row zip_with chain) — the slice-inside-lambda
    # form re-split the text per gram (guide §4.1); identical strings
    grams = word_ngrams("text", 10)
    g = (
        d.filter(F.size(toks) >= 10)
        .select("doc_id", "source", F.explode(grams).alias("gm"))
        .select("doc_id", "source", token_hash60("gm").alias("h"))
    )
    df_ = g.groupBy("h").agg(F.countDistinct("doc_id").alias("ndocs"))
    return (
        g.join(df_, "h")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_positions"),
            F.sum((F.col("ndocs") >= 2).cast("long")).alias("dup_positions"),
            F.floor(
                F.sum((F.col("ndocs") >= 2).cast("long"))
                * F.lit(1_000_000)
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("dup_ppm"),
        )
        .orderBy("source")
    )


@query(
    "x147_dup_degree_histogram",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {{J}} >= 0.5),
    deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
              SELECT id_a AS doc_id FROM pairs
              UNION ALL SELECT id_b FROM pairs) GROUP BY doc_id)
    SELECT degree,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(degree) AS BIGINT) AS edge_endpoints
    FROM deg GROUP BY degree ORDER BY degree
    """.replace("{J}", _J_SQL),
)
def x147_dup_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup pair graph (x12c, threshold
    0.5): how many documents have exactly k near-duplicates. The graph
    shape diagnostic that separates benign PAIRWISE duplication (mass at
    degree 1-2: mirrored posts) from boilerplate HUBS (a heavy tail:
    one template matched by thousands — the input that motivates every
    df-cap in this family and the first thing to inspect when x12h's
    cluster sizes explode). Plan: the x12c pair join, one explode of
    each edge into its two endpoints, two hash aggs — degree never
    requires a second pair pass. Output is |distinct degrees| rows."""
    from ..functions.dedupfns import ngram_jaccard_pairs

    d = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5).select("id_a", "id_b")
    # r16 (guide §2.4, the dup_clusters fix): the 2-branch endpoint union
    # re-ran the shingle pair pipeline once per branch; an in-row 2-way
    # explode emits both endpoints from ONE pass. Rows identical.
    ends = pairs.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("doc_id")
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("degree").alias("edge_endpoints"),
        )
        .orderBy("degree")
    )


@query(
    "x150_minhash_calibration",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b,
                     CAST(floor({{J}} * 1000000) AS BIGINT) AS jac_ppm
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {{J}} >= 0.3),
    sig AS (SELECT doc_id, i,
                   CAST(min(CAST('0x' || substring(
                        md5(CAST(i AS VARCHAR) || ':' || sh), 1, 15) AS BIGINT))
                     AS BIGINT) AS mh
            FROM ex CROSS JOIN unnest(range(0, 64)) t(i)
            GROUP BY doc_id, i),
    est AS (SELECT p.id_a, p.id_b, p.jac_ppm,
                   CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT) AS m
            FROM pairs p
            JOIN sig sa ON sa.doc_id = p.id_a
            JOIN sig sb ON sb.doc_id = p.id_b AND sb.i = sa.i
            GROUP BY 1, 2, 3)
    SELECT CAST(jac_ppm // 100000 AS BIGINT) AS jac_decile,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(abs(m * 1000000 // 64 - jac_ppm)) // count(*) AS BIGINT)
             AS mean_abs_err_ppm,
           CAST(max(abs(m * 1000000 // 64 - jac_ppm)) AS BIGINT) AS max_abs_err_ppm
    FROM est GROUP BY 1 ORDER BY jac_decile
    """.replace("{J}", _J_SQL),
)
def x150_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration, fully oracle-checked: for every
    exact-Jaccard pair >= 0.3, compute the 64-hash MinHash ESTIMATE
    (fraction of agreeing signature components) with an md5 hash family
    both engines share, and report mean/max absolute estimation error in
    ppm per exact-Jaccard decile. This closes the evidence loop around
    the rows-only LSH family: x12e's recall tests show the BUCKETING
    finds the pairs; this query hash-checks the ESTIMATOR mathematics
    (E[match fraction] = J, binomial sd ~ sqrt(J(1-J)/64) ~ 6% at J=0.5)
    that the banding thresholds are derived from. The production kernel
    (minhash_signatures) keeps xxhash64 permutations — cheaper per
    shingle; md5 here exists to be engine-replicable, the estimator
    distribution is hash-family-independent. Plan: one shingle explode
    x 64 hash ids -> per-(doc, i) min agg; the error join touches only
    the (tiny) exact pair set."""
    from ..functions.dedupfns import (
        md5_minhash_rows,
        ngram_jaccard_pairs,
        shingles,
    )

    d = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.3).select(
        "id_a", "id_b",
        F.floor(F.col("jaccard") * 1_000_000).cast("long").alias("jac_ppm"),
    )
    ex = d.select("doc_id", F.explode(shingles("text", 3)).alias("sh"))
    # min-agg columns + stack unpivot, never the occurrence x 64 row
    # explode (the 64x-octave spill) — see dedupfns.md5_minhash_rows.
    # r16 NOTE (guide §1.1): a "keep the signature WIDE, count matches as
    # a 64-term in-row sum" rewrite was built and interleave-A/B'd at
    # sf0.1: 4.07s (this form) vs 4.39s (wide) — NOT shipped. The two
    # sa/sb references do NOT rebuild the signature: their exchanges are
    # structurally identical, so ReuseExchange computes the md5 agg once;
    # the per-(pair, i) fan-out is tiny because the exact pair set is.
    sig = md5_minhash_rows(ex)
    sa = sig.select(F.col("doc_id").alias("id_a"), "i", F.col("mh").alias("mha"))
    sb = sig.select(F.col("doc_id").alias("id_b"), "i", F.col("mh").alias("mhb"))
    est = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "i"])
        .groupBy("id_a", "id_b", "jac_ppm")
        .agg(F.sum((F.col("mha") == F.col("mhb")).cast("long")).alias("m"))
    )
    err = F.abs(F.floor(F.col("m") * 1_000_000 / 64) - F.col("jac_ppm"))
    return (
        est.groupBy(F.floor(F.col("jac_ppm") / 100_000).cast("long").alias("jac_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.floor(F.sum(err) / F.count(F.lit(1))).cast("long").alias("mean_abs_err_ppm"),
            F.max(err).cast("long").alias("max_abs_err_ppm"),
        )
        .orderBy("jac_decile")
    )


@query(
    "x161_contamination_closure",
    oracle=f"""
    WITH RECURSIVE
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {dround_sql("inter / (sa.n + sb.n - inter)", 6)} >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM pairs),
    reach(doc_id, hops) AS (
      SELECT doc_id, 0 FROM documents WHERE doc_id < 10
      UNION ALL
      SELECT e.dst, r.hops + 1 FROM reach r
      JOIN edges e ON e.src = r.doc_id
      WHERE r.hops < 3
    )
    SELECT doc_id, CAST(min(hops) AS BIGINT) AS hops
    FROM reach GROUP BY doc_id ORDER BY doc_id
    """,
)
def x161_contamination_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSITIVE benchmark-contamination closure via a recursive CTE
    (Spark 4 WITH RECURSIVE): seed docs (doc_id < 10 standing in for the
    eval set) expand through the exact near-dup pair graph (x12c, word-
    3-gram Jaccard >= 0.5) up to 3 hops, reporting each reachable doc
    with its minimum hop count — the "remove everything a contaminated
    doc leaks into" sweep (decontamination needs the closure, not just
    direct matches: A~eval, B~A, B leaks eval phrasing without matching
    it). The depth cap both bounds recursion state AND is the policy knob
    (hop-3 guilt-by-association is already aggressive). UNION ALL
    recursion enumerates bounded-length paths and the final min-hop agg
    dedups, so cycles in the undirected pair graph cannot loop — the
    formulation both engines execute identically. Scale path: the SAME
    3 self-join rounds on the banded pair table (each a key-partitioned
    equi-join); x12h's label propagation is the UNBOUNDED-diameter tool —
    this op is the bounded-policy variant."""
    from ..functions.dedupfns import ngram_jaccard_pairs

    d = load_parallel(spark, sf_dir, "documents")
    pairs = (
        ngram_jaccard_pairs(d, n=3, threshold=0.5)
        .select("id_a", "id_b")
        # r15 optimization (guide §2.4, the x92 pattern): the recursive
        # closure re-evaluates the edge view on EVERY hop and the union
        # reads the pair set twice — without truncation the banded
        # shingle self-join (the expensive stage) executes 5x per run.
        # Materialize the bounded pair set once; hops re-read blocks.
        .localCheckpoint(eager=True)
    )
    edges = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).toDF("src", "dst")
    edges.createOrReplaceTempView("x161_edges")
    d.select("doc_id").filter(F.col("doc_id") < 10).createOrReplaceTempView(
        "x161_seeds"
    )
    return spark.sql(
        """
        WITH RECURSIVE reach(doc_id, hops) AS (
          SELECT doc_id, 0 FROM x161_seeds
          UNION ALL
          SELECT e.dst, r.hops + 1 FROM reach r
          JOIN x161_edges e ON e.src = r.doc_id
          WHERE r.hops < 3
        )
        SELECT doc_id, CAST(min(hops) AS BIGINT) AS hops
        FROM reach GROUP BY doc_id ORDER BY doc_id
        """
    )


@query(
    "x164_dup_graph_triangles",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    e AS (SELECT id_a, id_b FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE {dround_sql("inter / (sa.n + sb.n - inter)", 6)} >= 0.5),
    tri AS (SELECT count(*) AS n_triangles
            FROM e e1 JOIN e e2 ON e2.id_a = e1.id_b
                      JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
    deg AS (SELECT doc_id, count(*) AS d FROM (
              SELECT id_a AS doc_id FROM e UNION ALL SELECT id_b FROM e)
            GROUP BY doc_id),
    wed AS (SELECT sum(d * (d - 1) // 2) AS n_wedges FROM deg)
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST(tri.n_triangles AS BIGINT) AS n_triangles,
           CAST(wed.n_wedges AS BIGINT) AS n_wedges,
           {dround_sql(
               "CASE WHEN wed.n_wedges = 0 THEN 0.0 "
               "ELSE 3.0 * tri.n_triangles / wed.n_wedges END", 6)}
             AS clustering_coeff
    FROM tri, wed
    """,
)
def x164_dup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + global clustering coefficient of the near-dup
    graph (x12c edges at jaccard >= 0.5): distinguishes CLIQUE-shaped
    duplication (exact re-posts — every pair similar, coefficient -> 1)
    from STAR/CHAIN-shaped template drift (hub page with many variants
    that differ pairwise, coefficient -> 0) — the diagnostic that decides
    whether keep-one-per-cluster (cliques) or hierarchical merge (chains)
    is the right dedup policy. Plan: edges stay id_a < id_b (each
    triangle counted once as a < b < c), triangle count is two
    equi-joins on the ORIENTED edge list — the standard bound of
    O(sum of d(v)^2) work that survives at 100 TB when edges are
    pre-bucketed by vertex, far from the naive 3-way cross join; wedges
    are one degree agg. Zero-edge corpora yield the 0-triangle/0-wedge
    row with coefficient 0 in both engines."""
    from ..functions.dedupfns import ngram_jaccard_pairs

    d = load_parallel(spark, sf_dir, "documents")
    e = ngram_jaccard_pairs(d, n=3, threshold=0.5).select("id_a", "id_b").cache()
    e1 = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e2 = e.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    e3 = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    deg = (
        e.select(F.col("id_a").alias("doc_id"))
        .union(e.select(F.col("id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wed = deg.agg(
        F.coalesce(F.sum(F.expr("d * (d - 1) DIV 2")), F.lit(0)).alias("n_wedges")
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    cc = F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
        dround(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6)
    )
    return (
        ne.crossJoin(tri)
        .crossJoin(wed)
        .select(
            "n_edges",
            "n_triangles",
            "n_wedges",
            cc.alias("clustering_coeff"),
        )
    )


@query(
    "x168_dup_graph_pagerank",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    e0 AS (SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE {dround_sql("inter / (sa.n + sb.n - inter)", 6)} >= 0.5),
    ed AS (SELECT id_a AS src, id_b AS dst FROM e0
           UNION ALL SELECT id_b, id_a FROM e0),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY src),
    p0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS pr FROM deg),
    c0 AS (SELECT ed.dst AS node, SUM(p0.pr // deg.deg) AS s
           FROM ed JOIN p0 ON p0.node = ed.src JOIN deg ON deg.src = ed.src
           GROUP BY ed.dst),
    p1 AS (SELECT node, 150000000000 + (85 * s) // 100 AS pr FROM c0),
    c1 AS (SELECT ed.dst AS node, SUM(p1.pr // deg.deg) AS s
           FROM ed JOIN p1 ON p1.node = ed.src JOIN deg ON deg.src = ed.src
           GROUP BY ed.dst),
    p2 AS (SELECT node, 150000000000 + (85 * s) // 100 AS pr FROM c1),
    c2 AS (SELECT ed.dst AS node, SUM(p2.pr // deg.deg) AS s
           FROM ed JOIN p2 ON p2.node = ed.src JOIN deg ON deg.src = ed.src
           GROUP BY ed.dst),
    p3 AS (SELECT node, 150000000000 + (85 * s) // 100 AS pr FROM c2)
    SELECT p3.node AS doc_id, deg.deg,
           CAST(p3.pr AS BIGINT) AS pagerank_e12
    FROM p3 JOIN deg ON deg.src = p3.node
    ORDER BY doc_id
    """,
)
def x168_dup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup graph (x12c edges at jaccard >= 0.5,
    damping 0.85, 3 iterations) — centrality separates the CANONICAL
    document of a duplication neighborhood (the hub every variant links
    to) from its derivatives, a keep-best signal that, unlike x70's
    per-doc quality score, uses the graph STRUCTURE. Arithmetic is pure
    integers so an iterative float algorithm becomes hash-checkable: pr
    lives at scale 1e12, per-neighbor contribution is exact integer
    division pr div deg, and the update is 0.15e12 + (85 * s) div 100 —
    bit-identical in Spark (`div`) and DuckDB (`//`), no
    summation-order hazard since integer addition commutes. Fixed depth
    makes the oracle expressible by unrolling (the x161 lesson, minus
    the recursion). Plan: each iteration is one join of the pr vector
    with the degree-annotated edge list + one vertex-keyed hash agg; at
    100 TB both sides pre-partition by vertex once and every iteration
    reuses that exchange (no resort), total work 3 x |E| — the same
    bounded-iteration discipline as x12h's label propagation."""
    from ..functions.dedupfns import ngram_jaccard_pairs

    d = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5).select("id_a", "id_b")
    ed = (
        # r16 (guide §2.4, the dup_clusters fix): in-row 2-way explode —
        # the former 2-branch union ran the shingle pair-build once per
        # direction even inside the single checkpoint materialization.
        pairs.select(
            F.explode(
                F.expr(
                    "array(struct(id_a as src, id_b as dst),"
                    " struct(id_b as src, id_a as dst))"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        # materialize the edge list ONCE: every iteration joins against it,
        # and without lineage truncation the shingle pair-build would re-run
        # per iteration (the x12h label-propagation discipline)
        .localCheckpoint(eager=True)
    )
    deg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    pr = deg.select(F.col("src").alias("node"), F.lit(10**12).alias("pr"))
    for _ in range(3):
        contrib = pr.join(deg, pr["node"] == deg["src"]).select(
            "node", F.expr("pr div deg").alias("c")
        )
        s = (
            ed.join(contrib, ed["src"] == contrib["node"])
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = s.select(
            F.col("dst").alias("node"),
            (F.lit(150_000_000_000) + F.expr("(85 * s) div 100")).alias("pr"),
        )
    return (
        pr.join(deg, pr["node"] == deg["src"])
        .select(
            F.col("node").alias("doc_id"),
            "deg",
            F.col("pr").cast("long").alias("pagerank_e12"),
        )
        .orderBy("doc_id")
    )


@query("x230_kcore_decomposition")
def x230_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core membership of the near-dup graph (x12c edges at jaccard >=
    0.5): full-graph degree plus in-2-core / in-3-core flags per node —
    the density stratification x147's degree histogram can't give: a
    degree-5 node might hang off five separate chains (peels away
    instantly) or sit inside a dense clique (survives every peel); core
    membership separates SYSTEMIC duplication worth a template fix from
    incidental pair noise, and the 3-core is the candidate set x164's
    triangle census concentrates in. No SQL oracle (iterative peel);
    correctness rides tests/test_kcore.py (hand-checked graphs + a
    pure-Python peel on the fixture's own edges). Plan: the peel is
    degree-agg + semi-joins per round on a monotonically SHRINKING edge
    set, lineage cut per round, <=12 rounds (functions/dedupfns.py:
    kcore_nodes); the only driver scalars are per-round node counts."""
    from ..functions.dedupfns import kcore_nodes, ngram_jaccard_pairs

    d = load_parallel(spark, sf_dir, "documents")
    e = ngram_jaccard_pairs(d, n=3, threshold=0.5).select("id_a", "id_b")
    e = e.localCheckpoint()
    deg = (
        e.select(F.col("id_a").alias("doc_id"))
        .unionAll(e.select(F.col("id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    c2 = kcore_nodes(e, 2).withColumnRenamed("node", "doc_id").withColumn(
        "in_core2", F.lit(True)
    )
    c3 = kcore_nodes(e, 3).withColumnRenamed("node", "doc_id").withColumn(
        "in_core3", F.lit(True)
    )
    return (
        deg.join(c2, "doc_id", "left")
        .join(c3, "doc_id", "left")
        .select(
            "doc_id",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("in_core2", F.lit(False)).alias("in_core2"),
            F.coalesce("in_core3", F.lit(False)).alias("in_core3"),
        )
        .orderBy("doc_id")
    )


@query(
    "x238_group_kfold_split",
    oracle=f"""
    WITH cl AS (SELECT doc_id, lang, n_chars,
                       min(doc_id) OVER (PARTITION BY md5(text)) AS cluster
                FROM documents),
    fd AS (SELECT *,
                  CAST('0x' || substring(md5(CAST(cluster AS VARCHAR)), 1, 15)
                       AS BIGINT) % 5 AS fold
           FROM cl)
    SELECT fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
           CAST(sum(n_chars) AS BIGINT) AS char_mass,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS en_share_ppm
    FROM fd GROUP BY fold ORDER BY fold
    """,
)
def x238_group_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 5-fold assignment: every EXACT-DUP CLUSTER (md5 text
    groups, lowest-id representative) lands wholly in one fold via the
    md5 clock on its representative id — the GroupKFold discipline that
    keeps duplicate documents from straddling a train/eval boundary
    (x92 splits train vs eval once; this generalizes to k folds for
    cross-validation), with the per-fold balance audit (doc count,
    cluster count, char mass, language share) that tells you whether the
    hash folds are usable as-is. Determinism: the md5-derived fold is
    the engine-portable x177 clock idiom, not rand(); shares are exact
    ppm integers. Plan: the cluster id is a text-hash-partitioned window
    min (equivalently one hash agg), fold assignment is map-side, and
    the audit is one |folds|-row agg — the corpus is scanned once and
    never joined."""
    d = load(spark, sf_dir, "documents")
    wcl = Window.partitionBy(F.md5("text"))
    cl = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.min("doc_id").over(wcl).alias("cluster"),
    )
    fold = (
        F.expr(
            "cast(conv(substring(md5(cast(cluster as string)), 1, 15),"
            " 16, 10) as bigint)"
        )
        % 5
    )
    return (
        cl.select("lang", "n_chars", "cluster", fold.alias("fold"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster").alias("n_clusters"),
            F.sum("n_chars").alias("char_mass"),
            F.expr(
                "cast(sum(case when lang = 'en' then 1 else 0 end)"
                " * 1000000 div count(1) as bigint)"
            ).alias("en_share_ppm"),
        )
        .select(
            F.col("fold").cast("long").alias("fold"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            F.col("char_mass").cast("long").alias("char_mass"),
            "en_share_ppm",
        )
        .orderBy("fold")
    )


@query(
    "x255_capture_recapture",
    oracle="""
    WITH cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS nd
                 FROM documents GROUP BY source),
    a AS (SELECT source FROM cnt ORDER BY nd DESC, source LIMIT 1),
    ab AS (SELECT source FROM cnt ORDER BY nd DESC, source LIMIT 2),
    b AS (SELECT source FROM ab WHERE source NOT IN (SELECT source FROM a)),
    tok AS (SELECT d.source, string_split(d.text, ' ') AS toks
            FROM documents d
            WHERE d.source IN (SELECT source FROM ab)),
    grams AS (SELECT DISTINCT source, gram
              FROM (SELECT source,
                           unnest(list_transform(
                               range(1, greatest(len(toks) - 3, 1)),
                               i -> array_to_string(toks[i:i+4], ' ')))
                               AS gram
                    FROM tok)),
    sets AS (SELECT
        CAST(sum(CASE WHEN source = (SELECT source FROM a)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN source = (SELECT source FROM b)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(count(*) - count(DISTINCT gram) AS BIGINT) AS overlap
        FROM grams)
    SELECT (SELECT source FROM a) AS source_a,
           (SELECT source FROM b) AS source_b,
           n_a, n_b, overlap,
           CAST(CAST(overlap AS HUGEINT) * 1000000
                // (n_a + n_b - overlap) AS BIGINT) AS jaccard_ppm,
           CAST((CAST(n_a + 1 AS HUGEINT) * (n_b + 1)) // (overlap + 1) - 1
                AS BIGINT) AS chapman_est
    FROM sets
    """,
)
def x255_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Chapman) estimate of the TOTAL distinct
    5-gram content two sources are drawing from: treat the largest
    source's gram set as the marked sample, the second largest as the
    recapture, and estimate N = (n_a+1)(n_b+1)/(m+1) - 1 from the
    overlap m — the 'how big is the underlying pool' question behind
    crawl-coverage planning (x191's Chao1 asks it WITHIN one corpus
    from singleton counts; capture-recapture asks it ACROSS two
    independent crawls, which is how web-scale coverage is actually
    audited). All counts are exact distinct-gram cardinalities
    (overlap = |rows| - |distinct grams| over the two tagged sets, no
    pairwise join), the estimator is one integer `div` on
    HUGEINT/decimal. Plan: one explode over the two selected sources
    only (source filter pushed to the scan), a distinct agg, a 1-row
    reduction; the source picks are 1/2-row broadcasts. Degenerate
    single-source corpora agree with the oracle by construction (left
    join on the empty b pick + coalesce'd n_b; pinned by
    tests/test_dedup.py)."""
    d = load_parallel(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(F.count(F.lit(1)).alias("nd"))
    a = (
        cnt.orderBy(F.col("nd").desc(), "source")
        .limit(1)
        .select(F.col("source").alias("src_a"))
    )
    ab = cnt.orderBy(F.col("nd").desc(), "source").limit(2).select("source")
    b = (
        ab.join(a, ab["source"] == a["src_a"], "anti")
        .select(F.col("source").alias("src_b"))
    )
    tok = (
        d.join(
            F.broadcast(ab.withColumnRenamed("source", "sel")),
            F.col("source") == F.col("sel"),
            "semi",
        )
        .select("source", F.split("text", " ").alias("toks"))
    )
    grams = tok.select(
        "source",
        F.explode(
            # docs shorter than 5 tokens contribute NO gram (matches the
            # oracle's empty range — a 4-token doc must not emit a short
            # pseudo-gram in one engine only)
            F.expr(
                "case when size(toks) >= 5 then"
                " transform(sequence(1, size(toks) - 4),"
                " i -> array_join(slice(toks, i, 5), ' '))"
                " else array() end"
            )
        ).alias("gram"),
    ).distinct()
    # b is 0 rows on a single-source corpus: a crossJoin would empty the
    # gram stream and the final agg (round-11 ADVICE divergence), while
    # the oracle's `CASE WHEN source = (SELECT … FROM b)` falls through
    # NULL to ELSE 0 and still reports source_a's counts. A left join on
    # the 0-or-1-row broadcast keeps every gram row (src_b NULL), and the
    # coalesce makes the NULL comparison count as 0 exactly like the
    # oracle's CASE — multi-source corpora take the identical plan (the
    # TRUE-condition left join against a 1-row broadcast IS a cross
    # join).
    sets = (
        grams.crossJoin(F.broadcast(a))
        .join(F.broadcast(b), F.lit(True), "left")
        .agg(
            F.sum((F.col("source") == F.col("src_a")).cast("long"))
            .cast("long")
            .alias("n_a"),
            F.sum(
                F.coalesce(
                    (F.col("source") == F.col("src_b")).cast("long"),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias("n_b"),
            (F.count(F.lit(1)) - F.countDistinct("gram"))
            .cast("long")
            .alias("overlap"),
            F.any_value("src_a").alias("source_a"),
            F.any_value("src_b").alias("source_b"),
        )
    )
    return sets.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        "overlap",
        F.expr(
            "cast(cast(overlap as decimal(38,0)) * 1000000"
            " div (n_a + n_b - overlap) as bigint)"
        ).alias("jaccard_ppm"),
        F.expr(
            "cast(cast(n_a + 1 as decimal(38,0)) * (n_b + 1)"
            " div (overlap + 1) - 1 as bigint)"
        ).alias("chapman_est"),
    )


def _pow_chain(expr: str, k: int) -> str:
    """x^k (k a power of two) as an explicit repeated-squaring multiply
    chain — the SAME parenthesized IEEE multiplication tree in Spark and
    DuckDB, because libm pow() is not correctly rounded and differs
    between engines while individual multiplies are exact-rounded
    everywhere."""
    assert k & (k - 1) == 0 and k >= 1
    while k > 1:
        expr = f"({expr}*{expr})"
        k //= 2
    return expr


#: Default hot-shingle document-frequency cap for the exact pair-table
#: builds in x256/x260 (the x43b guardrail, mirrored in their oracles as
#: a HAVING anti-join). A shingle shared by k docs contributes O(k^2)
#: join rows BEFORE any similarity filter runs; capping k bounds the
#: worst key. MEASURED max shingle df per fixture: sf0.001 = 9,
#: sf0.01 = 7, sf0.1 = 25 — so 64 is a provable no-op at every tested
#: fixture (the round-12 value of 8 was NOT: it clipped 1 shingle at
#: sf0.001 and 16,611 at sf0.1, collapsing x260's audit queue from 21
#: rows to 5 and silently redefining both queries at bench scale —
#: round-13 ADVICE). The cap is a parameter of
#: :func:`_candidate_pair_table` (the ``max_shingle_freq`` plumbing
#: pattern from x92/x12h); x267 value-verifies the ENGAGED semantics at
#: caps 4..32 against a DuckDB oracle, while x256/x260 keep the
#: uncapped truth at fixture scale with the guardrail wired in the
#: plan. At a literal 100 TB the right setting is an ABSOLUTE doc count
#: (~1e4, the leakage_safe_split guidance): the cap also bounds the
#: r16 in-row pair emission (<= C(cap,2) structs per shingle row), so
#: keep it engaged on any production-scale path.
_PAIR_DF_CAP = 64


def _candidate_pair_table(sh, max_df: int = _PAIR_DF_CAP):
    """Exact candidate pair table over an exploded-shingle frame
    ``sh(id, s)``: per-shingle doc-id grouping with the ``max_df`` cap
    (x43b guardrail), in-row pair emission, per-pair intersection
    counts, sizes from the UNCAPPED per-doc shingle counts (the cap
    clips the pair fan-out's worst key, not the similarity denominator),
    jac >= 0.2 by integer cross-multiply. Shared by x256 (planner) and
    x260 (audit queue); their oracles mirror the cap as ``HAVING
    count(*) > max_df``.

    r16 shape (guide §2.4/§2.5, the x267 rewrite): ONE shuffle groups
    each shingle's distinct doc ids into a sorted array; candidate
    pairs are emitted IN-ROW from the df-bounded array (<= C(max_df,2)
    structs per shingle — the same rows the former hot-anti-join +
    self-join produced, without the df join or the second probe pass),
    and sizes re-explode the grouped table instead of re-reading the
    shingle stream. This retired the callers' exploded-shingle persist,
    whose 3-consumer tree raced concurrent cache materializations under
    AQE (the x267 timeline: 7 overlapping 32-task jobs). The grouped
    table is persisted and eager-counted HERE — callers receive
    ``(pairs, grouped)`` and must unpersist ``grouped`` after their
    terminal action. The in-row emission is bounded ONLY by ``max_df``:
    an uncapped call (max_df >> corpus df) materializes C(df,2) structs
    per hot shingle in one row — keep the cap engaged on any
    production-scale path (the self-join form merely streamed the same
    quadratic rows; neither shape makes an uncapped hot key linear)."""
    g = (
        sh.groupBy("s")
        .agg(
            F.sort_array(F.collect_list("id")).alias("ids"),
            F.count(F.lit(1)).alias("df_"),
        )
        .persist()
    )
    g.count()  # materialize ONCE before the consumers fan out
    sizes = (
        g.select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    # ids are distinct per shingle (shingles() emits per-doc distinct),
    # so i < j over the sorted array IS the a.id < b.id condition of the
    # old self-join, row for row.
    pair_expr = F.expr(
        "flatten(transform(sequence(1, size(ids) - 1),"
        " j -> transform(sequence(0, j - 1),"
        " i -> struct(ids[i] as id_a, ids[j] as id_b))))"
    )
    inter = (
        g.filter((F.col("df_") >= 2) & (F.col("df_") <= max_df))
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    pairs = (
        inter.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")),
            "id_b",
        )
        .filter(
            F.col("inter") * 5 >= F.col("n_a") + F.col("n_b") - F.col("inter")
        )
    )
    return pairs, g

_LSH_CONFIGS = [(2, 16), (4, 8), (4, 32), (8, 4), (8, 16)]


def _lsh_prob_expr(r: int, b: int) -> str:
    """P(candidate | jaccard s3) = 1 - (1 - s3^r)^b, s3 the 3-dp
    quantized similarity, as a pure multiply-chain expression."""
    s = "(cast(inter * 1000 div (n_a + n_b - inter) as double) / 1000.0)"
    sr = _pow_chain(s, r)
    return f"(1.0 - {_pow_chain(f'(1.0 - {sr})', b)})"


_LSH_PROB_SQL = {
    (r, b): _lsh_prob_expr(r, b).replace(" div ", " // ")
    for r, b in _LSH_CONFIGS
}


@query(
    "x256_lsh_parameter_planner",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    hot AS (SELECT sh FROM ex GROUP BY sh HAVING count(*) > {_PAIR_DF_CAP}),
    exj AS (SELECT doc_id, sh FROM ex ANTI JOIN hot USING (sh)),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(count(*) AS BIGINT) AS inter
              FROM exj a JOIN exj b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pj AS (SELECT inter, CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b
           FROM pairs
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE inter * 5 >= n_a + n_b - inter)
    {" UNION ALL ".join(
        f'''SELECT CAST({r} AS BIGINT) AS r, CAST({b} AS BIGINT) AS b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           {dround_sql(f"CAST(SUM(CAST({p} AS DECIMAL(38,6))) AS DOUBLE)", 4)}
               AS exp_detected,
           {dround_sql(
               f"CAST(SUM(CASE WHEN inter * 5 >= 4 * (n_a + n_b - inter)"
               f" THEN CAST({p} AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE)", 4)}
               AS exp_detected_high,
           {dround_sql(
               f"CAST(SUM(CASE WHEN inter * 10 < 3 * (n_a + n_b - inter)"
               f" THEN CAST({p} AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE)", 4)}
               AS exp_fp
        FROM pj'''
        for (r, b), p in _LSH_PROB_SQL.items())}
    ORDER BY r, b
    """,
)
def x256_lsh_parameter_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH (bands x rows) parameter planner: for each candidate
    config, the EXPECTED dup-pair yield on THIS corpus — total, on the
    high-similarity band the pipeline must not miss (jac >= 0.8), and on
    the sub-0.3 band it must not drown in — from the analytic S-curve
    P(candidate) = 1 - (1 - s^r)^b evaluated over the exact candidate
    pair-similarity table (x150 calibrates the ESTIMATOR against truth;
    this chooses the BANDING, which is the knob that sets x12e's cost).
    Cross-engine exactness: similarities quantize to 3 dp via integer
    cross-multiply, and every power is an explicit repeated-squaring
    multiply CHAIN (libm pow() is not correctly rounded and differs
    between engines; parenthesized multiplies are exact-rounded in
    both), then decimal-summed. Plan: one shingle self-join builds the
    pair table once (the x12c candidate shape, jac >= 0.2 by
    cross-multiply); the 5 config aggregates are conditional sums over
    that one table — no per-config rescans of the corpus. The pair build
    rides the _PAIR_DF_CAP cap (x43b guardrail — default 64, a MEASURED
    no-op at every fixture, mirrored in the oracle as the hot-shingle
    anti-join; x267 verifies the engaged-cap semantics), which is also
    what x12e's production banding actually sees — its bucket join caps
    the same way. r16: the pair build is the grouped in-row form (see
    _candidate_pair_table)."""
    d = load_parallel(spark, sf_dir, "documents")
    from ..functions.dedupfns import shingles

    sh = d.select(
        "doc_id", F.explode(shingles("text", 3)).alias("s_str")
    ).select(F.col("doc_id").alias("id"), F.xxhash64("s_str").alias("s"))
    cand, grouped = _candidate_pair_table(sh)
    pj = None
    try:
        # r16 (guide §7.3 driver planning + §2.4): TWO fixes over the r15
        # form, both measured.
        #
        # (1) The textual _pow_chain DUPLICATED its operand at every
        # squaring step — (1-s^r)^b expands to r*b textual copies of the
        # quantized-similarity expression, ~70 KB of SQL text / ~10^5
        # expression-tree nodes across 5 configs x 3 sums, measured as a
        # 4.8 s driver gap before the FIRST job plus per-row
        # re-interpretation of the full chain in every sum. Each squaring
        # step is now a NAMED intermediate column (CollapseProject keeps
        # non-cheap aliases referenced >1x, so codegen evaluates each step
        # once per row and the plan stays ~log(r*b) nodes per config).
        # The multiply SEQUENCE — and therefore every IEEE rounding — is
        # unchanged: measured bit-equal output at sf0.1, 1.88x alone.
        #
        # (2) With the ladders named, ALL 5 configs fit in ONE codegen'd
        # aggregation pass + a stack() unpivot of the 1-row state — the
        # exact fusion r15 tried and reverted (its textual form fell out
        # of whole-stage codegen; the method-budget blowup is gone with
        # named steps). One scan of the pair table instead of five, the
        # pj persist retired (single consumer), bit-equal output,
        # measured a further 1.13x at sf0.1.
        #
        # The ORACLE keeps the textual chain: DuckDB parses it in ms and
        # the two engines' arithmetic stays identical by construction.
        df = (
            cand
            .select("inter", "n_a", "n_b")
            .withColumn(
                "s",
                F.expr(
                    "cast(inter * 1000 div (n_a + n_b - inter) as double)"
                    " / 1000.0"
                ),
            )
        )
        aggs = [F.count(F.lit(1)).cast("long").alias("n_pairs")]
        zero = F.lit(0).cast("decimal(38,6)")
        high = F.col("inter") * 5 >= 4 * (
            F.col("n_a") + F.col("n_b") - F.col("inter")
        )
        low = F.col("inter") * 10 < 3 * (
            F.col("n_a") + F.col("n_b") - F.col("inter")
        )
        i = 0
        for r, b in _LSH_CONFIGS:
            c, kk = F.col("s"), r
            while kk > 1:  # s^r by repeated squaring, one named col/step
                df = df.withColumn(f"_w{i}", c * c)
                c = F.col(f"_w{i}")
                kk //= 2
                i += 1
            df = df.withColumn(f"_t{i}", F.lit(1.0) - c)
            c, kk = F.col(f"_t{i}"), b
            i += 1
            while kk > 1:  # (1-s^r)^b by repeated squaring
                df = df.withColumn(f"_w{i}", c * c)
                c = F.col(f"_w{i}")
                kk //= 2
                i += 1
            p = (F.lit(1.0) - c).cast("decimal(38,6)")
            df = df.withColumn(f"_p_{r}_{b}", p)
            pc = F.col(f"_p_{r}_{b}")
            aggs += [
                dround(F.sum(pc).cast("double"), 4).alias(f"ed_{r}_{b}"),
                dround(
                    F.sum(F.when(high, pc).otherwise(zero)).cast("double"),
                    4,
                ).alias(f"eh_{r}_{b}"),
                dround(
                    F.sum(F.when(low, pc).otherwise(zero)).cast("double"),
                    4,
                ).alias(f"ef_{r}_{b}"),
            ]
        one = df.agg(*aggs)
        stack = (
            "stack({}, {}) as"
            " (r, b, exp_detected, exp_detected_high, exp_fp)".format(
                len(_LSH_CONFIGS),
                ", ".join(
                    f"cast({r} as bigint), cast({b} as bigint),"
                    f" ed_{r}_{b}, eh_{r}_{b}, ef_{r}_{b}"
                    for r, b in _LSH_CONFIGS
                ),
            )
        )
        out = (
            one.select(F.expr(stack), "n_pairs")
            .select(
                "r", "b", "n_pairs",
                "exp_detected", "exp_detected_high", "exp_fp",
            )
            .orderBy("r", "b")
            .localCheckpoint()
        )
        return out
    finally:
        grouped.unpersist(blocking=False)
        if pj is not None:
            pj.unpersist(blocking=False)


@query(
    "x260_pair_audit_queue",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    hot AS (SELECT sh FROM ex GROUP BY sh HAVING count(*) > {_PAIR_DF_CAP}),
    exj AS (SELECT doc_id, sh FROM ex ANTI JOIN hot USING (sh)),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(count(*) AS BIGINT) AS inter
              FROM exj a JOIN exj b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pj AS (SELECT id_a, id_b, inter,
                  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
                  CAST(inter * 20 // (sa.n + sb.n - inter) AS BIGINT) AS bin
           FROM pairs
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE inter * 5 >= sa.n + sb.n - inter),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY bin ORDER BY
                     CAST('0x' || substring(md5(CAST(id_a AS VARCHAR) || ':'
                         || CAST(id_b AS VARCHAR)), 1, 15) AS BIGINT),
                     id_a, id_b) AS rk
          FROM pj)
    SELECT CAST(bin AS BIGINT) AS bin, CAST(rk AS BIGINT) AS rk,
           id_a, id_b,
           {dround_sql("CAST(inter AS DOUBLE) / (n_a + n_b - inter)", 6)}
               AS jaccard
    FROM r WHERE rk <= 5 ORDER BY bin, rk
    """,
)
def x260_pair_audit_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The human-labeling queue for near-dup threshold calibration: up
    to 5 candidate pairs per 0.05-wide similarity bin (jac >= 0.2),
    chosen DETERMINISTICALLY by the md5 clock on the pair id — the
    stratified audit sample an adjudication UI pages through to decide
    where the real dup boundary sits (x109 sweeps thresholds against
    HELD assumptions; this produces the evidence humans label; x127
    panels the signals for one pair). Clock order, not arrival order,
    so the queue is stable under re-crawls and repartitioning (x36's
    discipline applied to pairs). Plan: the x12c candidate pair table
    once; the per-bin pick is a bin-partitioned rank window that
    WindowGroupLimit caps at 5 rows below the sort — no global order,
    |bins| <= 16. The pair build rides the _PAIR_DF_CAP hot-shingle
    anti-join (x43b guardrail — default cap 64, a MEASURED no-op at
    every fixture, mirrored in the oracle; x267 verifies the engaged-cap
    semantics) so one boilerplate 3-gram can't make the audit queue's
    join quadratic at scale. r16: the pair build is the grouped in-row
    form (see _candidate_pair_table) — the grouped table is the one
    persisted relation, unpersisted after the terminal checkpoint."""
    d = load_parallel(spark, sf_dir, "documents")
    from ..functions.dedupfns import shingles

    sh = d.select(
        "doc_id", F.explode(shingles("text", 3)).alias("s_str")
    ).select(F.col("doc_id").alias("id"), F.xxhash64("s_str").alias("s"))
    cand, grouped = _candidate_pair_table(sh)
    try:
        pj = cand.select(
            "id_a",
            "id_b",
            "inter",
            "n_a",
            "n_b",
            F.expr("cast(inter * 20 div (n_a + n_b - inter) as bigint)").alias(
                "bin"
            ),
        )
        clock = F.expr(
            "cast(conv(substring(md5(concat(cast(id_a as string), ':',"
            " cast(id_b as string))), 1, 15), 16, 10) as bigint)"
        )
        w = Window.partitionBy("bin").orderBy(clock, "id_a", "id_b")
        return (
            pj.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= 5)
            .select(
                "bin",
                "rk",
                "id_a",
                "id_b",
                dround(
                    F.col("inter")
                    / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                    6,
                ).alias("jaccard"),
            )
            .orderBy("bin", "rk")
            .localCheckpoint()
        )
    finally:
        grouped.unpersist(blocking=False)


@query(
    "x261_fold_leakage_report",
    oracle=f"""
    WITH RECURSIVE
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    shl AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM shl),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {dround_sql("inter / (sa.n + sb.n - inter)", 6)}
                    >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM pairs),
    reach(doc_id, hops) AS (
      SELECT doc_id, 0 FROM documents WHERE doc_id < 10
      UNION ALL
      SELECT e.dst, r.hops + 1 FROM reach r
      JOIN edges e ON e.src = r.doc_id
      WHERE r.hops < 3
    ),
    cont AS (SELECT doc_id FROM reach GROUP BY doc_id),
    cl AS (SELECT doc_id,
                  min(doc_id) OVER (PARTITION BY md5(text)) AS cluster
           FROM documents),
    folds AS (SELECT doc_id,
                     CAST('0x' || substring(md5(CAST(cluster AS VARCHAR)),
                          1, 15) AS BIGINT) % 5 AS fold
              FROM cl)
    SELECT CAST(f.fold AS BIGINT) AS fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS contaminated_ppm
    FROM folds f LEFT JOIN cont c ON c.doc_id = f.doc_id
    GROUP BY f.fold ORDER BY f.fold
    """,
)
def x261_fold_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The question x161 and x238 exist to answer, composed: how much of
    each GroupKFold fold is inside the hop-3 contamination closure of
    the eval seed set? A fold with nonzero contaminated_ppm cannot be
    used as a clean eval fold no matter how leakage-safe the DUP
    grouping was — contamination flows through NEAR-dup edges that
    exact-dup clustering doesn't see, which is precisely why the two
    operators must be composed before a cross-validation run is
    trusted. Plan: x161's recursive closure (bounded 3 hops on the
    banded pair table) + x238's map-side md5 fold assignment, joined on
    doc_id and rolled up to 5 rows; both inputs' scale stories are
    probed individually and unchanged here."""
    from ..functions.dedupfns import ngram_jaccard_pairs

    d = load_parallel(spark, sf_dir, "documents")
    pairs = (
        ngram_jaccard_pairs(d, n=3, threshold=0.5)
        .select("id_a", "id_b")
        # r15 optimization (guide §2.4, the x92 pattern): same fix as
        # x161 — one materialization of the bounded pair set instead of
        # re-running the shingle self-join per recursion hop + per union
        # branch.
        .localCheckpoint(eager=True)
    )
    edges = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).toDF("src", "dst")
    edges.createOrReplaceTempView("x261_edges")
    d.select("doc_id").filter(F.col("doc_id") < 10).createOrReplaceTempView(
        "x261_seeds"
    )
    cont = spark.sql(
        """
        WITH RECURSIVE reach(doc_id, hops) AS (
          SELECT doc_id, 0 FROM x261_seeds
          UNION ALL
          SELECT e.dst, r.hops + 1 FROM reach r
          JOIN x261_edges e ON e.src = r.doc_id
          WHERE r.hops < 3
        )
        SELECT doc_id FROM reach GROUP BY doc_id
        """
    ).withColumnRenamed("doc_id", "cont_id")
    wcl = Window.partitionBy(F.md5("text"))
    folds = d.select(
        "doc_id", F.min("doc_id").over(wcl).alias("cluster")
    ).select(
        "doc_id",
        (
            F.expr(
                "cast(conv(substring(md5(cast(cluster as string)), 1, 15),"
                " 16, 10) as bigint)"
            )
            % 5
        ).alias("fold"),
    )
    return (
        folds.join(
            F.broadcast(cont), folds["doc_id"] == cont["cont_id"], "left"
        )
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("cont_id").isNotNull().cast("long"))
            .cast("long")
            .alias("n_contaminated"),
            F.expr(
                "cast(sum(cast(cont_id is not null as long)) * 1000000"
                " div count(1) as bigint)"
            ).alias("contaminated_ppm"),
        )
        .orderBy("fold")
    )


@query(
    "x265_keep_policy_comparison",
    oracle="""
    WITH sc AS (SELECT doc_id, n_chars, md5(text) AS h,
                       least(CAST(len(list_filter(string_split(text, ' '),
                                 t -> t IN ('a','the','of','and','to','in')))
                             AS BIGINT) * 5000000
                             // len(string_split(text, ' ')), 1000000)
                           AS dens
                FROM documents),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY h ORDER BY doc_id)
                     AS rk_first,
                 row_number() OVER (PARTITION BY h
                     ORDER BY n_chars DESC, doc_id) AS rk_long,
                 row_number() OVER (PARTITION BY h
                     ORDER BY dens DESC, doc_id) AS rk_dense
          FROM sc),
    pol AS (SELECT 'keep_first' AS policy, doc_id, n_chars, dens
            FROM r WHERE rk_first = 1
            UNION ALL
            SELECT 'keep_longest', doc_id, n_chars, dens
            FROM r WHERE rk_long = 1
            UNION ALL
            SELECT 'keep_densest', doc_id, n_chars, dens
            FROM r WHERE rk_dense = 1)
    SELECT policy,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS chars_kept,
           CAST(sum(dens) // count(*) AS BIGINT) AS mean_dens_ppm
    FROM pol GROUP BY policy ORDER BY policy
    """,
)
def x265_keep_policy_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which representative should a dedup keep? The three standard
    policies — keep-first (stable ids, x12b), keep-longest (max
    content), keep-densest (max quality signal, x70's idea) — compared
    on what they actually retain: per policy, the kept-doc count (equal
    by construction — one per exact-dup cluster — so it doubles as a
    cross-policy sanity check), retained char mass, and mean stopword
    density of the keepers. The table that turns 'we dedup' into a
    REVIEWED policy choice; on real corpora keep-first silently drops
    the longer rewrite ~half the time, and this makes that cost a
    number. Exactness: clusters are md5 text groups; every policy is a
    deterministic cluster-partitioned rank (explicit doc_id tie-break —
    arg_max tie order is engine-undefined, rank order is not). Plan:
    one scan computes hash + density; three hash-partitioned windows
    share the exchange; 3-row rollup."""
    d = load(spark, sf_dir, "documents")
    dens = F.least(
        F.expr(
            "cast(size(filter(split(text, ' '),"
            " t -> array_contains(array('a','the','of','and','to','in'), t)))"
            " as bigint) * 5000000 div size(split(text, ' '))"
        ),
        F.lit(1_000_000).cast("bigint"),
    )
    sc = d.select(
        "doc_id", "n_chars", F.md5("text").alias("h"), dens.alias("dens")
    )
    w1 = Window.partitionBy("h").orderBy("doc_id")
    w2 = Window.partitionBy("h").orderBy(F.col("n_chars").desc(), "doc_id")
    w3 = Window.partitionBy("h").orderBy(F.col("dens").desc(), "doc_id")
    r = sc.select(
        "doc_id",
        "n_chars",
        "dens",
        F.row_number().over(w1).alias("rk_first"),
        F.row_number().over(w2).alias("rk_long"),
        F.row_number().over(w3).alias("rk_dense"),
    )
    # one pass, not a 3-way union of filters: the union form re-evaluates
    # all three windows per branch (9 Window nodes, 3 corpus scans in the
    # static plan); exploding the policy tags in-row keeps each window
    # computed once over the shared md5-hash exchange
    pol = r.select(
        "n_chars",
        "dens",
        F.explode(
            F.array(
                F.when(F.col("rk_first") == 1, F.lit("keep_first")),
                F.when(F.col("rk_long") == 1, F.lit("keep_longest")),
                F.when(F.col("rk_dense") == 1, F.lit("keep_densest")),
            )
        ).alias("policy"),
    ).filter(F.col("policy").isNotNull())
    return (
        pol.groupBy("policy")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
            F.expr("cast(sum(dens) div count(1) as bigint)").alias(
                "mean_dens_ppm"
            ),
        )
        .orderBy("policy")
    )


#: caps evaluated by x267 — the largest (= _PAIR_DF_CAP's default) is the
#: reference table the drop counts are measured against.
_X267_CAPS = [4, 8, 16, 32, 64]


@query(
    "x267_df_cap_sensitivity",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    dft AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ex
              GROUP BY doc_id),
    exd AS (SELECT e.doc_id, e.sh, d.df FROM ex e JOIN dft d USING (sh)
            WHERE d.df <= {_X267_CAPS[-1]}),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              {", ".join(
                  f"CAST(sum(CASE WHEN a.df <= {c} THEN 1 ELSE 0 END)"
                  f" AS BIGINT) AS i{c}" for c in _X267_CAPS)}
              FROM exd a JOIN exd b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pj AS (SELECT p.*, sa.n AS n_a, sb.n AS n_b FROM pairs p
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b),
    agg AS (SELECT
            {", ".join(
                f"CAST(sum(CASE WHEN i{c} * 5 >= n_a + n_b - i{c}"
                f" THEN 1 ELSE 0 END) AS BIGINT) AS np{c},"
                f" CAST(sum(CASE WHEN i{c} * 5 >= n_a + n_b - i{c}"
                f" THEN i{c} ELSE 0 END) AS BIGINT) AS si{c}"
                for c in _X267_CAPS)}
            FROM pj),
    hotagg AS (SELECT
               {", ".join(
                   f"CAST(sum(CASE WHEN df > {c} THEN 1 ELSE 0 END)"
                   f" AS BIGINT) AS nh{c}" for c in _X267_CAPS)}
               FROM dft)
    {" UNION ALL ".join(
        f'''SELECT CAST({c} AS BIGINT) AS cap, nh{c} AS n_hot,
            np{c} AS n_pairs, si{c} AS sum_inter,
            np{_X267_CAPS[-1]} - np{c} AS pairs_dropped,
            si{_X267_CAPS[-1]} - si{c} AS inter_dropped
            FROM agg, hotagg''' for c in _X267_CAPS)}
    ORDER BY cap
    """,
)
def x267_df_cap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the _PAIR_DF_CAP guardrail actually COSTS, per candidate cap:
    for each df cap in {4, 8, 16, 32, 64}, the hot-shingle count the
    anti-join removes, the surviving candidate-pair count and
    intersection mass (the x256/x260 pipeline semantics: capped inter
    over UNCAPPED size denominators, jac >= 0.2 by cross-multiply), and
    the pairs/mass dropped versus the cap-64 reference — the evidence
    the round-12 cap=8 shipped without (it silently collapsed 256
    candidate pairs to 5 at sf0.1; round-13 ADVICE), turned into a
    first-class audited number so 'real speedup' and 'dropped work' can
    never be conflated again. This is also the query that value-verifies
    the ENGAGED cap semantics against DuckDB at every fixture (caps 4-16
    all clip at sf>=0.001), while x256/x260 keep the uncapped truth.
    Plan (r16): ONE shuffle of the shingle rows groups each shingle's
    (distinct, sorted) doc-id list; candidate pairs are emitted IN-ROW
    from the df-bounded array (<= C(64,2) structs per shingle — the same
    rows the former exd self-join produced, without the dft join or the
    second probe pass), and per-shingle df rides along so the per-cap
    sums stay one conditional groupBy. This retired the shingle-table
    persist whose 3-consumer tree raced SEVEN concurrent cache
    materializations under AQE (job timeline: 7 overlapping 32-task
    localCheckpoint jobs); the grouped table is persisted and
    eager-counted instead — one materialization, three cheap readers.
    Isolated interleaved A/B at sf0.1: 3.95 -> 2.45s median, outputs
    asserted equal. The 5 output rows still come from two 1-row
    aggregates."""
    d = load_parallel(spark, sf_dir, "documents")
    from ..functions.dedupfns import shingles

    caps = _X267_CAPS
    sh = d.select(
        "doc_id", F.explode(shingles("text", 3)).alias("s_str")
    ).select(F.col("doc_id").alias("id"), F.xxhash64("s_str").alias("s"))
    g = (
        sh.groupBy("s")
        .agg(
            F.sort_array(F.collect_list("id")).alias("ids"),
            F.count(F.lit(1)).alias("df_"),
        )
        .persist()
    )
    g.count()  # materialize ONCE before the three consumers fan out
    try:
        dft = g  # per-shingle df for the hot-shingle aggregate
        sizes = (
            g.select(F.explode("ids").alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_sh"))
        )
        # (id_a < id_b) pairs from the sorted id array: ids are distinct
        # per shingle (shingles() emits per-doc distinct), so i < j over
        # the sorted array IS the a.id < b.id condition of the old
        # self-join, row for row.
        pair_expr = F.expr(
            "flatten(transform(sequence(1, size(ids) - 1),"
            " j -> transform(sequence(0, j - 1),"
            " i -> struct(ids[i] as id_a, ids[j] as id_b))))"
        )
        pairs = (
            g.filter((F.col("df_") >= 2) & (F.col("df_") <= caps[-1]))
            .select(F.explode(pair_expr).alias("p"), "df_")
            .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
            .agg(
                *[
                    F.sum((F.col("df_") <= c).cast("long"))
                    .cast("long")
                    .alias(f"i{c}")
                    for c in caps
                ]
            )
        )
        pj = pairs.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")),
            "id_a",
        ).join(
            sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")),
            "id_b",
        )
        agg_cols = []
        for c in caps:
            keep = (
                F.col(f"i{c}") * 5
                >= F.col("n_a") + F.col("n_b") - F.col(f"i{c}")
            )
            agg_cols.append(
                F.sum(keep.cast("long")).cast("long").alias(f"np{c}")
            )
            agg_cols.append(
                F.sum(F.when(keep, F.col(f"i{c}")).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"si{c}")
            )
        agg = pj.agg(*agg_cols)
        hotagg = dft.agg(
            *[
                F.sum((F.col("df_") > c).cast("long"))
                .cast("long")
                .alias(f"nh{c}")
                for c in caps
            ]
        )
        one = agg.crossJoin(F.broadcast(hotagg))
        # r15 optimization (guide §2.4, the x281 stack discipline): the
        # former 5-way unionAll of per-cap selects put FIVE copies of the
        # whole pipeline (shingle self-join + conditional sums) in the
        # plan — AQE ran them as ~36 concurrent 32-task jobs, 5x the work
        # (measured 372 CPU-s at sf0.1). The five output rows are plain
        # projections of the ONE aggregated row; a single lazy stack()
        # fan-out emits them from one pipeline pass. Same values, same
        # column order, 1/5th the compute.
        stack_expr = (
            f"stack({len(caps)}, "
            + ", ".join(
                f"cast({c} as bigint), nh{c}, np{c}, si{c},"
                f" np{caps[-1]} - np{c}, si{caps[-1]} - si{c}"
                for c in caps
            )
            + ") as (cap, n_hot, n_pairs, sum_inter,"
            " pairs_dropped, inter_dropped)"
        )
        return one.select(F.expr(stack_expr)).orderBy("cap").localCheckpoint()
    finally:
        g.unpersist(blocking=False)


@query(
    "x269_eval_ngram_decontamination",
    oracle="""
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS toks
                 FROM documents),
    ev AS (SELECT DISTINCT gram
           FROM (SELECT unnest(list_transform(
                     range(1, greatest(len(toks) - 3, 1)),
                     i -> array_to_string(toks[i:i+4], ' '))) AS gram
                 FROM tok WHERE doc_id < 10)),
    corp AS (SELECT doc_id, source, unnest(list_distinct(list_transform(
                 range(1, greatest(len(toks) - 3, 1)),
                 i -> array_to_string(toks[i:i+4], ' ')))) AS gram
             FROM tok WHERE doc_id >= 10),
    hits AS (SELECT doc_id, source,
                    CAST(count(*) AS BIGINT) AS n_hits
             FROM corp JOIN ev USING (gram) GROUP BY 1, 2),
    per_doc AS (SELECT d.doc_id, d.source,
                       COALESCE(h.n_hits, 0) AS n_hits
                FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
                WHERE d.doc_id >= 10)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS contaminated_ppm,
           CAST(sum(n_hits) AS BIGINT) AS gram_hits
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def x269_eval_ngram_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Direct n-gram decontamination of the training corpus against the
    eval seed set (doc_id < 10, x261's convention): per source, how many
    candidate training docs share ANY distinct 5-gram with an eval doc,
    plus the total shared-gram count — the published GPT-3/PaLM-style
    membership test that runs BEFORE training-set freeze. Complementary
    to x261: the closure report follows NEAR-dup edges transitively
    (paraphrase leakage); this is the literal verbatim-overlap gate, the
    one a compliance checklist cites. Engine parity: 5-gram windows use
    x255's idiom (docs shorter than 5 tokens emit NOTHING in both
    engines); counts are exact integers. Plan: the eval gram set is a
    BROADCAST by construction (10 docs); the corpus explodes once,
    distinct-per-doc, and the hit count is one broadcast hash join +
    per-doc then per-source aggs — no corpus self-join anywhere, and at
    100 TB the eval set stays the small side (a 10K-doc eval suite's
    5-gram set is a few hundred MB: bucket it and the join stays
    shuffle-free on the corpus side)."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    )
    gram5 = F.expr(
        "case when size(toks) >= 5 then"
        " array_distinct(transform(sequence(1, size(toks) - 4),"
        " i -> array_join(slice(toks, i, 5), ' ')))"
        " else array() end"
    )
    ev = (
        toks.filter(F.col("doc_id") < 10)
        .select(F.explode(gram5).alias("gram"))
        .distinct()
    )
    corp = toks.filter(F.col("doc_id") >= 10).select(
        "doc_id", "source", F.explode(gram5).alias("gram")
    )
    hits = (
        corp.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    per_doc = (
        d.filter(F.col("doc_id") >= 10)
        .select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .select("source", F.coalesce("n_hits", F.lit(0)).alias("n_hits"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("n_hits") > 0).cast("long"))
            .cast("long")
            .alias("n_contaminated"),
            F.expr(
                "cast(sum(case when n_hits > 0 then 1 else 0 end)"
                " * 1000000 div count(1) as bigint)"
            ).alias("contaminated_ppm"),
            F.sum("n_hits").cast("long").alias("gram_hits"),
        )
        .orderBy("source")
    )


#: gram sizes x271 sweeps — the threshold-choice evidence for x269's
#: n=5 (3-grams flag ~60% of the fixture corpus, 8-grams almost none;
#: the knee is where the gate belongs).
_X271_NS = [3, 4, 5, 8]


@query(
    "x271_decontamination_gram_sweep",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    tagged AS (SELECT doc_id, n, gram FROM (
        {" UNION ALL ".join(
            f'''SELECT doc_id, CAST({n} AS BIGINT) AS n,
                unnest(list_distinct(list_transform(
                    range(1, greatest(len(toks) - {n - 2}, 1)),
                    i -> array_to_string(toks[i:i+{n - 1}], ' ')))) AS gram
                FROM tok''' for n in _X271_NS)})),
    ev AS (SELECT DISTINCT n, gram FROM tagged WHERE doc_id < 10),
    corp AS (SELECT doc_id, n, gram FROM tagged WHERE doc_id >= 10),
    hits AS (SELECT n, doc_id, CAST(count(*) AS BIGINT) AS h
             FROM corp JOIN ev USING (n, gram) GROUP BY 1, 2),
    base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
             WHERE doc_id >= 10)
    SELECT n AS gram_n,
           CAST(count(*) AS BIGINT) AS n_contaminated,
           CAST(count(*) * 1000000 // (SELECT n_docs FROM base) AS BIGINT)
               AS contaminated_ppm,
           CAST(sum(h) AS BIGINT) AS gram_hits
    FROM hits GROUP BY n ORDER BY gram_n
    """,
)
def x271_decontamination_gram_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How x269's gram size should be CHOSEN: the contamination census
    against the eval seed set at n in {3, 4, 5, 8} — contaminated-doc
    counts, corpus ppm, and total shared grams per n. Short grams flag
    common phrases (3-grams mark most of any corpus — useless as a
    gate); long grams miss light edits; the knee of this curve is where
    published pipelines put the cutoff (GPT-3 used 13-grams on much
    longer documents; the fixture's short texts knee lower). Engine parity:
    the per-n window arithmetic is x255's idiom at each n (docs shorter
    than n emit nothing in both engines). Plan: ONE corpus scan emits
    (n, gram)-tagged distinct grams for all four sizes (a 4-way
    in-projection fan-out, not four scans of the parquet — the tag
    rides the explode), the eval side is a broadcast by construction,
    and the census is one broadcast hash join + two aggs. Only
    contaminated ns appear in `hits`, so ns with zero flagged docs are
    absent rows in BOTH engines (no fabricated zeros)."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    grams_all = F.expr(
        "flatten(array("
        + ", ".join(
            f"case when size(toks) >= {n} then"
            f" transform(array_distinct(transform("
            f" sequence(1, size(toks) - {n - 1}),"
            f" i -> array_join(slice(toks, i, {n}), ' '))),"
            f" g -> struct(cast({n} as bigint) as n, g as gram))"
            " else array() end"
            for n in _X271_NS
        )
        + "))"
    )
    tagged = toks.select(
        "doc_id", F.explode(grams_all).alias("t")
    ).select("doc_id", F.col("t.n").alias("n"), F.col("t.gram").alias("gram"))
    ev = tagged.filter(F.col("doc_id") < 10).select("n", "gram").distinct()
    corp = tagged.filter(F.col("doc_id") >= 10)
    hits = (
        corp.join(F.broadcast(ev), ["n", "gram"])
        .groupBy("n", "doc_id")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    base = (
        d.filter(F.col("doc_id") >= 10)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return (
        hits.groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_contaminated"),
            F.sum("h").cast("long").alias("gram_hits"),
        )
        .crossJoin(F.broadcast(base))
        .select(
            F.col("n").alias("gram_n"),
            "n_contaminated",
            F.expr(
                "cast(n_contaminated * 1000000 div n_docs as bigint)"
            ).alias("contaminated_ppm"),
            "gram_hits",
        )
        .orderBy("gram_n")
    )


#: x272 segments documents into fixed 20-token non-overlapping blocks —
#: the sentence/paragraph stand-in for this corpus (the fixture text is a
#: flat token stream with no punctuation; real deployments swap the block
#: splitter for a sentence splitter, the plan is identical).
_X272_BLOCK = 20


@query(
    "x272_segment_dedup_prune",
    oracle=f"""
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS toks
                 FROM documents),
    blocks AS (SELECT doc_id, source,
                      CAST(b AS BIGINT) AS b_idx,
                      CAST(len(toks[b * {_X272_BLOCK} + 1 :
                               b * {_X272_BLOCK} + {_X272_BLOCK}]) AS BIGINT)
                          AS n_tok,
                      md5(array_to_string(
                          toks[b * {_X272_BLOCK} + 1 :
                               b * {_X272_BLOCK} + {_X272_BLOCK}], ' ')) AS h
               FROM tok,
                    unnest(range(0, (len(toks) + {_X272_BLOCK} - 1)
                                    // {_X272_BLOCK})) t(b)),
    keeper AS (SELECT h, min(doc_id * 1000000 + b_idx) AS keep_clock
               FROM blocks GROUP BY h)
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(CASE WHEN doc_id * 1000000 + b_idx <> keep_clock
                         THEN 1 ELSE 0 END) AS BIGINT) AS dup_blocks,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           CAST(sum(CASE WHEN doc_id * 1000000 + b_idx <> keep_clock
                         THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_dropped,
           CAST(sum(CASE WHEN doc_id * 1000000 + b_idx <> keep_clock
                         THEN n_tok ELSE 0 END) * 1000000
                // sum(n_tok) AS BIGINT) AS drop_ppm
    FROM blocks JOIN keeper USING (h)
    GROUP BY source ORDER BY source
    """,
)
def x272_segment_dedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level (sentence/paragraph-granularity) exact dedup PRUNE
    PLAN — per source, the token mass a keep-first block dedup removes.
    x139 audits how much 10-gram POSITION mass is shared (the Lee et al.
    measurement); this is the corresponding ACTION: split every doc into
    non-overlapping 20-token blocks, keep exactly one instance of each
    distinct block corpus-wide (the earliest by the (doc_id, block_idx)
    clock — reproducible under repartition and re-crawl, x36's
    discipline), and account the dropped-token savings per source. This
    is the between-doc boilerplate remover whole-doc dedup (x12b) can't
    see and gram auditing (x139) doesn't act on.

    Plan: one exploded scan emits (doc, block_idx, md5(block), n_tok);
    the keeper per hash is a hash-agg min over an ENCODED clock
    (doc_id*1e6 + block_idx — single BIGINT, so the agg is a plain min,
    no struct ordering semantics to keep in parity across engines), then
    one join back on the hash and per-source conditional sums. Two
    shuffles, both on the block hash — linear in corpus token volume, no
    pair join, no window. At 100 TB this is the exact shape of x12's
    fingerprint dedup with ~15x the row count (one row per block instead
    of per doc); the hash keys are uniform so there is no skew to salt.
    The encoded clock assumes block_idx < 1e6 (a 20M-token document) —
    assert-checked in tests."""
    from ..functions.dedupfns import segment_blocks

    d = load_parallel(spark, sf_dir, "documents")
    blocks = segment_blocks(
        d.select("doc_id", "source", "text"), block=_X272_BLOCK
    )
    keeper = blocks.groupBy("h").agg(F.min("clock").alias("keep_clock"))
    joined = blocks.join(keeper, "h")
    dropped = (F.col("clock") != F.col("keep_clock")).cast("long")
    return (
        joined.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(dropped).cast("long").alias("dup_blocks"),
            F.sum("n_tok").cast("long").alias("tokens_total"),
            F.sum(dropped * F.col("n_tok")).cast("long").alias("tokens_dropped"),
            F.expr(
                "cast(sum(case when clock <> keep_clock then n_tok else 0 end)"
                " * 1000000 div sum(n_tok) as bigint)"
            ).alias("drop_ppm"),
        )
        .orderBy("source")
    )


@query(
    "x273_temporal_split_audit",
    oracle="""
    WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
               FROM events),
    tagged AS (SELECT event_type, user_id,
                      CASE WHEN epoch_us(ts) <=
                           b.lo + (b.hi - b.lo) * 4 // 5
                           THEN 1 ELSE 0 END AS is_train
               FROM events, b),
    per_user AS (SELECT event_type, user_id,
                        CAST(sum(is_train) AS BIGINT) AS n_train,
                        CAST(sum(1 - is_train) AS BIGINT) AS n_test
                 FROM tagged GROUP BY 1, 2)
    SELECT event_type,
           CAST(sum(n_train) AS BIGINT) AS train_events,
           CAST(sum(n_test) AS BIGINT) AS test_events,
           CAST(sum(CASE WHEN n_train > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS train_users,
           CAST(sum(CASE WHEN n_test > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS test_users,
           CAST(sum(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS overlap_users,
           CAST(sum(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END)
                * 1000000
                // greatest(sum(CASE WHEN n_test > 0 THEN 1 ELSE 0 END), 1)
               AS BIGINT) AS overlap_ppm
    FROM per_user GROUP BY event_type ORDER BY event_type
    """,
)
def x273_temporal_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based holdout split + cross-boundary user-leakage audit: cut
    the event stream at 80% of its time span (integer microsecond
    arithmetic — exact in both engines), and report, per event_type, the
    train/test event counts AND how many test-side users also appear in
    train. User overlap across a temporal boundary is the leakage that
    silently inflates user-level feature models evaluated on the "held
    out" tail — the temporal complement of x92 (content leakage via
    near-dup edges) and x238 (GroupKFold prevents exactly this by
    grouping on the entity). High overlap_ppm says a temporal split does
    NOT give entity independence and x238's split should be used instead
    — this query is the evidence for that decision.

    Plan: one scan computes the global (min, max) epoch bounds (2-value
    agg, broadcast back via crossJoin — no collect); the per-user flags
    are ONE hash agg on (event_type, user_id); the report is a second
    agg on event_type. Two shuffles, the first on a key whose
    cardinality is |users| x |types| — at 100 TB this is the same
    bounded-state shape as the streaming session family; no window, no
    join beyond the 1-row bounds broadcast. The cut uses integer
    floor-div so a span that is not divisible by 5 lands on the same
    microsecond in both engines."""
    e = load_parallel(spark, sf_dir, "events").select(
        "event_type", "user_id", F.unix_micros("ts").alias("us")
    )
    bounds = e.agg(
        F.min("us").alias("lo"), F.max("us").alias("hi")
    )
    tagged = e.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "user_id",
        (
            F.col("us")
            <= F.col("lo") + F.expr("(hi - lo) * 4 div 5")
        )
        .cast("long")
        .alias("is_train"),
    )
    per_user = tagged.groupBy("event_type", "user_id").agg(
        F.sum("is_train").cast("long").alias("n_train"),
        F.sum(F.lit(1) - F.col("is_train")).cast("long").alias("n_test"),
    )
    in_train = (F.col("n_train") > 0).cast("long")
    in_test = (F.col("n_test") > 0).cast("long")
    return (
        per_user.groupBy("event_type")
        .agg(
            F.sum("n_train").cast("long").alias("train_events"),
            F.sum("n_test").cast("long").alias("test_events"),
            F.sum(in_train).cast("long").alias("train_users"),
            F.sum(in_test).cast("long").alias("test_users"),
            F.sum(in_train * in_test).cast("long").alias("overlap_users"),
            F.expr(
                "cast(sum(case when n_train > 0 and n_test > 0 then 1 else 0"
                " end) * 1000000 div greatest(sum(case when n_test > 0 then 1"
                " else 0 end), 1) as bigint)"
            ).alias("overlap_ppm"),
        )
        .orderBy("event_type")
    )


@query(
    "x276_segment_share_matrix",
    oracle=f"""
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS toks
                 FROM documents),
    blocks AS (SELECT DISTINCT source,
                      md5(array_to_string(
                          toks[b * {_X272_BLOCK} + 1 :
                               b * {_X272_BLOCK} + {_X272_BLOCK}], ' ')) AS h
               FROM tok,
                    unnest(range(0, (len(toks) + {_X272_BLOCK} - 1)
                                    // {_X272_BLOCK})) t(b)),
    tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM blocks
            GROUP BY source),
    c AS (SELECT a.source AS source_a, b.source AS source_b,
                 CAST(count(*) AS BIGINT) AS shared_blocks
          FROM blocks a JOIN blocks b
            ON a.h = b.h AND a.source < b.source
          GROUP BY 1, 2)
    SELECT source_a, source_b, shared_blocks,
           CAST(shared_blocks * 1000000 // least(ta.n, tb.n) AS BIGINT)
               AS overlap_ppm
    FROM c JOIN tot ta ON ta.source = source_a
           JOIN tot tb ON tb.source = source_b
    ORDER BY source_a, source_b
    """,
)
def x276_segment_share_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source segment-sharing provenance matrix: for every source
    pair, how many DISTINCT 20-token blocks appear in both, plus the
    overlap coefficient in ppm (shared / smaller source's block
    vocabulary). This is x44's cross-source dup matrix pushed down to
    segment granularity — whole-doc hashing misses the syndicated
    paragraph / shared boilerplate that x272 prunes, and THIS says where
    it comes from: a high-overlap source pair is one mirror or one
    shared template, and the mixture planner (x151) should treat them
    as one source before weighting.

    Plan: segment_blocks (shared with x272/the streaming twin) ->
    distinct (h, source) — the block VOCABULARY per source, one
    hash-agg shuffle; the pair count is per-h source-set collection
    (``collect_set`` bounded by |sources|, a few tens) with the source
    pairs generated IN-ROW (x167's idiom — never a self-join row
    explosion: per block the fan-out is <= |sources| choose 2, a
    constant) and one final pair agg; totals are a <=|sources|-row
    broadcast joined twice. No corpus self-join anywhere; linear in
    block volume. The DuckDB oracle states the same count as the
    equivalent h-equijoin, which at |sources| ~ tens is the identical
    quantity."""
    from ..functions.dedupfns import segment_blocks

    d = load_parallel(spark, sf_dir, "documents")
    db = (
        segment_blocks(d.select("doc_id", "source", "text"), block=_X272_BLOCK)
        .select("h", "source")
        .distinct()
    )
    # two consumers (totals + per-h sets) share one distinct subplan;
    # the shuffle is served once at runtime (AQE exchange reuse), so no
    # persist/checkpoint is needed.
    tot = db.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    sets = (
        db.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") > 1)
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(ss) - 2),"
                " i -> transform(sequence(i + 1, size(ss) - 1),"
                " j -> named_struct('a', ss[i], 'b', ss[j]))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
    c = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("shared_blocks")
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        c.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_blocks",
            F.expr(
                "cast(shared_blocks * 1000000 div least(n_a, n_b)"
                " as bigint)"
            ).alias("overlap_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


#: block sizes x277 sweeps — the calibration evidence for x272's 20:
#: small blocks over-prune (every common phrase dedups), huge blocks
#: degenerate to whole-doc hashing (x12b).
_X277_SIZES = [10, 20, 40, 80]


def _x277_blocks_sql(k: int) -> str:
    return f"""SELECT CAST({k} AS BIGINT) AS block_tokens, doc_id,
           CAST(b AS BIGINT) AS b_idx,
           CAST(len(toks[b * {k} + 1 : b * {k} + {k}]) AS BIGINT) AS n_tok,
           md5(array_to_string(toks[b * {k} + 1 : b * {k} + {k}], ' ')) AS h
    FROM tok, unnest(range(0, (len(toks) + {k} - 1) // {k})) t(b)"""


@query(
    "x277_segment_size_sweep",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    blocks AS ({" UNION ALL ".join(_x277_blocks_sql(k) for k in _X277_SIZES)}),
    keeper AS (SELECT block_tokens, h,
                      min(doc_id * 1000000 + b_idx) AS kc
               FROM blocks GROUP BY 1, 2)
    SELECT block_tokens,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(CASE WHEN doc_id * 1000000 + b_idx <> kc
                         THEN 1 ELSE 0 END) AS BIGINT) AS dup_blocks,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           CAST(sum(CASE WHEN doc_id * 1000000 + b_idx <> kc
                         THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_dropped,
           CAST(sum(CASE WHEN doc_id * 1000000 + b_idx <> kc
                         THEN n_tok ELSE 0 END) * 1000000
                // sum(n_tok) AS BIGINT) AS drop_ppm
    FROM blocks JOIN keeper USING (block_tokens, h)
    GROUP BY block_tokens ORDER BY block_tokens
    """,
)
def x277_segment_size_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x272's block-size calibration: the corpus-wide prune mass at
    block sizes {10,20,40,80} tokens — the threshold-choice evidence
    for the segment dedup granularity, exactly as x271 is for x269's
    gram size. Small blocks over-prune (any common phrase dedups its
    whole block); huge blocks converge on whole-doc hashing (x12b) and
    miss partial copies — the knee between the two is where x272's
    default belongs.

    Plan: ONE corpus scan emits (k, block)-tagged rows for all four
    sizes via an in-projection fan-out (x271's idiom — the tag rides
    the explode, not four parquet scans; total fan-out is sum(len/k)
    ~ 0.19x token volume, LESS than one k=10 segmentation of a 2x
    corpus); the keeper is one hash agg keyed (k, h) + one join back,
    identical to x272 with k in the key. Linear, no windows, no pair
    joins."""
    from ..functions.dedupfns import segment_blocks  # noqa: F401  (family)

    d = load_parallel(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    per_k = [
        f"transform(sequence(0, cast((size(toks) + {k} - 1) div {k}"
        f" as int) - 1),"
        f" b -> named_struct("
        f"'k', cast({k} as bigint),"
        f" 'b_idx', cast(b as bigint),"
        f" 'n_tok', cast(size(slice(toks, b * {k} + 1, {k})) as bigint),"
        f" 'h', md5(array_join(slice(toks, b * {k} + 1, {k}), ' '))))"
        for k in _X277_SIZES
    ]
    blocks = toks.select(
        "doc_id",
        F.explode(F.expr("flatten(array(" + ", ".join(per_k) + "))")).alias(
            "t"
        ),
    ).select(
        F.col("t.k").alias("block_tokens"),
        F.col("t.n_tok").alias("n_tok"),
        F.col("t.h").alias("h"),
        (F.col("doc_id") * 1000000 + F.col("t.b_idx")).alias("clock"),
    )
    keeper = blocks.groupBy("block_tokens", "h").agg(
        F.min("clock").alias("kc")
    )
    joined = blocks.join(keeper, ["block_tokens", "h"])
    dropped = (F.col("clock") != F.col("kc")).cast("long")
    return (
        joined.groupBy("block_tokens")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(dropped).cast("long").alias("dup_blocks"),
            F.sum("n_tok").cast("long").alias("tokens_total"),
            F.sum(dropped * F.col("n_tok")).cast("long").alias(
                "tokens_dropped"
            ),
            F.expr(
                "cast(sum(case when clock <> kc then n_tok else 0 end)"
                " * 1000000 div sum(n_tok) as bigint)"
            ).alias("drop_ppm"),
        )
        .orderBy("block_tokens")
    )


@query(
    "x279_boilerplate_blocklist",
    oracle=f"""
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS toks
                 FROM documents),
    blocks AS (SELECT doc_id, source,
                      CAST(len(toks[b * {_X272_BLOCK} + 1 :
                               b * {_X272_BLOCK} + {_X272_BLOCK}]) AS BIGINT)
                          AS n_tok,
                      md5(array_to_string(
                          toks[b * {_X272_BLOCK} + 1 :
                               b * {_X272_BLOCK} + {_X272_BLOCK}], ' ')) AS h
               FROM tok,
                    unnest(range(0, (len(toks) + {_X272_BLOCK} - 1)
                                    // {_X272_BLOCK})) t(b)),
    agg AS (SELECT h,
                   CAST(count(*) AS BIGINT) AS n_occurrences,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                   CAST(sum(n_tok) AS BIGINT) AS token_mass
            FROM blocks GROUP BY h),
    r AS (SELECT *, row_number() OVER
              (ORDER BY n_docs DESC, token_mass DESC, h) AS rk
          FROM agg WHERE n_docs >= 3)
    SELECT CAST(rk AS BIGINT) AS rk, h AS block_hash, n_occurrences,
           n_docs, n_sources, token_mass
    FROM r WHERE rk <= 20 ORDER BY rk
    """,
)
def x279_boilerplate_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BLOCKLIST the segment family exists to produce: the top-20
    20-token blocks by document frequency (df >= 3), with occurrence
    count, source spread, and token mass — the concrete "strip THESE
    segments" artifact a curation run ships alongside x272's aggregate
    savings (x272 says how much boilerplate costs, x276 where it flows
    between sources; this says WHAT it is, keyed by the same md5 so the
    strip pass is an anti-join on the published hashes). Ties break by
    (token_mass desc, h) — a total order both engines share.

    Plan: segment_blocks -> ONE per-h hash agg (count / two distincts /
    sum — partial+final over uniform md5 keys) -> df >= floor filter ->
    orderBy().limit(20), i.e. TakeOrderedAndProject — a DISTRIBUTED
    top-k (per-partition heads merged on the driver), never a global
    rank window over the whole df tail (the x140 BM25 idiom); rk is
    attached by a window over only the 20 survivors. At 100 TB the df
    floor rises with the corpus (parameterized below), but even at
    floor=3 the rank input is 20 rows by construction."""
    return _boilerplate_blocklist(spark, sf_dir, df_floor=3, top_k=20)


def _boilerplate_blocklist(
    spark: SparkSession, sf_dir: str, df_floor: int, top_k: int
) -> DataFrame:
    """x279's body with the df floor and list size as parameters — at
    production scale the floor rises with the corpus so the reviewed
    artifact stays human-sized; the plan shape is floor-independent."""
    d = load_parallel(spark, sf_dir, "documents")
    return boilerplate_blocklist_from_docs(
        d, df_floor=df_floor, top_k=top_k
    )


def boilerplate_blocklist_from_docs(
    d: DataFrame,
    df_floor: int = 3,
    top_k: int = 20,
    block: int = _X272_BLOCK,
) -> DataFrame:
    """x279 over an in-hand documents DataFrame — the form curated_write
    (plans/curate.py) and the pipeline sink consume, so the published
    blocklist and the strip pass share one builder."""
    from ..functions.dedupfns import segment_blocks

    blocks = segment_blocks(
        d.select("doc_id", "source", "text"), block=block
    )
    agg = blocks.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_tok").cast("long").alias("token_mass"),
    )
    order = [F.desc("n_docs"), F.desc("token_mass"), F.asc("h")]
    top = (
        agg.filter(F.col("n_docs") >= df_floor).orderBy(*order).limit(top_k)
    )
    return (
        top.withColumn(
            "rk", F.row_number().over(Window.orderBy(*order)).cast("long")
        )
        .select(
            "rk",
            F.col("h").alias("block_hash"),
            "n_occurrences",
            "n_docs",
            "n_sources",
            "token_mass",
        )
        .orderBy("rk")
    )


@query(
    "x280_eval_item_leak_profile",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    ev AS (SELECT doc_id AS eval_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - 3, 1)),
               i -> array_to_string(toks[i:i+4], ' ')))) AS gram
           FROM tok WHERE doc_id < 10),
    corp AS (SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, greatest(len(toks) - 3, 1)),
                 i -> array_to_string(toks[i:i+4], ' ')))) AS gram
             FROM tok WHERE doc_id >= 10),
    hit AS (SELECT e.eval_id, e.gram, c.doc_id
            FROM ev e JOIN corp c USING (gram)),
    per AS (SELECT eval_id,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_corpus_docs,
                   CAST(count(DISTINCT gram) AS BIGINT) AS leaked_grams,
                   CAST(count(*) AS BIGINT) AS gram_doc_hits
            FROM hit GROUP BY eval_id),
    base AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS total_grams
             FROM ev GROUP BY eval_id)
    SELECT b.eval_id,
           b.total_grams,
           COALESCE(p.leaked_grams, 0) AS leaked_grams,
           COALESCE(p.n_corpus_docs, 0) AS n_corpus_docs,
           COALESCE(p.gram_doc_hits, 0) AS gram_doc_hits,
           CAST(COALESCE(p.leaked_grams, 0) * 1000000
                // b.total_grams AS BIGINT) AS leak_ppm
    FROM base b LEFT JOIN per p ON p.eval_id = b.eval_id
    ORDER BY b.eval_id
    """,
)
def x280_eval_item_leak_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """x269 INVERTED: per eval-seed document (doc_id < 10), how leaked
    it is into the candidate corpus — distinct 5-grams that appear in
    any corpus doc (and as what fraction of the item's grams), how many
    corpus docs touch it, and the total (gram, doc) hit count. x269
    answers "is the corpus clean enough to freeze"; this answers "which
    EVAL ITEMS are compromised and should be re-authored or re-split" —
    the other half of the decontamination decision, and the one that
    survives when the corpus can't be changed (published benchmarks).
    Zero-leak items are real rows (left join from the eval side).

    Plan: both sides explode distinct 5-grams once (same expression as
    x269, docs < 5 tokens emit nothing in both engines); the join is
    corpus-side broadcast OF THE EVAL GRAMS exactly like x269 but
    keeps (eval_id, gram, corpus_doc) for the per-item distinct aggs;
    the profile is one hash agg on eval_id (|eval| rows) plus the
    per-item gram totals (a second broadcast-sized agg). At 100 TB the
    corpus contributes one explode + broadcast probe — identical cost
    envelope to x269."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    gram5 = F.expr(
        "case when size(toks) >= 5 then"
        " array_distinct(transform(sequence(1, size(toks) - 4),"
        " i -> array_join(slice(toks, i, 5), ' ')))"
        " else array() end"
    )
    ev = toks.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("eval_id"), F.explode(gram5).alias("gram")
    )
    corp = toks.filter(F.col("doc_id") >= 10).select(
        "doc_id", F.explode(gram5).alias("gram")
    )
    hit = corp.join(F.broadcast(ev), "gram")
    per = hit.groupBy("eval_id").agg(
        F.countDistinct("doc_id").cast("long").alias("n_corpus_docs"),
        F.countDistinct("gram").cast("long").alias("leaked_grams"),
        F.count(F.lit(1)).cast("long").alias("gram_doc_hits"),
    )
    base = ev.groupBy("eval_id").agg(
        F.count(F.lit(1)).cast("long").alias("total_grams")
    )
    return (
        base.join(per, "eval_id", "left")
        .select(
            "eval_id",
            "total_grams",
            F.coalesce("leaked_grams", F.lit(0)).cast("long").alias(
                "leaked_grams"
            ),
            F.coalesce("n_corpus_docs", F.lit(0)).cast("long").alias(
                "n_corpus_docs"
            ),
            F.coalesce("gram_doc_hits", F.lit(0)).cast("long").alias(
                "gram_doc_hits"
            ),
            F.expr(
                "cast(coalesce(leaked_grams, 0) * 1000000"
                " div total_grams as bigint)"
            ).alias("leak_ppm"),
        )
        .orderBy("eval_id")
    )


#: signature sizes x281 sweeps — prefixes of the SAME 64-component
#: signature (component i is hash family member i in both engines), so
#: one signature build yields every estimate.
_X281_KS = [8, 16, 32, 64]


@query(
    "x281_minhash_k_sweep",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t) - 1)]) AS s
           FROM tok WHERE len(t) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b,
                     CAST(floor({{J}} * 1000000) AS BIGINT) AS jac_ppm
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE {{J}} >= 0.3),
    sig AS (SELECT doc_id, i,
                   CAST(min(CAST('0x' || substring(
                        md5(CAST(i AS VARCHAR) || ':' || sh), 1, 15) AS BIGINT))
                     AS BIGINT) AS mh
            FROM ex CROSS JOIN unnest(range(0, 64)) t(i)
            GROUP BY doc_id, i),
    est AS (SELECT p.id_a, p.id_b, p.jac_ppm,
                   {", ".join(
        f"CAST(sum(CASE WHEN sa.i < {k} AND sa.mh = sb.mh"
        f" THEN 1 ELSE 0 END) AS BIGINT) AS m{k}"
        for k in _X281_KS)}
            FROM pairs p
            JOIN sig sa ON sa.doc_id = p.id_a
            JOIN sig sb ON sb.doc_id = p.id_b AND sb.i = sa.i
            GROUP BY 1, 2, 3)
    {" UNION ALL ".join(
        f'''SELECT CAST({k} AS BIGINT) AS n_hashes,
            CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(abs(m{k} * 1000000 // {k} - jac_ppm))
                 // greatest(count(*), 1) AS BIGINT) AS mean_abs_err_ppm,
            CAST(max(abs(m{k} * 1000000 // {k} - jac_ppm)) AS BIGINT)
                AS max_abs_err_ppm
            FROM est''' for k in _X281_KS)}
    ORDER BY n_hashes
    """.replace("{J}", _J_SQL),
)
def x281_minhash_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x150's signature-SIZE calibration: the MinHash estimation error
    against exact Jaccard at k in {8, 16, 32, 64} hash components — the
    evidence behind choosing a signature width (error ~ 1/sqrt(k), so
    halving storage costs sqrt(2) in threshold sharpness; the measured
    max error at each k says which banding thresholds are actually
    distinguishable). Rides the PREFIX property: component i of a
    k-component signature is hash family member i regardless of k, so
    ONE 64-component signature build (x150's md5 family, shared with
    the oracle) yields every estimate as a conditional sum over i < k
    — the x266 vocab-sweep discipline applied to sketch width, never
    four signature rebuilds.

    Plan: x150's exact shape with four conditional sums in the per-pair
    agg and a 4-row fan-out from the 1-row corpus aggregate; all error
    arithmetic is exact integer ppm (matches * 1e6 div k), so the
    hash check is airtight. The error join touches only the exact
    pair set (jac >= 0.3, tiny); the signature table is |docs| x 64
    rows — both linear."""
    from ..functions.dedupfns import (
        md5_minhash_rows,
        ngram_jaccard_pairs,
        shingles,
    )

    d = load_parallel(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.3).select(
        "id_a",
        "id_b",
        F.floor(F.col("jaccard") * 1_000_000).cast("long").alias("jac_ppm"),
    )
    ex = d.select("doc_id", F.explode(shingles("text", 3)).alias("sh"))
    # min-agg columns + stack unpivot, never the occurrence x 64 row
    # explode (the 64x-octave spill) — see dedupfns.md5_minhash_rows.
    # (r16: a wide-signature in-row prefix-sum rewrite A/B'd slower on
    # x150's identical shape and was not shipped — see x150's note.)
    sig = md5_minhash_rows(ex)
    sa = sig.select(F.col("doc_id").alias("id_a"), "i", F.col("mh").alias("mha"))
    sb = sig.select(F.col("doc_id").alias("id_b"), "i", F.col("mh").alias("mhb"))
    est = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "i"])
        .groupBy("id_a", "id_b", "jac_ppm")
        .agg(
            *[
                F.sum(
                    (
                        (F.col("i") < k) & (F.col("mha") == F.col("mhb"))
                    ).cast("long")
                )
                .cast("long")
                .alias(f"m{k}")
                for k in _X281_KS
            ]
        )
    )
    # ONE corpus aggregate; the 4-row sweep is a stack() unpivot of the
    # 1-row state — a single lazy plan with ONE consumer of the agg, so
    # the pair pipeline runs exactly once per action and merely building
    # the DataFrame (plan dumps, registry sweeps) stays side-effect-free.
    # greatest(n_pairs, 1) guards the empty-pair corpus (x273's idiom):
    # sums over zero rows are NULL in both engines, so mean/max come out
    # NULL rather than one engine erroring on the division.
    agg_cols = [F.count(F.lit(1)).cast("long").alias("n_pairs")]
    for k in _X281_KS:
        agg_cols.append(
            F.sum(
                F.abs(F.expr(f"m{k} * 1000000 div {k}") - F.col("jac_ppm"))
            )
            .cast("long")
            .alias(f"s{k}")
        )
        agg_cols.append(
            F.max(
                F.abs(F.expr(f"m{k} * 1000000 div {k}") - F.col("jac_ppm"))
            )
            .cast("long")
            .alias(f"x{k}")
        )
    one = est.agg(*agg_cols)
    stack_expr = (
        f"stack({len(_X281_KS)}, "
        + ", ".join(
            f"cast({k} as bigint),"
            f" cast(s{k} div greatest(n_pairs, 1) as bigint), x{k}"
            for k in _X281_KS
        )
        + ") as (n_hashes, mean_abs_err_ppm, max_abs_err_ppm)"
    )
    return (
        one.select(F.expr(stack_expr), "n_pairs")
        .select("n_hashes", "n_pairs", "mean_abs_err_ppm", "max_abs_err_ppm")
        .orderBy("n_hashes")
    )


@query("x284_embedding_near_dup_lsh_centered")  # seed-det.; rows-only check
def x284_embedding_near_dup_lsh_centered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """x12g's LSH near-dup pair generator with MEAN-CENTERED bucketing
    (x275's all-but-the-top fix applied to the dedup path, the partner
    of x283's top-k variant): hyperplane signs on (x - corpus_mean),
    exact RAW-cosine verify unchanged — so precision stays 1.0 vs x12f
    by construction and the output contract is x12g's. On an
    anisotropic corpus raw planes agree with sign(w.mean) and buckets
    balloon; centering spreads them, so the same (planes, tables)
    budget probes fewer pairs. The fixture is near-isotropic (x275:
    avg cosine 0.005), so here the variant is verified SAFE (recall
    0.995 vs raw 0.993 at identical budget, candidate mass within
    0.2%); the anisotropic win is pinned on a planted common-mean
    corpus in tests/test_similarity.py. At 100 TB the smaller bucket
    join IS this operator's cost; the mean adds one posexplode scan."""
    from ..functions.simfns import lsh_cosine_pairs

    emb = load_parallel(spark, sf_dir, "embeddings")
    return lsh_cosine_pairs(
        emb, 0.4, n_planes=3, n_tables=16, center=True
    ).orderBy("id_a", "id_b")


@query("x287_embedding_near_dup_lsh_abtt")  # seed-det.; rows-only check
def x287_embedding_near_dup_lsh_abtt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """x284 with the SECOND half of All-but-the-Top wired in (the fix
    x286's audit exists to pick): hyperplane signs taken on the centered
    vector MINUS its PC1 projection — u is x286's eigenvector (3
    integer-ppm power iterations on the decimal-quantized Gram, replayed
    bit-exactly driver-side by simfns.pc1_vector_np; parity vs the
    in-plan decimal iteration is pinned in tests/test_similarity.py).
    Exact RAW-cosine verify unchanged, so precision stays 1.0 by
    construction and the output contract is x12g's/x284's. The fixture
    is near-isotropic with no dominant direction (x286 at sf0.1: avg
    centered cosine ~= avg abtt cosine), so here abtt is verified SAFE
    — measured at sf0.1: candidate mass within 0.2% of centered
    (4,076,210 vs 4,068,726 probed pairs), recall 0.997 vs centered
    0.995 at the identical (3 planes, 16 tables) budget; the
    anisotropic win — the zero-mean dominant direction centering
    cannot see — is pinned on a planted-PC1 corpus in
    tests/test_similarity.py, where abtt collapses the candidate mass
    centering cannot (a zero-mean dominant direction is invisible to
    the mean). Build-time cost: two bounded jobs (|dim|-row mean +
    2080-row Gram collect — see pc1_vector_np); per-run cost is x284's
    plan plus one broadcast zip_with."""
    from ..functions.simfns import lsh_cosine_pairs

    emb = load_parallel(spark, sf_dir, "embeddings")
    return lsh_cosine_pairs(
        emb, 0.4, n_planes=3, n_tables=16, abtt=True
    ).orderBy("id_a", "id_b")
