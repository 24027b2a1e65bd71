"""Scale-probe the dedup/similarity family beyond the sf0.1 fixtures.

The 100 TB claims in docs/PLANS.md rest on the assertion that the dedup
operators grow ~linearly in corpus size (bucketed joins, no all-pairs).
This script measures it: it synthesizes documents tables at K x sf0.1
(K = 1, 2, 4, 8 by default), runs the heavy dedup queries at each scale,
and fits the growth exponent  t ~ n^alpha  by least squares on
(log K, log t).  alpha ~ 1 = the linear scaling the plans claim;
alpha ~ 2 = a hidden all-pairs.

Scaling construction: copy k of the corpus is the sf0.1 documents table
with every TOKEN prefixed by a copy tag (``c<k>x``) and doc_id offset by
k * 10^9. Token-level tagging means no shingle ever matches ACROSS copies
(every token differs), while the duplicate structure WITHIN each copy is
preserved verbatim — so true pair/cluster cardinality scales exactly
linearly with K and any superlinear wall-time growth is the ENGINE's, not
the workload's. (A naive text-suffix tag would leave near-identical
cross-copy texts and inflate the true pair count quadratically,
contaminating the measurement.)

Two families (--family):
- ``docs``: token-tagged copies of documents.parquet (see above).
- ``embeddings``: signed-permutation copies of embeddings.parquet (cyclic
  dim shift + deterministic signs — orthogonal, so within-copy geometry is
  exact; cross-copy cosines concentrate near 0). Probes the ANN top-k
  family (fixed 30-query set against a growing corpus — linear work) and
  strict-threshold (0.8) pair variants as COST-CURVE measurements: the
  registry's 0.4 threshold sits ~3 sigma into the 64-dim random-cosine
  tail, where the fixture's own "near-dup" workload is the quadratic tail
  of a continuous distribution (920 pairs >= 0.4 at sf0.1, max cosine
  0.60 — no planted-duplicate separation), so pair OUTPUT cannot be made
  scale-linear by any replication scheme; at 0.8 output is exactly zero
  and the measurement isolates candidate-generation cost.

Synthetic data lands in a scratch dir (default /tmp/scale_probe_<family>)
— never in the committed fixtures; the scratch dir holds only the one
table the family reads.

Usage:
    python scripts/scale_probe.py                # docs family, K=1,2,4,8
    python scripts/scale_probe.py --mults 1,2,4 --queries x12c,x43
    python scripts/scale_probe.py --family embeddings --mults 1,4,16
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_connect_spark.session import get_spark
from kafka_connect_spark.queries import QUERIES

BASE = "/root/testdata/sf0.1"


def _near_dup_strict(spark, sf_dir):
    """Probe-local x12f variant at threshold 0.8. The registry's 0.4
    threshold sits ~3.2 sigma into the random-pair cosine tail at 64 dims
    (std ~ 1/8), so even decorrelated copies collide at ~3e-4 — a
    quadratic noise floor that is a DATA property, not an engine one, and
    would contaminate the scaling measurement. 0.8 is ~6.4 sigma: zero
    random collisions, workload stays exactly linear in K."""
    from kafka_connect_spark.functions.simfns import cosine_pairs_blocked

    return cosine_pairs_blocked(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), threshold=0.8
    )


def _near_dup_lsh_strict(spark, sf_dir):
    """Probe-local x12g (LSH) variant at threshold 0.8 — see above."""
    from kafka_connect_spark.functions.simfns import lsh_cosine_pairs

    return lsh_cosine_pairs(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), threshold=0.8
    )


def _semantic_dedup_scaled(spark, sf_dir):
    """Probe-local x71 with the published SemDeDup scaling discipline:
    n_clusters grows with the corpus (k ~ n/640) so per-cluster size — and
    therefore the within-cluster all-pairs matmul — stays bounded. The
    registry query pins n_clusters=8 for fixture determinism; THIS is the
    shape that runs at scale, and the probe measures it."""
    from kafka_connect_spark.functions.simfns import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    return semantic_dedup(emb, 0.8, n_clusters=max(8, n // 640))


def _semantic_dedup_skewed(spark, sf_dir):
    """Probe-local x71 ADVERSARIAL workload: the corpus is the scaled
    embeddings table PLUS an equally-sized near-clique — one template
    direction with per-row 1e-3 jitter, i.e. the boilerplate-duplicate
    mega-cluster that semantic dedup exists to catch. k-means lands the
    whole clique in one cluster, which blows past max_cluster_rows and
    exercises the block-parallel greedy (_semantic_dedup_blocked): the
    kept prefix stays ~1 row, so the round count is O(1) in clique size
    and measured wall time should stay ~linear in K (alpha ~ 1), never
    the one-task OOM the one-group path would hit."""
    from kafka_connect_spark.functions.simfns import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clique = emb.select(
        (F.col("vec_id") + 10_000_000_000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (
                F.lit(1.0)
                + F.pmod(F.xxhash64(F.col("vec_id"), i.cast("string")), F.lit(997))
                / 997000.0
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    corpus = emb.unionByName(clique)
    n = corpus.count()
    return semantic_dedup(
        corpus,
        0.8,
        n_clusters=max(8, n // 640),
        max_cluster_rows=2048,
        block_rows=2048,
    )


def _boilerplate_docs(spark, sf_dir):
    """Scaled docs with a PLANTED hot SHINGLE: 90% of documents gain the
    same 6-token boilerplate phrase, creating two 5-gram shingles whose
    posting lists span ~0.9 of the corpus — the x97 join's worst case
    (each contributes (0.9 |corpus|)^2/2 candidate pairs). Two
    deliberate choices: (a) the phrase is 6 TOKENS, because x97 shingles
    on 5-token windows — a single appended token (the first version of
    this probe) creates NO shared shingle at all, every 5-gram
    containing it also contains doc-specific tokens; (b) 90%, not 100%,
    of docs, because a df = N term is dropped by the query's built-in
    ubiquitous-shingle filter before the join — the adversarial regime
    is df huge but < N, where only the max_df cap stands between the
    plan and a quadratic join."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    phrase = " zzb1 zzb2 zzb3 zzb4 zzb5 zzb6"
    return d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 != 0, F.concat(F.col("text"), F.lit(phrase))
        ).otherwise(F.col("text")),
    )


def _tfidf_uncapped_hot(spark, sf_dir):
    """x97 (no df cap) on the boilerplate-planted corpus: expected
    superlinear — the planted term's pair fan-out is quadratic in K."""
    from kafka_connect_spark.queries.text import tfidf_cosine_pairs

    return tfidf_cosine_pairs(_boilerplate_docs(spark, sf_dir), threshold=0.5)


def _tfidf_capped_hot(spark, sf_dir):
    """x97b (max_df cap) on the same corpus: the planted term exceeds any
    absolute df cap and leaves the JOIN side, so growth should match the
    unplanted x97 curve — the guardrail the cap exists for, measured."""
    from kafka_connect_spark.queries.text import tfidf_cosine_pairs

    d = _boilerplate_docs(spark, sf_dir)
    n = d.count()
    return tfidf_cosine_pairs(d, threshold=0.5, max_df=max(3, n // 100))


def _distributed_rank_probe(spark, sf_dir):
    """Full-corpus exact global rank via distributed_rank (range
    repartition + sorted-partition monotonic ids + P-row offset cumsum)
    ranking every scaled doc by (n_chars desc, doc_id) — the operation
    the naive global window serializes through one task. Expected alpha
    ~ 1 (one range shuffle + narrow passes); the aggregate keeps the
    probe's noop sink from writing the corpus back out."""
    from pyspark.sql import functions as FF

    from kafka_connect_spark.functions.skew import distributed_rank

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = distributed_rank(
        d, [FF.col("n_chars").desc(), FF.col("doc_id")], rank_name="rank"
    )
    # checksum-style reduce: forces every rank to materialize
    return r.agg(
        FF.count(FF.lit(1)).alias("n"),
        FF.sum(FF.col("rank").cast("decimal(38,0)")).alias("rank_sum"),
        FF.max(FF.col("rank")).alias("max_rank"),
    )


def _retrieval_eval_scaled(spark, sf_dir):
    """x180's nDCG/MRR eval with the query set scaled WITH the corpus:
    copy k's tokens are tagged c<k>x, so querying the same 4 base terms
    under every copy's tag grows queries linearly with K while each
    query's postings stay the base corpus's — the 'embarrassingly
    parallel across queries' claim x180's docstring makes, measured.
    Expected alpha ~ 1: per-term windows never see more rows per
    partition, only more partitions."""
    from kafka_connect_spark.queries.text import retrieval_ndcg

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # recover K from the copy offset in doc_id (bounded 1-row probe)
    k = d.agg(F.max(F.expr("doc_id div 1000000000"))).collect()[0][0] + 1
    q_terms = [
        f"c{i}x{t}"
        for i in range(int(k))
        for t in ("table", "stream", "window", "join")
    ]
    return retrieval_ndcg(d, q_terms)


def _centered_lsh_strict(spark, sf_dir):
    """x284's scale form: auto-depth LSH pairs with mean-centered
    bucketing at the 0.8 strict threshold (the registered x284 pins
    p=3/t=16 for fixture determinism; with fixed planes bucket size
    grows with the corpus — the measured x12g quadratic — so the scale
    path is the auto rule, same as near_dup_lsh_strict). The delta vs
    near_dup_lsh_strict prices the centering additions: one in-plan
    mean agg + the broadcast zip_with."""
    from kafka_connect_spark.functions.simfns import lsh_cosine_pairs

    return lsh_cosine_pairs(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), threshold=0.8,
        center=True,
    )


def _abtt_lsh_strict(spark, sf_dir):
    """x287's scale form: auto-depth + full All-but-the-Top bucketing at
    0.8 — adds pc1_vector_np's build-time Gram (one corpus scan with
    2080 structs/row, collected bounded) on top of the centered form."""
    from kafka_connect_spark.functions.simfns import lsh_cosine_pairs

    return lsh_cosine_pairs(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), threshold=0.8,
        abtt=True,
    )


def _knn_graph_hubness_scaled(spark, sf_dir):
    """x274b's composition at its production depth (n_planes=None: the
    auto rule pins bucket size at ~256, so the (table, bucket) self-join
    grows ~n*bucket — the registered fixture form pins p=4 for rows-only
    determinism, which with fixed planes is the known x12g quadratic and
    is measured separately at small K). Full composition: tag pass +
    bucket self-join + WindowGroupLimit top-5 + in-degree histogram."""
    from kafka_connect_spark.functions.simfns import lsh_knn_graph

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    g = lsh_knn_graph(emb, k=5, n_planes=None, n_tables=12)
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


def _curated_corpus_probe(spark, sf_dir):
    """curated_write's PLAN cost without the parquet write: verdict pass
    + blocklist build + ONE segment scan + broadcast anti-join + the
    doc_id reassembly shuffle, noop-executed. The e2e probe's delta vs
    this isolates what the parquet write itself costs."""
    from kafka_connect_spark.plans.curate import curated_corpus

    return curated_corpus(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _curated_write_e2e(spark, sf_dir):
    """curated_write end to end — the strip pass INCLUDING the parquet
    write and the manifest's bounded collects — into a scratch dir;
    returns the totals as one row so the framework's noop/count add
    nothing. (The framework's row-count pass re-runs the write; the
    timed number is the first, 'best' run.)"""
    import tempfile

    from kafka_connect_spark.plans.curate import curated_write_df

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tempfile.mkdtemp(prefix="curated-e2e-")
    m = curated_write_df(d, out)
    t = m["totals"]
    return spark.createDataFrame(
        [(t["docs_emitted"], t["tokens_out"], t["blocks_stripped"])],
        "docs_emitted long, tokens_out long, blocks_stripped long",
    )


def _packed_write_e2e(spark, sf_dir):
    """packed_write end to end — x288's plan INCLUDING the parquet write
    and the manifest's bounded collects — into a scratch dir; returns
    the totals as one row so the framework's noop/count add nothing."""
    import tempfile

    from kafka_connect_spark.plans.pack import packed_write

    out = tempfile.mkdtemp(prefix="packed-e2e-")
    m = packed_write(spark, sf_dir, out)
    return spark.createDataFrame(
        [(m["n_sequences"], m["total_tokens"], m["pad_tokens"])],
        "n_sequences long, total_tokens long, pad_tokens long",
    )


def _ann_index_e2e(spark, sf_dir):
    """ann_index_write + ann_index_search end to end into scratch: build
    the 16-cell IVF artifact over the scaled corpus (one assignment pass
    + cell-partitioned write), then serve the fixed 10-query set probing
    8 cells from the artifact. Build is linear in K; search reads only
    probed partitions of a K x corpus, so the pair should track K with
    the partition-pruned scan as the growing term."""
    import tempfile

    from kafka_connect_spark.plans.index import (
        ann_index_search,
        ann_index_write,
    )

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = tempfile.mkdtemp(prefix="ivf-index-")
    ann_index_write(spark, sf_dir, out, corpus=corpus)
    return ann_index_search(
        spark, out, corpus.filter(F.col("vec_id") < 10), k=3, n_probe=8
    )


def _pq_index_e2e(spark, sf_dir):
    """pq_index_write + pq_index_search end to end into scratch: train
    the 8x16 codebook, encode + write codes/vectors, serve the fixed
    10-query set by ADC over the stored codes. Build is linear in K
    (one encode pass + two writes); the serve side's growing term is
    the code-table scan — 1/64th the bytes of the vectors."""
    import tempfile

    from kafka_connect_spark.plans.pq import pq_index_search, pq_index_write

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = tempfile.mkdtemp(prefix="pq-index-")
    pq_index_write(spark, sf_dir, out, corpus=corpus)
    return pq_index_search(
        spark, out, corpus.filter(F.col("vec_id") < 10), k=3, oversample=8
    )


PROBE_EXTRA = {
    "distributed_rank_probe": _distributed_rank_probe,
    "retrieval_eval_scaled": _retrieval_eval_scaled,
    "near_dup_strict": _near_dup_strict,
    "near_dup_lsh_strict": _near_dup_lsh_strict,
    "semantic_dedup_scaled": _semantic_dedup_scaled,
    "semantic_dedup_skewed": _semantic_dedup_skewed,
    "tfidf_uncapped_hot": _tfidf_uncapped_hot,
    "tfidf_capped_hot": _tfidf_capped_hot,
    "centered_lsh_strict": _centered_lsh_strict,
    "abtt_lsh_strict": _abtt_lsh_strict,
    "knn_graph_hubness_scaled": _knn_graph_hubness_scaled,
    "curated_corpus_probe": _curated_corpus_probe,
    "curated_write_e2e": _curated_write_e2e,
    "packed_write_e2e": _packed_write_e2e,
    "ann_index_e2e": _ann_index_e2e,
    "pq_index_e2e": _pq_index_e2e,
}

DEFAULT_QUERIES = {
    "docs": ["x12c", "x12e", "x12h", "x12i", "x43", "x43b", "x69", "x70"],
    "embeddings": ["x13", "x13b", "x13c", "near_dup_strict", "near_dup_lsh_strict",
                   "semantic_dedup_scaled"],
    "events": ["x153", "x158"],
    # r15 (r14 verdict items 1/6): the round-14 queries' alpha rows.
    # The curation family scales with its OWN construction (see
    # build_scaled_curation): token tags would zero the stopword signal
    # and the quality gate would drop every copy k>0, leaving the strip
    # pass 1/K of its true workload.
    "curation": ["x282", "x285", "curated_corpus_probe", "curated_write_e2e"],
    # r15: the packing OUTPUT stage. Token-tagged docs copies (the docs
    # construction) keep token COUNTS exact per copy, so sequence count
    # and packed text volume scale exactly linearly in K; the per-lang
    # cumsum window is the watched term (5 langs, each partition K x).
    "packing": ["x29", "x288", "packed_write_e2e"],
}
# registry names are prefixed (x12c_ngram_jaccard_pairs etc.); resolve by prefix
def _resolve(short: str) -> str:
    if short in PROBE_EXTRA:
        return short
    hits = [k for k in QUERIES if k == short or k.startswith(short + "_")]
    if len(hits) != 1:
        raise SystemExit(f"query {short!r} resolves to {hits!r}")
    return hits[0]


def _run(name: str):
    return PROBE_EXTRA.get(name) or QUERIES[name]


def build_scaled(spark, mult: int, scratch: str) -> str:
    """Materialize K x sf0.1 documents into <scratch>/m<K>/documents.parquet."""
    out_dir = os.path.join(scratch, f"m{mult}")
    out = os.path.join(out_dir, "documents.parquet")
    # only reuse a COMPLETE prior materialization (a crashed run leaves the
    # directory without Spark's _SUCCESS marker)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out_dir
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    copies = []
    for k in range(mult):
        tag = F.lit(f"c{k}x")
        copies.append(
            base.select(
                (F.col("doc_id") + F.lit(k * 1_000_000_000)).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "), lambda t: F.concat(tag, t)
                    ),
                    " ",
                ).alias("text"),
                "lang",
                "source",
                F.length(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "), lambda t: F.concat(tag, t)
                        ),
                        " ",
                    )
                ).alias("n_chars"),
            )
        )
    df = copies[0]
    for c in copies[1:]:
        df = df.unionAll(c)
    # spread copies across partitions like a real corpus (not copy-clustered)
    df.repartition(32, "doc_id").write.mode("overwrite").parquet(out)
    return out_dir


def build_scaled_embeddings(spark, mult: int, scratch: str) -> str:
    """K x sf0.1 embeddings. Copy k applies a SIGNED PERMUTATION: a cyclic
    shift of the 64 dimensions by 7k plus a deterministic per-(copy, dim)
    sign. Signed permutations are orthogonal, so norms and all WITHIN-copy
    inner products are preserved exactly; a CROSS-copy pair's cosine
    becomes a shifted random-sign sum that concentrates near 0 — so true
    near-dup pairs and top-k workload scale linearly in K, same argument
    as the token tagging for documents. (Sign flips ALONE are not enough:
    the fixture vectors concentrate mass on a few dimensions, and aligned
    big dims keep |cos| above the 0.4 near-dup threshold; the shift
    misaligns them.)"""
    out_dir = os.path.join(scratch, f"m{mult}")
    out = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out_dir
    base = spark.read.parquet(f"{BASE}/embeddings.parquet")
    copies = []
    for k in range(mult):
        if k == 0:
            copies.append(base)  # queries (vec_id < 500) stay a fixed set
            continue
        tag = F.lit(f"c{k}_")
        shift = (7 * k) % 64
        signed = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (
                F.element_at(
                    F.col("embedding"), ((i + F.lit(shift)) % 64 + 1).cast("int")
                )
                * (
                    1
                    - 2
                    * F.pmod(F.xxhash64(F.concat(tag, i.cast("string"))), F.lit(2))
                )
            ).cast("float"),
        )
        copies.append(
            base.select(
                (F.col("vec_id") + F.lit(k * 1_000_000_000)).alias("vec_id"),
                signed.alias("embedding"),
                "label",
            )
        )
    df = copies[0]
    for c in copies[1:]:
        df = df.unionAll(c)
    df.repartition(32, "vec_id").write.mode("overwrite").parquet(out)
    return out_dir


#: 64 single-char copy tags — one CHARACTER, not c<k>x: the curation
#: gates read mean token length (ceiling 12 chars), and a 3-char prefix
#: on a ~6-char fixture token is a third of the budget; one char is
#: noise.
_CUR_TAGS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_~"
)
#: the funnel's stopword list (textfns.FUNNEL_STAGES signal) — left
#: untagged so the stopword-density signal is preserved verbatim.
_CUR_STOPWORDS = ("a", "the", "of", "and", "to", "in")


def build_scaled_curation(spark, mult: int, scratch: str) -> str:
    """K x sf0.1 documents for the CURATION family (x282/x285/curated_*).

    The docs family's token tagging is WRONG here: tagging the stopwords
    zeroes the funnel's stopword-hit signal, so every copy k>0 fails the
    stopwords_2pct gate, gets verdict drop_quality, and the strip pass
    sees only 1/K of the corpus. This construction tags every
    NON-stopword token with a single-char copy tag instead:

    - stopword hits and token counts: preserved exactly (stopwords
      untouched, token count unchanged);
    - punctuation ratio: absolute punct unchanged, n_chars grows ->
      ratio shrinks below an unchanged ceiling (still passes);
    - mean token length: +<=1 char on a ~12-char ceiling;
    - min chars/tokens: docs only grow (floors still pass);
    - exact-dup + segment structure: consistent within-copy tagging
      preserves every within-copy duplicate text and repeated block
      verbatim, while no text or 20-token block ever matches ACROSS
      copies — so verdict mix, blocklist df structure, and strip mass
      all scale ~linearly in K and superlinear wall time is the
      ENGINE's. (The x269 contamination gate's doc_id<10 eval seed
      lives in copy 0 only; its broadcast-grams pass is per-row and
      K-independent in shape.)"""
    out_dir = os.path.join(scratch, f"m{mult}")
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out_dir
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    copies = []
    for k in range(mult):
        tag = F.lit(_CUR_TAGS[k])
        tagged = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.when(
                    t.isin(*_CUR_STOPWORDS), t
                ).otherwise(F.concat(tag, t)),
            ),
            " ",
        )
        copies.append(
            base.select(
                (F.col("doc_id") + F.lit(k * 1_000_000_000)).alias("doc_id"),
                tagged.alias("text"),
                "lang",
                "source",
                F.length(tagged).alias("n_chars"),
            )
        )
    df = copies[0]
    for c in copies[1:]:
        df = df.unionAll(c)
    df.repartition(32, "doc_id").write.mode("overwrite").parquet(out)
    return out_dir


def build_scaled_events(spark, mult: int, scratch: str) -> str:
    """K x sf0.1 events. Copy k offsets user_id AND event_id by k * 10^9
    with timestamps untouched: the per-user temporal structure (gaps,
    sessions, view->purchase sequences) is preserved verbatim inside each
    copy while user sets are disjoint ACROSS copies — so user-keyed joins
    (x158's interval join, x153's overlap matrix) gain exactly K x the
    true workload and any superlinear wall-time is the engine's."""
    out_dir = os.path.join(scratch, f"m{mult}")
    out = os.path.join(out_dir, "events.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out_dir
    base = spark.read.parquet(f"{BASE}/events.parquet")
    copies = []
    for k in range(mult):
        off = F.lit(k * 1_000_000_000)
        copies.append(
            base.select(
                (F.col("event_id") + off).alias("event_id"),
                "ts",
                (F.col("user_id") + off).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    df = copies[0]
    for c in copies[1:]:
        df = df.unionAll(c)
    df.repartition(32, "event_id").write.mode("overwrite").parquet(out)
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,2,4,8")
    ap.add_argument("--family", choices=sorted(DEFAULT_QUERIES), default="docs")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--scratch", default=None)
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    shorts = args.queries.split(",") if args.queries else DEFAULT_QUERIES[args.family]
    names = [_resolve(q) for q in shorts]
    scratch = args.scratch or f"/tmp/scale_probe_{args.family}"
    build = {
        "docs": build_scaled,
        "embeddings": build_scaled_embeddings,
        "events": build_scaled_events,
        "curation": build_scaled_curation,
        "packing": build_scaled,
    }[args.family]

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {}
    for m in mults:
        t0 = time.time()
        dirs[m] = build(spark, m, scratch)
        print(f"built m{m} in {time.time()-t0:.1f}s", flush=True)

    # warmup (JIT/codegen caches) on the smallest scale
    for name in names:
        _run(name)(spark, dirs[mults[0]]).write.format("noop").mode(
            "overwrite"
        ).save()

    results: dict[str, dict[int, float]] = {n: {} for n in names}
    rows_out: dict[str, dict[int, int]] = {n: {} for n in names}
    for m in mults:
        for name in names:
            best = math.inf
            for _ in range(args.reps):
                t0 = time.time()
                df = _run(name)(spark, dirs[m])
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            results[name][m] = best
            rows_out[name][m] = _run(name)(spark, dirs[m]).count()
            print(f"m{m} {name}: {best:.2f}s ({rows_out[name][m]} rows)", flush=True)

    # least-squares slope of log t vs log m = scaling exponent
    print("\n| query | " + " | ".join(f"{m}x (s)" for m in mults) + " | rows@max | alpha |")
    print("|---|" + "---|" * (len(mults) + 2))
    for name in names:
        xs = [math.log(m) for m in mults]
        ys = [math.log(results[name][m]) for m in mults]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom if denom else float("nan")
        times = " | ".join(f"{results[name][m]:.2f}" for m in mults)
        print(f"| {name} | {times} | {rows_out[name][max(mults)]} | {alpha:.2f} |")


if __name__ == "__main__":
    main()
