"""Deduplication operators for training-data pipelines (SURVEY.md §2.6 X12):

- exact dedup          hash-groupBy on a content hash (md5)
- n-gram Jaccard       shingle explode -> equi self-join -> set algebra
- MinHash + LSH        signature -> band-bucket join -> verified pairs
- SimHash              weighted bit voting over token hashes

Scale notes (100 TB): the shingle self-join shuffles on the shingle string —
hot shingles (boilerplate) produce join skew, so ``max_shingle_freq`` drops
shingles whose global document frequency exceeds a cap before the join
(standard df-cap trick; biases Jaccard down only for docs made of pure
boilerplate). MinHash replaces the |docs|^2 comparison with band buckets:
only same-bucket docs are compared, and the verify step recomputes exact
Jaccard so false positives cost time, not correctness."""

from __future__ import annotations

import threading
from functools import reduce
from operator import add

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rounding import dround
from .textfns import word_ngrams

# Mersenne prime 2^31-1: (a*h + b) stays within int64 for a,h < 2^31,
# so ANSI-mode arithmetic never overflows.
_MINHASH_PRIME = 2147483647

# One-slot handle on the most recent ngram_jaccard_pairs shingle cache —
# released on the next call so repeated invocations in a long-lived session
# don't accumulate pinned partitions. Guarded by a lock: with concurrent
# pipelines (herder streaming queries, parallel bench runs) an unguarded
# swap could unpersist a cache another in-flight job is reading, forcing
# mid-job recomputation of the shingle transform. The lock makes the swap
# atomic; the unpersist itself is always SAFE (Spark recomputes), the lock
# just prevents two concurrent calls from both leaving a cache pinned.
_shingle_cache_lock = threading.Lock()
_last_shingle_cache: DataFrame | None = None


def content_hash(text: Column | str) -> Column:
    return F.md5(text if isinstance(text, Column) else F.col(text))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of every exact-content group.
    One hash aggregation — the 100 TB plan is scan -> partial min -> final."""
    return (
        df.groupBy(content_hash(text_col).alias("h"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("h")
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a whitespace-tokenized text.

    r15: gram construction rides textfns.word_ngrams (per-row zip_with
    chain) — the previous slice-inside-lambda form re-evaluated the full
    split per gram (guide §4.1). Byte-identical shingle strings."""
    return F.array_distinct(word_ngrams(text, n))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= threshold).

    Plan shape: explode distinct shingles, hash each to int64, equi
    self-join on the hash (8-byte shuffle keys instead of the raw shingle
    string — shingles average ~20+ bytes, so this cuts join shuffle volume
    by more than half), count intersections per pair, then
    |A ∪ B| = |A| + |B| - |A ∩ B|. Shingles are distinct per doc before
    hashing, so intersection counts are exact up to 64-bit xxhash64
    collisions (~n²/2⁶⁵ — negligible at any corpus size we target).
    Deterministic integer counts; the final division is a single double op,
    rounded to 6."""
    # NOTE on plan shape: carrying size(arr) alongside explode(arr) looks
    # cheaper (one shuffle) but CollapseProject folds the array expression
    # into the post-explode projection, recomputing the shingle transform
    # per exploded row (~150x per doc) — measured 4x slower. Counting the
    # exploded rows per doc is one extra (tiny: |docs| groups) aggregation
    # and keeps the expensive expression evaluated once per row.
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("s_str")
    ).select("id", F.xxhash64("s_str").alias("s"))
    # the exploded shingles feed three consumers (sizes + both join sides);
    # persisting computes the expensive shingle transform once (~35% saved,
    # measured at sf0.1). MEMORY_AND_DISK + LRU eviction keeps it safe.
    # Long-lived sessions (bench loop, herder) call this repeatedly: release
    # the previous call's cache so at most one shingle relation stays pinned
    # (unpersist is safe even if that result is re-evaluated later — the
    # plan just recomputes).
    sh = sh.persist()
    global _last_shingle_cache
    with _shingle_cache_lock:
        prev, _last_shingle_cache = _last_shingle_cache, sh
    if prev is not None and prev is not sh:
        prev.unpersist(blocking=False)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_freq is not None:
        hot = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_"))
        sh = sh.join(F.broadcast(hot.filter(F.col("df_") > max_shingle_freq)), "s", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            dround(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _perm_coeffs(num_hashes: int, seed: int) -> tuple[list[int], list[int]]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MINHASH_PRIME, size=num_hashes).tolist()
    b = rng.randint(0, _MINHASH_PRIME, size=num_hashes).tolist()
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures: h_i(doc) = min over shingles of (a_i*x + b_i) mod p,
    x = xxhash64(shingle) folded into [0, p). One explode + one hash-agg with
    ``num_hashes`` partial-min columns — map-side combine keeps the shuffle at
    |docs| x num_hashes regardless of corpus size."""
    a, b = _perm_coeffs(num_hashes, seed)
    # materialize the base hash ONCE per shingle row: as a subexpression of
    # all num_hashes aggregates it would be re-evaluated per permutation
    # (aggregate expressions don't share CSE), turning 1 xxhash into 64
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("s")
    ).select("id", F.pmod(F.xxhash64("s"), F.lit(_MINHASH_PRIME)).alias("x"))
    x = F.col("x")
    aggs = [
        F.min(F.pmod(F.lit(a[i]) * x + F.lit(b[i]), F.lit(_MINHASH_PRIME))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """Band the signature matrix: docs sharing any band hash are candidates.
    Banding is an explode to (id, band, band_hash) then an equi self-join on
    (band, band_hash) — the classic MinHash-LSH bucket join."""
    rows = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(*[f"mh{j * rows + r}" for r in range(rows)]).alias("bh"),
            )
            for j in range(bands)
        ]
    )
    banded = sigs.select("id", F.explode(band_structs).alias("b")).select(
        "id", "b.band", "b.bh"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    # r16 (guide §2.4/§2.5): pin the candidate-dedup exchange at the
    # session shuffle width and key it by id_a — same fix as
    # simfns.lsh_cosine_pairs (AQE's byte-based coalescing starved the
    # CPU-dense dedup + verify stages; hash(id_a) also pre-clusters the
    # id_a shingle-set join downstream). Output set unchanged.
    n_shuffle = int(
        sigs.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .repartition(n_shuffle, "id_a")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard on the shingle sets
    (false positives filtered; recall tested in tests/test_dedup.py)."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n, seed)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands)
    sets_ = df.select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh"))
    a = sets_.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets_.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            dround(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """Near-dup CLUSTER assignment: connected components over the dup-pair
    graph via hash-min label propagation — the step that turns pairwise
    near-dups into one canonical document per group (cluster id = min doc
    id in the component, the usual keep-lowest policy).

    Each iteration is one shuffle join + min-aggregate; iterations needed =
    graph diameter in hops (log-ish for real dup clusters, which are
    near-cliques — typically 2-3 rounds at any scale). The driver-side
    convergence check is a scalar count per round, not a data collect."""
    # r16 (guide §2.4): the former 2-branch union re-ran the PAIRS
    # pipeline once per direction — the expensive upstream (LSH bucket
    # join / shingle pair build) executed twice to materialize sym.
    # An in-row 2-way explode emits both directions from ONE pass; rows
    # identical, measured 1.33x (x12h) / 1.27x (x12i) interleaved at
    # sf0.1 with labels asserted equal. (An eager sym.count() before the
    # consumers was ALSO measured: slightly slower — the labels-agg /
    # round-1 consumers' cache race duplicates only the cheap post-sym
    # projection, not the pairs pipeline.)
    sym = (
        pairs.select(
            F.explode(
                F.expr(
                    f"array(struct({id_a} as src, {id_b} as dst),"
                    f" struct({id_b} as src, {id_a} as dst))"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .persist()
    )
    # fused init: label_0 = min(self, neighbors) — the same aggregation a
    # "labels = node; round 1" sequence would produce, for the cost of the
    # node-distinct job alone (one join round saved; near-clique dup
    # graphs then converge in 1-2 further rounds)
    labels = (
        sym.groupBy("src")
        .agg(F.min(F.least(F.col("src"), F.col("dst"))).alias("label"))
        .withColumnRenamed("src", "node")
        .persist()
    )
    try:
        # Convergence check exploits hash-min monotonicity: labels only ever
        # DECREASE, so the label total strictly decreases every round until
        # the fixpoint — comparing one decimal sum per round replaces the
        # join-against-previous-labels job (one aggregation instead of a
        # shuffle join + filter + count; measured ~25% off x12h wall).
        changed = 1
        # r15 optimization: seed the monotone-sum check with the FUSED-INIT
        # labels' sum (one cheap agg on the already-persisted label table —
        # it also warms the cache the first round reads). Near-clique dup
        # graphs reach the fixpoint AT init, and the seeded comparison
        # detects that after ONE propagation round instead of two — saving
        # a full join+agg+collect round per call (and, at scale, one whole
        # shuffle of the label table). Labels are untouched; only when the
        # loop STOPS changes, and only in the already-converged direction.
        #
        # r16: the seed sum and round 1's sum now land in ONE collect —
        # round 1 is built lazily on the init labels and both decimal
        # sums ride a single 2-row union action, so the typical
        # (near-clique, converges-at-init) call pays ONE driver job round
        # for its convergence proof instead of two. Later rounds (rare:
        # diameter > 1 graphs) keep the per-round collect. Sums, labels
        # and the stop rule are unchanged.
        sum_of = lambda df: F.sum(F.col("label").cast("decimal(38,0)"))  # noqa: E731
        prev_sum = None
        for it in range(max_iters):
            nbr = sym.join(labels, sym["dst"] == labels["node"]).select(
                F.col("src").alias("node"), "label"
            )
            new = (
                labels.unionByName(nbr)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
            if (it + 1) % 5 == 0:
                # Truncate the iterative lineage: persist() caches DATA but
                # the logical plan still compounds one join per round, and
                # long-diameter graphs (many rounds) blow up planning/codegen
                # memory. A periodic eager checkpoint caps plan depth at 5
                # joins regardless of round count.
                new = new.localCheckpoint(eager=True)
            else:
                new = new.persist()
            # decimal(38,0): exact at any node count x 64-bit label magnitude
            if prev_sum is None:
                rows = (
                    labels.agg(sum_of(labels).alias("s"))
                    .select(F.lit(0).alias("k"), "s")
                    .unionAll(
                        new.agg(sum_of(new).alias("s")).select(
                            F.lit(1).alias("k"), "s"
                        )
                    )
                    .collect()
                )
                by_k = {r["k"]: r["s"] for r in rows}
                prev_sum, cur_sum = by_k[0], by_k[1]
            else:
                cur_sum = new.agg(sum_of(new).alias("s")).collect()[0]["s"]
            labels.unpersist()
            labels = new
            if cur_sum == prev_sum:
                changed = 0
                break
            prev_sum = cur_sum
        if changed != 0:
            # A component whose diameter exceeds the iteration budget (long
            # chains of near-dups) would otherwise silently return SPLIT
            # cluster assignments in a hash-checked path.
            raise RuntimeError(
                f"dup_clusters did not converge after {max_iters} iterations "
                "(labels still changing); raise max_iters — the dup graph "
                "has components with diameter > max_iters"
            )
        return labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster")
        )
    finally:
        sym.unpersist(blocking=False)


def token_hash60(token: Column | str) -> Column:
    """Cross-engine deterministic 60-bit token hash: first 15 hex chars of
    md5, parsed base-16. DuckDB twin: CAST('0x' || substring(md5(t),1,15) AS BIGINT)."""
    t = token if isinstance(token, Column) else F.col(token)
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """SimHash: per bit position, tokens vote +1/-1 by their hash bit; the
    sign of the tally sets the output bit. Near-dup docs land at small
    Hamming distance. Explode + single hash-agg with ``bits`` sum columns."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).withColumn("h", token_hash60("tok"))
    # r16 (build-time cost, guide §1.2): the per-bit Column-op loops made
    # ~300 py4j round trips per BUILD (~1.2 ms each on this rig — ~1 s of
    # driver time per bench rep before any job ran). Each vote/pack term
    # is now one SQL string parsed JVM-side in a single call; the parsed
    # expressions are identical (asserted row-for-row at sf0.1), so plan
    # and results are unchanged — only Python-side construction cost
    # drops (measured 5x: 1.27 s -> 0.25 s per build).
    votes = [
        F.expr(f"sum((shiftright(h, {i}) & 1) * 2 - 1)").alias(f"v{i}")
        for i in range(bits)
    ]
    tallied = toks.groupBy("id").agg(*votes)
    pack = " + ".join(
        f"(case when v{i} >= 0 then {1 << i}L else 0L end)"
        for i in range(bits)
    )
    return tallied.select(
        F.col("id").alias(id_col),
        F.expr(f"cast({pack} as bigint)").alias("simhash"),
    )


def hamming(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-SUBSET pairs: containment(A in B) = |A ∩ B| / |A| — the
    boilerplate/quotation detector Jaccard misses (a short doc fully
    embedded in a long one has low Jaccard but containment ~1). Same
    int64-hashed shingle self-join as ngram_jaccard_pairs; emits the pair
    once (id_a < id_b) with BOTH directions' containment, filtered on the
    max of the two. Deterministic integer counts; two rounded divisions.

    ``max_shingle_freq`` is the 100 TB guardrail: this operator's target
    input IS boilerplate, and a shingle shared by N docs yields an O(N²)
    join output for that key — a header in 10⁶ docs would emit 10¹² rows.
    The cap drops shingles whose document frequency exceeds it from the
    JOIN SIDE ONLY; |A| (``n_sh``) stays exact, computed from the uncapped
    set. Bias is therefore one-sided and documented: |A∩B| can only shrink,
    so reported containment is a LOWER bound — capped-out pairs are missed,
    never inflated (the audit-safe direction for a boilerplate report).
    Unlike the Jaccard cap (which shrinks the union denominator too), the
    exact |A| denominator here keeps every surviving pair's score
    conservative."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("s_str")
    ).select("id", F.xxhash64("s_str").alias("s"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_freq is not None:
        # df-cap mirrors ngram_jaccard_pairs: the hot-shingle list is tiny
        # (only shingles with df > cap), so the anti-join broadcasts.
        hot = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_"))
        sh = sh.join(
            F.broadcast(hot.filter(F.col("df_") > max_shingle_freq)), "s", "left_anti"
        )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("containment_a", dround(F.col("inter") / F.col("n_a"), 6))
        .withColumn("containment_b", dround(F.col("inter") / F.col("n_b"), 6))
        .filter(
            F.greatest(F.col("containment_a"), F.col("containment_b")) >= threshold
        )
        .select("id_a", "id_b", "containment_a", "containment_b")
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-token gram, slide a
    w-gram window over the hash sequence, and select each window's
    minimum hash (rightmost on ties). Guarantees: any shared substring of
    at least w+k-1 tokens produces at least one shared fingerprint, and
    expected density is 2/(w+1) — a ~60% sparser match index than raw
    shingles at w=4, with a detection-length floor instead of silent loss.

    Selection is ONE window-min per gram, no per-window subquery: the
    (hash, position) pair packs into an exact DECIMAL(38,0) ordinal
    ``h * 2^40 + (2^40-1 - pos)`` (60-bit hash × 40-bit position — wide
    enough for any int32 posexplode offset, and > int64 so it rides
    DECIMAL/HUGEINT), so "min hash, rightmost tie" is a plain integer
    MIN over a CURRENT..w-1 FOLLOWING frame.
    At 100 TB this is one per-doc sort partition (no shuffle beyond the
    doc repartition) and the output is the sparse fingerprint set.

    Returns distinct ``(id, h)`` fingerprint rows.
    """
    toks = F.split(text_col, " ")
    n_grams = F.size(toks) - F.lit(k - 1)
    # r15: gram strings from word_ngrams (per-row zip_with chain), the
    # md5 hash transform's collection argument evaluated once per row —
    # the slice-inside-lambda form re-split the text per gram (guide
    # §4.1). Identical gram strings => identical fingerprint hashes.
    grams = F.transform(
        word_ngrams(text_col, k),
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
    )
    g = (
        docs.filter(F.size(toks) >= k + w - 1)
        .select(
            F.col(id_col).alias("id"),
            n_grams.alias("ng"),
            F.posexplode(grams).alias("pos", "h"),
        )
    )
    win = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    # 40-bit position field: 2^20 overflowed for docs with > 1M grams
    # (negative offset borrows into the hash field); 2^40 covers any
    # possible array position (posexplode is int32) and h*2^40 < 2^100
    # still fits DECIMAL(38,0) / HUGEINT exactly.
    packed = F.min(
        F.col("h").cast("decimal(38,0)") * F.lit(1_099_511_627_776)
        + (F.lit(1_099_511_627_775) - F.col("pos"))
    ).over(win)
    return (
        g.select("id", "pos", "ng", packed.alias("pk"))
        .filter(F.col("pos") <= F.col("ng") - w)  # full windows only
        .select(
            "id",
            F.floor(F.col("pk") / F.lit(1_099_511_627_776)).cast("long").alias("h"),
        )
        .distinct()
    )


def winnow_match_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 3,
    max_hash_freq: int | None = None,
) -> DataFrame:
    """Cross-document near-duplicate candidates by shared winnowing
    fingerprints: equi-join the sparse fingerprint sets on hash, count
    shared fingerprints per (doc_a, doc_b), keep pairs with at least
    ``min_shared``. The join key is a fingerprint — already ~2/(w+1) of
    gram volume — and ``max_hash_freq`` drops fingerprints shared by more
    than that many documents before the self-join (the same hot-key
    guardrail as the shingle ops: a boilerplate fingerprint in 10^6 docs
    would otherwise emit 10^12 pairs). Capping only removes candidates
    supported by ubiquitous substrings; per-pair counts of the surviving
    fingerprints are exact."""
    fp = winnow_fingerprints(docs, id_col, text_col, k, w)
    if max_hash_freq is not None:
        hot = fp.groupBy("h").agg(F.count(F.lit(1)).alias("df_"))
        fp = fp.join(
            F.broadcast(hot.filter(F.col("df_") > max_hash_freq)), "h", "left_anti"
        )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def deletion_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_pairs_per_variant: int | None = None,
) -> DataFrame:
    """Entity-resolution candidate pairs within edit distance 1 via
    deletion-neighborhood blocking (FastSS, Bocek et al. 2007): the
    variant set U(s) = {s} ∪ {s with one char deleted} has the property
    that edit_distance(x, y) <= 1 implies U(x) ∩ U(y) != ∅ — a
    substitution matches on the both-sides deletion, an insert/delete
    matches the shorter string itself. Candidates come from ONE equi-join
    on variant strings (|s|+1 variants per record, join keys hashed by
    the engine), then exact ``levenshtein`` verifies — so output is
    EXACT while the join never compares all pairs: the naive plan is
    O(n²) string comparisons, this is O(n·L) join rows. The classic
    Spark-native fuzzy-join blocking scheme for typo-level dedup of
    names/emails/SKUs.

    ``max_pairs_per_variant`` optionally drops variants whose block
    exceeds the cap before the self-join (the same hot-key guardrail as
    the shingle df-cap — e.g. the empty-string variant of 1-char names).

    The join key is xxhash64(variant), not the variant string: candidates
    only ever feed the exact levenshtein verify, so a hash collision can
    only ADD a candidate that verification then scores exactly —
    completeness is untouched (equal variants imply equal hashes) and,
    with ``max_pairs_per_variant=None``, the output is provably identical
    to the string-keyed join, while the shuffle carries 8-byte longs
    instead of name-length strings. With the cap SET the guarantee is
    only probabilistic: a collision merges two variants' block counts and
    can push a block over the cap, dropping true dist<=1 pairs — so the
    cap counts on (length(variant), xxhash64(variant)), which requires a
    same-length 64-bit collision to misfire (the bare-hash birthday bound
    bites around ~4e9 variants, i.e. exactly the 100 TB regime the cap
    exists for). Names likewise stay OUT of the self-join: the join
    moves (id, hash) only, the pair set dedupes as bare id pairs, and
    names re-attach by two id-keyed joins against the input — at 100 TB
    that is two hash joins on the record key vs shipping every string
    L+1 times through the widest shuffle.
    Returns (id_a, id_b, dist) with id_a < id_b, dist <= 1."""
    name_len = F.length(F.col(name_col))
    variants = F.array_distinct(
        F.concat(
            F.array(F.col(name_col)),
            F.transform(
                F.sequence(F.lit(1), name_len),
                lambda i: F.concat(
                    F.substring(F.col(name_col), F.lit(1), i - 1),
                    F.substring(F.col(name_col), i + 1, name_len),
                ),
            ),
        )
    )
    v = df.select(
        F.col(id_col).alias("id"),
        F.explode(variants).alias("var"),
    ).select("id", F.xxhash64("var").alias("hv"), F.length("var").alias("lv"))
    if max_pairs_per_variant is not None:
        hot = v.groupBy("hv", "lv").agg(F.count(F.lit(1)).alias("df_"))
        v = v.join(
            F.broadcast(hot.filter(F.col("df_") > max_pairs_per_variant)),
            ["hv", "lv"],
            "left_anti",
        )
    v = v.drop("lv")
    a, b = v.alias("a"), v.alias("b")
    # r16 (guide §2.4/§2.5): pin the candidate-dedup exchange at the
    # session shuffle width, keyed by id_a — same fix as
    # simfns.lsh_cosine_pairs / lsh_candidate_pairs (AQE's byte-based
    # coalescing ran the CPU-dense dedup + levenshtein-verify stages on
    # 8 of 32 cores; hash(id_a) also pre-clusters the id_a name
    # re-attach join). Output set unchanged; measured 2.09 -> 1.53s
    # interleaved on the x85 shape at sf0.1.
    n_shuffle = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    cands = (
        a.join(b, (F.col("a.hv") == F.col("b.hv")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .repartition(n_shuffle, "id_a")
        .dropDuplicates(["id_a", "id_b"])
    )
    na = df.select(F.col(id_col).alias("id_a"), F.col(name_col).alias("nm_a"))
    nb = df.select(F.col(id_col).alias("id_b"), F.col(name_col).alias("nm_b"))
    return (
        cands.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("dist", F.levenshtein("nm_a", "nm_b").cast("long"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "dist")
    )


def subset_edges(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    containment_num: int = 9,
    containment_den: int = 10,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Directed near-subset edges: A -> B where >= 90% of A's shingles are
    inside B but B is > 2x bigger than the overlap — quote/extract/
    derivative detection, the ORIENTED refinement of symmetric
    containment (ngram_containment_pairs). Predicates are
    cross-multiplied integers; same shingle-join machinery, and
    ``max_shingle_freq`` is the same 100 TB hot-key guardrail: shingles
    in more than that many docs leave the JOIN side only, so ``nsh``
    sizes stay exact and capped containment is a one-sided lower bound
    (can only miss edges supported by boilerplate shingles)."""
    ex = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("sh")
    )
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("nsh"))
    exj = ex
    if max_shingle_freq is not None:
        hot = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
        exj = ex.join(
            F.broadcast(hot.filter(F.col("df_") > max_shingle_freq)),
            "sh",
            "left_anti",
        )
    a, b = exj.alias("a"), exj.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") != F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("nsh").alias("n_contained"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("nsh").alias("n_container"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            (F.col("inter") * containment_den >= F.col("n_contained") * containment_num)
            & (F.col("inter") * 2 < F.col("n_container"))
        )
        .select(
            F.col("id_a").alias("contained_doc"),
            F.col("id_b").alias("container_doc"),
            "inter",
            "n_contained",
            "n_container",
        )
    )


def kcore_nodes(edges: DataFrame, k: int, max_iters: int = 12) -> DataFrame:
    """Nodes of the k-core of an undirected (id_a < id_b) edge list: the
    maximal subgraph where every node keeps degree >= k — computed by the
    standard peel ("drop nodes with degree < k, drop their edges, repeat
    to fixpoint").

    Scale shape: each iteration is one degree hash-agg + two semi-joins
    of the CURRENT edge set against the surviving node set — never a
    growing structure; the edge set only shrinks. Peeling converges in at
    most diameter-ish rounds on dup graphs (long chains peel one hop per
    round); ``max_iters`` bounds the worst case and lineage is cut with
    localCheckpoint each round so the plan can't replay the whole peel
    history. The only driver-side values are the per-round surviving-node
    COUNTS (one scalar per round, the x12i convergence idiom).

    Returns DataFrame(node) of surviving node ids.
    """
    e = edges.select("id_a", "id_b").localCheckpoint()
    prev_n = -1
    converged = False
    for _ in range(max_iters):
        deg = (
            e.select(F.col("id_a").alias("node"))
            .unionAll(e.select(F.col("id_b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("node").localCheckpoint()
        n = keep.count()
        if n == prev_n:
            converged = True
            break
        prev_n = n
        e = (
            e.join(keep.withColumnRenamed("node", "id_a"), "id_a", "semi")
            .join(keep.withColumnRenamed("node", "id_b"), "id_b", "semi")
            .localCheckpoint()
        )
        if n == 0:
            converged = True
            break
    if not converged:
        # Long chains peel one hop per round, so a component of ~2*max_iters
        # near-dup docs would otherwise silently return a SUPERSET of the
        # true k-core (the final degree filter enforces only one extra peel
        # step) — same contract as dup_clusters above: fail loudly.
        raise RuntimeError(
            f"kcore_nodes did not converge after {max_iters} iterations "
            "(surviving-node count still shrinking); raise max_iters — the "
            "dup graph has chains longer than the peel budget"
        )
    return (
        e.select(F.col("id_a").alias("node"))
        .unionAll(e.select(F.col("id_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") >= k)
        .select("node")
    )


def segment_blocks(
    docs: DataFrame, block: int = 20, with_text: bool = False
) -> DataFrame:
    """Explode documents into non-overlapping ``block``-token segments —
    the shared front half of x272's batch prune plan, its streaming
    twin (streaming/drift.py block_keeper_state), and the curated_write
    strip pass (plans/curate.py), so batch, stream, and the emitting
    action can never drift on the segmentation.

    Emits one row per block: (doc_id, source, b_idx, n_tok, h, clock)
    where ``h`` = md5 of the space-joined block and ``clock`` =
    doc_id * 1e6 + b_idx — the keep-first total order, a single BIGINT
    so the keeper selection stays a plain ``min`` in every engine.
    With ``with_text=True`` each row also carries ``txt``, the
    space-joined block itself, so surviving blocks re-assemble the
    document EXACTLY (split-on-space then block-join with a space is
    the identity on the original text, empty tokens included) — only
    the strip pass pays for carrying the strings.
    Assumes b_idx < 1e6 (a 20M-token document at block=20;
    assert-checked in tests/test_curation_ops.py); the docs side needs
    columns doc_id, source, text."""
    toks = docs.select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    )
    txt_field = (
        f", 'txt', array_join(slice(toks, b * {block} + 1, {block}), ' ')"
        if with_text
        else ""
    )
    out = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(0, cast((size(toks) + {block} - 1)"
                f" div {block} as int) - 1),"
                f" b -> named_struct("
                f"'b_idx', cast(b as bigint),"
                f" 'n_tok', cast(size(slice(toks, b * {block} + 1, {block}))"
                f" as bigint),"
                f" 'h', md5(array_join(slice(toks, b * {block} + 1, {block}),"
                f" ' ')){txt_field}))"
            )
        ).alias("blk"),
    )
    cols = [
        "doc_id",
        "source",
        F.col("blk.b_idx").alias("b_idx"),
        F.col("blk.n_tok").alias("n_tok"),
        F.col("blk.h").alias("h"),
        (F.col("doc_id") * 1000000 + F.col("blk.b_idx")).alias("clock"),
    ]
    if with_text:
        cols.append(F.col("blk.txt").alias("txt"))
    return out.select(*cols)


def md5_minhash_rows(ex: DataFrame, n_hashes: int = 64) -> DataFrame:
    """The (doc_id, i, mh) MinHash signature table over an exploded
    (doc_id, sh) shingle stream, with the md5 hash family both engines
    share (x150/x281's estimator calibration kernel — the production
    bucketing keeps xxhash64 permutations, see minhash_signatures).

    Built as ``n_hashes`` min-agg COLUMNS over the occurrence stream
    followed by a stack() unpivot of the |docs| x n aggregate — never
    the occurrence x n row explode, whose 64x-octave materialization
    is what spilled in the scale probe (164s -> 69s at 64 x sf0.1 for
    the same answer). The md5 work is identical; only the intermediate
    rows disappear."""
    sig_wide = ex.groupBy("doc_id").agg(
        *[
            F.min(
                token_hash60(F.concat(F.lit(f"{i}:"), F.col("sh")))
            ).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    )
    stack_expr = (
        f"stack({n_hashes}, "
        + ", ".join(f"cast({i} as int), mh{i}" for i in range(n_hashes))
        + ") as (i, mh)"
    )
    return sig_wide.select("doc_id", F.expr(stack_expr))
