"""Text-analysis query surface (SURVEY.md §2.6 X14 + training-data ops)
over the ``documents`` fixture. Oracle SQL mirrors
functions/textfns.py expression-for-expression (DuckDB list lambdas)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, load_parallel
from ..functions.textfns import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
    redact_pii,
    repetition_score,
    stopword_ratio,
    token_count,
    word_ngrams,
)
from .registry import dround, dround_sql, query


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "x14_lang_stats",
    oracle="""
    SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def x14_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_parallel(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang")
    )


@query(
    "x14b_token_counts",
    oracle="""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token ORDER BY token
    """,
)
def x14b_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies: explode + hash-agg (the wordcount plan;
    partial counts combine map-side before the shuffle)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("token")
    )


@query(
    "x14c_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             length(regexp_replace(text, '[^.,!?;:]', '', 'g')) / length(text) AS punct
      FROM documents
    ), s AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             len(list_filter(toks, x -> list_contains({_sql_list(STOPWORDS)}, x))) / len(toks) AS sw_raw,
             punct
      FROM t
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, {dround_sql("sw_raw", 6)} AS sw_ratio,
           {dround_sql("(least(n_tokens, 100) / 100.0 + least(sw_raw * 5, 1.0)) / 2.0 - punct", 4)} AS quality
    FROM s ORDER BY doc_id
    """,
)
def x14c_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristic: length / stopword-ratio / punctuation
    density (functions/textfns.quality_score)."""
    d = load_parallel(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        stopword_ratio("text").alias("sw_ratio"),
        quality_score("text").alias("quality"),
    ).orderBy("doc_id")


_LANG_CASE = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    h AS (SELECT doc_id,
      len(list_filter(toks, x -> list_contains({_sql_list(LANG_MARKERS["en"])}, x))) AS en,
      len(list_filter(toks, x -> list_contains({_sql_list(LANG_MARKERS["de"])}, x))) AS de,
      len(list_filter(toks, x -> list_contains({_sql_list(LANG_MARKERS["es"])}, x))) AS es,
      len(list_filter(toks, x -> list_contains({_sql_list(LANG_MARKERS["fr"])}, x))) AS fr
      FROM t)
    SELECT doc_id,
      CASE WHEN en >= de AND en >= es AND en >= fr AND en > 0 THEN 'en'
           WHEN de >= es AND de >= fr AND de > 0 THEN 'de'
           WHEN es >= fr AND es > 0 THEN 'es'
           WHEN fr > 0 THEN 'fr'
           ELSE 'und' END AS lang_guess
    FROM h ORDER BY doc_id
"""


@query("x14d_lang_id", oracle=_LANG_CASE)
def x14d_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-stopword argmax; see textfns.lang_id)."""
    d = load_parallel(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id("text").alias("lang_guess")).orderBy("doc_id")


@query(
    "x14f_chunking",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (SELECT doc_id,
            unnest([{'i': CAST(s AS INTEGER),
                     'c': array_to_string(toks[s*5 + 1 : s*5 + 10], ' ')}
                    for s in range(0, CASE WHEN len(toks) >= 10
                                         THEN (len(toks) - 10) // 5 + 1
                                         ELSE 0 END)]) AS u
          FROM t)
    SELECT doc_id, u.i AS chunk_idx, u.c AS chunk_text
    FROM c ORDER BY doc_id, chunk_idx
    """,
)
def x14f_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sample chunking: sliding windows of 10 tokens, stride 5,
    full windows only — the standard doc->sample fan-out before
    tokenization. posexplode keeps the chunk index; all JVM-side array ops."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    starts = F.when(
        F.size(toks) >= 10,
        F.sequence(F.lit(0), F.floor((F.size(toks) - 10) / 5).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(toks, s * 5 + 1, 10)))
    return (
        d.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .withColumn("chunk_idx", F.col("chunk_idx").cast("int"))
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "x14g_training_pipeline",
    oracle="""
    WITH kept AS (
      SELECT doc_id, text, lang,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
      WHERE len(string_split(text, ' ')) >= 20 AND lang IN ('en', 'de')
    ),
    chunks AS (
      SELECT doc_id, lang,
             unnest([{'i': CAST(s AS INTEGER),
                      'c': array_to_string(string_split(text, ' ')[s*10 + 1 : s*10 + 20], ' ')}
                     for s in range(0, (len(string_split(text, ' ')) - 20) // 10 + 1)]) AS u
      FROM kept WHERE rn = 1
    )
    SELECT lang, count(*) AS n_chunks,
           CAST(sum(len(string_split(u.c, ' '))) AS BIGINT) AS n_tokens
    FROM chunks GROUP BY lang ORDER BY lang
    """,
)
def x14g_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data pipeline in ONE plan: length+lang filter ->
    exact dedup keep-first -> 20-token/stride-10 chunking -> per-lang token
    budget. Each stage is the operator implemented elsewhere; composed they
    stay a single Catalyst plan (filter pushdown through the whole chain)."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    kept = (
        d.filter((F.size(toks) >= 20) & F.col("lang").isin("en", "de"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    starts = F.sequence(F.lit(0), F.floor((F.size(toks) - 20) / 10).cast("int"))
    chunks = kept.select(
        "lang",
        F.explode(
            F.transform(starts, lambda s: F.concat_ws(" ", F.slice(toks, s * 10 + 1, 20)))
        ).alias("chunk"),
    )
    return (
        chunks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.size(F.split("chunk", " "))).alias("n_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "x18_deterministic_split",
    oracle="""
    WITH h AS (SELECT doc_id, lang,
                      CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket
               FROM documents)
    SELECT doc_id, lang, CAST(bucket AS INTEGER) AS bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
    FROM h ORDER BY doc_id
    """,
)
def x18_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by a cross-engine
    content hash of the key — reproducible across runs AND engines, no
    rand(). The standard leakage-safe dataset split at any scale (pure
    map-side; doc_id could equally be a URL or content fingerprint)."""
    from ..functions.dedupfns import token_hash60

    d = load(spark, sf_dir, "documents")
    bucket = F.pmod(token_hash60(F.col("doc_id").cast("string")), F.lit(100))
    return d.select(
        "doc_id",
        "lang",
        bucket.cast("int").alias("bucket"),
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    ).orderBy("doc_id")


@query(
    "x14h_vocab",
    oracle="""
    SELECT token, cnt, CAST(rank AS BIGINT) AS rank FROM (
      SELECT token, count(*) AS cnt,
             row_number() OVER (ORDER BY count(*) DESC, token) AS rank
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token
    ) WHERE rank <= 20 ORDER BY rank
    """,
)
def x14h_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary builder: corpus token counts ranked by frequency (ties by
    token), top-20. The cutoff is orderBy().limit(20) — a
    TakeOrderedAndProject (per-partition top-k, 20-row driver merge), NOT a
    global row_number window: ranking the full distinct-token set through a
    single-partition WindowExec is the classic scale-killer (10^8+ tokens
    through one task at corpus scale). The rank window runs only over the
    20 surviving rows."""
    d = load_parallel(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), "token").limit(20)
    w = Window.orderBy(F.col("cnt").desc(), "token")
    return top.withColumn("rank", F.row_number().over(w).cast("long")).orderBy("rank")


@query(
    "x14k_bpe_token_counts",
    oracle=r"""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(regexp_extract_all(text,
            '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
          AS token FROM documents)
    WHERE NOT regexp_matches(token, '^\s+$')
    GROUP BY token ORDER BY token
    """,
)
def x14k_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex tokenizer (GPT-2-style pre-split:
    contraction suffixes, space-prefixed word pieces, digit/punct runs),
    hash-checked — the RE2-safe pattern runs verbatim in both engines.
    Same wordcount plan as x14b, different tokenizer."""
    from ..functions.textfns import bpe_tokens

    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(bpe_tokens("text")).alias("token"))
        .filter(~F.col("token").rlike(r"^\s+$"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("token")
    )


@query(
    "x14i_pii_redaction",
    oracle=r"""
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        text || ' contact user' || CAST(doc_id AS VARCHAR)
             || '@example.com ph 555-123-4567 ssn 123-45-6789 card 4111-1111-1111-1111',
        '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+', '[EMAIL]', 'g'),
        '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
        '\b\d{3}[- ]\d{3}[- ]\d{4}\b', '[PHONE]', 'g'),
        '\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b', '[CARD]', 'g') AS redacted
    FROM documents ORDER BY doc_id
    """,
)
def x14i_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data PII scrubbing, hash-checked: emails / SSNs / phones /
    card numbers -> typed placeholders. The fixture text carries no PII, so
    a deterministic PII suffix is appended before redaction; patterns are
    RE2-compatible so Spark (Java regex) and the DuckDB oracle (RE2) run
    the IDENTICAL expressions. Pure regexp_replace chain: JVM codegen,
    per-row, no shuffle — the 100 TB plan is the scan itself."""
    d = load_parallel(spark, sf_dir, "documents")
    salted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ph 555-123-4567 ssn 123-45-6789 card 4111-1111-1111-1111"),
    )
    return d.select("doc_id", redact_pii(salted).alias("redacted")).orderBy("doc_id")


@query(
    "x14j_repetition_score",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (
      SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) _
      WHERE len(t) >= 3
    ),
    c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
    s AS (SELECT doc_id, {dround_sql("CAST(MAX(c) AS DOUBLE) / SUM(c)", 6)} AS repetition
          FROM c GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(s.repetition, 0.0) AS repetition
    FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id
    """,
)
def x14j_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal, hash-checked: most-frequent
    word trigram count over total trigrams per document. Spark computes it
    per-row with higher-order array functions (sort + one aggregate pass,
    no shuffle); the oracle recomputes via unnest + GROUP BY."""
    d = load_parallel(spark, sf_dir, "documents")
    return d.select(
        "doc_id", repetition_score("text", n=3).alias("repetition")
    ).orderBy("doc_id")


@query(
    "x14e_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def x14e_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint (sorted distinct token set)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fp")).orderBy("doc_id")


@query(
    "x24_stratified_sample",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
    FROM h WHERE rn <= 20 ORDER BY lang, rn
    """,
)
def x24_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified DETERMINISTIC sampling: top-20 docs per language by
    content-hash order — reproducible across runs and engines (no rand()),
    the standard leakage-safe way to cut per-class evaluation slices from
    a training corpus. Per-group window = one shuffle on the strata key;
    skewed strata ride AQE."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang", "rn")
        .orderBy("lang", "rn")
    )


@query(
    "x25_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
      FROM documents
    ),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    df_ AS (SELECT term, count(*) AS df FROM tok GROUP BY term),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
           GROUP BY doc_id, term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             {dround_sql("tf.tf * ln(CAST(n.n AS DOUBLE) / df_.df)", 6)} AS tfidf
      FROM tf JOIN df_ USING (term) CROSS JOIN n_docs n
    ),
    ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, term, tfidf, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk
    """,
)
def x25_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document: term frequency x inverse document
    frequency (ln(N/df)), the classic relevance/keyword-extraction score.
    Plan: two hash aggs (tf per doc-term, df per term), a broadcast-able
    join on the term dimension, per-doc top-k window. df is |vocab|-sized
    — small relative to the corpus, so the join broadcasts at scale."""
    d = load_parallel(spark, sf_dir, "documents")
    n_docs = d.select(F.countDistinct("doc_id").alias("n"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            dround(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .orderBy("doc_id", "rk")
    )


@query(
    "x28_contamination_check",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(t[i:i+3], ' ')
                            for i in range(1, len(t) - 2)]) AS s
           FROM tok WHERE len(t) >= 4),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    bench AS (SELECT DISTINCT sh FROM ex WHERE doc_id % 29 = 0)
    SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM ex e JOIN bench b ON e.sh = b.sh
    WHERE e.doc_id % 29 <> 0
    GROUP BY e.doc_id ORDER BY e.doc_id
    """,
)
def x28_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: for every training document, how many
    distinct 4-gram shingles it shares with a held-out benchmark set (here
    the deterministic doc_id % 29 slice standing in for an eval suite) —
    the decontamination pass every LLM data pipeline runs before training.

    Plan: shingle-explode both sides, BROADCAST the benchmark's distinct
    shingles (eval suites are tiny relative to the corpus — MBs against
    100 TB), hash-join + per-doc count. No shuffle of the training corpus
    beyond the final per-doc aggregation of matches only."""
    from ..functions.dedupfns import shingles

    d = load_parallel(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id", F.explode(shingles(F.col("text"), 4)).alias("sh")
    )
    bench = (
        ex.filter(F.col("doc_id") % 29 == 0).select("sh").distinct()
    )
    return (
        ex.filter(F.col("doc_id") % 29 != 0)
        .join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy("doc_id")
    )


@query(
    "x29_sequence_packing",
    oracle="""
    WITH d AS (
      SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    off AS (
      SELECT lang, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok AS start_off
      FROM d
    ),
    spans AS (
      SELECT lang, doc_id, n_tok, start_off,
             unnest(range(CAST(start_off // 512 AS BIGINT),
                          CAST((start_off + n_tok - 1) // 512 AS BIGINT) + 1)) AS seq_id
      FROM off WHERE n_tok > 0
    )
    SELECT lang, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEAST(start_off + n_tok, (seq_id + 1) * 512)
                    - GREATEST(start_off, seq_id * 512)) AS BIGINT) AS n_tokens
    FROM spans GROUP BY lang, seq_id ORDER BY lang, seq_id
    """,
)
def x29_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing accounting (GPT-style concat-and-chunk):
    documents concatenate in deterministic (lang, doc_id) order and split
    into fixed 512-token sequences; a document straddling a boundary
    contributes to both sequences. Output per (lang, sequence): documents
    touching it and tokens filled — every sequence holds exactly 512
    except each language's last.

    Plan (r15, shared verbatim with plans/pack.py's _packed_spans): the
    running token offset rides distributed_group_prefix_sum — the r15
    de-single-tasking, see x288's docstring — then a sequence() explode
    (~1 row per doc) and one hash agg. The accounting path carries
    token COUNTS only, never text."""
    from ..plans.pack import _packed_spans

    d = load(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    return (
        _packed_spans(d, 512, ("lang",), ("doc_id",), with_text=False)
        .select(
            "lang",
            "seq_id",
            "n_docs",
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("lang", "seq_id")
    )


@query(
    "x288_packed_texts",
    oracle="""
    WITH d AS (
      SELECT lang, doc_id, string_split(text, ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    off AS (
      SELECT lang, doc_id, toks, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok AS start_off
      FROM d
    ),
    spans AS (
      SELECT lang, toks, n_tok, start_off,
             unnest(range(CAST(start_off // 512 AS BIGINT),
                          CAST((start_off + n_tok - 1) // 512 AS BIGINT) + 1)) AS seq_id
      FROM off WHERE n_tok > 0
    ),
    pieces AS (
      SELECT lang, seq_id, start_off,
             LEAST(start_off + n_tok, (seq_id + 1) * 512)
               - GREATEST(start_off, seq_id * 512) AS filled,
             array_to_string(list_slice(toks,
                 CAST(GREATEST(start_off, seq_id * 512) - start_off + 1 AS BIGINT),
                 CAST(LEAST(start_off + n_tok, (seq_id + 1) * 512) - start_off
                      AS BIGINT)), ' ') AS piece
      FROM spans
    )
    SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(filled) AS BIGINT) AS n_tokens,
           string_agg(piece, ' ' ORDER BY start_off) AS text
    FROM pieces GROUP BY lang, seq_id ORDER BY lang, seq_id
    """,
)
def x288_packed_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packed training sequences THEMSELVES, content hash-checked:
    x29 publishes the packing accounting; this is the corresponding
    emit plan (plans/pack.py packed_sequences, shared verbatim with
    packed_write) with the reassembled ctx=512-token sequence text in
    the row, so the cross-engine hash pins the exact bytes a
    dataloader would memory-map — not just the counts. DuckDB
    reassembles independently (list_slice + ordered string_agg vs
    Spark's map-side slice + in-row array_sort(collect_list)).

    Plan (the 100 TB shape, see plans/pack.py): one per-lang cumsum
    window, one ~1x sequence() explode whose token SLICE is cut
    map-side before the shuffle, one (lang, seq_id) hash agg. Two
    shuffles, no joins."""
    from ..plans.pack import packed_sequences

    d = load(spark, sf_dir, "documents")
    return packed_sequences(d, ctx=512).orderBy("lang", "seq_id")


@query(
    "x290_packed_nostraddle",
    oracle="""
    WITH RECURSIVE
    d AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ),
    langs AS (SELECT DISTINCT lang FROM d),
    st(lang, rn, seq, fill, start_seq, nchunks, t) AS (
      SELECT lang, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
      FROM langs
      UNION ALL
      SELECT d.lang, d.rn,
             CASE WHEN d.t > 512 THEN st.seq
                    + CASE WHEN st.fill > 0 THEN 1 ELSE 0 END
                    + CAST((d.t + 511) // 512 AS BIGINT)
                  WHEN st.fill + d.t <= 512 THEN st.seq
                  ELSE st.seq + 1 END,
             CASE WHEN d.t > 512 THEN CAST(0 AS BIGINT)
                  WHEN st.fill + d.t <= 512 THEN st.fill + d.t
                  ELSE d.t END,
             CASE WHEN d.t > 512 THEN st.seq
                    + CASE WHEN st.fill > 0 THEN 1 ELSE 0 END
                  WHEN st.fill + d.t <= 512 THEN st.seq
                  ELSE st.seq + 1 END,
             CASE WHEN d.t > 512 THEN CAST((d.t + 511) // 512 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) END,
             d.t
      FROM st JOIN d ON d.lang = st.lang AND d.rn = st.rn + 1
    ),
    chunks AS (
      SELECT lang, start_seq + i AS seq_id,
             LEAST(512, t - i * 512) AS toks
      FROM st, unnest(range(0, nchunks)) u(i)
      WHERE nchunks IS NOT NULL
    )
    SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS n_tokens
    FROM chunks GROUP BY lang, seq_id ORDER BY lang, seq_id
    """,
)
def x290_packed_nostraddle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-respecting packing accounting, hash-checked: the
    no-straddle greedy rule (a doc that does not fit closes the open
    sequence and starts the next; an over-ctx doc is chunk-split alone)
    over (lang, doc_id) order at ctx=512 — the layout a dataloader uses
    when cross-document attention is NOT masked, traded against x29's
    zero-padding concat-and-chunk. Per (lang, sequence): docs packed
    and tokens filled; ctx - n_tokens is that sequence's padding.

    Greedy packing is order-sequential — no window expresses it — so
    Spark folds each language in ONE applyInPandas group over (doc_id,
    n_tok) PAIRS only (16 bytes/doc, never text; plans/pack.py
    packed_nostraddle), and the DuckDB oracle replays the identical
    fold as a recursive CTE stepping rn -> rn+1 per language — the
    x12h/x161 recursion idiom applied to sequential state instead of
    graph reachability."""
    from ..plans.pack import packed_nostraddle

    d = load(spark, sf_dir, "documents")
    return packed_nostraddle(d, ctx=512).orderBy("lang", "seq_id")


@query(
    "x291_packing_policy_tradeoff",
    oracle="""
    WITH RECURSIVE
    d AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ),
    off AS (
      SELECT lang, t,
             SUM(t) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - t AS start_off
      FROM d WHERE t > 0
    ),
    ch AS (
      SELECT lang,
             CAST(SUM(t) AS BIGINT) AS tokens,
             CAST(MAX((start_off + t - 1) // 512) + 1 AS BIGINT) AS chunk_seqs,
             CAST(SUM(CASE WHEN start_off // 512
                             <> (start_off + t - 1) // 512
                           THEN 1 ELSE 0 END) AS BIGINT) AS straddled_docs
      FROM off GROUP BY lang
    ),
    langs AS (SELECT DISTINCT lang FROM d),
    st(lang, rn, seq, fill) AS (
      SELECT lang, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM langs
      UNION ALL
      SELECT d.lang, d.rn,
             CASE WHEN d.t > 512 THEN st.seq
                    + CASE WHEN st.fill > 0 THEN 1 ELSE 0 END
                    + CAST((d.t + 511) // 512 AS BIGINT)
                  WHEN st.fill + d.t <= 512 THEN st.seq
                  ELSE st.seq + 1 END,
             CASE WHEN d.t > 512 THEN CAST(0 AS BIGINT)
                  WHEN st.fill + d.t <= 512 THEN st.fill + d.t
                  ELSE d.t END
      FROM st JOIN d ON d.lang = st.lang AND d.rn = st.rn + 1
    ),
    fin AS (
      SELECT lang, seq + CASE WHEN fill > 0 THEN 1 ELSE 0 END AS ns_seqs
      FROM (SELECT lang, seq, fill,
                   row_number() OVER (PARTITION BY lang ORDER BY rn DESC) AS rr
            FROM st) WHERE rr = 1
    )
    SELECT ch.lang, ch.tokens, ch.chunk_seqs,
           CAST((ch.chunk_seqs * 512 - ch.tokens) * 1000000
                // (ch.chunk_seqs * 512) AS BIGINT) AS chunk_pad_ppm,
           ch.straddled_docs,
           CAST(fin.ns_seqs AS BIGINT) AS nostraddle_seqs,
           CAST((fin.ns_seqs * 512 - ch.tokens) * 1000000
                // (fin.ns_seqs * 512) AS BIGINT) AS nostraddle_pad_ppm,
           CAST((fin.ns_seqs - ch.chunk_seqs) * 1000000
                // ch.chunk_seqs AS BIGINT) AS extra_seqs_ppm
    FROM ch JOIN fin ON fin.lang = ch.lang
    ORDER BY ch.lang
    """,
)
def x291_packing_policy_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing-policy decision table, hash-checked: per language,
    what x29's concat-and-chunk layout costs in cross-document
    contamination (straddled_docs — documents cut by a sequence
    boundary, visible to unmasked attention) versus what x290's
    no-straddle greedy costs in compute (nostraddle_pad_ppm padding and
    extra_seqs_ppm additional sequences for the same token mass).
    chunk_pad_ppm is the concat layout's padding (only each language's
    last sequence pads). The two laid side by side ARE the choice; the
    fixture puts real numbers on it.

    Plan: the chunk side is x29's cumsum-window math aggregated per
    lang (straddlers = docs whose first and last token land in
    different sequences — pure column algebra on the offsets); the
    no-straddle side reuses packed_nostraddle's fold aggregated per
    lang. One window pass + one (doc_id, n_tok)-pairs fold + a 5-row
    join."""
    from ..functions.skew import distributed_group_prefix_sum
    from ..plans.pack import packed_nostraddle

    d = load(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.size(F.split("text", " ")).cast("long").alias("t")
    )
    off = distributed_group_prefix_sum(
        d.filter(F.col("t") > 0), ["lang"], [F.col("doc_id")], "t"
    ).withColumn("start_off", F.col("__csum") - F.col("t"))
    ch = off.groupBy("lang").agg(
        F.sum("t").cast("long").alias("tokens"),
        (F.max(F.expr("(start_off + t - 1) div 512")) + 1)
        .cast("long")
        .alias("chunk_seqs"),
        F.sum(
            (
                F.expr("start_off div 512")
                != F.expr("(start_off + t - 1) div 512")
            ).cast("long")
        )
        .cast("long")
        .alias("straddled_docs"),
    )
    docs = load(spark, sf_dir, "documents")
    ns = (
        packed_nostraddle(docs, ctx=512)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("nostraddle_seqs"))
    )
    return (
        ch.join(ns, "lang")
        .select(
            "lang",
            "tokens",
            "chunk_seqs",
            F.expr(
                "cast((chunk_seqs * 512 - tokens) * 1000000"
                " div (chunk_seqs * 512) as bigint)"
            ).alias("chunk_pad_ppm"),
            "straddled_docs",
            "nostraddle_seqs",
            F.expr(
                "cast((nostraddle_seqs * 512 - tokens) * 1000000"
                " div (nostraddle_seqs * 512) as bigint)"
            ).alias("nostraddle_pad_ppm"),
            F.expr(
                "cast((nostraddle_seqs - chunk_seqs) * 1000000"
                " div chunk_seqs as bigint)"
            ).alias("extra_seqs_ppm"),
        )
        .orderBy("lang")
    )


@query(
    "x292_curriculum_packed_accounting",
    oracle="""
    WITH t AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    p AS (SELECT *, CAST(ntile(4) OVER (ORDER BY n_tok, doc_id) AS BIGINT)
                 AS phase FROM t),
    off AS (
      SELECT lang, phase, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang, phase
                              ORDER BY n_tok, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok AS start_off
      FROM p
    ),
    spans AS (
      SELECT lang, phase, n_tok, start_off,
             unnest(range(CAST(start_off // 512 AS BIGINT),
                          CAST((start_off + n_tok - 1) // 512 AS BIGINT) + 1)) AS seq_id
      FROM off WHERE n_tok > 0
    )
    SELECT lang, phase, CAST(seq_id AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEAST(start_off + n_tok, (seq_id + 1) * 512)
                    - GREATEST(start_off, seq_id * 512)) AS BIGINT) AS n_tokens
    FROM spans GROUP BY lang, phase, seq_id
    ORDER BY lang, phase, seq_id
    """,
)
def x292_curriculum_packed_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Curriculum-ordered packing, hash-checked: the corpus cut into 4
    equal-count phases by global (n_tokens, doc_id) ntile (x155's
    short->long schedule), each (lang, phase) cell then packed
    INDEPENDENTLY in short->long order — a phase boundary never mixes
    into one training sequence, the dataloader property a curriculum
    schedule needs. Per (lang, phase, sequence): docs and tokens.

    Plan (plans/pack.py curriculum_packed): the phase tiling is the
    scale-safe distributed_ntile (range repartition + offset cumsum —
    no SinglePartition sort sees the corpus; the oracle's plain window
    ntile proves the decomposition, x155's own argument), then x29's
    span math with the window re-keyed to (lang, phase) — same two
    shuffles, finer partitions."""
    from ..plans.pack import curriculum_packed

    d = load(spark, sf_dir, "documents")
    return curriculum_packed(d, ctx=512, phases=4).orderBy(
        "lang", "phase", "seq_id"
    )


# Per-language mixture rates for x30 (rebalance toward low-resource
# languages). Acceptance thresholds are precomputed as exact int64 values
# (rate * 2^60) so both engines compare integers — no float boundary.
_MIX_RATES = {"en": 0.25, "de": 1.0, "es": 0.5, "fr": 1.0, "zh": 0.2}
_MIX_THRESHOLDS = {
    lang: int(rate * (1 << 60)) for lang, rate in _MIX_RATES.items()
}
_mix_sql_case = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {thr}" for lang, thr in _MIX_THRESHOLDS.items()
) + " ELSE 0 END"


@query(
    "x30_mixture_resample",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
          < {_mix_sql_case}
    ORDER BY doc_id
    """,
)
def x30_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture resampling: per-language Bernoulli acceptance at
    declared mixture rates (en downweighted, low-resource languages kept),
    decided by a content-independent deterministic hash of the doc id — so
    the sample is reproducible across runs, engines, and partitionings
    (rand() would be none of those). Pure map-side filter: at 100 TB this
    is a scan with zero shuffle, and the acceptance predicate pushes into
    the reader."""
    from ..functions.dedupfns import token_hash60

    d = load(spark, sf_dir, "documents")
    thr = F.lit(0)
    for lang, t in _MIX_THRESHOLDS.items():
        thr = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thr)
    u = token_hash60(F.col("doc_id").cast("string"))
    return d.filter(u < thr).select("doc_id", "lang").orderBy("doc_id")


@query(
    "x32_token_commonness",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
           {dround_sql("CAST(SUM(c) AS BIGINT) / CAST(count(*) AS DOUBLE)", 6)}
             AS avg_commonness
    FROM tk JOIN cnt USING (tok)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def x32_token_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-likelihood quality signal: each document's average corpus
    frequency of its tokens — the integer-exact stand-in for unigram-LM
    perplexity (low = rare-token gibberish, high = boilerplate; filter
    both tails). All arithmetic is integer counts with ONE final double
    division, so the score is bit-identical across engines and replay.
    Plan: one token count agg + one re-join of the exploded tokens + one
    per-doc agg — the vocabulary shuffles once, the corpus twice."""
    d = load(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    cnt = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        tk.join(cnt, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            dround(F.sum("c") / F.count(F.lit(1)).cast("double"), 6).alias(
                "avg_commonness"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "x36_source_quota_cap",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST('0x' || substring(md5(text), 1, 15) AS BIGINT), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 50 ORDER BY doc_id
    """,
)
def x36_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling — the domain-cap stage of a crawl-derived
    training pipeline (no single source may dominate the mixture): keep at
    most 50 docs per source, chosen DETERMINISTICALLY by content-hash order
    (not arrival order, so the sample is stable under re-crawls and
    repartitioning). One per-source rank window; with millions of sources
    the partition count is the source count — no global sort, no skew
    beyond the largest single source, and WindowGroupLimit prunes rows
    past the cap before the sort at 100 TB."""
    from ..functions.dedupfns import token_hash60

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(token_hash60(F.col("text")), "doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= 50)
        .orderBy("doc_id")
    )


@query("x39_bpe_train")  # iterative argmax-merge loop: no SQL analog -> rows-only
def x39_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning (tokenizer fitting) over the corpus:
    10 merge rounds on the word-frequency table. Deterministic (lexicographic
    tie-break); verified against a pure-Python reference BPE in
    tests/test_text_analysis-style suite (Spark == reference merge sequence).
    Scale shape: one corpus-sized word count, then every round touches only
    |vocab| rows and collects exactly ONE row (the argmax pair)."""
    from ..functions.textfns import bpe_train

    d = load_parallel(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, num_merges=10)
    return merges.orderBy("rank")


# ---------------------------------------------------------------------------
# X53-X55 — statistical LM scoring + mixture design (training-data curation:
# perplexity-proxy quality filters and temperature-scaled domain weights).
# ---------------------------------------------------------------------------


@query(
    "x53_unigram_lm_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    vocab AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
              FROM tok GROUP BY token),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
    scored AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             sum(CAST(ln(v.cnt) AS DECIMAL(38,6))) AS slc
      FROM tok t JOIN vocab v ON t.token = v.token
      GROUP BY t.doc_id)
    SELECT doc_id, n_tokens,
           {dround_sql("ln(total) - CAST(slc AS DOUBLE) / n_tokens")} AS lm_score
    FROM scored CROSS JOIN tot ORDER BY doc_id
    """,
)
def x53_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM negative-log-likelihood per document — the classic
    perplexity-proxy quality filter (high score = tokens rare in this
    corpus = gibberish or off-distribution). score = -avg ln p(tok)
    = ln(N) - avg ln cnt(tok). Plan: one explode + one token hash-agg
    builds the LM; the score join hashes on token (both sides partial-agg
    first, so the shuffle carries |vocab| + |tokens|, never |docs|x|vocab|);
    the corpus total broadcasts as a 1-row scalar. Per-token ln values
    quantize to DECIMAL(38,6) before the sum so accumulation order can't
    shift the last ulps between engines."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        tok.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(F.col("cnt").cast("double")).cast("decimal(38,6)")).alias("slc"),
        )
    )
    return (
        scored.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_tokens",
            dround(
                F.log(F.col("total").cast("double"))
                - F.col("slc").cast("double") / F.col("n_tokens")
            ).alias("lm_score"),
        )
        .orderBy("doc_id")
    )


@query(
    "x54_bigram_lm_score",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    big AS (
      SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bg,
             unnest([t[i] for i in range(1, len(t))]) AS w1
      FROM toks WHERE len(t) >= 2),
    bcnt AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM big GROUP BY bg),
    ucnt AS (SELECT w1, CAST(count(*) AS BIGINT) AS cu FROM big GROUP BY w1),
    scored AS (
      SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             sum(CAST(ln(CAST(bc.cb AS DOUBLE) / uc.cu) AS DECIMAL(38,6))) AS s
      FROM big b JOIN bcnt bc ON b.bg = bc.bg JOIN ucnt uc ON b.w1 = uc.w1
      GROUP BY b.doc_id)
    SELECT doc_id, n_bigrams,
           {dround_sql("-CAST(s AS DOUBLE) / n_bigrams")} AS lm_score
    FROM scored ORDER BY doc_id
    """,
)
def x54_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM conditional NLL per document: score =
    -avg ln [cnt(w1 w2) / cnt(w1 ·)], the next-token-surprise version of
    x53 (catches shuffled-word salad that unigram stats miss). Bigrams
    materialize as a JVM higher-order transform over the token array (no
    Python UDF); counts and the two probability joins all hash on the
    bigram/prefix keys with map-side partial aggregation. The count ratio
    is formed per row from exact BIGINTs, then ln quantizes to decimal for
    order-independent summation."""
    d = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    big = (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 2),
                    lambda i: F.struct(
                        F.concat(F.col("t")[i], F.lit(" "), F.col("t")[i + 1]).alias("bg"),
                        F.col("t")[i].alias("w1"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.bg", "p.w1")
    )
    bcnt = big.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    ucnt = big.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    scored = (
        big.join(bcnt, "bg")
        .join(ucnt, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.log(F.col("cb").cast("double") / F.col("cu")).cast("decimal(38,6)")
            ).alias("s"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        dround(-F.col("s").cast("double") / F.col("n_bigrams")).alias("lm_score"),
    ).orderBy("doc_id")


@query(
    "x55_temperature_mixture_weights",
    oracle=f"""
    WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
    w AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS raw FROM c),
    z AS (SELECT sum(CAST(raw AS DECIMAL(38,6))) AS zsum FROM w)
    SELECT lang, n, {dround_sql("raw / CAST(zsum AS DOUBLE)", 6)} AS weight,
           CAST({dround_sql("raw / CAST(zsum AS DOUBLE) * 1000000", 0)} AS BIGINT)
             AS samples_per_m
    FROM w CROSS JOIN z ORDER BY lang
    """,
)
def x55_temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual-sampling rule
    p_i ~ n_i^alpha with alpha = 0.5): upweights low-resource domains
    relative to their raw share. sqrt is IEEE correctly-rounded in both
    engines, so raw weights are bit-identical; the normalizer accumulates
    in decimal. Emits both the normalized weight and an integer
    samples-per-million quota (what a sampler actually consumes). The
    whole query runs on the tiny per-domain count table — one hash-agg
    over the corpus, then scalar broadcast arithmetic."""
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    w = c.select("lang", "n", F.sqrt(F.col("n").cast("double")).alias("raw"))
    z = w.agg(F.sum(F.col("raw").cast("decimal(38,6)")).alias("zsum"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "n",
            dround(F.col("raw") / F.col("zsum").cast("double"), 6).alias("weight"),
            dround(F.col("raw") / F.col("zsum").cast("double") * 1_000_000, 0)
            .cast("bigint")
            .alias("samples_per_m"),
        )
        .orderBy("lang")
    )


@query(
    "x57_weighted_sample",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang, n_chars,
             CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
      FROM documents),
    k AS (
      SELECT doc_id, lang, n_chars,
             ln((hv + 1.0) / 1152921504606846976.0) / n_chars AS key
      FROM h),
    r AS (SELECT doc_id, lang, n_chars,
                 row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) AS rn
          FROM k)
    SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(rn AS BIGINT) AS rank
    FROM r WHERE rn <= 20 ORDER BY lang, rank
    """,
)
def x57_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k=20 per
    language (Efraimidis-Spirakis exponential clocks): priority =
    ln(u)/w with u a cross-engine md5 uniform and w = n_chars, top-k by
    priority == a weight-proportional draw — reproducible across runs and
    engines, no rand(). The per-group top-k is a rank window partitioned
    on lang (WindowGroupLimit at scale); the priority itself is pure
    map-side arithmetic. Deterministic u makes this an auditable sampler:
    re-running the pipeline on the same corpus provably selects the same
    documents (the property training-data lineage audits need)."""
    from ..functions.dedupfns import token_hash60

    d = load(spark, sf_dir, "documents")
    u = (token_hash60(F.col("doc_id").cast("string")) + 1).cast("double") / F.lit(
        float(1 << 60)
    )
    key = F.log(u) / F.col("n_chars")
    r = (
        d.select("lang", "doc_id", "n_chars", key.alias("key"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.desc("key"), "doc_id")
            ),
        )
        .filter(F.col("rank") <= 20)
    )
    return r.select(
        "lang", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("rank").cast("bigint").alias("rank"),
    ).orderBy("lang", "rank")


@query(
    "x58_length_decile_stats",
    oracle="""
    WITH d AS (SELECT doc_id, n_chars,
                      ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
               FROM documents)
    SELECT CAST(decile AS INTEGER) AS decile, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM d GROUP BY decile ORDER BY decile
    """,
)
def x58_length_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-decile curriculum stats (exact NTILE semantics) WITHOUT the
    naive plan: ``ntile(10) OVER (ORDER BY ...)`` funnels the whole table
    through one SinglePartition sort — the thing that dies first at
    100 TB. Instead, exact two-phase ntile: (1) per-length counts with a
    cumulative window over the TINY aggregated length domain (|distinct
    lengths| rows, not |docs|); (2) rank-within-length via a window
    hash-partitioned on n_chars; global rank = cumulative-before +
    within-rank, then NTILE's exact allocation rule (first N%10 tiles get
    ceil(N/10) rows) applied as integer arithmetic. The only
    single-partition work is the length-domain cumsum; the oracle is the
    plain window ntile, proving the decomposition IS ntile."""
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    per_len = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_len.select(
        "n_chars", F.coalesce(F.sum("cnt").over(wcum), F.lit(0)).alias("cum_before")
    )
    tot = d.agg(F.count(F.lit(1)).alias("n_total"))
    win = Window.partitionBy("n_chars").orderBy("doc_id")
    ranked = (
        d.withColumn("rk_in", F.row_number().over(win))
        .join(F.broadcast(cum), "n_chars")
        .crossJoin(F.broadcast(tot))
        .withColumn("rk", F.col("cum_before") + F.col("rk_in"))
    )
    # NTILE(10) allocation: q = N div 10 rows per tile, the first r = N mod
    # 10 tiles take one extra row.
    q = F.col("n_total").cast("long") / F.lit(10)
    tiled = ranked.selectExpr(
        "n_chars",
        "rk",
        "n_total DIV 10 AS q",
        "n_total % 10 AS r",
    ).withColumn(
        "decile",
        F.when(
            F.col("rk") <= (F.col("q") + 1) * F.col("r"),
            F.expr("(rk - 1) DIV (q + 1) + 1"),
        ).otherwise(F.expr("r + (rk - (q + 1) * r - 1) DIV q + 1")),
    )
    return (
        tiled.groupBy(F.col("decile").cast("int").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("decile")
    )


@query(
    "x69_boilerplate_segments",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    segs AS (SELECT doc_id,
               list_distinct([array_to_string(t[8*i+1 : 8*i+8], ' ')
                              for i in range(0, CAST(len(t) // 8 AS INT))]) AS s
             FROM tok WHERE len(t) >= 8),
    ex AS (SELECT doc_id, unnest(s) AS seg FROM segs),
    freq AS (SELECT seg, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY seg)
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(COALESCE(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_hot,
           {dround_sql("CAST(COALESCE(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END), 0) AS DOUBLE) / count(*)", 6)}
             AS boilerplate_frac
    FROM ex e JOIN freq f USING (seg)
    GROUP BY e.doc_id ORDER BY doc_id
    """,
)
def x69_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level boilerplate audit (the C4/RefinedWeb 'repeated lines
    across documents' rule, adapted to the fixture's newline-free text):
    each document is cut into NON-overlapping 8-token segments, segment
    document-frequency is counted corpus-wide, and each doc reports the
    fraction of its segments shared with at least one other document —
    the per-doc removal/penalty signal. Distinct from x43 containment
    (overlapping shingles, pairwise scores): this is corpus-global,
    per-segment, and linear — explode + one wordcount-shaped hash agg +
    one equi-join back on the segment key, no self-join anywhere, so at
    100 TB it costs two shuffles of the segment table regardless of how
    much boilerplate there is."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # r15: the stride-8 segments are every 8th overlapping 8-gram —
    # word_ngrams (per-row zip_with chain) + an index filter replaces the
    # slice-inside-lambda form that re-split the text per segment (guide
    # §4.1). For L >= 8 the multiples of 8 in [0, L-8] number exactly
    # floor(L/8) = the old n_seg, and each string is the identical
    # 8-token join.
    segs = F.array_distinct(
        F.filter(word_ngrams("text", 8), lambda g, i: i % 8 == 0)
    )
    ex = (
        d.filter(F.size(toks) >= 8)
        .select("doc_id", F.explode(segs).alias("seg"))
    )
    freq = ex.groupBy("seg").agg(F.count(F.lit(1)).alias("df"))
    return (
        ex.join(freq, "seg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.coalesce(F.sum((F.col("df") >= 2).cast("long")), F.lit(0)).alias("n_hot"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_hot",
            dround(
                F.col("n_hot").cast("double") / F.col("n_segments"), 6
            ).alias("boilerplate_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "x76_heavy_hitter_bigrams",
    oracle="""
    WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT toks[i] || ' ' || toks[i+1] AS term
          FROM d, unnest(range(1, len(toks))) t(i)),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY term),
    n AS (SELECT count(*) AS n_total FROM g)
    SELECT term, cnt FROM c, n WHERE cnt * 640 > n_total ORDER BY term
    """,
)
def x76_heavy_hitter_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter bigrams (count × 640 > N) via per-partition Misra–Gries
    candidates + exact rescore (functions/sketchfns.py). The oracle is the
    naive full wordcount; the Spark plan is the sketch: at web-scale
    vocabulary the naive plan shuffles billions of distinct n-grams for a
    few hundred output rows, while MG shuffles ≤ capacity rows/partition
    and the rescore semi-join broadcasts the candidate set. Exact output,
    integer-exact threshold — hash-checked despite the approximate
    intermediate."""
    from ..functions.sketchfns import frequent_terms_exact

    d = load_parallel(spark, sf_dir, "documents")
    # r15: word_ngrams (per-row zip_with chain) — the element_at lambda
    # re-split the text per bigram (guide §4.1); identical gram strings
    terms = d.select(F.explode(word_ngrams("text", 2)).alias("term"))
    return frequent_terms_exact(terms, "term", denom=640)


@query(
    "x80_inverted_index",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY term, doc_id)
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
    FROM tf GROUP BY term ORDER BY term
    """,
)
def x80_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term -> (document frequency, total term
    frequency, sorted posting list). The retrieval-side complement of the
    text-analysis family — explode + two hash aggs, with the posting list
    materialized via sort_array(collect_list(...)) so the content is
    deterministic under any partitioning (collect_list order is not),
    serialized to a comma string because the hash harness compares scalar
    columns.
    At 100 TB hot terms need posting-list sharding (split postings at a
    fixed length and emit (term, shard_no) rows) — the same hot-key
    treatment as the shingle df-cap; the fixture-scale query emits full
    lists so the oracle can hash-check array equality."""
    d = load_parallel(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("postings"),
        )
        .orderBy("term")
    )


@query(
    "x81_vocab_growth",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tok AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS term
            FROM d, unnest(range(1, len(toks) - 3)) t(i)
            WHERE len(toks) >= 5),
    fo AS (SELECT term, min(doc_id) AS first_doc FROM tok GROUP BY term),
    mx AS (SELECT max(doc_id) AS md FROM documents),
    b AS (SELECT CAST(first_doc * 10 // (md + 1) AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS new_terms
          FROM fo, mx GROUP BY 1)
    SELECT bucket, new_terms,
           CAST(sum(new_terms) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_vocab
    FROM b ORDER BY bucket
    """,
)
def x81_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps'-law measurement) over 5-token
    grams: per corpus decile (by doc_id), how many NEVER-BEFORE-SEEN
    grams appear, and the running vocabulary size — the tokenizer-
    coverage / corpus-diversity planning number (the fixture's unigram
    vocabulary saturates in the first decile, so the curve is measured
    on the 5-gram space, which keeps growing like real corpora do). First occurrence is one min-agg per term (no ordered scan);
    deciles are integer arithmetic off the max doc id (one scalar agg,
    broadcast); the cumulative sum runs over <= 10 rows. Three hash aggs
    and a 10-row window — nothing scales with corpus size except the
    term-level agg."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # r15: word_ngrams (per-row zip_with chain) — the slice-inside-lambda
    # form re-split the text per gram (guide §4.1); identical strings
    grams = word_ngrams("text", 5)
    fo = (
        d.filter(F.size(toks) >= 5)
        .select("doc_id", F.explode(grams).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    mx = d.agg(F.max("doc_id").alias("md"))
    b = (
        fo.crossJoin(F.broadcast(mx))
        .select(
            F.floor(F.col("first_doc") * 10 / (F.col("md") + 1)).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_terms"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        b.select(
            "bucket",
            "new_terms",
            F.sum("new_terms").over(w).cast("long").alias("cum_vocab"),
        )
        .orderBy("bucket")
    )


@query(
    "x90_pmi_collocations",
    oracle=f"""
    WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
    bg AS (SELECT toks[i] AS w1, toks[i+1] AS w2
           FROM d, unnest(range(1, len(toks))) t(i)),
    cxy AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
            FROM bg GROUP BY w1, w2),
    cx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c_x FROM bg GROUP BY w1),
    cy AS (SELECT w2, CAST(count(*) AS BIGINT) AS c_y FROM bg GROUP BY w2),
    n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM bg)
    SELECT w1, w2, c_xy,
           {dround_sql("ln(total) + ln(c_xy) - ln(c_x) - ln(c_y)")} AS pmi
    FROM cxy JOIN cx USING (w1) JOIN cy USING (w2) CROSS JOIN n
    WHERE c_xy >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
)
def x90_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information (Church & Hanks
    1990): pmi(x,y) = ln(N·c_xy / (c_x·c_y)) over adjacent token pairs,
    top-20 with support >= 5 — the phrase/term-of-art detector a corpus
    vocabulary pipeline runs before tokenizer training. Every output
    value is ONE arithmetic expression of four integer counts through
    single IEEE ln calls (no float accumulation at all), so engines
    agree bit-for-bit. Plan: three hash aggs off one bigram explode +
    two key joins + a broadcast scalar; TakeOrdered(20)."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # r15: adjacent-pair structs via one zip_with over shifted slices —
    # the element_at lambda re-split the text per bigram (guide §4.1);
    # identical (w1, w2) pairs, zip_with's null tail sliced off
    pair_structs = F.slice(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.size(toks) - 1),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        ),
        1,
        F.size(toks) - 1,
    )
    bg = d.filter(F.size(toks) >= 2).select(
        F.explode(pair_structs).alias("p")
    ).select("p.w1", "p.w2")
    cxy = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    cx = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c_x"))
    cy = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("c_y"))
    n = bg.agg(F.count(F.lit(1)).alias("total"))
    pmi = dround(
        F.log(F.col("total").cast("double"))
        + F.log(F.col("c_xy").cast("double"))
        - F.log(F.col("c_x").cast("double"))
        - F.log(F.col("c_y").cast("double")),
        4,
    )
    return (
        cxy.join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(n))
        .filter(F.col("c_xy") >= 5)
        .select("w1", "w2", "c_xy", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


@query(
    "x91_rank_fusion",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      FROM documents),
    m AS (SELECT doc_id, n_chars, n_tokens,
                 n_distinct * 1000000000 // n_tokens AS diversity_ppb
          FROM s),
    r AS (SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS r_len,
                 CAST(row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS r_tok,
                 CAST(row_number() OVER (ORDER BY diversity_ppb DESC, doc_id) AS BIGINT) AS r_div
          FROM m)
    SELECT doc_id, r_len, r_tok, r_div, r_len + r_tok + r_div AS fused,
           CAST(row_number() OVER (ORDER BY r_len + r_tok + r_div, doc_id) AS BIGINT)
             AS fused_rank
    FROM r ORDER BY fused_rank LIMIT 50
    """,
)
def x91_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal curation by rank fusion (Borda count): blend length,
    token count and lexical diversity into one ordering by summing each
    document's per-signal ranks — the scale-free way to combine quality
    signals with incomparable units (no z-scores, no weight tuning; the
    idiom behind reciprocal-rank fusion in retrieval). The diversity
    signal ranks on an exact integer (n_distinct * 1e9 // n_tokens), so
    every sort key in both engines is a BIGINT — ranks cannot diverge.
    The three corpus-sized ranks ride ``distributed_rank`` (range
    repartition + within-range rank + P-row offset cumsum — no
    SinglePartition sort ever sees the corpus); the fused top-50 is a
    plain sort-limit, which Spark executes as TakeOrderedAndProject
    (per-partition top-k, driver merge of 50-row heads), and the final
    rank window runs over those 50 rows only."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    m = d.select(
        "doc_id",
        "n_chars",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    ).withColumn(
        "diversity_ppb",
        F.floor(F.col("n_distinct") * F.lit(1_000_000_000) / F.col("n_tokens")).cast("long"),
    )
    from kafka_connect_spark.functions.skew import distributed_rank

    r = m
    for name, order in (
        ("r_len", [F.col("n_chars").desc(), F.col("doc_id")]),
        ("r_tok", [F.col("n_tokens").desc(), F.col("doc_id")]),
        ("r_div", [F.col("diversity_ppb").desc(), F.col("doc_id")]),
    ):
        r = distributed_rank(r, order, rank_name=name)
    fused = (F.col("r_len") + F.col("r_tok") + F.col("r_div")).alias("fused")
    top = (
        r.select("doc_id", "r_len", "r_tok", "r_div", fused)
        .orderBy("fused", "doc_id")
        .limit(50)
    )
    # 50-row global window — bounded by the limit above
    return top.withColumn(
        "fused_rank",
        F.row_number().over(Window.orderBy("fused", "doc_id")).cast("long"),
    ).orderBy("fused_rank")


@query(
    "x93_corpus_datasheet",
    oracle="""
    WITH s AS (
      SELECT source,
             n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             md5(text) AS h
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
           CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_exact_dups,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(n_tokens) * 1000000 // count(*) AS BIGINT) AS tokens_per_doc_ppm
    FROM s GROUP BY source ORDER BY source
    """,
)
def x93_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source corpus datasheet (the 'datasheets for datasets'
    summary a training-mix decision starts from): document / token /
    char volumes, exact-duplicate counts off the 16-byte content hash,
    token-length extrema, and mean tokens-per-doc as an exact
    parts-per-million integer (sum*1e6 // count — no float division to
    disagree on). ONE hash agg over one scan; every column is BIGINT.
    At 100 TB this is the cheapest query in the curation family and the
    first one you run."""
    d = load_parallel(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    s = d.select("source", "n_chars", n_tokens.alias("n_tokens"), F.md5("text").alias("h"))
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.countDistinct("h").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_exact_dups"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.floor(F.sum("n_tokens") * F.lit(1_000_000) / F.count(F.lit(1)))
            .cast("long")
            .alias("tokens_per_doc_ppm"),
        )
        .orderBy("source")
    )


def _tfidf_oracle(threshold: float, max_df: int | None) -> str:
    capfilter = f"WHERE df <= {max_df}" if max_df is not None else ""
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS term
          FROM d, unnest(range(1, len(toks) - 3)) t(i) WHERE len(toks) >= 5),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM g GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
    w AS (SELECT doc_id, term, df,
                 tf * CAST(ln(CAST(nd AS DOUBLE) / df) AS DECIMAL(18,6)) AS w
          FROM tf JOIN df USING (term) CROSS JOIN n WHERE df < nd),
    nrm AS (SELECT doc_id, sqrt(CAST(sum(w*w) AS DOUBLE)) AS nn FROM w GROUP BY 1),
    wj AS (SELECT * FROM w {capfilter}),
    dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    CAST(sum(a.w * b.w) AS DOUBLE) AS dd
             FROM wj a JOIN wj b ON a.term = b.term AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           {dround_sql("dd / (na.nn * nb.nn)", 6)} AS cos_sim
    FROM dots JOIN nrm na ON na.doc_id = doc_a JOIN nrm nb ON nb.doc_id = doc_b
    WHERE {dround_sql("dd / (na.nn * nb.nn)", 6)} >= {threshold}
    ORDER BY doc_a, doc_b
    """


def tfidf_cosine_pairs(
    d: DataFrame, threshold: float = 0.5, max_df: int | None = None
) -> DataFrame:
    """Sparse TF-IDF cosine similarity pairs over 5-gram shingles — the
    classic IR document-similarity measure, complementing the dense
    embedding cosine (x12f) and unweighted Jaccard (x12c): rare shared
    shingles count more than common ones. Exactness discipline: idf is a
    single IEEE ln quantized to DECIMAL(18,6); every weight product and
    both norms accumulate EXACTLY in decimal; only the final
    sqrt/divide touch doubles (fixed expression order both engines).
    Plan: token-keyed join of weighted postings (the x12c shuffle shape;
    ubiquitous shingles with df = N are dropped — the natural stopword
    cap); one pair agg; two tiny norm joins.

    ``max_df`` is the 100 TB boilerplate guardrail (the x43b pattern,
    mirroring ``ngram_jaccard_pairs``'s ``max_shingle_freq``): terms with
    df > max_df leave the JOIN side only — norms stay exact over all
    terms, so capped cosines are one-sided LOWER bounds of the uncapped
    score. A hot 5-gram shared by 10^6 docs otherwise produces an O(df^2)
    join blowup for that key; tf-idf downweights it in the score but not
    in the join volume."""
    toks = F.split("text", " ")
    # r15: word_ngrams (per-row zip_with chain) — the slice-inside-lambda
    # form re-split the text per gram (guide §4.1); identical strings
    grams = word_ngrams("text", 5)
    g = d.filter(F.size(toks) >= 5).select("doc_id", F.explode(grams).alias("term"))
    tf = g.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    w = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(nd))
        .filter(F.col("df") < F.col("nd"))
        .select(
            "doc_id",
            "term",
            "df",
            (
                F.col("tf")
                * F.log(F.col("nd").cast("double") / F.col("df")).cast("decimal(18,6)")
            ).alias("w"),
        )
    )
    # r15 optimization (guide §2.4): the norms were a THIRD consumption of
    # the weighted-postings subtree (its own agg) attached back by two
    # joins after the pair agg. The norm now rides a window over doc_id on
    # the postings themselves — the identical exact decimal sum of w²
    # (order-free), sqrt'd to the identical double — and travels through
    # the pair join as a carried column, picked up by max() in the pair
    # agg (it is constant within each doc's rows). Two joins + one agg
    # gone; norms are still computed over ALL terms BEFORE any df cap, so
    # the capped-cosine lower-bound contract is untouched.
    wn = w.withColumn(
        "nn",
        F.sqrt(
            F.sum(F.col("w") * F.col("w"))
            .over(Window.partitionBy("doc_id"))
            .cast("double")
        ),
    )
    wj = wn.filter(F.col("df") <= max_df) if max_df is not None else wn
    a, b = wj.alias("a"), wj.alias("b")
    dots = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.sum(F.col("a.w") * F.col("b.w")).cast("double").alias("dd"),
            F.max(F.col("a.nn")).alias("na_nn"),
            F.max(F.col("b.nn")).alias("nb_nn"),
        )
    )
    cos = dround(F.col("dd") / (F.col("na_nn") * F.col("nb_nn")), 6)
    return (
        dots.select("doc_a", "doc_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


@query("x97_tfidf_cosine_pairs", oracle=_tfidf_oracle(0.5, None))
def x97_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncapped TF-IDF cosine pairs (see ``tfidf_cosine_pairs``); the
    df-capped 100 TB scale path is x97b."""
    d = load_parallel(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(d, threshold=0.5)


@query("x97b_tfidf_cosine_pairs_capped", oracle=_tfidf_oracle(0.5, 2))
def x97b_tfidf_cosine_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x97 with the df-cap engaged (max_df=2 on this fixture, where max df
    is 3 — the cap provably removes terms): hot terms leave the join side,
    norms stay exact, scores are lower bounds of x97's. Hash-checked
    against an oracle applying the identical cap (the proven x43/x43b
    pattern). At 100 TB, max_df is set in absolute document counts
    (e.g. 10^4) so join fan-out per term key is bounded."""
    d = load_parallel(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(d, threshold=0.5, max_df=2)


@query(
    "x106_trending_ngrams",
    oracle=f"""
    WITH mx AS (SELECT max(doc_id) AS md FROM documents),
    d AS (SELECT doc_id, string_split(text, ' ') AS toks,
                 CASE WHEN doc_id * 2 <= md THEN 0 ELSE 1 END AS half
          FROM documents CROSS JOIN mx),
    bg AS (SELECT half, toks[i] || ' ' || toks[i+1] AS term
           FROM d, unnest(range(1, len(toks))) t(i)),
    c AS (SELECT term,
                 CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
          FROM bg GROUP BY term),
    n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
                 CAST(count(*) AS BIGINT) AS v
          FROM c)
    SELECT term, c1, c2,
           {dround_sql(
               "ln(CAST(c2 + 1 AS DOUBLE)) - ln(CAST(n2 + v AS DOUBLE))"
               " - ln(CAST(c1 + 1 AS DOUBLE)) + ln(CAST(n1 + v AS DOUBLE))", 6)}
             AS trend_score
    FROM c CROSS JOIN n
    WHERE c1 + c2 >= 10
    ORDER BY trend_score DESC, term LIMIT 15
    """,
)
def x106_trending_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging-term detection: bigrams whose add-1-smoothed log
    probability rises most from the first corpus half to the second (by
    doc_id — the snapshot ordering) — the 'what's new in this crawl'
    report that complements x74's distribution-level PSI with term-level
    attribution. Every score is four single IEEE ln calls on integers in
    a fixed expression order; support filter keeps noise terms out. Two
    conditional counts in ONE hash agg (no per-half scans), a 1-row
    scalar broadcast, TakeOrdered(15). The token array is hoisted into a
    materialized column: referencing F.split(...) inside the transform
    lambda re-splits the text once per bigram position (~25% of the
    operator's wall at sf0.1)."""
    d = load_parallel(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("md"))
    toks = F.col("toks")
    bg = (
        d.withColumn("toks", F.split("text", " "))
        .crossJoin(F.broadcast(mx))
        .filter(F.size(toks) >= 2)
        .select(
            F.when(F.col("doc_id") * 2 <= F.col("md"), 0).otherwise(1).alias("half"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                    ),
                )
            ).alias("term"),
        )
    )
    c = bg.groupBy("term").agg(
        F.sum((F.col("half") == 0).cast("long")).alias("c1"),
        F.sum((F.col("half") == 1).cast("long")).alias("c2"),
    )
    n = c.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2"), F.count(F.lit(1)).alias("v")
    )
    score = dround(
        F.log((F.col("c2") + 1).cast("double"))
        - F.log((F.col("n2") + F.col("v")).cast("double"))
        - F.log((F.col("c1") + 1).cast("double"))
        + F.log((F.col("n1") + F.col("v")).cast("double")),
        6,
    )
    return (
        c.crossJoin(F.broadcast(n))
        .filter(F.col("c1") + F.col("c2") >= 10)
        .select("term", "c1", "c2", score.alias("trend_score"))
        .orderBy(F.col("trend_score").desc(), "term")
        .limit(15)
    )


@query(
    "x110_pareto_abc",
    oracle="""
    WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS vol
               FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(vol) AS BIGINT) AS total FROM s),
    r AS (SELECT source, vol,
                 CAST(sum(vol) OVER (ORDER BY vol DESC, source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_vol
          FROM s)
    SELECT source, vol,
           CAST(vol * 1000000 // total AS BIGINT) AS share_ppm,
           CAST(cum_vol * 1000000 // total AS BIGINT) AS cum_share_ppm,
           CASE WHEN (cum_vol - vol) * 10 < total * 8 THEN 'A'
                WHEN (cum_vol - vol) * 100 < total * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM r CROSS JOIN t ORDER BY vol DESC, source
    """,
)
def x110_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC contribution analysis over corpus sources: volume
    share, cumulative share, and the classic A/B/C banding (A = sources
    whose PRECEDING cumulative volume is under 80%, B = under 95%, C =
    tail) — the 'which sources matter' table that prioritizes curation
    effort. Shares are exact ppm integers; class boundaries compare
    cross-multiplied integers, so banding can never flicker on float
    rounding. One hash agg + a cumulative window over |sources| rows +
    a 1-row scalar broadcast."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.sum("n_chars").alias("vol"))
    t = s.agg(F.sum("vol").alias("total"))
    w = Window.orderBy(F.col("vol").desc(), "source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = s.select("source", "vol", F.sum("vol").over(w).alias("cum_vol"))
    return (
        r.crossJoin(F.broadcast(t))
        .select(
            "source",
            "vol",
            F.floor(F.col("vol") * 1_000_000 / F.col("total")).cast("long").alias("share_ppm"),
            F.floor(F.col("cum_vol") * 1_000_000 / F.col("total"))
            .cast("long")
            .alias("cum_share_ppm"),
            F.when((F.col("cum_vol") - F.col("vol")) * 10 < F.col("total") * 8, "A")
            .when((F.col("cum_vol") - F.col("vol")) * 100 < F.col("total") * 95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .orderBy(F.col("vol").desc(), "source")
    )


@query(
    "x114_length_cutoff_sweep",
    oracle="""
    WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents),
    t AS (SELECT CAST(count(*) AS BIGINT) AS all_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS all_tokens FROM d),
    cut AS (SELECT unnest([10, 20, 30, 40, 60]) AS min_tokens)
    SELECT CAST(min_tokens AS BIGINT) AS min_tokens,
           CAST(count(*) FILTER (n_tokens >= min_tokens) AS BIGINT) AS docs_kept,
           CAST(COALESCE(sum(n_tokens) FILTER (n_tokens >= min_tokens), 0)
                AS BIGINT) AS tokens_kept,
           CAST(count(*) FILTER (n_tokens >= min_tokens) * 1000000 // max(all_docs)
                AS BIGINT) AS docs_kept_ppm,
           CAST(COALESCE(sum(n_tokens) FILTER (n_tokens >= min_tokens), 0) * 1000000
                // max(all_tokens) AS BIGINT) AS tokens_kept_ppm
    FROM cut CROSS JOIN d CROSS JOIN t
    GROUP BY min_tokens ORDER BY min_tokens
    """,
)
def x114_length_cutoff_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-cutoff sensitivity: documents and tokens retained at five
    candidate minimum-length filters, from ONE scan (the x109 pattern
    applied to the most-used quality gate) — the curve that turns 'pick
    a min length' from folklore into a budget decision. Exact ppm
    retention; cutoffs are a 5-row broadcast."""
    d = load(spark, sf_dir, "documents")
    n_tok = d.select(F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    t = n_tok.agg(
        F.count(F.lit(1)).alias("all_docs"), F.sum("n_tokens").alias("all_tokens")
    )
    cut = spark.createDataFrame([(10,), (20,), (30,), (40,), (60,)], "min_tokens long")
    keep = (F.col("n_tokens") >= F.col("min_tokens")).cast("long")
    return (
        n_tok.crossJoin(F.broadcast(cut))
        .crossJoin(F.broadcast(t))
        .groupBy("min_tokens")
        .agg(
            F.sum(keep).alias("docs_kept"),
            F.coalesce(F.sum(F.col("n_tokens") * keep), F.lit(0)).alias("tokens_kept"),
            F.floor(F.sum(keep) * 1_000_000 / F.max("all_docs"))
            .cast("long")
            .alias("docs_kept_ppm"),
            F.floor(
                F.coalesce(F.sum(F.col("n_tokens") * keep), F.lit(0))
                * 1_000_000
                / F.max("all_tokens")
            )
            .cast("long")
            .alias("tokens_kept_ppm"),
        )
        .orderBy("min_tokens")
    )


@query(
    "x115_source_divergence",
    oracle="""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2),
    n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY source),
    pairs AS (SELECT a.source AS src_a, b.source AS src_b FROM n a, n b
              WHERE a.source < b.source),
    terms AS (SELECT p.src_a, p.src_b, t.term,
                     COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
              FROM pairs p
              CROSS JOIN (SELECT DISTINCT term FROM c) t
              LEFT JOIN c ca ON ca.source = p.src_a AND ca.term = t.term
              LEFT JOIN c cb ON cb.source = p.src_b AND cb.term = t.term),
    contrib AS (
      SELECT src_a, src_b, term,
             CAST(CASE WHEN ca > 0 THEN ca * (
               ln(CAST(2 AS DOUBLE)) + ln(CAST(ca AS DOUBLE)) + ln(CAST(na.n + nb.n AS DOUBLE))
               - ln(CAST(na.n AS DOUBLE))
               - ln(CAST(ca AS DOUBLE) * nb.n + CAST(cb AS DOUBLE) * na.n)
             ) ELSE 0 END AS DECIMAL(38,6)) AS ta,
             CAST(CASE WHEN cb > 0 THEN cb * (
               ln(CAST(2 AS DOUBLE)) + ln(CAST(cb AS DOUBLE)) + ln(CAST(na.n + nb.n AS DOUBLE))
               - ln(CAST(nb.n AS DOUBLE))
               - ln(CAST(ca AS DOUBLE) * nb.n + CAST(cb AS DOUBLE) * na.n)
             ) ELSE 0 END AS DECIMAL(38,6)) AS tb
      FROM terms
      JOIN n na ON na.source = src_a
      JOIN n nb ON nb.source = src_b)
    SELECT src_a, src_b,
           {JSD} AS jsd
    FROM contrib
    JOIN n na2 ON na2.source = src_a
    JOIN n nb2 ON nb2.source = src_b
    GROUP BY src_a, src_b ORDER BY src_a, src_b
    """.replace("{JSD}", dround_sql(
        "CAST(sum(ta) AS DOUBLE) / 2 / max(na2.n)"
        " + CAST(sum(tb) AS DOUBLE) / 2 / max(nb2.n)", 6)),
)
def x115_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source token
    distributions — 'which sources are interchangeable, which add
    diversity' (the mixture-design companion of x74's temporal PSI and
    x55's mixture weights). Per-term KL contributions are single-IEEE-ln
    expressions of integer counts quantized to DECIMAL(38,6) BEFORE the
    sum (the x53 discipline — accumulation order can't shift ulps); the
    final scalar division rounds once and is emitted as DECIMAL so the
    representation hash can't diverge. Plan: one token hash agg per
    corpus scan, a K^2-pair broadcast expansion over the vocabulary —
    bounded by |vocab| x pairs, never by raw tokens."""
    d = load_parallel(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("term"))
    c = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    n = c.groupBy("source").agg(F.sum("c").alias("n"))
    na = n.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = n.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    pairs = na.crossJoin(nb).filter(F.col("src_a") < F.col("src_b"))
    vocab = c.select("term").distinct()
    grid = pairs.crossJoin(vocab)
    ca = c.select(F.col("source").alias("src_a"), F.col("term"), F.col("c").alias("ca"))
    cb = c.select(F.col("source").alias("src_b"), F.col("term"), F.col("c").alias("cb"))
    t = (
        grid.join(ca, ["src_a", "term"], "left")
        .join(cb, ["src_b", "term"], "left")
        .fillna({"ca": 0, "cb": 0})
    )
    ln = F.log
    two, d_ = F.lit(2.0), "double"
    mix = F.col("ca").cast(d_) * F.col("n_b") + F.col("cb").cast(d_) * F.col("n_a")
    ta = F.when(
        F.col("ca") > 0,
        F.col("ca")
        * (
            ln(two)
            + ln(F.col("ca").cast(d_))
            + ln((F.col("n_a") + F.col("n_b")).cast(d_))
            - ln(F.col("n_a").cast(d_))
            - ln(mix)
        ),
    ).otherwise(0.0).cast("decimal(38,6)")
    tb = F.when(
        F.col("cb") > 0,
        F.col("cb")
        * (
            ln(two)
            + ln(F.col("cb").cast(d_))
            + ln((F.col("n_a") + F.col("n_b")).cast(d_))
            - ln(F.col("n_b").cast(d_))
            - ln(mix)
        ),
    ).otherwise(0.0).cast("decimal(38,6)")
    g = t.groupBy("src_a", "src_b").agg(
        F.sum(ta).alias("sta"),
        F.sum(tb).alias("stb"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )
    return g.select(
        "src_a",
        "src_b",
        dround(
            F.col("sta").cast("double") / 2 / F.col("n_a")
            + F.col("stb").cast("double") / 2 / F.col("n_b"),
            6,
        ).alias("jsd"),
    ).orderBy("src_a", "src_b")


@query(
    "x116_token_budget_allocation",
    oracle="""
    WITH s AS (SELECT source,
                      CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
                           AS BIGINT) AS avail,
                      CAST(sum(n_chars) AS BIGINT) AS quality_key
               FROM documents GROUP BY source),
    r AS (SELECT source, avail,
                 CAST(COALESCE(sum(avail) OVER (ORDER BY quality_key DESC, source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS cum_before
          FROM s)
    SELECT source, avail,
           CAST(LEAST(avail, GREATEST(CAST(0 AS BIGINT), 20000 - cum_before))
                AS BIGINT) AS allocated,
           CAST(LEAST(avail, GREATEST(CAST(0 AS BIGINT), 20000 - cum_before))
                * 1000000 // avail AS BIGINT) AS fill_ppm
    FROM r ORDER BY source
    """,
)
def x116_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget allocation across sources: rank sources by a
    quality key, fill a fixed token budget in rank order, cap each
    source at its availability — the mixture allocator that turns x110's
    Pareto table and x55's weights into an actionable 'take this many
    tokens from each source' plan. The greedy fill is CLOSED-FORM: each
    source takes clamp(budget - cum_before, 0, avail), one cumulative
    window over |sources| rows — no iteration, no driver loop. All
    BIGINT."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    s = d.groupBy("source").agg(
        F.sum(toks).alias("avail"), F.sum("n_chars").alias("quality_key")
    )
    w = Window.orderBy(F.col("quality_key").desc(), "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = s.select(
        "source",
        "avail",
        F.coalesce(F.sum("avail").over(w), F.lit(0)).alias("cum_before"),
    )
    alloc = F.least(
        F.col("avail"), F.greatest(F.lit(0).cast("long"), F.lit(20_000) - F.col("cum_before"))
    )
    return r.select(
        "source",
        "avail",
        alloc.alias("allocated"),
        F.floor(alloc * 1_000_000 / F.col("avail")).cast("long").alias("fill_ppm"),
    ).orderBy("source")


@query(
    "x117_dedup_savings",
    oracle="""
    WITH h AS (SELECT source, md5(text) AS hh,
                      CAST(min(n_chars) AS BIGINT) AS keep_chars,
                      CAST(sum(n_chars) AS BIGINT) AS all_chars,
                      CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY source, md5(text))
    SELECT source,
           CAST(sum(all_chars) AS BIGINT) AS total_chars,
           CAST(sum(all_chars) - sum(keep_chars) AS BIGINT) AS chars_saved,
           CAST((sum(all_chars) - sum(keep_chars)) * 1000000 // sum(all_chars)
                AS BIGINT) AS saved_ppm,
           CAST(sum(n) - count(*) AS BIGINT) AS docs_removed
    FROM h GROUP BY source ORDER BY source
    """,
)
def x117_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup savings forecast per source: storage (chars) and doc
    count reclaimed by keep-one-per-content-hash — the cost-benefit
    number that justifies (or kills) a dedup campaign before running it.
    One hash agg on (source, md5) partials then one rollup: the shuffle
    carries 16-byte hashes + three integers per group, never text."""
    d = load(spark, sf_dir, "documents")
    h = d.groupBy("source", F.md5("text").alias("hh")).agg(
        F.min("n_chars").alias("keep_chars"),
        F.sum("n_chars").alias("all_chars"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        h.groupBy("source")
        .agg(
            F.sum("all_chars").alias("total_chars"),
            (F.sum("all_chars") - F.sum("keep_chars")).alias("chars_saved"),
            F.floor(
                (F.sum("all_chars") - F.sum("keep_chars"))
                * 1_000_000
                / F.sum("all_chars")
            )
            .cast("long")
            .alias("saved_ppm"),
            (F.sum("n") - F.count(F.lit(1))).alias("docs_removed"),
        )
        .orderBy("source")
    )


@query(
    "x118_ranked_retrieval",
    oracle="""
    WITH q AS (SELECT unnest(['table', 'stream', 'window']) AS term),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
    w AS (SELECT tf.doc_id, tf.term,
                 tf.tf * CAST(ln(CAST(nd AS DOUBLE) / df) AS DECIMAL(18,6)) AS w
          FROM tf JOIN df USING (term) CROSS JOIN n
          WHERE tf.term IN (SELECT term FROM q) AND df < nd),
    sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
                  CAST(sum(w) AS DECIMAL(38,6)) AS score
           FROM w GROUP BY doc_id)
    SELECT doc_id, n_terms_hit, CAST(score AS DECIMAL(18,6)) AS score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
    FROM sc ORDER BY rank LIMIT 5
    """,
)
def x118_ranked_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked retrieval for a 3-term query — the mini search engine that
    ties the IR components together: tf-idf weights (x97's decimal
    discipline) summed over matched query terms, top-5 documents by
    score with doc_id ties. The query-term filter pushes into the token
    stream BEFORE any aggregation (only matching terms shuffle), idf is
    a single quantized IEEE ln, the score accumulates exactly in
    DECIMAL so both engines rank identically — and because scores are
    emitted AS decimal, the representation hash cannot diverge. At
    100 TB this reads the x80 inverted index instead of re-exploding
    text; the plan shape (term filter -> postings join -> per-doc agg ->
    TakeOrdered) is the same either way."""
    d = load_parallel(spark, sf_dir, "documents")
    q_terms = ["table", "stream", "window"]
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    w = (
        tf.filter(F.col("term").isin(q_terms))
        .join(df_, "term")
        .crossJoin(F.broadcast(nd))
        .filter(F.col("df") < F.col("nd"))
        .select(
            "doc_id",
            (
                F.col("tf")
                * F.log(F.col("nd").cast("double") / F.col("df")).cast("decimal(18,6)")
            ).alias("w"),
        )
    )
    sc = w.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.sum("w").cast("decimal(38,6)").alias("score"),
    )
    # top-5 as sort-limit (TakeOrderedAndProject: per-partition heads,
    # driver merge — no corpus-sized global window), then the rank
    # window runs over exactly 5 rows
    top = (
        sc.select(
            "doc_id",
            "n_terms_hit",
            F.col("score").cast("decimal(18,6)").alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(5)
    )
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .cast("long"),
    ).orderBy("rank")


@query(
    "x122_zipf_fit",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY term),
    r AS (SELECT freq,
                 CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank
          FROM c),
    q AS (SELECT CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(18,6)) AS x,
                 CAST(ln(CAST(freq AS DOUBLE)) AS DECIMAL(18,6)) AS y
          FROM r),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS DECIMAL(38,6)) AS sx,
                 CAST(sum(y) AS DECIMAL(38,6)) AS sy,
                 CAST(sum(x*y) AS DECIMAL(38,12)) AS sxy,
                 CAST(sum(x*x) AS DECIMAL(38,12)) AS sxx
          FROM q)
    SELECT n AS vocab_size,
           CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * 1000000)
                AS BIGINT) AS zipf_slope_ppm
    FROM s
    """,
)
def x122_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: the log-log rank-frequency regression slope of the
    token distribution (natural language sits near -1; generated or
    templated text deviates — a corpus-authenticity screen next to the
    quality filters). ln(rank) and ln(freq) quantize to DECIMAL(18,6)
    so all regression sums accumulate exactly (the x53/x78 discipline);
    the slope divides two exactly-derived doubles once and emits as a
    floored ppm integer. One token hash agg + a ``distributed_rank``
    over the vocab (range repartition + within-range rank + P-row offset
    cumsum — no SinglePartition sort over |vocab|) + a 1-row reduce."""
    d = load_parallel(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("term"))
    c = tok.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    from kafka_connect_spark.functions.skew import distributed_rank

    r = distributed_rank(
        c, [F.col("freq").desc(), F.col("term")], rank_name="rank"
    ).select("freq", "rank")
    q = r.select(
        F.log(F.col("rank").cast("double")).cast("decimal(18,6)").alias("x"),
        F.log(F.col("freq").cast("double")).cast("decimal(18,6)").alias("y"),
    )
    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,6)").alias("sx"),
        F.sum("y").cast("decimal(38,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,12)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,12)").alias("sxx"),
    )
    slope = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return s.select(
        F.col("n").alias("vocab_size"),
        F.floor(slope * 1_000_000).cast("long").alias("zipf_slope_ppm"),
    )


@query(
    "x123_heaps_fit",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tok AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS term
            FROM d, unnest(range(1, len(toks) - 3)) t(i)
            WHERE len(toks) >= 5),
    fo AS (SELECT term, min(doc_id) AS first_doc FROM tok GROUP BY term),
    mx AS (SELECT max(doc_id) AS md FROM documents),
    nt AS (SELECT doc_id, CAST(len(toks) - 4 AS BIGINT) AS n_grams FROM d
           WHERE len(toks) >= 5),
    b AS (SELECT CAST(first_doc * 10 // (md + 1) AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS new_terms
          FROM fo, mx GROUP BY 1),
    tb AS (SELECT CAST(doc_id * 10 // (md + 1) AS BIGINT) AS bucket,
                  CAST(sum(n_grams) AS BIGINT) AS toks_in_bucket
           FROM nt, mx GROUP BY 1),
    cum AS (SELECT b.bucket,
                   CAST(sum(new_terms) OVER w AS BIGINT) AS cum_vocab,
                   CAST(sum(toks_in_bucket) OVER w AS BIGINT) AS cum_tokens
            FROM b JOIN tb USING (bucket)
            WINDOW w AS (ORDER BY b.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    q AS (SELECT CAST(ln(CAST(cum_tokens AS DOUBLE)) AS DECIMAL(18,6)) AS x,
                 CAST(ln(CAST(cum_vocab AS DOUBLE)) AS DECIMAL(18,6)) AS y
          FROM cum),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS DECIMAL(38,6)) AS sx,
                 CAST(sum(y) AS DECIMAL(38,6)) AS sy,
                 CAST(sum(x*y) AS DECIMAL(38,12)) AS sxy,
                 CAST(sum(x*x) AS DECIMAL(38,12)) AS sxx
          FROM q)
    SELECT n AS n_points,
           CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * 1000000)
                AS BIGINT) AS heaps_beta_ppm
    FROM s
    """,
)
def x123_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law exponent fit: vocabulary ~ tokens^beta, estimated as the
    log-log regression slope over x81's cumulative (tokens, vocabulary)
    decile curve — the single number that predicts how fast NEW 5-gram
    types keep arriving as the corpus grows (flat beta = the crawl is
    recycling content; natural corpora sit around 0.5-0.8). Same
    decimal-exact regression discipline as x122, over 10 points."""
    d = load_parallel(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # r15: word_ngrams (per-row zip_with chain) — the slice-inside-lambda
    # form re-split the text per gram (guide §4.1); identical strings
    grams = word_ngrams("text", 5)
    base = d.filter(F.size(toks) >= 5)
    fo = (
        base.select("doc_id", F.explode(grams).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    mx = d.agg(F.max("doc_id").alias("md"))
    nt = base.select("doc_id", (F.size(toks) - 4).cast("long").alias("n_grams"))
    b = (
        fo.crossJoin(F.broadcast(mx))
        .select(F.floor(F.col("first_doc") * 10 / (F.col("md") + 1)).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_terms"))
    )
    tb = (
        nt.crossJoin(F.broadcast(mx))
        .select(
            F.floor(F.col("doc_id") * 10 / (F.col("md") + 1)).cast("long").alias("bucket"),
            "n_grams",
        )
        .groupBy("bucket")
        .agg(F.sum("n_grams").alias("toks_in_bucket"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = b.join(tb, "bucket").select(
        F.sum("new_terms").over(w).alias("cum_vocab"),
        F.sum("toks_in_bucket").over(w).alias("cum_tokens"),
    )
    q = cum.select(
        F.log(F.col("cum_tokens").cast("double")).cast("decimal(18,6)").alias("x"),
        F.log(F.col("cum_vocab").cast("double")).cast("decimal(18,6)").alias("y"),
    )
    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,6)").alias("sx"),
        F.sum("y").cast("decimal(38,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,12)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,12)").alias("sxx"),
    )
    slope = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return s.select(
        F.col("n").alias("n_points"),
        F.floor(slope * 1_000_000).cast("long").alias("heaps_beta_ppm"),
    )


@query(
    "x124_source_lm_profile",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
      FROM documents),
    vocab AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
              FROM tok GROUP BY token),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
    doc AS (SELECT t.doc_id, t.source,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CAST(ln(v.cnt) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS slc
            FROM tok t JOIN vocab v ON t.token = v.token
            GROUP BY t.doc_id, t.source)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           {dround_sql(
               "ln(max(total)) - CAST(sum(slc) AS DOUBLE) / sum(n_tokens)", 6)}
             AS mean_lm_score
    FROM doc CROSS JOIN tot
    GROUP BY source ORDER BY source
    """,
)
def x124_source_lm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-model quality profile: the token-weighted mean
    unigram NLL (x53's perplexity-proxy aggregated to the mixture-design
    level) — sources whose text is systematically off-distribution
    surface here before any per-document filtering. ln-count terms
    quantize to decimal before EVERY sum (doc-level and source-level),
    so the two-level aggregation is order-free; one final IEEE divide
    through the shared floor rounding."""
    d = load_parallel(spark, sf_dir, "documents")
    tok = d.select("doc_id", "source", F.explode(F.split("text", " ")).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    doc = (
        tok.join(vocab, "token")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(F.col("cnt").cast("double")).cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .alias("slc"),
        )
    )
    return (
        doc.crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dround(
                F.log(F.max("total").cast("double"))
                - F.sum("slc").cast("double") / F.sum("n_tokens"),
                6,
            ).alias("mean_lm_score"),
        )
        .orderBy("source")
    )


@query(
    "x125_source_rank_movers",
    oracle="""
    WITH mx AS (SELECT max(doc_id) AS md FROM documents),
    h AS (SELECT source,
                 CAST(sum(CASE WHEN doc_id * 2 <= md THEN n_chars ELSE 0 END)
                      AS BIGINT) AS v1,
                 CAST(sum(CASE WHEN doc_id * 2 > md THEN n_chars ELSE 0 END)
                      AS BIGINT) AS v2
          FROM documents CROSS JOIN mx GROUP BY source),
    r AS (SELECT source, v1, v2,
                 CAST(row_number() OVER (ORDER BY v1 DESC, source) AS BIGINT) AS rank1,
                 CAST(row_number() OVER (ORDER BY v2 DESC, source) AS BIGINT) AS rank2
          FROM h)
    SELECT source, v1, v2, rank1, rank2,
           CAST(rank1 - rank2 AS BIGINT) AS rank_delta
    FROM r WHERE rank1 <> rank2
    ORDER BY abs(rank1 - rank2) DESC, source
    """,
)
def x125_source_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risers and fallers: sources whose volume RANK changed between the
    first and second corpus half (by doc_id — the snapshot ordering).
    Rank deltas are robust where raw volume deltas mislead (everything
    grows in a growing crawl; what matters is relative position). Both
    halves aggregate in ONE conditional pass; two rank windows over
    |sources| rows."""
    d = load(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("md"))
    h = (
        d.crossJoin(F.broadcast(mx))
        .groupBy("source")
        .agg(
            F.sum(
                F.when(F.col("doc_id") * 2 <= F.col("md"), F.col("n_chars")).otherwise(0)
            ).alias("v1"),
            F.sum(
                F.when(F.col("doc_id") * 2 > F.col("md"), F.col("n_chars")).otherwise(0)
            ).alias("v2"),
        )
    )
    r = h.select(
        "source",
        "v1",
        "v2",
        F.row_number().over(Window.orderBy(F.col("v1").desc(), "source")).cast("long").alias("rank1"),
        F.row_number().over(Window.orderBy(F.col("v2").desc(), "source")).cast("long").alias("rank2"),
    )
    return (
        r.filter(F.col("rank1") != F.col("rank2"))
        .select(
            "source",
            "v1",
            "v2",
            "rank1",
            "rank2",
            (F.col("rank1") - F.col("rank2")).alias("rank_delta"),
        )
        .orderBy(F.abs(F.col("rank1") - F.col("rank2")).desc(), "source")
    )


@query(
    "x129_quality_flag_panel",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      FROM documents),
    f AS (SELECT doc_id,
                 CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END AS flag_short,
                 CASE WHEN n_distinct * 10 < n_tokens * 3 THEN 1 ELSE 0 END
                   AS flag_low_diversity,
                 CASE WHEN n_tokens > 45 THEN 1 ELSE 0 END AS flag_long
          FROM s)
    SELECT doc_id, flag_short, flag_low_diversity, flag_long,
           CAST(flag_short + flag_low_diversity + flag_long AS BIGINT) AS n_flags,
           CAST(flag_short * 4 + flag_low_diversity * 2 + flag_long AS BIGINT)
             AS flag_mask
    FROM f WHERE flag_short + flag_low_diversity + flag_long >= 1
    ORDER BY doc_id
    """,
)
def x129_quality_flag_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality flag panel: every document tripping at least one quality
    rule, with the individual flags, the flag count, and a bitmask —
    the x127 adjudication idea applied to the quality family (a doc
    flagged by ONE rule is a judgment call; by two or more it's a
    drop). Rules are exact integer predicates (diversity via
    cross-multiplication); the bitmask makes downstream routing a
    single integer compare. Pure map-side, codegen-resident — the
    cheapest per-row query in the curation family."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    s = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    f = s.select(
        "doc_id",
        (F.col("n_tokens") < 20).cast("long").alias("flag_short"),
        (F.col("n_distinct") * 10 < F.col("n_tokens") * 3).cast("long").alias("flag_low_diversity"),
        (F.col("n_tokens") > 45).cast("long").alias("flag_long"),
    )
    n_flags = F.col("flag_short") + F.col("flag_low_diversity") + F.col("flag_long")
    return (
        f.select(
            "doc_id",
            "flag_short",
            "flag_low_diversity",
            "flag_long",
            n_flags.cast("long").alias("n_flags"),
            (F.col("flag_short") * 4 + F.col("flag_low_diversity") * 2 + F.col("flag_long"))
            .cast("long")
            .alias("flag_mask"),
        )
        .filter(F.col("n_flags") >= 1)
        .orderBy("doc_id")
    )


@query(
    "x134_tokenizer_efficiency",
    oracle="""
    WITH s AS (SELECT source, lang,
                      CAST(sum(n_chars) AS BIGINT) AS chars,
                      CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
                           AS BIGINT) AS toks
               FROM documents GROUP BY source, lang)
    SELECT source, lang, chars, toks,
           CAST(chars * 1000000 // toks AS BIGINT) AS chars_per_token_ppm
    FROM s ORDER BY source, lang
    """,
)
def x134_tokenizer_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-efficiency grid: characters per token by (source, lang)
    as an exact ppm — the compression-cost table that prices each slice
    of the mixture in actual context-window budget (a lang/source whose
    text tokenizes fat costs proportionally more per character of
    content; the input to x116's allocator when the budget is tokens
    but the value is characters). One hash agg."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source", "lang").agg(
        F.sum("n_chars").alias("chars"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("toks"),
    )
    return s.select(
        "source",
        "lang",
        "chars",
        "toks",
        F.floor(F.col("chars") * 1_000_000 / F.col("toks")).cast("long").alias(
            "chars_per_token_ppm"
        ),
    ).orderBy("source", "lang")


@query(
    "x136_corpus_summary",
    oracle="""
    WITH d AS (SELECT doc_id, text, source, lang, n_chars,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                 CAST(sum(n_chars) AS BIGINT) AS n_chars,
                 CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
                 CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                 CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
          FROM d),
    v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab
          FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents))
    SELECT n_docs, n_tokens, n_chars, n_unique, n_sources, n_langs, vocab,
           CAST((n_docs - n_unique) * 1000000 // n_docs AS BIGINT)
             AS exact_dup_ppm,
           CAST(n_tokens * 1000000 // n_docs AS BIGINT) AS tokens_per_doc_ppm
    FROM t CROSS JOIN v
    """,
)
def x136_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus front page: one row of headline KPIs (docs, tokens,
    chars, distinct contents, sources, languages, vocabulary, exact-dup
    ppm, mean doc length) — the number set every drill-down query in
    the curation family starts from and reconciles back to. Two scans
    (doc-level agg + token distinct), everything BIGINT."""
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    t = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
    )
    v = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab"))
    )
    return t.crossJoin(F.broadcast(v)).select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_unique",
        "n_sources",
        "n_langs",
        "vocab",
        F.floor((F.col("n_docs") - F.col("n_unique")) * 1_000_000 / F.col("n_docs"))
        .cast("long")
        .alias("exact_dup_ppm"),
        F.floor(F.col("n_tokens") * 1_000_000 / F.col("n_docs"))
        .cast("long")
        .alias("tokens_per_doc_ppm"),
    )


@query(
    "x138_dsir_importance_weights",
    oracle="""
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS gm
          FROM d, unnest(range(1, len(toks))) t(i) WHERE len(toks) >= 2),
    gb AS (SELECT doc_id, lang,
                  CAST('0x' || substring(md5(gm), 1, 15) AS BIGINT) % 1024 AS b
           FROM g),
    c AS (SELECT b,
                 CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                 CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cs
          FROM gb GROUP BY b),
    n AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cs) AS BIGINT) AS ns FROM c),
    sc AS (SELECT b,
                  CAST(ln((ct + 1.0) / (nt + 1024)) AS DECIMAL(18,6))
                  - CAST(ln((cs + 1.0) / (ns + 1024)) AS DECIMAL(18,6)) AS lr
           FROM c CROSS JOIN n)
    SELECT gb.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(lr) * 1000000 AS BIGINT) AS weight_micros
    FROM gb JOIN sc USING (b)
    GROUP BY gb.doc_id ORDER BY gb.doc_id
    """,
)
def x138_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.,
    NeurIPS'23): score every document by the log-likelihood ratio of its
    HASHED BIGRAM features under a target vs a raw distribution — here
    target = the 'en' slice (standing in for the high-quality corpus),
    raw = everything else. Both distributions are 1024-bucket hashed
    n-gram unigram models with Laplace smoothing; a document's weight is
    the exact decimal sum of its occurrences' per-bucket quantized
    log-ratios, emitted in integer micros.

    Why this is the 100 TB mixture tool: the feature model is a
    FIXED-SIZE table (1024 buckets) built in one hash agg, the scoring
    pass is a broadcast join + per-doc sum over one scan — no shuffle
    keyed on anything wider than the doc id, and the same broadcast table
    scores any future corpus increment (the streaming-selection property
    DSIR was designed for — tests/test_curation_ops.py replays documents
    as a file stream and shows per-microbatch ``dsir_score_docs`` with a
    FROZEN model equals this batch output row-for-row). Cross-engine
    exactness: md5-hash bucketing, per-bucket ln quantized to
    DECIMAL(18,6) (the x97 idf idiom), decimal accumulation,
    integer-micros output."""
    d = load_parallel(spark, sf_dir, "documents")
    return dsir_score_docs(d, dsir_bucket_scores(d)).orderBy("doc_id")


def _dsir_grams(d: DataFrame) -> DataFrame:
    from ..functions.dedupfns import token_hash60

    toks = F.split("text", " ")
    # r15: word_ngrams (per-row zip_with chain; guide §4.1)
    bigr = word_ngrams("text", 2)
    return (
        d.filter(F.size(toks) >= 2)
        .select("doc_id", "lang", F.explode(bigr).alias("gm"))
        .select(
            "doc_id", "lang", F.pmod(token_hash60("gm"), F.lit(1024)).alias("b")
        )
    )


def dsir_bucket_scores(d: DataFrame) -> DataFrame:
    """The DSIR feature model: a 1024-row (bucket, log-ratio) table built
    in one hash agg over the training corpus. Freeze (or persist) it and
    score any later corpus increment with ``dsir_score_docs`` — the model
    never grows with the data."""
    c = _dsir_grams(d).groupBy("b").agg(
        F.sum((F.col("lang") == "en").cast("long")).alias("ct"),
        F.sum((F.col("lang") != "en").cast("long")).alias("cs"),
    )
    n = c.agg(F.sum("ct").alias("nt"), F.sum("cs").alias("ns"))
    lr = (
        F.log((F.col("ct") + 1.0) / (F.col("nt") + 1024)).cast("decimal(18,6)")
        - F.log((F.col("cs") + 1.0) / (F.col("ns") + 1024)).cast("decimal(18,6)")
    )
    return c.crossJoin(F.broadcast(n)).select("b", lr.alias("lr"))


def dsir_score_docs(d: DataFrame, sc: DataFrame) -> DataFrame:
    """Score documents against a (frozen) DSIR bucket model: broadcast
    join + per-doc exact decimal sum. Stateless per document, so it runs
    identically on a batch frame or inside each streaming microbatch
    (foreachBatch) — no cross-batch state to carry."""
    return (
        _dsir_grams(d)
        .join(F.broadcast(sc), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            (F.sum("lr") * 1_000_000).cast("long").alias("weight_micros"),
        )
    )


@query(
    "x140_bm25_retrieval",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok WHERE term IN ('table', 'stream', 'window') GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM dl),
    s AS (SELECT tf.doc_id, tf.term,
                 CAST(ln((nd - df + 0.5) / (df + 0.5) + 1.0)
                      * (tf * 2.2)
                      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                      AS DECIMAL(18,6)) AS sc
          FROM tf JOIN df USING (term)
                  JOIN dl ON dl.doc_id = tf.doc_id
                  CROSS JOIN n),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
                   CAST(sum(sc) AS DECIMAL(18,6)) AS score
            FROM s GROUP BY doc_id)
    SELECT doc_id, n_terms_hit, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
    FROM agg ORDER BY rank LIMIT 10
    """,
)
def x140_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for the same 3-term query as x118 (k1=1.2,
    b=0.75, Lucene's +1 idf so scores never go negative) — the ranking
    function production search actually runs, next to x118's plain
    tf-idf: BM25 saturates term frequency (a doc mentioning 'stream' 50
    times isn't 50x more relevant) and normalizes by document length
    against the corpus average. Per-(doc,term) score is ONE double
    expression from exact integers (tf, df, dl BIGINT; avgdl a single
    fixed-order IEEE division) quantized to DECIMAL(18,6), then summed
    exactly — both engines rank identically and the emitted decimal
    cannot representation-diverge. Plan: the term filter pushes into the
    token explosion (only query-term postings shuffle — x118's shape),
    dl/avgdl ride a tiny broadcast; TakeOrdered(10) finishes. At 100 TB
    this reads the x80 inverted index + a doc-length table instead of
    re-exploding text."""
    d = load_parallel(spark, sf_dir, "documents")
    q_terms = ["table", "stream", "window"]
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        tok.filter(F.col("term").isin(q_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = dl.agg(
        F.count(F.lit(1)).alias("nd"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    sc = (
        F.log(
            (F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
    ).cast("decimal(18,6)")
    s = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", sc.alias("sc"))
    )
    agg = s.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.sum("sc").cast("decimal(18,6)").alias("score"),
    )
    # top-10 as sort-limit (TakeOrderedAndProject — no corpus-sized
    # global window); the rank window then runs over 10 rows only
    top = agg.orderBy(F.col("score").desc(), "doc_id").limit(10)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .cast("long"),
    ).orderBy("rank")


@query(
    "x141_rank_agreement",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok WHERE term IN ('table', 'stream', 'window') GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM dl),
    s AS (SELECT tf.doc_id,
                 CAST(tf.tf * CAST(ln(CAST(nd AS DOUBLE) / df) AS DECIMAL(18,6))
                      AS DECIMAL(18,6)) AS w_tfidf,
                 CAST(ln((nd - df + 0.5) / (df + 0.5) + 1.0)
                      * (tf * 2.2)
                      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                      AS DECIMAL(18,6)) AS w_bm25
          FROM tf JOIN df USING (term)
                  JOIN dl ON dl.doc_id = tf.doc_id
                  CROSS JOIN n),
    agg AS (SELECT doc_id,
                   CAST(sum(w_tfidf) AS DECIMAL(18,6)) AS s_tfidf,
                   CAST(sum(w_bm25) AS DECIMAL(18,6)) AS s_bm25
            FROM s GROUP BY doc_id),
    r AS (SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY s_tfidf DESC, doc_id) AS BIGINT) AS r_tfidf,
                 CAST(row_number() OVER (ORDER BY s_bm25 DESC, doc_id) AS BIGINT) AS r_bm25
          FROM agg)
    SELECT CAST(count(*) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN r_tfidf <= 10 AND r_bm25 <= 10 THEN 1 ELSE 0 END)
                AS BIGINT) AS overlap_at_10,
           CAST(sum(abs(r_tfidf - r_bm25)) AS BIGINT) AS footrule_sum,
           CAST(sum(abs(r_tfidf - r_bm25)) * 1000000
                // GREATEST(count(*) * count(*) // 2, 1) AS BIGINT)
             AS footrule_ppm
    FROM r
    """,
)
def x141_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-agreement audit between the two retrieval scorers (x118
    tf-idf vs x140 BM25) on the same query: Spearman FOOTRULE distance
    (sum of |rank difference| over the matched-doc set, normalized ppm
    against the permutation maximum ~m^2/2) plus top-10 overlap. The
    meta-eval a ranker swap ships with — footrule is rank-correlation
    you can compute in ONE linear pass (no concordant/discordant pair
    join, unlike Kendall tau), so at 100 TB it runs over the full
    matched set; both rankings derive from quantized-decimal scores with
    doc_id tie-breaks, so ranks — and therefore the audit — are
    engine-exact. Plan: the two scorers share one postings scan (single
    tf CTE feeds both weight columns), two rank windows over the tiny
    matched set, one final agg."""
    d = load_parallel(spark, sf_dir, "documents")
    q_terms = ["table", "stream", "window"]
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        tok.filter(F.col("term").isin(q_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = dl.agg(
        F.count(F.lit(1)).alias("nd"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    w_tfidf = (
        F.col("tf")
        * F.log(F.col("nd").cast("double") / F.col("df")).cast("decimal(18,6)")
    ).cast("decimal(18,6)")
    w_bm25 = (
        F.log((F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
    ).cast("decimal(18,6)")
    s = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .select("doc_id", w_tfidf.alias("w_tfidf"), w_bm25.alias("w_bm25"))
    )
    agg = s.groupBy("doc_id").agg(
        F.sum("w_tfidf").cast("decimal(18,6)").alias("s_tfidf"),
        F.sum("w_bm25").cast("decimal(18,6)").alias("s_bm25"),
    )
    # both corpus-sized ranks ride distributed_rank (range repartition +
    # within-range rank + P-row offset cumsum) — no SinglePartition sort
    from kafka_connect_spark.functions.skew import distributed_rank

    r = distributed_rank(
        distributed_rank(
            agg,
            [F.col("s_tfidf").desc(), F.col("doc_id")],
            rank_name="r_tfidf",
        ),
        [F.col("s_bm25").desc(), F.col("doc_id")],
        rank_name="r_bm25",
    ).select("doc_id", "r_tfidf", "r_bm25")
    fr = F.sum(F.abs(F.col("r_tfidf") - F.col("r_bm25")))
    m = F.count(F.lit(1))
    return r.agg(
        m.alias("n_matched"),
        F.sum(
            ((F.col("r_tfidf") <= 10) & (F.col("r_bm25") <= 10)).cast("long")
        ).alias("overlap_at_10"),
        fr.alias("footrule_sum"),
        F.floor(
            fr * F.lit(1_000_000)
            / F.greatest(F.floor(m * m / 2), F.lit(1))
        )
        .cast("long")
        .alias("footrule_ppm"),
    )


@query(
    "x142_stratified_eval_sample",
    oracle="""
    WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
    q AS (SELECT lang, n,
                 CAST(100 * n // total AS BIGINT) AS base,
                 CAST(100 * n % total AS BIGINT) AS rem
          FROM c CROSS JOIN t),
    b AS (SELECT CAST(sum(base) AS BIGINT) AS sum_base FROM q),
    a AS (SELECT lang, n,
                 base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
                                  <= 100 - sum_base THEN 1 ELSE 0 END AS alloc
          FROM q CROSS JOIN b),
    h AS (SELECT doc_id, lang,
                 CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
          FROM documents),
    r AS (SELECT doc_id, lang, hv,
                 row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
          FROM h)
    SELECT r.lang, CAST(a.alloc AS BIGINT) AS lang_quota, r.doc_id,
           CAST(r.rn AS BIGINT) AS rank
    FROM r JOIN a ON a.lang = r.lang
    WHERE r.rn <= a.alloc
    ORDER BY r.lang, r.rn
    """,
)
def x142_stratified_eval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified eval-set construction: apportion a fixed
    budget of 100 eval slots across language strata by LARGEST-REMAINDER
    (Hamilton) apportionment — floor quotas plus one extra slot per
    largest fractional remainder, ties by lang — then fill each stratum
    with its md5-clock sample (the x57 deterministic-uniform idiom). The
    op an eval-pipeline runs at every corpus refresh: exact proportional
    representation with NO floating-point quota (quotas compare integer
    numerators 100*n mod N), reproducible doc selection, and an output
    an auditor can re-derive by hand.

    Plan at 100 TB: stratum counts are one hash agg (|langs| rows,
    broadcast everywhere after); the apportionment window runs over that
    tiny table; the fill is one per-stratum rank window that
    WindowGroupLimit caps at the quota — the corpus scan never shuffles
    more than (lang, doc_id, 8-byte clock)."""
    from ..functions.dedupfns import token_hash60

    d = load_parallel(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    q = c.crossJoin(F.broadcast(t)).select(
        "lang",
        "n",
        F.floor(F.lit(100) * F.col("n") / F.col("total")).cast("long").alias("base"),
        (F.lit(100) * F.col("n") % F.col("total")).alias("rem"),
    )
    b = q.agg(F.sum("base").alias("sum_base"))
    a = (
        q.crossJoin(F.broadcast(b))
        .withColumn(
            "rn_", F.row_number().over(Window.orderBy(F.col("rem").desc(), "lang"))
        )
        .select(
            "lang",
            (
                F.col("base")
                + (F.col("rn_") <= F.lit(100) - F.col("sum_base")).cast("long")
            ).alias("alloc"),
        )
    )
    h = d.select(
        "doc_id", "lang", token_hash60(F.col("doc_id").cast("string")).alias("hv")
    )
    r = h.withColumn(
        "rn", F.row_number().over(Window.partitionBy("lang").orderBy("hv", "doc_id"))
    )
    return (
        r.join(F.broadcast(a), "lang")
        .filter(F.col("rn") <= F.col("alloc"))
        .select(
            "lang",
            F.col("alloc").cast("long").alias("lang_quota"),
            "doc_id",
            F.col("rn").cast("long").alias("rank"),
        )
        .orderBy("lang", "rank")
    )


@query(
    "x146_dsir_ess",
    oracle="""
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS gm
          FROM d, unnest(range(1, len(toks))) t(i) WHERE len(toks) >= 2),
    gb AS (SELECT doc_id, lang,
                  CAST('0x' || substring(md5(gm), 1, 15) AS BIGINT) % 1024 AS b
           FROM g),
    c AS (SELECT b,
                 CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                 CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cs
          FROM gb GROUP BY b),
    n AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cs) AS BIGINT) AS ns FROM c),
    sc AS (SELECT b,
                  CAST(ln((ct + 1.0) / (nt + 1024)) AS DECIMAL(18,6))
                  - CAST(ln((cs + 1.0) / (ns + 1024)) AS DECIMAL(18,6)) AS lr
           FROM c CROSS JOIN n),
    dw AS (SELECT gb.doc_id,
                  CAST(count(*) AS BIGINT) AS ng,
                  CAST(sum(lr) * 1000000 AS BIGINT) AS w_micros
           FROM gb JOIN sc USING (b) GROUP BY gb.doc_id),
    r AS (SELECT doc_id,
                 exp(CAST(floor(CAST(w_micros AS DOUBLE) / ng) AS DOUBLE)
                     / 1000000.0) AS w
          FROM dw),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CAST(floor(w * 1000000) AS BIGINT)) AS HUGEINT) AS s1,
                 CAST(sum(CAST(floor(w * 1000000) AS HUGEINT)
                          * CAST(floor(w * 1000000) AS HUGEINT)) AS HUGEINT) AS s2
          FROM r)
    SELECT n_docs,
           CAST(CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) // s2 AS BIGINT) AS ess,
           CAST(floor((CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) // s2)
                      * 1000000.0 / n_docs) AS BIGINT) AS ess_ratio_ppm
    FROM m
    """,
)
def x146_dsir_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the DSIR importance weights (x138) — the
    go/no-go diagnostic importance resampling ships with: if
    ESS = (Σw)² / Σw² collapses relative to n, the target distribution
    is so far from the raw corpus that resampling would repeat a tiny
    subset (and you should mix gradually instead). Weights are
    length-normalized (per-gram mean log-ratio, exact integer division
    of the x138 micros by the gram count) then exponentiated once;
    weight sums accumulate as exact integers (floor(w*10^6) in
    BIGINT/HUGEINT, Σw² reaches 10^25 — int64 would overflow), so the
    final ESS is integer arithmetic both engines agree on bit-for-bit.
    Plan: x138's broadcast-scored scan + one 1-row agg — the diagnostic
    is free on top of the scoring pass."""
    from ..functions.dedupfns import token_hash60

    d = load_parallel(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # r15: word_ngrams (per-row zip_with chain; guide §4.1)
    bigr = word_ngrams("text", 2)
    g = (
        d.filter(F.size(toks) >= 2)
        .select("doc_id", "lang", F.explode(bigr).alias("gm"))
        .select(
            "doc_id", "lang", F.pmod(token_hash60("gm"), F.lit(1024)).alias("b")
        )
    )
    c = g.groupBy("b").agg(
        F.sum((F.col("lang") == "en").cast("long")).alias("ct"),
        F.sum((F.col("lang") != "en").cast("long")).alias("cs"),
    )
    n = c.agg(F.sum("ct").alias("nt"), F.sum("cs").alias("ns"))
    lr = (
        F.log((F.col("ct") + 1.0) / (F.col("nt") + 1024)).cast("decimal(18,6)")
        - F.log((F.col("cs") + 1.0) / (F.col("ns") + 1024)).cast("decimal(18,6)")
    )
    sc = c.crossJoin(F.broadcast(n)).select("b", lr.alias("lr"))
    dw = (
        g.join(F.broadcast(sc), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("ng"),
            (F.sum("lr") * 1_000_000).cast("long").alias("w_micros"),
        )
    )
    w = F.exp(
        F.floor(F.col("w_micros") / F.col("ng")).cast("double") / 1_000_000.0
    )
    wi = F.floor(w * 1_000_000).cast("decimal(38,0)")
    r = dw.select(wi.alias("wi"))
    m = r.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("wi").alias("s1"),
        F.sum(F.col("wi") * F.col("wi")).alias("s2"),
    )
    # exact truncating big-int division: Spark decimal `/` rounds HALF_UP
    # at the result scale, so floor(a/b) can disagree with DuckDB's `//`
    # by 1; subtracting pmod first makes the quotient an exact integer.
    a = F.col("s1") * F.col("s1")
    ess = ((a - F.pmod(a, F.col("s2"))) / F.col("s2")).cast("long")
    return m.select(
        "n_docs",
        ess.alias("ess"),
        F.floor(ess * F.lit(1_000_000).cast("double") / F.col("n_docs"))
        .cast("long")
        .alias("ess_ratio_ppm"),
    )


@query(
    "x148_context_fit_report",
    oracle="""
    WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents),
    ctx AS (SELECT unnest([128, 256, 512, 1024]) AS ctx)
    SELECT CAST(ctx AS BIGINT) AS ctx,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum((n_tokens + ctx - 1) // ctx) AS BIGINT) AS n_chunks,
           CAST(sum((n_tokens + ctx - 1) // ctx) * ctx - sum(n_tokens) AS BIGINT)
             AS pad_tokens,
           CAST((sum((n_tokens + ctx - 1) // ctx) * ctx - sum(n_tokens)) * 1000000
                // (sum((n_tokens + ctx - 1) // ctx) * ctx) AS BIGINT) AS waste_ppm
    FROM d CROSS JOIN ctx
    GROUP BY ctx ORDER BY ctx
    """,
)
def x148_context_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste report across candidate context lengths (128-1024):
    if every document is split into ceil(tokens/ctx) fixed-size chunks
    (the no-packing baseline a dataloader falls back to), what fraction
    of compute slots is padding? The table that justifies a
    sequence-packing stage (x29) or a context-length choice — waste_ppm
    vs ctx is the curve you trade against long-range dependency needs.
    All exact integer ceil-division arithmetic; ONE documents scan
    crossed with a 4-row broadcast ctx table, one hash agg. At 100 TB
    the scan reads one int column (token counts ride the x93 datasheet
    scan in practice)."""
    d = load_parallel(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    ctxs = spark.createDataFrame([(128,), (256,), (512,), (1024,)], "ctx long")
    j = d.select(n_tokens.alias("n_tokens")).crossJoin(F.broadcast(ctxs))
    chunks = F.floor((F.col("n_tokens") + F.col("ctx") - 1) / F.col("ctx"))
    agg = j.groupBy("ctx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(chunks).alias("n_chunks"),
    )
    slots = F.col("n_chunks") * F.col("ctx")
    return (
        agg.select(
            "ctx",
            "n_docs",
            "total_tokens",
            "n_chunks",
            (slots - F.col("total_tokens")).alias("pad_tokens"),
            F.floor((slots - F.col("total_tokens")) * 1_000_000 / slots)
            .cast("long")
            .alias("waste_ppm"),
        )
        .orderBy("ctx")
    )


@query(
    "x151_mixture_plan",
    oracle="""
    WITH d AS (SELECT doc_id, source, lang, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS gm
          FROM d, unnest(range(1, len(toks))) t(i) WHERE len(toks) >= 2),
    gb AS (SELECT doc_id, lang,
                  CAST('0x' || substring(md5(gm), 1, 15) AS BIGINT) % 1024 AS b
           FROM g),
    c AS (SELECT b,
                 CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                 CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cs
          FROM gb GROUP BY b),
    n AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cs) AS BIGINT) AS ns FROM c),
    sc AS (SELECT b,
                  CAST(ln((ct + 1.0) / (nt + 1024)) AS DECIMAL(18,6))
                  - CAST(ln((cs + 1.0) / (ns + 1024)) AS DECIMAL(18,6)) AS lr
           FROM c CROSS JOIN n),
    dw AS (SELECT gb.doc_id, CAST(count(*) AS BIGINT) AS ng,
                  CAST(sum(lr) * 1000000 AS BIGINT) AS w_micros
           FROM gb JOIN sc USING (b) GROUP BY gb.doc_id),
    src AS (SELECT d.source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(toks)) AS BIGINT) AS tokens,
                   CAST(floor(CAST(sum(CAST(floor(CAST(dw.w_micros AS DOUBLE) / dw.ng)
                                             AS BIGINT)) AS DOUBLE) / count(*))
                        AS BIGINT) AS mean_w_micros
            FROM d JOIN dw ON dw.doc_id = d.doc_id
            GROUP BY d.source),
    scr AS (SELECT source, n_docs, tokens, mean_w_micros,
                   CAST(floor(exp(0.7 * ln(CAST(tokens AS DOUBLE))
                                  + CAST(mean_w_micros AS DOUBLE) / 1000000.0)
                              * 1000000) AS BIGINT) AS score_micros
            FROM src),
    tot AS (SELECT CAST(sum(score_micros) AS HUGEINT) AS sum_score,
                   CAST(sum(tokens) AS BIGINT) AS total_tokens
            FROM scr)
    SELECT source, n_docs, tokens, mean_w_micros, score_micros,
           CAST(CAST(score_micros AS HUGEINT) * 1000000 // sum_score AS BIGINT) AS p_ppm,
           CAST(CAST(score_micros AS HUGEINT) * total_tokens // sum_score AS BIGINT)
             AS alloc_tokens,
           CAST(CAST(CAST(score_micros AS HUGEINT) * total_tokens // sum_score
                     AS HUGEINT) * 1000000 // tokens AS BIGINT) AS epochs_ppm
    FROM scr CROSS JOIN tot ORDER BY source
    """,
)
def x151_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture PLAN — the table a pretraining data committee actually
    signs off on: per source, allocate a one-epoch-equivalent token
    budget by temperature-scaled size x DSIR quality,
    score_s = exp(0.7 * ln(tokens_s) + mean_dsir_weight_s). Temperature
    0.7 (the multilingual-sampling standard) upweights small sources;
    the DSIR term (x138's frozen model, length-normalized per doc)
    upweights target-like ones. Outputs sampling probability (ppm),
    allocated tokens, and the implied per-source epoch count in ppm —
    epochs_ppm > 1e6 means that source repeats, the number the
    repetition-harm literature wants surfaced, not hidden.

    Exactness: one transcendental expression per source quantized ONCE
    to integer micros (fewer floor-boundary events than composing
    quantized pow and exp); every division after that is exact big-int
    floor division (the x146 pmod idiom; products reach 10^22).
    Plan: x138's scoring pass + a |sources|-row plan table — the whole
    planner is one extra tiny agg on the scan the datasheet already
    pays for."""
    d = load_parallel(spark, sf_dir, "documents")
    dw = dsir_score_docs(d, dsir_bucket_scores(d))
    n_tokens = F.size(F.split("text", " ")).cast("long")
    src = (
        d.select("doc_id", "source", n_tokens.alias("ntok"))
        .join(dw, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("tokens"),
            F.floor(
                F.sum(F.floor(F.col("weight_micros") / F.col("n_grams")))
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("mean_w_micros"),
        )
    )
    score = F.floor(
        F.exp(
            F.lit(0.7) * F.log(F.col("tokens").cast("double"))
            + F.col("mean_w_micros").cast("double") / F.lit(1_000_000.0)
        )
        * 1_000_000
    ).cast("long")
    # r15 optimization (guide §2.4): the totals used to be a separate
    # aggregate broadcast-crossJoined back, which put a SECOND copy of
    # the whole DSIR scoring pipeline in the plan (both executed). They
    # now ride one SinglePartition window over the <=|sources| panel —
    # same exact decimal sums, one scoring pass.
    wall = Window.partitionBy()
    scr = src.select(
        "source", "n_docs", "tokens", "mean_w_micros", score.alias("score_micros")
    ).select(
        "source",
        "n_docs",
        "tokens",
        "mean_w_micros",
        "score_micros",
        F.sum(F.col("score_micros").cast("decimal(38,0)"))
        .over(wall)
        .alias("sum_score"),
        F.sum("tokens").over(wall).alias("total_tokens"),
    )

    def exdiv(a, b):
        # exact truncating big-int division (x146 idiom)
        return ((a - F.pmod(a, b)) / b).cast("long")

    sm = F.col("score_micros").cast("decimal(38,0)")
    alloc = exdiv(sm * F.col("total_tokens"), F.col("sum_score"))
    return (
        scr
        .select(
            "source", "n_docs", "tokens", "mean_w_micros", "score_micros",
            exdiv(sm * 1_000_000, F.col("sum_score")).alias("p_ppm"),
            alloc.alias("alloc_tokens"),
            exdiv(
                alloc.cast("decimal(38,0)") * 1_000_000, F.col("tokens")
            ).alias("epochs_ppm"),
        )
        .orderBy("source")
    )


@query(
    "x155_curriculum_plan",
    oracle="""
    WITH t AS (SELECT doc_id, source, n_chars,
                      len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    p AS (SELECT *, ntile(4) OVER (ORDER BY n_tokens, doc_id) AS phase FROM t)
    SELECT CAST(phase AS BIGINT) AS phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM p GROUP BY phase ORDER BY phase
    """,
)
def x155_curriculum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-ordered curriculum phases: rank the corpus by token count
    (short -> long, the classic curriculum-learning schedule) and cut it
    into 4 equal-count phases, reporting each phase's doc count and token
    budget — the plan a trainer consumes to schedule data loading. The
    tiling is EXACT window-NTILE semantics but runs scale-safe:
    ``distributed_ntile`` (range repartition + within-range rank + P-row
    offset cumsum + NTILE's integer allocation rule) — no SinglePartition
    sort ever sees the corpus, and the oracle's plain window ntile proves
    the decomposition. Deterministic: the order key (n_tokens, doc_id) is
    a total order, so both engines build the same tiles."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    from kafka_connect_spark.functions.skew import distributed_ntile

    p = distributed_ntile(
        t, 4, [F.col("n_tokens"), F.col("doc_id")], tile_name="phase"
    ).withColumn("phase", F.col("phase").cast("long"))
    return (
        p.groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("phase")
    )


@query(
    "x156_char_entropy_profile",
    oracle="""
    WITH c AS (SELECT doc_id, source, ch, CAST(count(*) AS BIGINT) AS c
               FROM (SELECT doc_id, source,
                            unnest(string_split(text, '')) AS ch
                     FROM documents)
               WHERE ch <> '' GROUP BY doc_id, source, ch),
    e AS (SELECT doc_id, source,
                 greatest(CAST(floor((ln(CAST(sum(c) AS DOUBLE))
                       - CAST(sum(c * CAST(ln(CAST(c AS DOUBLE))
                                           AS DECIMAL(18,6))) AS DOUBLE)
                         / sum(c)) * 1000000) AS BIGINT), 0) AS ent
          FROM c GROUP BY doc_id, source)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST((sum(ent) - ((sum(ent) % count(*) + count(*)) % count(*)))
                // count(*) AS BIGINT) AS avg_entropy_micronats,
           CAST(min(ent) AS BIGINT) AS min_entropy_micronats,
           CAST(max(ent) AS BIGINT) AS max_entropy_micronats,
           CAST(sum(CASE WHEN ent < 2500000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_entropy
    FROM e GROUP BY source ORDER BY source
    """,
)
def x156_char_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-unigram entropy per document, profiled per source — the
    gibberish/boilerplate detector quality pipelines run alongside
    stopword/punctuation ratios (x14c): natural text sits near 2.8-3.1
    nats, repeated-template or single-char spam collapses toward 0, and
    random bytes push past 4. Exactness is the x138/x144 quantized-ln
    idiom: entropy = ln(n) - (sum c*ln c)/n with each ln quantized to
    DECIMAL(18,6) and multiplied by EXACT integer counts, so accumulation
    is order-free in both engines; the per-source average is an exact
    BIGINT floor-division. Plan: explode chars -> (doc, char) hash agg
    (combines map-side: the alphabet is tiny so partial maps stay small)
    -> per-doc agg -> per-source agg; linear, no joins, and at 100 TB the
    char agg is the wordcount shape with a ~100-key alphabet per doc."""
    d = load_parallel(spark, sf_dir, "documents")
    c = (
        d.select("doc_id", "source", F.explode(F.split("text", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "source", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    e = c.groupBy("doc_id", "source").agg(
        F.greatest(
            F.floor(
                (
                    F.log(F.sum("c").cast("double"))
                    - F.sum(
                        F.col("c")
                        * F.log(F.col("c").cast("double")).cast("decimal(18,6)")
                    ).cast("double")
                    / F.sum("c")
                )
                * 1_000_000
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("ent")
    )
    return (
        e.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "CAST((sum(ent) - ((sum(ent) % count(*) + count(*)) % count(*)))"
                " DIV count(*) AS BIGINT)"
            ).alias("avg_entropy_micronats"),
            F.min("ent").alias("min_entropy_micronats"),
            F.max("ent").alias("max_entropy_micronats"),
            F.sum((F.col("ent") < 2_500_000).cast("long")).alias("n_low_entropy"),
        )
        .orderBy("source")
    )


@query(
    "x159_cms_token_frequency",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    ex AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt FROM tok
           GROUP BY token),
    ks AS (SELECT token, exact_cnt, s.salt,
                  CAST('0x' || substring(md5(CAST(s.salt AS VARCHAR) || ':' || token),
                       1, 15) AS BIGINT) % 1024 AS bucket
           FROM ex, (SELECT unnest([0, 1, 2, 3]) AS salt) s),
    cms AS (SELECT salt, bucket, sum(exact_cnt) AS cnt
            FROM ks GROUP BY salt, bucket),
    top AS (SELECT token, exact_cnt FROM ex
            ORDER BY exact_cnt DESC, token LIMIT 20),
    est AS (SELECT t.token, t.exact_cnt, min(c.cnt) AS cms_est
            FROM top t
            JOIN ks k ON k.token = t.token
            JOIN cms c ON c.salt = k.salt AND c.bucket = k.bucket
            GROUP BY t.token, t.exact_cnt)
    SELECT token, exact_cnt, CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - exact_cnt AS BIGINT) AS overcount
    FROM est ORDER BY exact_cnt DESC, token
    """,
)
def x159_cms_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch calibration on corpus token frequencies: a 4 x 1024
    CMS (depth 4 salted md5 rows, width-1024 buckets) vs exact counts for
    the top-20 tokens, reporting the sketch's one-sided overcount. The
    mergeable-sketch companion to x76's Misra-Gries: MG answers "which
    tokens are heavy", CMS answers point queries for ANY token in O(d)
    bounded memory — at 100 TB each partition builds its own 4x1024 grid
    map-side (the insert stream collapses to per-token partial counts
    first, which is exactly the map-side combine) and grids merge by
    cellwise addition; the shuffle carries 4,096 cells per partition no
    matter the vocabulary. CMS guarantees est >= exact always and
    est <= exact + eps*N w.h.p.; the overcount column is the measured
    error. Deterministic cross-engine: salted md5 bucket hashing, no RNG."""
    from ..functions.dedupfns import token_hash60

    d = load_parallel(spark, sf_dir, "documents")
    ex = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    ks = ex.select(
        "token",
        "exact_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("salt"),
    ).withColumn(
        "bucket",
        F.pmod(
            token_hash60(
                F.concat(F.col("salt").cast("string"), F.lit(":"), F.col("token"))
            ),
            F.lit(1024),
        ),
    )
    cms = ks.groupBy("salt", "bucket").agg(F.sum("exact_cnt").alias("cnt"))
    top = ex.orderBy(F.col("exact_cnt").desc(), "token").limit(20)
    est = (
        top.join(ks.select("token", "salt", "bucket"), "token")
        .join(cms, ["salt", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "token",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    ).orderBy(F.col("exact_cnt").desc(), "token")


@query(
    "x163_bloom_filter_calibration",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    ins AS (SELECT DISTINCT token FROM tok WHERE doc_id % 2 = 0),
    probe AS (SELECT token || '#p' AS token FROM (SELECT DISTINCT token FROM tok)
              WHERE token || '#p' NOT IN (SELECT token FROM ins)),
    ib AS (SELECT DISTINCT s.salt,
                  CAST('0x' || substring(md5(CAST(s.salt AS VARCHAR) || ':' || token),
                       1, 15) AS BIGINT) % 65536 AS bucket
           FROM ins, (SELECT unnest([0, 1, 2, 3]) AS salt) s),
    pb AS (SELECT token, s.salt,
                  CAST('0x' || substring(md5(CAST(s.salt AS VARCHAR) || ':' || token),
                       1, 15) AS BIGINT) % 65536 AS bucket
           FROM probe, (SELECT unnest([0, 1, 2, 3]) AS salt) s),
    hits AS (SELECT pb.token, count(*) AS nhit
             FROM pb JOIN ib ON ib.salt = pb.salt AND ib.bucket = pb.bucket
             GROUP BY pb.token),
    agg AS (SELECT
              (SELECT count(*) FROM ins) AS n_inserted,
              (SELECT count(*) FROM ib) AS n_bits_set,
              (SELECT count(*) FROM probe) AS n_probes,
              (SELECT count(*) FROM hits WHERE nhit = 4) AS n_false_positives)
    SELECT CAST(n_inserted AS BIGINT) AS n_inserted,
           CAST(n_bits_set AS BIGINT) AS n_bits_set,
           CAST(n_probes AS BIGINT) AS n_probes,
           CAST(n_false_positives AS BIGINT) AS n_false_positives,
           CAST(floor(n_false_positives * 1000000.0 / n_probes) AS BIGINT)
             AS fpr_ppm,
           CAST(floor((CAST(n_bits_set AS DOUBLE) / 65536)
                      * (CAST(n_bits_set AS DOUBLE) / 65536)
                      * (CAST(n_bits_set AS DOUBLE) / 65536)
                      * (CAST(n_bits_set AS DOUBLE) / 65536) * 1000000)
                AS BIGINT) AS theory_ppm
    FROM agg
    """,
)
def x163_bloom_filter_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive calibration, the sketch behind every
    join-pruning decision (the AQE runtime bloom this repo pins in
    tests/test_plan_properties.py is the same math): insert the even-doc
    vocabulary into a 65,536-bit / 4-hash salted-md5 filter, probe with
    a disjoint synthetic vocabulary (every distinct token suffixed '#p',
    anti-joined against the inserted set so probes are PROVEN
    non-members — the fixture's organic vocabulary is fully shared
    between doc-id parities, so held-out-doc probes don't exist), and
    report
    the measured FP rate against the theoretical (b/m)^k given the
    realized bit density. At 100 TB the filter builds map-side as
    per-partition distinct (salt, bucket) sets OR-merged by a distinct
    union — 64 KiB per partition on the wire regardless of vocabulary —
    and ships to the probe side as a broadcast. Deterministic: salted
    md5, no RNG; theory uses the realized b (an integer), not exp(),
    so both engines floor identical doubles."""
    from ..functions.dedupfns import token_hash60

    d = load_parallel(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    ins = tok.filter(F.col("doc_id") % 2 == 0).select("token").distinct()
    probe = (
        tok.select("token")
        .distinct()
        .select(F.concat("token", F.lit("#p")).alias("token"))
        .join(ins, "token", "left_anti")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("salt")

    def bucketed(df):
        return df.select("token", salts).withColumn(
            "bucket",
            F.pmod(
                token_hash60(
                    F.concat(F.col("salt").cast("string"), F.lit(":"), F.col("token"))
                ),
                F.lit(65536),
            ),
        )

    ib = bucketed(ins).select("salt", "bucket").distinct()
    pb = bucketed(probe)
    hits = (
        pb.join(ib, ["salt", "bucket"])
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("nhit"))
        .filter(F.col("nhit") == 4)
    )
    counts = (
        ins.agg(F.count(F.lit(1)).alias("n_inserted"))
        .crossJoin(ib.agg(F.count(F.lit(1)).alias("n_bits_set")))
        .crossJoin(probe.agg(F.count(F.lit(1)).alias("n_probes")))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_false_positives")))
    )
    dens = F.col("n_bits_set").cast("double") / F.lit(65536.0)
    return counts.select(
        "n_inserted",
        "n_bits_set",
        "n_probes",
        "n_false_positives",
        F.floor(F.col("n_false_positives") * 1_000_000.0 / F.col("n_probes"))
        .cast("long")
        .alias("fpr_ppm"),
        F.floor(dens * dens * dens * dens * F.lit(1_000_000.0))
        .cast("long")
        .alias("theory_ppm"),
    )


@query(
    "x165_readability_profile",
    oracle="""
    WITH m AS (SELECT source,
                      len(string_split(text, ' ')) AS w,
                      greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g')))
                        AS s,
                      len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS syl
               FROM documents),
    g AS (SELECT source,
                 CAST(floor((0.39e0 * w / s + 11.8e0 * syl / w - 15.59e0) * 1000)
                      AS BIGINT) AS grade_milli
          FROM m WHERE w > 0)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST((sum(grade_milli) - ((sum(grade_milli) % count(*) + count(*))
                 % count(*))) // count(*) AS BIGINT) AS avg_grade_milli,
           CAST(min(grade_milli) AS BIGINT) AS min_grade_milli,
           CAST(max(grade_milli) AS BIGINT) AS max_grade_milli
    FROM g GROUP BY source ORDER BY source
    """,
)
def x165_readability_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade-level profile per source (0.39 * words/sentence
    + 11.8 * syllables/word - 15.59, syllables approximated as vowel
    groups — the standard fast heuristic): the readability axis of
    quality filtering (FineWeb-Edu-style curation scores "educational,
    readable" text; pathologically high grades flag run-on boilerplate,
    negative grades flag fragment spam). All per-doc math is doubles
    over exact integers floored to milli-units, per-source averages are
    exact BIGINT floor-division — cross-engine bit-stable, same idiom as
    x156. Plan: one map pass (split/regexp are JVM codegen) + one hash
    agg; embarrassingly parallel at any scale."""
    d = load_parallel(spark, sf_dir, "documents")
    w = F.size(F.split("text", " "))
    sents = F.greatest(
        F.lit(1), F.length(F.regexp_replace("text", "[^.!?]", ""))
    )
    syl = F.size(F.expr("regexp_extract_all(text, '[aeiouyAEIOUY]+', 0)"))
    g = d.select(
        "source",
        F.floor(
            (
                0.39 * w.cast("double") / sents.cast("double")
                + 11.8 * syl.cast("double") / w.cast("double")
                - 15.59
            )
            * 1000
        ).alias("grade_milli"),
    ).filter(w > 0)
    return (
        g.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "CAST((sum(grade_milli) - ((sum(grade_milli) % count(*) + count(*))"
                " % count(*))) DIV count(*) AS BIGINT)"
            ).alias("avg_grade_milli"),
            F.min("grade_milli").alias("min_grade_milli"),
            F.max("grade_milli").alias("max_grade_milli"),
        )
        .orderBy("source")
    )


@query(
    "x170_rrf_rank_fusion",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok WHERE term IN ('table', 'stream', 'window') GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                 CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
                   / CAST(count(*) AS BIGINT) AS avgdl
          FROM documents),
    bs AS (SELECT tf.doc_id,
                  CAST(sum(CAST(ln((nd - df + 0.5) / (df + 0.5) + 1.0)
                       * (tf * 2.2)
                       / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS score
           FROM tf JOIN df USING (term)
                   JOIN dl ON dl.doc_id = tf.doc_id
                   CROSS JOIN n
           GROUP BY tf.doc_id),
    bm AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
                    AS r
           FROM bs),
    ts AS (SELECT tf.doc_id,
                  CAST(sum(tf.tf * CAST(ln(CAST(nd AS DOUBLE) / df)
                                        AS DECIMAL(18,6))) AS DECIMAL(38,6))
                    AS score
           FROM tf JOIN df USING (term) CROSS JOIN n
           WHERE df < nd
           GROUP BY tf.doc_id),
    ti AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
                    AS r
           FROM ts),
    f AS (SELECT coalesce(bm.doc_id, ti.doc_id) AS doc_id,
                 CAST(coalesce(bm.r, 0) AS BIGINT) AS bm25_rank,
                 CAST(coalesce(ti.r, 0) AS BIGINT) AS tfidf_rank,
                 CAST(coalesce(1000000000 // (60 + bm.r), 0)
                      + coalesce(1000000000 // (60 + ti.r), 0) AS BIGINT)
                   AS rrf_ppb
          FROM bm FULL JOIN ti ON ti.doc_id = bm.doc_id)
    SELECT doc_id, bm25_rank, tfidf_rank, rrf_ppb,
           CAST(row_number() OVER (ORDER BY rrf_ppb DESC, doc_id) AS BIGINT)
             AS rank
    FROM f ORDER BY rank LIMIT 10
    """,
)
def x170_rrf_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the two retrieval rankings the registry
    already trusts — BM25 (x140) and tf-idf (x118) over the same 3-term
    query — the standard way production search (and RAG retrieval
    pipelines) combines lexically different scorers without calibrating
    their score scales: each list contributes 1/(60+rank), ranks only.
    The fused score is computed in EXACT integers (floor(1e9/(60+r)),
    `div` in Spark, `//` in DuckDB) so fusion cannot
    representation-diverge even though the underlying scores are
    decimal-quantized doubles. Docs absent from one list (tf-idf drops
    ubiquitous-term-only matches, rank reported as 0) simply contribute
    nothing — RRF's usual top-N truncation semantic. Plan: both
    rankings share ONE postings scan (the q-term tf table), each rank
    is a TakeOrdered-sized window, and the fusion is a full outer join
    of two |hits|-row frames — at 100 TB this consumes the x80
    inverted index like its parents."""
    d = load_parallel(spark, sf_dir, "documents")
    q_terms = ["table", "stream", "window"]
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        tok.filter(F.col("term").isin(q_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("nd")).crossJoin(
        dl.agg((F.sum("dl").cast("double")).alias("sdl"))
    ).select("nd", (F.col("sdl") / F.col("nd")).alias("avgdl"))
    bm_sc = (
        F.log((F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
    ).cast("decimal(18,6)")
    bs = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .select("doc_id", bm_sc.alias("sc"))
        .groupBy("doc_id")
        .agg(F.sum("sc").cast("decimal(38,6)").alias("score"))
    )
    from kafka_connect_spark.functions.skew import distributed_rank

    bm = distributed_rank(
        bs, [F.col("score").desc(), F.col("doc_id")], rank_name="r"
    ).select("doc_id", "r")
    ts = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .filter(F.col("df") < F.col("nd"))
        .select(
            "doc_id",
            (
                F.col("tf")
                * F.log(F.col("nd").cast("double") / F.col("df")).cast(
                    "decimal(18,6)"
                )
            ).alias("w"),
        )
        .groupBy("doc_id")
        .agg(F.sum("w").cast("decimal(38,6)").alias("score"))
    )
    ti = distributed_rank(
        ts, [F.col("score").desc(), F.col("doc_id")], rank_name="r"
    ).select("doc_id", "r")
    f = (
        bm.withColumnRenamed("r", "bm_r")
        .join(ti.withColumnRenamed("r", "ti_r"), "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce(F.col("bm_r"), F.lit(0)).alias("bm25_rank"),
            F.coalesce(F.col("ti_r"), F.lit(0)).alias("tfidf_rank"),
            (
                F.coalesce(F.expr("1000000000 div (60 + bm_r)"), F.lit(0))
                + F.coalesce(F.expr("1000000000 div (60 + ti_r)"), F.lit(0))
            ).alias("rrf_ppb"),
        )
    )
    # top-10 as sort-limit (TakeOrderedAndProject); the rank window then
    # runs over 10 rows only
    top = f.orderBy(F.col("rrf_ppb").desc(), "doc_id").limit(10)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("rrf_ppb").desc(), "doc_id"))
        .cast("long"),
    ).orderBy("rank")


@query(
    "x173_good_turing_unseen",
    oracle="""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS freq
          FROM tok GROUP BY 1, 2)
    SELECT source,
           CAST(sum(freq) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(sum(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) * 1000000
                // sum(freq) AS BIGINT) AS unseen_mass_ppm
    FROM c GROUP BY source ORDER BY source
    """,
)
def x173_good_turing_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-vocabulary mass per source: the probability
    that the NEXT token drawn from a source is a type never seen before,
    estimated by the singleton fraction f1/N (Good 1953) — the
    curation signal for 'is this source exhausted or still yielding new
    content', and the sanity bound for vocabulary-dependent ops (a
    source with unseen-mass 20% will blow up a frozen tokenizer's OOV
    rate). f2 rides along for the full Simple-GT smoothing. Exact ppm
    integers over one (source, term) wordcount — the same partial-agg
    shape as every frequency op here; nothing else shuffles."""
    d = load_parallel(spark, sf_dir, "documents")
    c = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        c.groupBy("source")
        .agg(
            F.sum("freq").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum((F.col("freq") == 1).cast("long")).alias("f1"),
            F.sum((F.col("freq") == 2).cast("long")).alias("f2"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab",
            "f1",
            "f2",
            F.expr("f1 * 1000000 div n_tokens").cast("long").alias(
                "unseen_mass_ppm"
            ),
        )
        .orderBy("source")
    )


@query(
    "x174_ks_length_distance",
    oracle="""
    WITH v AS (SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS side,
                      n_chars AS x
               FROM documents),
    n AS (SELECT CAST(sum(CASE WHEN side = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS na,
                 CAST(sum(CASE WHEN side = 'other' THEN 1 ELSE 0 END) AS BIGINT)
                   AS nb
          FROM v),
    cx AS (SELECT x,
                  CAST(sum(CASE WHEN side = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                    AS ca,
                  CAST(sum(CASE WHEN side = 'other' THEN 1 ELSE 0 END) AS BIGINT)
                    AS cb
           FROM v GROUP BY x),
    cum AS (SELECT x,
                   sum(ca) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS fa,
                   sum(cb) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS fb
            FROM cx),
    d AS (SELECT CAST(max(abs(fa * n.nb - fb * n.na)) AS BIGINT) AS d_scaled
          FROM cum, n)
    SELECT n.na, n.nb,
           CAST(d.d_scaled * 1000000 // (n.na * n.nb) AS BIGINT) AS ks_ppm,
           CAST(floor(1358000 * sqrt((n.na + n.nb)
                                     / CAST(n.na * n.nb AS DOUBLE)))
                AS BIGINT) AS crit_ppm_5pct,
           CAST(CASE WHEN d.d_scaled * 1000000 // (n.na * n.nb)
                          > floor(1358000 * sqrt((n.na + n.nb)
                                  / CAST(n.na * n.nb AS DOUBLE)))
                     THEN 1 ELSE 0 END AS BIGINT) AS reject_same_dist
    FROM d, n
    """,
)
def x174_ks_length_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the document-length
    distributions of English vs non-English docs — the distribution-shift
    test a curation pipeline runs when a filter tuned on one segment is
    applied to another (PSI, x-family, bins first; KS is the
    bin-free exact complement). The statistic is EXACT integers: at each
    distinct length x, |F_a - F_b| scales to |cumA * Nb - cumB * Na|, the
    max is one window chain, and ks_ppm floors through 1e6/(Na*Nb). The
    5% critical value 1.358*sqrt((Na+Nb)/(Na*Nb)) uses only IEEE sqrt
    (correctly rounded by the standard, so engine-identical — unlike ln,
    which we quantize elsewhere). Plan: one (length, side) agg, a single
    ordered window over |distinct lengths| rows, one broadcast of the
    2-row totals — the D statistic never touches row-level data after
    the first agg."""
    d = load_parallel(spark, sf_dir, "documents")
    v = d.select(
        F.when(F.col("lang") == "en", "en").otherwise("other").alias("side"),
        F.col("n_chars").alias("x"),
    )
    n = v.agg(
        F.sum((F.col("side") == "en").cast("long")).alias("na"),
        F.sum((F.col("side") == "other").cast("long")).alias("nb"),
    )
    cx = v.groupBy("x").agg(
        F.sum((F.col("side") == "en").cast("long")).alias("ca"),
        F.sum((F.col("side") == "other").cast("long")).alias("cb"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = cx.select(
        "x", F.sum("ca").over(w).alias("fa"), F.sum("cb").over(w).alias("fb")
    )
    dmax = cum.crossJoin(F.broadcast(n)).agg(
        F.max(F.abs(F.col("fa") * F.col("nb") - F.col("fb") * F.col("na"))).alias(
            "d_scaled"
        )
    )
    ks = F.expr("d_scaled * 1000000 div (na * nb)").cast("long")
    crit = F.floor(
        1358000
        * F.sqrt((F.col("na") + F.col("nb")) / (F.col("na") * F.col("nb")).cast("double"))
    ).cast("long")
    return (
        dmax.crossJoin(F.broadcast(n))
        .select(
            "na",
            "nb",
            ks.alias("ks_ppm"),
            crit.alias("crit_ppm_5pct"),
            (ks > crit).cast("long").alias("reject_same_dist"),
        )
    )


@query(
    "x176_token_gini",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY term),
    r AS (SELECT freq,
                 CAST(row_number() OVER (ORDER BY freq, term) AS BIGINT) AS rk
          FROM c),
    agg AS (SELECT CAST(count(*) AS BIGINT) AS v,
                   CAST(sum(freq) AS BIGINT) AS n,
                   CAST(sum(rk * freq) AS BIGINT) AS swf
            FROM r)
    SELECT v AS vocab, n AS n_tokens,
           CAST((2 * swf - (v + 1) * n) * 1000000 // (v * n) AS BIGINT)
             AS gini_ppm
    FROM agg
    """,
)
def x176_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the token frequency distribution — the
    single-number concentration audit next to x122's Zipf exponent: 0 =
    every type equally common, ->1 = a few stopwords carry all the mass.
    Tracked over time it flags template/boilerplate creep (Gini rises)
    before dedup metrics move. Computed by the exact rank formula
    G = (2*sum(i*f_i) - (V+1)*N) / (V*N) over frequencies ranked
    ascending (ties broken by term, identical in both engines), emitted
    as a floored ppm integer. Plan: wordcount agg, then NO per-term rank
    at all — the x182 count-of-counts decomposition: ranks over
    (freq, term) are contiguous within each distinct freq value, and
    sum(rk*freq) only needs each tie-group's rank SUM, which has the
    exact closed form freq * (c*C + c(c+1)/2) for a group of c terms
    with C lower-ranked terms. The only ordered window runs over
    |distinct freq values| rows (a power-law vocab has ~thousands), and
    every product rides decimal(38,0) — rk*freq in BIGINT overflows
    inside the 100 TB regime."""
    d = load_parallel(spark, sf_dir, "documents")
    c = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cc = c.groupBy("freq").agg(F.count(F.lit(1)).alias("cf"))
    wcum = Window.orderBy("freq").rowsBetween(Window.unboundedPreceding, -1)
    cum = cc.select(
        "freq", "cf", F.coalesce(F.sum("cf").over(wcum), F.lit(0)).alias("cb")
    )
    # DOUBLED rank-sum of a tie group: 2*(cf*cb + cf*(cf+1)/2) =
    # 2*cf*cb + cf*(cf+1) — carrying 2*swf keeps everything integral in
    # decimal(38,0), no fractional scale ever appears
    grp_rank_sum_2x = F.col("cf").cast("decimal(38,0)") * (
        2 * F.col("cb") + F.col("cf") + 1
    ).cast("decimal(38,0)")
    agg = cum.agg(
        F.sum("cf").cast("long").alias("v"),
        F.sum(F.col("freq").cast("decimal(38,0)") * F.col("cf"))
        .cast("long")
        .alias("n"),
        F.sum(F.col("freq").cast("decimal(38,0)") * grp_rank_sum_2x)
        .cast("decimal(38,0)")
        .alias("swf2"),
    )
    return agg.select(
        F.col("v").alias("vocab"),
        F.col("n").alias("n_tokens"),
        F.expr(
            "(swf2 - (cast(v as decimal(38,0)) + 1) * n) * 1000000"
            " div (cast(v as decimal(38,0)) * n)"
        )
        .cast("long")
        .alias("gini_ppm"),
    )


@query(
    "x180_retrieval_ndcg",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok WHERE term IN ('table', 'stream', 'window', 'join')
           GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM dl),
    s AS (SELECT tf.term, tf.doc_id,
                 least(tf.tf, 3) AS rel,
                 CAST(ln((nd - df + 0.5) / (df + 0.5) + 1.0)
                      * (tf * 2.2)
                      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                      AS DECIMAL(18,6)) AS sc
          FROM tf JOIN df USING (term)
                  JOIN dl ON dl.doc_id = tf.doc_id
                  CROSS JOIN n),
    ranked AS (SELECT term, doc_id, rel, sc,
                      row_number() OVER (PARTITION BY term
                                         ORDER BY sc DESC, doc_id) AS rnk
               FROM s),
    ideal AS (SELECT term, rel,
                     row_number() OVER (PARTITION BY term
                                        ORDER BY rel DESC, doc_id) AS irnk
              FROM s),
    dcg AS (SELECT term,
                   CAST(sum(CAST(((1 << rel) - 1) / ln(rnk + 1.0)
                        AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS dcg10
            FROM ranked WHERE rnk <= 10 GROUP BY term),
    idcg AS (SELECT term,
                    CAST(sum(CAST(((1 << rel) - 1) / ln(irnk + 1.0)
                         AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS idcg10
             FROM ideal WHERE irnk <= 10 GROUP BY term),
    mrr AS (SELECT term, CAST(min(rnk) AS BIGINT) AS first_rel_rank
            FROM ranked WHERE rel >= 2 GROUP BY term)
    SELECT d.term,
           {dcg_ratio} AS ndcg10,
           COALESCE(CAST(1000000 // first_rel_rank AS BIGINT), 0) AS mrr_ppm,
           CAST((SELECT count(*) FROM s WHERE s.term = d.term) AS BIGINT)
             AS n_relevant
    FROM dcg d JOIN idcg USING (term) LEFT JOIN mrr USING (term)
    ORDER BY term
    """.format(
        dcg_ratio=dround_sql("CAST(dcg10 AS DOUBLE) / CAST(idcg10 AS DOUBLE)", 6)
    ),
)
def x180_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the BM25 run (x140's scorer) against
    graded relevance: nDCG@10 and MRR per query — the eval loop a RAG /
    search pipeline runs after every index or scorer change. Relevance
    grade = min(tf, 3) (graded by term saturation, the standard poor-man's
    qrels when no human labels exist); DCG uses the (2^rel - 1)/ln(rank+1)
    gain form with each term's contribution quantized to DECIMAL(18,6)
    before the exact sum (the x140 discipline), so both engines rank and
    sum identically; MRR counts the first rank with grade >= 2 in exact
    ppm. Plan shape at 100 TB: only query-term postings leave the token
    explosion (4 terms here), doc-length and idf ride broadcasts, both
    rank windows partition BY TERM over <= |postings(term)| rows — the
    eval is embarrassingly parallel across queries (measured: the
    retrieval_eval_scaled probe in docs/SCALING.md grows the corpus AND
    the query set together), and a real qrels table would replace the
    tf-grade join with a broadcast."""
    d = load_parallel(spark, sf_dir, "documents")
    return retrieval_ndcg(d, ["table", "stream", "window", "join"])


def retrieval_ndcg(d: DataFrame, q_terms: list) -> DataFrame:
    """x180's scoring body over an arbitrary documents frame and query-term
    set — shared by the registry entry (fixed 4-term query set) and the
    scale probe (query set grows with the scaled corpus)."""
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        tok.filter(F.col("term").isin(q_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = dl.agg(
        F.count(F.lit(1)).alias("nd"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    sc = (
        F.log((F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
    ).cast("decimal(18,6)")
    s = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "doc_id",
            F.least("tf", F.lit(3)).alias("rel"),
            sc.alias("sc"),
        )
    )
    # r15 optimization (guide §2.4): dcg/idcg/mrr/n_relevant used to be FOUR
    # aggregation branches joined back on term — each branch re-executed the
    # whole scored-postings pipeline (token explode + tf/dl aggs + window),
    # so the corpus was scanned ~4x per run. Both rank windows share the
    # term partitioning (one Exchange, two Sorts), and all four outputs
    # collapse into ONE conditional aggregation on that same key — the
    # summand sets, decimal types, and NULL semantics (no rel>=2 row =>
    # NULL first_rel_rank => mrr 0, exactly the old left join) are
    # unchanged, so the result is identical.
    wt = Window.partitionBy("term")
    both = s.select(
        "term",
        "rel",
        F.row_number()
        .over(wt.orderBy(F.col("sc").desc(), "doc_id"))
        .alias("rnk"),
        F.row_number()
        .over(wt.orderBy(F.col("rel").desc(), "doc_id"))
        .alias("irnk"),
    )
    gain = lambda rel, rnk: (  # noqa: E731 — one shared gain expression
        # (2^rel - 1) for rel in 1..3 as an exact int lookup (F.shiftleft
        # only takes a literal shift; the oracle's (1 << rel) matches)
        ((F.element_at(F.array(F.lit(1), F.lit(3), F.lit(7)), rel.cast("int")))
         / F.log(rnk + 1.0))
        .cast("decimal(18,6)")
    )
    agg = both.groupBy("term").agg(
        F.sum(F.when(F.col("rnk") <= 10, gain(F.col("rel"), F.col("rnk"))))
        .cast("decimal(18,6)")
        .alias("dcg10"),
        F.sum(F.when(F.col("irnk") <= 10, gain(F.col("rel"), F.col("irnk"))))
        .cast("decimal(18,6)")
        .alias("idcg10"),
        F.min(F.when(F.col("rel") >= 2, F.col("rnk")))
        .cast("long")
        .alias("first_rel_rank"),
        F.count(F.lit(1)).alias("n_relevant"),
    )
    return (
        agg.select(
            "term",
            dround(
                F.col("dcg10").cast("double") / F.col("idcg10").cast("double"), 6
            ).alias("ndcg10"),
            F.coalesce(
                F.expr("1000000 div first_rel_rank"), F.lit(0)
            ).cast("long").alias("mrr_ppm"),
            F.col("n_relevant").cast("long"),
        )
        .orderBy("term")
    )


@query(
    "x191_vocab_richness",
    oracle="""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS freq
          FROM tok GROUP BY 1, 2)
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(freq) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(sum(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           CAST(count(*)
                + CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                  * (sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) - 1)
                  // (2 * (sum(CASE WHEN freq = 2 THEN 1 ELSE 0 END) + 1))
                AS BIGINT) AS chao1,
           CAST(sum(CASE WHEN freq <= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS v_rare,
           CAST(sum(CASE WHEN freq <= 10 THEN freq ELSE 0 END) AS BIGINT)
             AS n_rare
    FROM c GROUP BY source ORDER BY source
    """,
)
def x191_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary richness: the bias-corrected Chao1 estimate
    of TRUE vocabulary size, V + f1*(f1-1)/(2*(f2+1)) — how many types
    the corpus would reveal with unbounded sampling — plus the rare-type
    mass (freq <= 10) that the ACE family conditions on. The capture-
    recapture complement to x173's Good-Turing UNSEEN-MASS estimate:
    Good-Turing prices the next token being novel, Chao1 sizes the
    whole undiscovered tail — together they tell a tokenizer/vocab
    planner whether a source is near lexical saturation or still
    yielding types linearly (scrape more vs done). Everything derives
    from the frequency-of-frequencies, so the plan is the x173 shape:
    one (source, term) hash agg, one per-source conditional-sum agg —
    integer-exact, no windows at all."""
    d = load_parallel(spark, sf_dir, "documents")
    c = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    f1 = F.sum((F.col("freq") == 1).cast("long"))
    f2 = F.sum((F.col("freq") == 2).cast("long"))
    return (
        c.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            F.sum("freq").cast("long").alias("n_tokens"),
            f1.alias("f1"),
            f2.alias("f2"),
            (
                F.count(F.lit(1))
                # f1*(f1-1) overflows BIGINT past f1 ~ 3e9 singletons —
                # decimal(38,0) from the first multiply (x167 lesson)
                + F.expr(
                    "cast(sum(cast(freq = 1 as long)) as decimal(38,0))"
                    " * (sum(cast(freq = 1 as long)) - 1)"
                    " div (2 * (sum(cast(freq = 2 as long)) + 1))"
                )
            )
            .cast("long")
            .alias("chao1"),
            F.sum((F.col("freq") <= 10).cast("long")).alias("v_rare"),
            F.sum(F.when(F.col("freq") <= 10, F.col("freq")).otherwise(0))
            .cast("long")
            .alias("n_rare"),
        )
        .orderBy("source")
    )


@query(
    "x192_vocab_coverage_curve",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
                 FROM documents),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
          FROM tok GROUP BY term),
    r AS (SELECT freq,
                 row_number() OVER (ORDER BY freq DESC, term) AS rn
          FROM c),
    n AS (SELECT CAST(sum(freq) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS vocab FROM c),
    k AS (SELECT unnest([100, 1000, 10000]) AS k)
    SELECT k.k AS k,
           CAST(least(k.k, n.vocab) AS BIGINT) AS kept_types,
           CAST(coalesce(sum(CASE WHEN r.rn <= k.k THEN r.freq END), 0)
                AS BIGINT) AS covered_tokens,
           CAST(max(n.total) AS BIGINT) AS total_tokens,
           CAST(coalesce(sum(CASE WHEN r.rn <= k.k THEN r.freq END), 0)
                * 1000000 // max(n.total) AS BIGINT) AS coverage_ppm
    FROM k CROSS JOIN n CROSS JOIN r
    GROUP BY k.k, n.vocab ORDER BY k.k
    """,
)
def x192_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of total token mass the
    top-K most frequent types carry, at K = 100 / 1k / 10k — THE
    tokenizer-budget planning number (a vocab of K covers this much of
    the stream; the remainder falls to subword/byte fallback, which
    multiplies sequence length). Zipf (x122) fits the shape; this emits
    the operational integrals. Scale shape: NO per-term rank — top-K
    membership by (freq desc, term) splits only inside one tie group, so
    the covered mass is cum_mass_before + (K - types_before) * freq for
    the straddling frequency value (tie-break-invariant: any K types of
    equal freq carry the same mass), all on the count-of-counts table
    with its |distinct freq| cumsum. The oracle ranks every term
    naively, proving the closed form."""
    d = load_parallel(spark, sf_dir, "documents")
    c = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cc = c.groupBy("freq").agg(F.count(F.lit(1)).alias("cf"))
    wcum = (
        Window.orderBy(F.col("freq").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = cc.select(
        "freq",
        "cf",
        F.coalesce(F.sum("cf").over(wcum), F.lit(0)).alias("tb"),
        F.coalesce(
            F.sum(F.col("freq").cast("decimal(38,0)") * F.col("cf")).over(
                wcum
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("mb"),
    )
    tot = cc.agg(
        F.sum(F.col("freq").cast("decimal(38,0)") * F.col("cf"))
        .cast("decimal(38,0)")
        .alias("total"),
        F.sum("cf").cast("long").alias("vocab"),
    )
    ks = spark.createDataFrame([(100,), (1000,), (10000,)], ["k"])
    j = (
        cum.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        # the group straddling K, or fully-covered groups
        .withColumn(
            "cov_grp",
            F.when(
                F.col("tb") + F.col("cf") <= F.col("k"),
                F.col("freq").cast("decimal(38,0)") * F.col("cf"),
            ).when(
                F.col("tb") < F.col("k"),
                F.col("freq").cast("decimal(38,0)")
                * (F.col("k") - F.col("tb")),
            ).otherwise(F.lit(0).cast("decimal(38,0)")),
        )
    )
    return (
        j.groupBy("k")
        .agg(
            F.least(F.max("k").cast("long"), F.max("vocab")).alias(
                "kept_types"
            ),
            F.sum("cov_grp").cast("long").alias("covered_tokens"),
            F.max("total").cast("long").alias("total_tokens"),
            F.expr(
                "cast(sum(cov_grp) * 1000000 div max(total) as bigint)"
            ).alias("coverage_ppm"),
        )
        .orderBy("k")
        .select(
            F.col("k").cast("long"),
            "kept_types",
            "covered_tokens",
            "total_tokens",
            "coverage_ppm",
        )
    )


@query(
    "x193_wasserstein_length_shift",
    oracle="""
    WITH src AS (SELECT source, n_chars FROM documents),
    cnt AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
            FROM src GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
    pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                     a.n AS na, b.n AS nb
              FROM tot a, tot b WHERE a.source < b.source),
    sup AS (SELECT DISTINCT n_chars FROM src),
    grid AS (SELECT p.src_a, p.src_b, p.na, p.nb, s.n_chars,
                    lead(s.n_chars) OVER (PARTITION BY p.src_a, p.src_b
                                          ORDER BY s.n_chars) AS nxt,
                    CAST(coalesce(sum(ca.c) OVER (
                        PARTITION BY p.src_a, p.src_b
                        ORDER BY s.n_chars), 0) AS HUGEINT) AS cum_a,
                    CAST(coalesce(sum(cb.c) OVER (
                        PARTITION BY p.src_a, p.src_b
                        ORDER BY s.n_chars), 0) AS HUGEINT) AS cum_b
             FROM pairs p
             CROSS JOIN sup s
             LEFT JOIN cnt ca ON ca.source = p.src_a
                             AND ca.n_chars = s.n_chars
             LEFT JOIN cnt cb ON cb.source = p.src_b
                             AND cb.n_chars = s.n_chars)
    SELECT src_a, src_b,
           CAST(sum(abs(cum_a * nb - cum_b * na) * (nxt - n_chars)) * 1000
                // (CAST(max(na) AS HUGEINT) * max(nb)) AS BIGINT)
             AS emd_millichars
    FROM grid WHERE nxt IS NOT NULL
    GROUP BY src_a, src_b ORDER BY src_a, src_b
    """,
)
def x193_wasserstein_length_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between every
    source pair's document-length distributions, in milli-characters —
    the magnitude-aware companion to x174's KS statistic (KS is the max
    CDF gap and saturates; W1 integrates |CDF_a - CDF_b| over the
    support, so it keeps responding as a drifted source drifts further —
    the drift number a mixture rebalancer actually budgets with).
    Integer-exact: with counts over the merged length support,
    |cum_a * n_b - cum_b * n_a| * gap summed then floor-divided by
    n_a*n_b — no floats anywhere. Scale shape: all windows partition by
    source pair over the |distinct n_chars| support table (value-domain
    sized, the x174 contract); the corpus is touched once by the
    (source, n_chars) hash agg. Products ride decimal(38,0)."""
    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    pairs = (
        tot.alias("a")
        .crossJoin(tot.alias("b"))
        .filter(F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
    )
    sup = d.select("n_chars").distinct()
    w = Window.partitionBy("src_a", "src_b").orderBy("n_chars")
    grid = (
        pairs.crossJoin(sup)
        .join(
            cnt.select(
                F.col("source").alias("src_a"),
                "n_chars",
                F.col("c").alias("ca"),
            ),
            ["src_a", "n_chars"],
            "left",
        )
        .join(
            cnt.select(
                F.col("source").alias("src_b"),
                "n_chars",
                F.col("c").alias("cb"),
            ),
            ["src_b", "n_chars"],
            "left",
        )
        .select(
            "src_a",
            "src_b",
            "na",
            "nb",
            "n_chars",
            F.lead("n_chars").over(w).alias("nxt"),
            F.coalesce(
                F.sum("ca").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
                F.lit(0),
            ).alias("cum_a"),
            F.coalesce(
                F.sum("cb").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
                F.lit(0),
            ).alias("cum_b"),
        )
        .filter(F.col("nxt").isNotNull())
    )
    return (
        grid.groupBy("src_a", "src_b")
        .agg(
            F.expr(
                "cast(sum({t}) * 1000"
                " div (cast(max(na) as decimal(38,0)) * max(nb)) as bigint)".format(
                    t="abs(cast(cum_a as decimal(38,0)) * nb"
                    " - cast(cum_b as decimal(38,0)) * na)"
                    " * cast(nxt - n_chars as decimal(38,0))"
                )
            ).alias("emd_millichars")
        )
        .orderBy("src_a", "src_b")
    )


@query(
    "x196_cliffs_delta_length",
    oracle="""
    WITH cnt AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
                 FROM documents GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
    pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                     a.n AS na, b.n AS nb
              FROM tot a, tot b WHERE a.source < b.source),
    sup AS (SELECT DISTINCT n_chars FROM documents),
    grid AS (SELECT p.src_a, p.src_b, p.na, p.nb, s.n_chars,
                    CAST(coalesce(ca.c, 0) AS HUGEINT) AS ca,
                    CAST(coalesce(cb.c, 0) AS HUGEINT) AS cb,
                    CAST(coalesce(sum(cb.c) OVER (
                        PARTITION BY p.src_a, p.src_b
                        ORDER BY s.n_chars), 0) AS HUGEINT) AS cum_b
             FROM pairs p
             CROSS JOIN sup s
             LEFT JOIN cnt ca ON ca.source = p.src_a
                             AND ca.n_chars = s.n_chars
             LEFT JOIN cnt cb ON cb.source = p.src_b
                             AND cb.n_chars = s.n_chars)
    SELECT src_a, src_b,
           CAST(sum(ca * (cum_b - cb)) AS BIGINT) AS gt_pairs,
           CAST(sum(ca * (nb - cum_b)) AS BIGINT) AS lt_pairs,
           CAST((sum(ca * (cum_b - cb)) - sum(ca * (nb - cum_b))) * 1000000
                // (CAST(max(na) AS HUGEINT) * max(nb)) AS BIGINT)
             AS cliffs_delta_ppm
    FROM grid GROUP BY src_a, src_b ORDER BY src_a, src_b
    """,
)
def x196_cliffs_delta_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta effect size between every source pair's length
    distributions: P(X > Y) - P(X < Y) over all cross pairs, exact —
    the nonparametric effect-size number that belongs NEXT to a
    significance test (x174's KS says the distributions differ; delta
    says by HOW MUCH in rank terms, robust to outliers and sample-size
    inflation, the standard companion to Mann-Whitney). All integer:
    the dominance counts collapse onto the merged length support —
    gt += c_a(v) * cum_b(< v) per support value — so nothing bigger
    than |distinct n_chars| is ever windowed (the x193 grid, reused),
    and the corpus is touched once by the (source, n_chars) hash agg.
    Emitted as floored ppm of n_a * n_b with decimal(38,0) products."""
    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    pairs = (
        tot.alias("a")
        .crossJoin(tot.alias("b"))
        .filter(F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
    )
    sup = d.select("n_chars").distinct()
    w = Window.partitionBy("src_a", "src_b").orderBy("n_chars")
    grid = (
        pairs.crossJoin(sup)
        .join(
            cnt.select(
                F.col("source").alias("src_a"),
                "n_chars",
                F.col("c").alias("ca_"),
            ),
            ["src_a", "n_chars"],
            "left",
        )
        .join(
            cnt.select(
                F.col("source").alias("src_b"),
                "n_chars",
                F.col("c").alias("cb_"),
            ),
            ["src_b", "n_chars"],
            "left",
        )
        .select(
            "src_a",
            "src_b",
            "na",
            "nb",
            F.coalesce("ca_", F.lit(0)).cast("decimal(38,0)").alias("ca"),
            F.coalesce("cb_", F.lit(0)).cast("decimal(38,0)").alias("cb"),
            F.coalesce(
                F.sum("cb_").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
                F.lit(0),
            )
            .cast("decimal(38,0)")
            .alias("cum_b"),
        )
    )
    return (
        grid.groupBy("src_a", "src_b")
        .agg(
            F.sum(F.col("ca") * (F.col("cum_b") - F.col("cb")))
            .cast("long")
            .alias("gt_pairs"),
            F.sum(F.col("ca") * (F.col("nb") - F.col("cum_b")))
            .cast("long")
            .alias("lt_pairs"),
            F.expr(
                "cast((sum(ca * (cum_b - cb)) - sum(ca * (nb - cum_b)))"
                " * 1000000"
                " div (cast(max(na) as decimal(38,0)) * max(nb)) as bigint)"
            ).alias("cliffs_delta_ppm"),
        )
        .orderBy("src_a", "src_b")
    )


@query(
    "x197_length_qq_profile",
    oracle="""
    WITH cnt AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
                 FROM documents GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
    cum AS (SELECT source, n_chars,
                   CAST(sum(c) OVER (PARTITION BY source
                                     ORDER BY n_chars) AS BIGINT) AS cm
            FROM cnt),
    dec AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS d),
    srcq AS (SELECT c.source, dec.d,
                    CAST(min(CASE WHEN c.cm * 10 >= dec.d * t.n
                                  THEN c.n_chars END) AS BIGINT) AS src_q
             FROM cum c JOIN tot t ON c.source = t.source
             CROSS JOIN dec GROUP BY 1, 2),
    gcnt AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS c
             FROM documents GROUP BY 1),
    gtot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM gcnt),
    gcum AS (SELECT n_chars,
                    CAST(sum(c) OVER (ORDER BY n_chars) AS BIGINT) AS cm
             FROM gcnt),
    gq AS (SELECT dec.d,
                  CAST(min(CASE WHEN g.cm * 10 >= dec.d * t.n
                                THEN g.n_chars END) AS BIGINT) AS corpus_q
           FROM gcum g CROSS JOIN gtot t CROSS JOIN dec GROUP BY 1)
    SELECT s.source, CAST(s.d AS BIGINT) AS decile, s.src_q, g.corpus_q,
           s.src_q - g.corpus_q AS shift_chars
    FROM srcq s JOIN gq g ON s.d = g.d
    ORDER BY s.source, s.d
    """,
)
def x197_length_qq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-quantile profile of each source's length distribution
    against the whole corpus: the exact d1..d9 deciles side by side with
    the corpus deciles and their signed shift — WHERE a drifted source
    differs (short-form head vs long-tail body), which the one-number
    summaries (x174 KS, x193 W1, x196 delta) deliberately compress away.
    Exact nearest-rank deciles via the value-domain idiom: per-source
    cumsums partition by source over |distinct n_chars| rows, the corpus
    cumsum is the same domain unpartitioned, and each decile is a min
    over qualifying support values — no per-doc ranks anywhere. All
    integer (cm * 10 >= d * n avoids division entirely)."""
    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    wsrc = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cnt.select(
        "source", "n_chars", F.sum("c").over(wsrc).alias("cm")
    )
    dec = spark.createDataFrame([(i,) for i in range(1, 10)], ["d"])
    srcq = (
        cum.join(tot, "source")
        .crossJoin(F.broadcast(dec))
        .groupBy("source", "d")
        .agg(
            F.min(
                F.when(
                    F.col("cm") * 10 >= F.col("d") * F.col("n"),
                    F.col("n_chars"),
                )
            )
            .cast("long")
            .alias("src_q")
        )
    )
    gcnt = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    gtot = gcnt.agg(F.sum("c").alias("n"))
    wg = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    gcum = gcnt.select("n_chars", F.sum("c").over(wg).alias("cm"))
    gq = (
        gcum.crossJoin(F.broadcast(gtot))
        .crossJoin(F.broadcast(dec))
        .groupBy("d")
        .agg(
            F.min(
                F.when(
                    F.col("cm") * 10 >= F.col("d") * F.col("n"),
                    F.col("n_chars"),
                )
            )
            .cast("long")
            .alias("corpus_q")
        )
    )
    return (
        srcq.join(F.broadcast(gq), "d")
        .select(
            "source",
            F.col("d").cast("long").alias("decile"),
            "src_q",
            "corpus_q",
            (F.col("src_q") - F.col("corpus_q")).alias("shift_chars"),
        )
        .orderBy("source", "decile")
    )


@query(
    "x198_vocab_overlap",
    oracle="""
    WITH c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS f
               FROM (SELECT source, unnest(string_split(text, ' ')) AS term
                     FROM documents)
               GROUP BY 1, 2),
    v AS (SELECT source, CAST(count(*) AS BIGINT) AS vsize,
                 CAST(sum(f) AS BIGINT) AS mass
          FROM c GROUP BY 1),
    i AS (SELECT a.source AS src_a, b.source AS src_b,
                 CAST(count(*) AS BIGINT) AS inter,
                 CAST(sum(least(a.f, b.f)) AS BIGINT) AS min_mass
          FROM c a JOIN c b ON a.term = b.term AND a.source < b.source
          GROUP BY 1, 2)
    SELECT i.src_a, i.src_b, i.inter,
           va.vsize + vb.vsize - i.inter AS union_size,
           CAST(i.inter * 1000000 // (va.vsize + vb.vsize - i.inter)
                AS BIGINT) AS jaccard_ppm,
           CAST(CAST(i.min_mass AS HUGEINT) * 1000000
                // (va.mass + vb.mass - i.min_mass) AS BIGINT)
             AS ruzicka_ppm
    FROM i JOIN v va ON i.src_a = va.source
           JOIN v vb ON i.src_b = vb.source
    ORDER BY i.src_a, i.src_b
    """,
)
def x198_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary overlap between every source pair: set Jaccard over
    the type sets AND the frequency-weighted Ruzicka similarity
    (sum min(f_a, f_b) / sum max(f_a, f_b)) — the lexical-redundancy
    matrix a mixture planner reads before weighting sources (x115's JS
    divergence measures distributional SHAPE; this measures shared
    SUBSTANCE — two sources can share every word yet use them at
    different rates, and vice versa). Scale shape: the only join is the
    term-keyed intersection of the per-source vocab tables (bucketed by
    term, vocab-sized — never the corpus), and Ruzicka's denominator
    needs no union join at all: sum max = mass_a + mass_b - sum min,
    an identity over the union. Integer-exact ppm; the min-mass product
    rides decimal(38,0)."""
    d = load_parallel(spark, sf_dir, "documents")
    c = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    v = c.groupBy("source").agg(
        F.count(F.lit(1)).alias("vsize"), F.sum("f").alias("mass")
    )
    i = (
        c.alias("a")
        .join(
            c.alias("b"),
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.sum(F.least(F.col("a.f"), F.col("b.f"))).alias("min_mass"),
        )
    )
    va = v.select(
        F.col("source").alias("src_a"),
        F.col("vsize").alias("va_size"),
        F.col("mass").alias("va_mass"),
    )
    vb = v.select(
        F.col("source").alias("src_b"),
        F.col("vsize").alias("vb_size"),
        F.col("mass").alias("vb_mass"),
    )
    return (
        i.join(F.broadcast(va), "src_a")
        .join(F.broadcast(vb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("inter").cast("long"),
            (F.col("va_size") + F.col("vb_size") - F.col("inter"))
            .cast("long")
            .alias("union_size"),
            F.expr(
                "cast(inter * 1000000 div (va_size + vb_size - inter)"
                " as bigint)"
            ).alias("jaccard_ppm"),
            F.expr(
                "cast(cast(min_mass as decimal(38,0)) * 1000000"
                " div (va_mass + vb_mass - min_mass) as bigint)"
            ).alias("ruzicka_ppm"),
        )
        .orderBy("src_a", "src_b")
    )


@query(
    "x199_entropy_rate",
    oracle=f"""
    WITH toks AS (SELECT source, string_split(text, ' ') AS t
                  FROM documents),
    uni AS (SELECT source, unnest(t) AS w FROM toks),
    uc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS cy
           FROM uni GROUP BY 1, 2),
    u1 AS (SELECT source, CAST(sum(cy) AS BIGINT) AS n1,
                  CAST(sum(cy * CAST(ln(cy) AS DECIMAL(28,6)))
                       AS DECIMAL(38,6)) AS slc
           FROM uc GROUP BY source),
    big AS (SELECT source,
                   unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))])
                     AS bg,
                   unnest([t[i] for i in range(1, len(t))]) AS w1
            FROM toks WHERE len(t) >= 2),
    bc AS (SELECT source, bg, w1, CAST(count(*) AS BIGINT) AS cxy
           FROM big GROUP BY 1, 2, 3),
    pc AS (SELECT source, w1, CAST(sum(cxy) AS BIGINT) AS cx
           FROM bc GROUP BY 1, 2),
    b1 AS (SELECT bc.source, CAST(sum(bc.cxy) AS BIGINT) AS n2,
                  CAST(sum(bc.cxy *
                       CAST(ln(CAST(pc.cx AS DOUBLE) / bc.cxy)
                            AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS sh
           FROM bc JOIN pc ON bc.source = pc.source AND bc.w1 = pc.w1
           GROUP BY bc.source)
    SELECT u1.source, b1.n2 AS n_bigrams,
           {dround_sql("ln(u1.n1) - CAST(u1.slc AS DOUBLE) / u1.n1", 6)}
             AS h_uni,
           {dround_sql("CAST(b1.sh AS DOUBLE) / b1.n2", 6)} AS h_cond,
           {dround_sql(
               "(ln(u1.n1) - CAST(u1.slc AS DOUBLE) / u1.n1)"
               " - CAST(b1.sh AS DOUBLE) / b1.n2", 6)} AS info_gain
    FROM u1 JOIN b1 ON u1.source = b1.source
    ORDER BY u1.source
    """,
)
def x199_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token entropy vs bigram conditional entropy (entropy
    RATE), in nats: H(Y) says how diverse a source's vocabulary is;
    H(Y|X) says how PREDICTABLE the next token is given the current one;
    their gap (the information the current token carries about the next)
    is the sequence-level templatedness signal — boilerplate-heavy or
    machine-generated sources show a large gap even when their unigram
    entropy looks healthy (x156/x124 measure the unigram side only, x54
    scores individual DOCS by bigram surprise; this profiles SOURCES).
    Exactness discipline: every ln runs on exact integer counts (or
    their exact ratio), quantizes to DECIMAL(28,6), multiplies by the
    exact count and sums as DECIMAL(38,6) — order-independent — with ONE
    double division per output, rounded once (the x183/x124 rule). Plan:
    bigrams as a JVM higher-order transform, counts and the prefix join
    all hash on (source, bigram/prefix) with map-side partials; nothing
    wider than the bigram vocab shuffles."""
    d = load_parallel(spark, sf_dir, "documents")
    t = F.split("text", " ")
    uni = d.select("source", F.explode(t).alias("w"))
    uc = uni.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cy"))
    u1 = uc.groupBy("source").agg(
        F.sum("cy").alias("n1"),
        F.sum(
            (
                F.col("cy")
                * F.log(F.col("cy").cast("double")).cast("decimal(28,6)")
            ).cast("decimal(38,6)")
        )
        .cast("decimal(38,6)")
        .alias("slc"),
    )
    big = (
        d.select("source", t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 2),
                    lambda i: F.struct(
                        F.concat(
                            F.col("t")[i], F.lit(" "), F.col("t")[i + 1]
                        ).alias("bg"),
                        F.col("t")[i].alias("w1"),
                    ),
                )
            ).alias("p"),
        )
        .select("source", F.col("p.bg").alias("bg"), F.col("p.w1").alias("w1"))
    )
    bc = big.groupBy("source", "bg", "w1").agg(
        F.count(F.lit(1)).alias("cxy")
    )
    pc = bc.groupBy("source", "w1").agg(F.sum("cxy").alias("cx"))
    b1 = (
        bc.join(pc, ["source", "w1"])
        .groupBy("source")
        .agg(
            F.sum("cxy").alias("n2"),
            F.sum(
                (
                    F.col("cxy")
                    * F.log(
                        F.col("cx").cast("double") / F.col("cxy")
                    ).cast("decimal(28,6)")
                ).cast("decimal(38,6)")
            )
            .cast("decimal(38,6)")
            .alias("sh"),
        )
    )
    h_uni = F.log(F.col("n1").cast("double")) - F.col("slc").cast(
        "double"
    ) / F.col("n1")
    h_cond = F.col("sh").cast("double") / F.col("n2")
    return (
        u1.join(b1, "source")
        .select(
            "source",
            F.col("n2").cast("long").alias("n_bigrams"),
            dround(h_uni, 6).alias("h_uni"),
            dround(h_cond, 6).alias("h_cond"),
            dround(h_uni - h_cond, 6).alias("info_gain"),
        )
        .orderBy("source")
    )


@query(
    "x206_source_jsd",
    oracle=f"""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    uc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS a
           FROM tok GROUP BY 1, 2),
    cw AS (SELECT w, CAST(sum(a) AS BIGINT) AS b FROM uc GROUP BY w),
    ns AS (SELECT source, CAST(sum(a) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS vocab
           FROM uc GROUP BY source),
    nt AS (SELECT CAST(sum(a) AS BIGINT) AS nn FROM uc),
    terms AS (SELECT uc.source,
                     CAST(sum(uc.a * CAST(ln(
                          CAST(2 * CAST(uc.a AS HUGEINT) * nt.nn AS DOUBLE) /
                          CAST(CAST(uc.a AS HUGEINT) * nt.nn
                               + CAST(cw.b AS HUGEINT) * ns.n AS DOUBLE))
                          AS DECIMAL(28,6)))
                       AS DECIMAL(38,6)) AS sa,
                     CAST(sum(cw.b * CAST(ln(
                          CAST(2 * CAST(cw.b AS HUGEINT) * ns.n AS DOUBLE) /
                          CAST(CAST(uc.a AS HUGEINT) * nt.nn
                               + CAST(cw.b AS HUGEINT) * ns.n AS DOUBLE))
                          AS DECIMAL(28,6)))
                       AS DECIMAL(38,6)) AS sb_in,
                     CAST(sum(cw.b) AS BIGINT) AS b_in
              FROM uc JOIN cw ON uc.w = cw.w
                      JOIN ns ON uc.source = ns.source
                      CROSS JOIN nt
              GROUP BY uc.source)
    SELECT ns.source, ns.n AS n_tokens, ns.vocab,
           {dround_sql(
               "0.5 * (CAST(terms.sa AS DOUBLE) / ns.n"
               " + (CAST(terms.sb_in AS DOUBLE)"
               "    + (nt.nn - terms.b_in)"
               "      * CAST(CAST(ln(2.0) AS DECIMAL(28,6)) AS DOUBLE))"
               "   / nt.nn)", 6)} AS jsd
    FROM ns JOIN terms ON ns.source = terms.source CROSS JOIN nt
    ORDER BY ns.source
    """,
)
def x206_source_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    from the whole-corpus distribution — the bounded, symmetric
    drift-from-corpus ranking (x183's MI scores the source/term
    ASSOCIATION structure, x198 the vocab SET overlap; JSD measures how
    far the probability MASS has shifted, the quantity data-mixing and
    domain-upsampling decisions read). Closed over exact integers: with
    a = count(w in s), n = |s|, b = count(w in corpus), N = |corpus|,
    every log-ratio P/M and Q/M reduces to 2aN/(aN+bn) and 2bn/(aN+bn)
    — exact integer ratios — quantized to DECIMAL(28,6) (the x199 ln
    discipline), weighted by exact counts into DECIMAL(38,6) sums. The
    corpus-side KL's terms for words ABSENT from the source collapse to
    (N - sum_in b) * ln 2 in closed form, so the join only ever touches
    the source's own vocabulary. One double expression per source,
    rounded once. Plan: (source, word) and word hash aggs, a
    vocab-sized broadcast-ish join, |sources| output rows; the corpus
    is tokenized exactly once."""
    d = load_parallel(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    uc = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("a"))
    cw = uc.groupBy("w").agg(F.sum("a").alias("b"))
    ns = uc.groupBy("source").agg(
        F.sum("a").alias("n"), F.count(F.lit(1)).alias("vocab")
    )
    nt = uc.agg(F.sum("a").alias("nn"))
    j = (
        uc.join(cw, "w")
        .join(F.broadcast(ns.select("source", "n")), "source")
        .crossJoin(F.broadcast(nt))
    )
    # exact integer products ride decimal(38,0) (HUGEINT in the oracle),
    # then ONE double cast each side of the division — bare `2.0 * ...`
    # would run under DECIMAL literal semantics in DuckDB and diverge
    lnq = lambda expr: F.expr(f"CAST(ln({expr}) AS DECIMAL(28,6))")  # noqa: E731
    den = (
        "CAST(CAST(a AS DECIMAL(38,0)) * nn"
        " + CAST(b AS DECIMAL(38,0)) * n AS DOUBLE)"
    )
    terms = j.groupBy("source").agg(
        F.sum(
            F.col("a")
            * lnq(f"CAST(2 * CAST(a AS DECIMAL(38,0)) * nn AS DOUBLE) / {den}")
        )
        .cast("decimal(38,6)")
        .alias("sa"),
        F.sum(
            F.col("b")
            * lnq(f"CAST(2 * CAST(b AS DECIMAL(38,0)) * n AS DOUBLE) / {den}")
        )
        .cast("decimal(38,6)")
        .alias("sb_in"),
        F.sum("b").alias("b_in"),
    )
    ln2 = F.expr("CAST(CAST(ln(2.0) AS DECIMAL(28,6)) AS DOUBLE)")
    return (
        ns.join(terms, "source")
        .crossJoin(F.broadcast(nt))
        .select(
            "source",
            F.col("n").cast("long").alias("n_tokens"),
            F.col("vocab").cast("long").alias("vocab"),
            dround(
                0.5
                * (
                    F.col("sa").cast("double") / F.col("n")
                    + (
                        F.col("sb_in").cast("double")
                        + (F.col("nn") - F.col("b_in")) * ln2
                    )
                    / F.col("nn")
                ),
                6,
            ).alias("jsd"),
        )
        .orderBy("source")
    )


@query(
    "x210_skyline_docs",
    oracle="""
    WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS a,
                      CAST(length(list_distinct(string_split(text, ' ')))
                        AS BIGINT) AS b
               FROM documents),
    va AS (SELECT a, CAST(max(b) AS BIGINT) AS mb,
                  CAST(count(*) AS BIGINT) AS n_at
           FROM d GROUP BY a),
    sk AS (SELECT a, mb,
                  max(mb) OVER (ORDER BY a DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS better_mb
           FROM va),
    front AS (SELECT a, mb FROM sk
              WHERE better_mb IS NULL OR mb > better_mb)
    SELECT front.a AS n_chars, front.mb AS vocab,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM front JOIN d ON d.a = front.a AND d.b = front.mb
    GROUP BY front.a, front.mb
    ORDER BY n_chars DESC
    """,
)
def x210_skyline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) query over documents on (length, distinct
    vocabulary): the docs no other doc weakly dominates on both axes
    with a strict improvement on one — the multi-criteria selection
    operator (Borzsony/Kossmann/Stocker's SKYLINE OF) behind "show me
    the frontier" curation asks (longest docs that are ALSO the most
    lexically rich at their length), a different operator class from
    any single-key top-k in the registry. Scalable shape: dominance on
    two totally-ordered axes collapses onto the VALUE DOMAIN — per
    distinct length keep max vocab (a hash agg), then one cumulative
    max over |distinct lengths| rows finds the staircase; a point is on
    the front iff its max-vocab strictly exceeds every longer length's
    (ties in both coordinates are mutually non-dominating, so all docs
    AT a front point are returned via the final value-join). The corpus
    is never rank-sorted: the only window rides the length-value
    histogram (the x200/x58 discipline), and the final join is a
    broadcast of the front. Output: the front staircase with doc
    multiplicity per point."""
    d = load_parallel(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("a"),
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("b"),
    )
    va = d.groupBy("a").agg(
        F.max("b").alias("mb"), F.count(F.lit(1)).alias("n_at")
    )
    wsk = Window.orderBy(F.col("a").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sk = va.select("a", "mb", F.max("mb").over(wsk).alias("better_mb"))
    front = sk.filter(
        F.col("better_mb").isNull() | (F.col("mb") > F.col("better_mb"))
    ).select("a", "mb")
    return (
        d.join(
            F.broadcast(front),
            (d["a"] == front["a"]) & (d["b"] == front["mb"]),
        )
        .drop(front["a"])
        .groupBy(F.col("a").alias("n_chars"), F.col("mb").alias("vocab"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(F.col("n_chars").desc())
    )


@query(
    "x220_dup_ngram_char_fraction",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents),
    g AS (SELECT doc_id, array_to_string(t[i:i+4], ' ') AS gram
          FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i) _
          WHERE len(t) >= 5),
    c AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c,
                 CAST(length(gram) AS BIGINT) AS w
          FROM g GROUP BY doc_id, gram),
    s AS (SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n5,
                 CAST(sum(c * w) AS BIGINT) AS total_chars,
                 CAST(sum(CASE WHEN c >= 2 THEN c * w ELSE 0 END) AS BIGINT)
                     AS dup_chars
          FROM c GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(s.n5, 0) AS n5,
           {dround_sql(
               "COALESCE(CAST(s.dup_chars AS DOUBLE)"
               " / nullif(s.total_chars, 0), 0.0)", 6)}
               AS dup5_char_fraction
    FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id
    """,
)
def x220_dup_ngram_char_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-5-gram character fraction per document: the
    share of 5-gram character mass sitting in grams that occur MORE THAN
    ONCE within the same document — the long-range self-repetition
    filter (Rae et al. 2021 use dup n-gram char fractions for n=5..10;
    x14j's top-trigram share catches one dominant loop, this catches
    diffuse copy-paste where no single gram dominates; x139 is the
    CROSS-document analog). Character weighting (gram string length)
    matches what the training loss sees. Per-doc explode -> (doc, gram)
    hash count -> conditional sums; work is linear in corpus tokens,
    grouped on (doc, gram) so no key is hotter than one document, and
    the ratio is one IEEE division of exact integers, rounded once.
    Sub-5-token docs emit n5=0, fraction 0."""
    # r15 optimization (guide §2.4): the per-doc gram counts used to ride
    # an explode -> (doc, gram) hash agg -> per-doc agg -> join-back —
    # two corpus-sized shuffles of raw gram STRINGS plus a join, for a
    # statistic that never leaves its own document. It is now computed
    # in-row (the x14j idiom): sort the doc's gram array and run-length
    # the equal runs — a run of length c contributes c*length(gram) chars
    # exactly when c >= 2, the same summand set as the old conditional
    # sum (first repeat adds both occurrences, later repeats add one).
    # Zero shuffles, zero joins; the 100 TB plan is the scan itself.
    d = load_parallel(spark, sf_dir, "documents")
    row = d.select("doc_id", word_ngrams("text", 5).alias("g"))
    dup_chars = F.expr(
        """
        aggregate(array_sort(g),
          named_struct('prev', '', 'run', 0L, 'dup', 0L),
          (st, x) -> if(x = st.prev,
            named_struct('prev', x, 'run', st.run + 1,
              'dup', st.dup + length(x) + if(st.run = 1, length(x), 0L)),
            named_struct('prev', x, 'run', 1L, 'dup', st.dup)),
          st -> st.dup)
        """
    )
    total_chars = F.expr("aggregate(g, 0L, (a, x) -> a + length(x))")
    return (
        row.select(
            "doc_id",
            F.size("g").cast("long").alias("n5"),
            dround(
                F.coalesce(
                    dup_chars.cast("double") / F.nullif(total_chars, F.lit(0)),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup5_char_fraction"),
        )
        .orderBy("doc_id")
    )


@query(
    "x235_token_burstiness",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    dc AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    t AS (SELECT token, CAST(sum(c) AS BIGINT) AS cf,
                 CAST(count(*) AS BIGINT) AS df,
                 CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))
                     AS s2
          FROM dc GROUP BY token),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    top AS (SELECT t.*, n.n_docs FROM t, n
            ORDER BY t.cf DESC, t.token LIMIT 30)
    SELECT token, cf, df, n_docs,
           {dround_sql(
               "CAST(CAST(n_docs AS DECIMAL(38,0)) * s2"
               " - CAST(cf AS DECIMAL(38,0)) * cf AS DOUBLE)"
               " / (CAST(n_docs AS DECIMAL(38,0)) * cf)", 6)} AS vmr
    FROM top ORDER BY token
    """,
)
def x235_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness (variance-to-mean ratio of per-document
    counts, zeros included) for the 30 highest-frequency tokens: VMR ~ 1
    is Poisson 'background' usage, VMR >> 1 is a bursty/topical token
    that concentrates in few docs — the dispersion signal that separates
    function words from content words at equal frequency, which x32's
    commonness rank and x106's trend can't see. The identity
    VMR = (N*sum(c^2) - cf^2) / (N*cf) keeps everything exact: the
    corpus collapses to (token, doc) counts in one explode+agg pass
    (no key hotter than one token's postings), the vocab table carries
    cf/df/sum(c^2) in decimals, top-30 is TakeOrdered (no global sort
    materialized), and the one division is IEEE on exact decimals,
    rounded once. Tie-break on token keeps the selected SET
    deterministic in both engines."""
    d = load_parallel(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    dc = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    t = dc.groupBy("token").agg(
        F.sum("c").alias("cf"),
        F.count(F.lit(1)).alias("df"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    top = (
        t.crossJoin(F.broadcast(n))
        .orderBy(F.col("cf").desc(), "token")
        .limit(30)
    )
    nd = F.col("n_docs").cast("decimal(38,0)")
    cfd = F.col("cf").cast("decimal(38,0)")
    return (
        top.select(
            "token",
            F.col("cf").cast("long").alias("cf"),
            F.col("df").cast("long").alias("df"),
            F.col("n_docs").cast("long").alias("n_docs"),
            dround(
                (nd * F.col("s2") - cfd * F.col("cf")).cast("double")
                / (nd * F.col("cf")).cast("double"),
                6,
            ).alias("vmr"),
        )
        .orderBy("token")
    )


@query(
    "x239_keyword_extraction",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf
           GROUP BY token),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    sc AS (SELECT tf.doc_id, tf.token,
                  CAST(tf.tf AS DECIMAL(38,0))
                      * (n.n_docs * 1000000 // df.df) AS score
           FROM tf JOIN df USING (token) CROSS JOIN n),
    r AS (SELECT doc_id, token, score,
                 row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, token) AS rank
          FROM sc)
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, token,
           CAST(score AS DOUBLE) AS score
    FROM r WHERE rank <= 3 ORDER BY doc_id, rank
    """,
)
def x239_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive keywords per document by rational tf-idf
    (score = tf * floor(1e6 * N/df)) — the per-document tagging pass
    behind faceted corpus browsers and x140's query-side expansion,
    deliberately using the RATIONAL idf (exact integer, monotone in
    1/df) instead of the log so the per-doc ranking is engine-exact
    integer arithmetic with no transcendental in the rank key (x97's
    cosine keeps the log idf; this op's contract is the top-3 SET, where
    a 1-ulp ln difference could flip a rank boundary). Plan: one
    explode -> (doc, token) tf agg, a broadcast df join, and a
    doc-partitioned rank window that WindowGroupLimit caps at 3 rows
    per doc below the sort — no global ordering, fan-out bounded by the
    corpus token count."""
    d = load_parallel(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    sc = (
        tf.join(F.broadcast(dfq), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            # tf rides decimal(38,0) BEFORE the idf multiply: at df=1,
            # n_docs~1e9, tf~1e4 the int64 product exceeds 2^63 (the
            # x167/x182 overflow class). The rank key stays exact decimal;
            # only the REPORTED score is cast to double at the end.
            (
                F.col("tf").cast("decimal(38,0)")
                * F.expr("n_docs * 1000000 div df")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        sc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            "rank",
            "token",
            F.col("score").cast("double").alias("score"),
        )
        .orderBy("doc_id", "rank")
    )


@query(
    "x240_log_odds_vocab_shift",
    oracle=f"""
    WITH s1 AS (SELECT source FROM documents GROUP BY source
                ORDER BY count(*) DESC, source LIMIT 1),
    tok AS (SELECT CASE WHEN d.source = s1.source THEN 1 ELSE 0 END AS grp,
                   unnest(string_split(d.text, ' ')) AS token
            FROM documents d, s1),
    cnt AS (SELECT token,
                   CAST(sum(grp) AS BIGINT) AS y,
                   CAST(sum(1 - grp) AS BIGINT) AS c
            FROM tok GROUP BY token),
    tot AS (SELECT CAST(sum(y) AS BIGINT) AS n1,
                   CAST(sum(c) AS BIGINT) AS n2,
                   CAST(sum(y + c) AS BIGINT) AS cf_all
            FROM cnt),
    z AS (SELECT cnt.token, cnt.y, cnt.c,
                 1000.0 * (cnt.y + cnt.c) / tot.cf_all AS a_w,
                 tot.n1, tot.n2
          FROM cnt, tot),
    stat AS (SELECT token, y, c,
                    (ln((y + a_w) / (n1 + 1000.0 - y - a_w))
                     - ln((c + a_w) / (n2 + 1000.0 - c - a_w)))
                    / sqrt(1.0 / (y + a_w) + 1.0 / (c + a_w)) AS z
             FROM z),
    rk AS (SELECT token, y, c, {dround_sql("z", 6)} AS z_lo,
                  row_number() OVER (
                      ORDER BY {dround_sql("abs(z)", 6)} DESC, token) AS rn
           FROM stat)
    SELECT token, y AS count_top_source, c AS count_rest, z_lo AS z
    FROM rk WHERE rn <= 20 ORDER BY token
    """,
)
def x240_log_odds_vocab_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe-style log-odds with an informative Dirichlet prior: which
    tokens most distinguish the LARGEST source from the rest of the
    corpus, z-scored — the lexical-shift diagnostic behind 'what is this
    source actually full of' (x206's JSD says THAT distributions differ;
    this names the words, and the corpus-frequency prior keeps rare
    tokens from dominating the way raw log-ratios do). Top source is
    picked deterministically (doc count, name tie-break); the prior
    a_w = 1000 * cf_w / cf_total; z uses the standard two-ln variance
    approximation. Rank key is the 6-dp-ROUNDED |z| with a token
    tie-break, so a last-ulp ln difference between engines cannot flip
    the selected set. Plan: one explode -> token-count agg with a
    broadcast group bit, closed form per token, TakeOrdered(20)."""
    d = load_parallel(spark, sf_dir, "documents")
    s1 = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("nd"))
        .orderBy(F.col("nd").desc(), "source")
        .limit(1)
        .select(F.col("source").alias("top_source"))
    )
    tok = d.crossJoin(F.broadcast(s1)).select(
        (F.col("source") == F.col("top_source")).cast("int").alias("grp"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    cnt = tok.groupBy("token").agg(
        F.sum("grp").alias("y"), F.sum(1 - F.col("grp")).alias("c")
    )
    tot = cnt.agg(
        F.sum("y").alias("n1"),
        F.sum("c").alias("n2"),
        F.sum(F.col("y") + F.col("c")).alias("cf_all"),
    )
    zt = cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        "y",
        "c",
        (1000.0 * (F.col("y") + F.col("c")) / F.col("cf_all")).alias("a_w"),
        "n1",
        "n2",
    )
    z = (
        F.log((F.col("y") + F.col("a_w")) / (F.col("n1") + 1000.0 - F.col("y") - F.col("a_w")))
        - F.log((F.col("c") + F.col("a_w")) / (F.col("n2") + 1000.0 - F.col("c") - F.col("a_w")))
    ) / F.sqrt(1.0 / (F.col("y") + F.col("a_w")) + 1.0 / (F.col("c") + F.col("a_w")))
    stat = zt.select(
        "token", "y", "c", dround(z, 6).alias("z_lo"), dround(F.abs(z), 6).alias("za")
    )
    top = stat.orderBy(F.col("za").desc(), "token").limit(20)
    return top.select(
        "token",
        F.col("y").cast("long").alias("count_top_source"),
        F.col("c").cast("long").alias("count_rest"),
        F.col("z_lo").alias("z"),
    ).orderBy("token")


@query("x245_bpe_encode")  # trainer rounds + python merge loop: no SQL analog
def x245_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide BPE ENCODE with the x39-learned merge table — the
    missing half of the tokenizer story (the r10 verdict's one named
    functional gap): x39 fits the vocab; this applies it, which is the
    single most-executed operator of a real training-data pipeline
    (every document, every epoch-prep run). Output: per-document token
    accounting (words, BPE tokens, tokens-per-word ppm) — the table
    token-budget planning (x116) and context packing (x29) consume.

    Scale shape (the Zipf factoring, same as x53's LM): the corpus never
    reaches Python. One explode + hash-agg builds the per-(doc, word)
    count table; the DISTINCT-word table (|vocab| rows) is what the
    Arrow-batched encoder touches, each word once, with the merge list
    as a ~1 MB broadcast and per-word cost independent of vocab size
    (min-rank loop — functions/textfns.py bpe_encode_words); the per-doc
    answer is a join back on the word column carrying only (word,
    n_bpe). Exactness: distributed == sequential rank-order oracle ==
    the trainer's own final word-symbol table, all pinned in
    tests/test_bpe_encode.py. Rows-only by design (iterative trainer +
    merge application have no SQL analog)."""
    from ..functions.textfns import bpe_encode_words, bpe_train

    d = load_parallel(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, num_merges=10)
    # bounded collect: exactly num_merges rows (the learned rule table)
    rules = [
        (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
    ]
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w"),
    ).filter(F.length("w") > 0)
    wc = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = wc.select("w").distinct()
    enc = bpe_encode_words(vocab, rules).select("w", "n_bpe")
    return (
        wc.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_bpe")).cast("long").alias(
                "n_bpe_tokens"
            ),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            F.expr(
                "cast(n_bpe_tokens as decimal(38,0)) * 1000000"
                " div n_words"
            )
            .cast("long")
            .alias("toks_per_word_ppm"),
        )
        .orderBy("doc_id")
    )


@query("x250_bpe_fertility_audit")  # learned-merge encode inside: rows-only
def x250_bpe_fertility_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer-fit audit over the x245 encode: tokens per
    word (fertility), characters per token (compression), and the
    single-character-token fraction (the fallback rate — the share of
    emitted tokens no merge rule covered). This is how a pipeline
    decides WHERE the learned vocab underfits: a source whose fallback
    rate is 3x the corpus is a different register/language the merge
    table never saw, and is exactly what to feed the next trainer round.
    Scale shape: identical to x245 (distinct-word Zipf factoring; the
    per-word token stats come from the same encoded vocab table, with
    single-char counting as a JVM higher-order filter on the token
    array — no second Python pass); the per-source rollup joins word
    stats back on the word column. Rows-only (the merge table is
    iteratively learned); pure-Python equality pinned in
    tests/test_bpe_encode.py."""
    from ..functions.textfns import bpe_encode_words, bpe_train

    d = load_parallel(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, num_merges=10)
    rules = [
        (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
    ]
    tok = d.select(
        "source",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w"),
    ).filter(F.length("w") > 0)
    wc = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = wc.select("w").distinct()
    enc = bpe_encode_words(vocab, rules).select(
        "w",
        "n_bpe",
        F.size(
            F.filter(
                F.col("bpe_toks"),
                lambda t: F.length(F.regexp_replace(t, r"</w>$", "")) == 1,
            )
        )
        .cast("long")
        .alias("n_single"),
    )
    return (
        wc.join(enc, "w")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_bpe")).cast("long").alias(
                "n_tokens"
            ),
            F.sum(F.col("cnt") * F.col("n_single")).cast("long").alias(
                "n_single_tokens"
            ),
            F.sum(F.col("cnt") * F.length("w")).cast("long").alias("n_chars"),
        )
        .select(
            "source",
            "n_words",
            "n_tokens",
            F.expr(
                "cast(n_tokens as decimal(38,0)) * 1000000 div n_words"
            )
            .cast("long")
            .alias("fertility_ppm"),
            F.expr(
                "cast(n_chars as decimal(38,0)) * 1000000 div n_tokens"
            )
            .cast("long")
            .alias("chars_per_token_ppm"),
            F.expr(
                "cast(n_single_tokens as decimal(38,0)) * 1000000"
                " div n_tokens"
            )
            .cast("long")
            .alias("fallback_ppm"),
        )
        .orderBy("source")
    )


@query("x262_bpe_holdout_fertility")  # learned-merge encode inside: rows-only
def x262_bpe_holdout_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer GENERALIZATION audit: fit the BPE merges on the even
    doc_id half only, then measure fertility and fallback rate per lang
    on the HELD-OUT odd half — the train/test discipline x250 skips
    (in-corpus fertility always flatters the vocab; the held-out gap is
    what predicts fertility on tomorrow's crawl, and a lang whose
    held-out fallback spikes is under-represented in the training
    half). Same Zipf factoring as x245/x250: the odd half's distinct
    words encode once through the Arrow-batched min-rank loop with the
    even-half merge table broadcast. Rows-only (iterative trainer);
    pure-Python equality pinned in tests/test_bpe_encode.py."""
    from ..functions.textfns import bpe_encode_words, bpe_train

    d = load_parallel(spark, sf_dir, "documents")
    merges, _ = bpe_train(
        d.filter(F.col("doc_id") % 2 == 0), num_merges=10
    )
    rules = [
        (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
    ]
    held = d.filter(F.col("doc_id") % 2 == 1)
    tok = held.select(
        "lang",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w"),
    ).filter(F.length("w") > 0)
    wc = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = wc.select("w").distinct()
    enc = bpe_encode_words(vocab, rules).select(
        "w",
        "n_bpe",
        F.size(
            F.filter(
                F.col("bpe_toks"),
                lambda t: F.length(F.regexp_replace(t, r"</w>$", "")) == 1,
            )
        )
        .cast("long")
        .alias("n_single"),
    )
    return (
        wc.join(enc, "w")
        .groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_bpe")).cast("long").alias(
                "n_tokens"
            ),
            F.sum(F.col("cnt") * F.col("n_single")).cast("long").alias(
                "n_single_tokens"
            ),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            F.expr("cast(n_tokens as decimal(38,0)) * 1000000 div n_words")
            .cast("long")
            .alias("fertility_ppm"),
            F.expr(
                "cast(n_single_tokens as decimal(38,0)) * 1000000"
                " div n_tokens"
            )
            .cast("long")
            .alias("fallback_ppm"),
        )
        .orderBy("lang")
    )


#: vocabulary budgets x266 sweeps (prefixes of the one learned merge
#: list; the largest is the trained size).
_X266_BUDGETS = [8, 16, 24, 32, 48]


@query("x266_bpe_vocab_sweep")  # iterative trainer + python encode: rows-only
def x266_bpe_vocab_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocab-size curve a tokenizer budget decision reads: corpus
    fertility (tokens per word) and compression (chars per token) at
    every vocabulary budget V in {8, 16, 24, 32, 48} merges, plus how
    many of the first V rules the corpus actually exercises — the
    diminishing-returns table behind 'is a bigger vocab worth it' (x134
    measures ONE tokenizer's efficiency; x250 audits per-source fit at
    ONE budget; this sweeps the budget). BPE's nesting property does the
    heavy lifting: the merge list is a curriculum, so budget V's
    tokenization is exactly the full encode truncated at rank V —
    ONE train at the largest budget + ONE rank-recording encode of the
    distinct-word table answers every row by column algebra
    (length(w) + 1 - #{applied ranks < V}); no per-budget re-train or
    re-encode (see bpe_encode_words_with_ranks; prefix-equality vs the
    sequential oracle pinned in tests/test_bpe_encode.py). Scale shape:
    x245's Zipf factoring verbatim — corpus explode + hash agg to the
    word-count table, Arrow-batched encode of |vocab| rows, 5-row
    conditional-sum rollup. Rows-only by design (iterative trainer
    inside)."""
    from ..functions.textfns import bpe_encode_words_with_ranks, bpe_train

    d = load_parallel(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, num_merges=_X266_BUDGETS[-1])
    # bounded collect: exactly num_merges rows (the learned rule table)
    rules = [
        (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
    ]
    tok = d.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    wc = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    enc = bpe_encode_words_with_ranks(wc, rules)
    agg_cols = [
        F.sum("cnt").cast("long").alias("n_words"),
        F.sum(F.col("cnt") * F.length("w")).cast("long").alias("n_chars"),
    ]
    for v in _X266_BUDGETS:
        toks_v = (
            F.length("w")
            + 1
            - F.size(F.filter("applied_ranks", lambda r: r < F.lit(v)))
        )
        agg_cols.append(
            F.sum(F.col("cnt") * toks_v).cast("long").alias(f"t{v}")
        )
    one = enc.agg(*agg_cols)
    # which of the first V rules the corpus exercises at all: the
    # distinct applied-rank table is <= num_merges rows by construction
    used = (
        enc.select(F.explode("applied_ranks").alias("r"))
        .distinct()
        .agg(
            *[
                F.sum((F.col("r") < v).cast("long"))
                .cast("long")
                .alias(f"u{v}")
                for v in _X266_BUDGETS
            ]
        )
    )
    one = one.crossJoin(F.broadcast(used))
    parts = [
        one.select(
            F.lit(v).cast("long").alias("n_rules"),
            F.col(f"u{v}").alias("rules_used"),
            F.col(f"t{v}").alias("total_tokens"),
            F.expr(
                f"cast(cast(t{v} as decimal(38,0)) * 1000000"
                " div n_words as bigint)"
            ).alias("toks_per_word_ppm"),
            F.expr(
                f"cast(cast(n_chars as decimal(38,0)) * 1000000"
                f" div t{v} as bigint)"
            ).alias("chars_per_token_ppm"),
        )
        for v in _X266_BUDGETS
    ]
    out = parts[0]
    for x in parts[1:]:
        out = out.unionAll(x)
    return out.orderBy("n_rules")
