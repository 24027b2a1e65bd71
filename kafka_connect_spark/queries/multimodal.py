"""Multimodal-column query surface (north-star extension): binary payload +
typed metadata, feature extraction via Arrow-batched mapInPandas
(functions/multimodalfns.py). The oracle recomputes the deterministic fake
decode independently in DuckDB (md5 digest bytes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, load_parallel
from ..functions.multimodalfns import attach_fake_media, extract_features, sample_frames
from .registry import dround_sql, query


@query(
    "mm_feature_extract",
    oracle="""
    SELECT doc_id,
           CAST(16 AS INTEGER) AS byte_len,
           CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) AS head_u32,
           CAST(doc_id % 64 + 1 AS INTEGER) AS width,
           CAST(doc_id % 48 + 1 AS INTEGER) AS height
    FROM documents ORDER BY doc_id
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary media column -> mapInPandas feature extraction. byte_len/head_u32
    come from the decoded payload (md5 digest of text => 16 bytes; head_u32 =
    first 4 bytes big-endian = first 8 hex chars of md5)."""
    d = load(spark, sf_dir, "documents")
    media = attach_fake_media(d)
    return extract_features(media).orderBy("doc_id")


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, CAST(0 AS INTEGER) AS frame_idx FROM documents ORDER BY doc_id
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (every_n=2 over n_frames=1 => frame 0 only in
    the fixture; the operator shape — sequence + explode — is the real one)."""
    d = load(spark, sf_dir, "documents")
    media = attach_fake_media(d)
    return sample_frames(media, every_n=2).orderBy("doc_id", "frame_idx")


@query(
    "mm_resize",
    oracle="""
    SELECT doc_id,
           CAST(512 AS INTEGER) AS byte_len,
           substring(repeat(md5(text), 32), 1, 1024) AS resized_hex,
           CAST(32 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height
    FROM documents ORDER BY doc_id
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage on the multimodal contract: mapInPandas re-samples each
    payload to 32x16 (fake codec: cycle-repeat/truncate to 512 bytes) and
    rewrites the metadata struct; composes ahead of feature extraction. The
    oracle reproduces the deterministic fake in pure SQL on the hex plane
    (repeat the 32-hex-char md5 x32, truncate to 1024 chars = 512 bytes)."""
    from ..functions.multimodalfns import resize_media

    d = load(spark, sf_dir, "documents")
    resized = resize_media(attach_fake_media(d), 32, 16)
    return resized.select(
        "doc_id",
        F.length("media").cast("int").alias("byte_len"),
        F.lower(F.hex("media")).alias("resized_hex"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    ).orderBy("doc_id")


@query(
    "mm_phash_pairs",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             [CAST('0x' || substr(md5(text), 2*j + 1, 2) AS BIGINT)
              for j in range(0, 16)] AS px
      FROM documents
    ),
    p AS (
      SELECT doc_id,
             list_sum([CASE WHEN px[j + 1] > list_sum(px) / 16.0
                            THEN 2**j ELSE 0 END
                       for j in range(0, 16)]) AS pattern
      FROM b
    )
    SELECT a.doc_id AS id_a, c.doc_id AS id_b, CAST(0 AS INTEGER) AS hamming
    FROM p a JOIN p c ON a.pattern = c.pattern AND a.doc_id < c.doc_id
    ORDER BY id_a, id_b
    """,
)
def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection: 64-bit perceptual hash (resize to 8x8,
    threshold against the mean) + pigeonhole multi-index banding — an
    EXACT-recall Hamming pair search (any two hashes within 3 bits share a
    whole 16-bit slice), unlike probabilistic LSH.

    Under the fake codec the 8x8 plane is the 16-byte md5 digest cycled
    4x, so every phash bit repeats with period 16: Hamming distances are
    multiples of 4, pairs within 3 bits are exactly the pairs whose
    16-byte threshold PATTERN matches, and the oracle recomputes that
    pattern byte-for-byte from the md5 hex in pure SQL — a full-path hash
    check of decode -> resize -> threshold -> band -> verify."""
    from ..functions.multimodalfns import perceptual_hash, phash_near_dup_pairs

    d = load(spark, sf_dir, "documents")
    hashes = perceptual_hash(attach_fake_media(d))
    return phash_near_dup_pairs(hashes, max_hamming=3, bands=4).orderBy(
        "id_a", "id_b"
    )


@query(
    "mm_audio_frame_energy",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             flatten(list_transform(range(0, 8), blk ->
               list_transform(range(0, 16), p ->
                 CAST('0x' || substr(md5(text || CAST(blk AS VARCHAR)), 2*p + 1, 2)
                      AS BIGINT)))) AS bts
      FROM documents
    ),
    smp AS (
      SELECT doc_id,
             list_transform(range(0, 64), k ->
               ((bts[2*k + 1] + 256 * bts[2*k + 2] + 32768) % 65536) - 32768) AS s
      FROM raw
    )
    SELECT doc_id,
           CAST(f AS INT) AS frame_idx,
           CAST(list_sum(list_transform(range(16*f, 16*f + 16), k -> abs(s[k + 1])))
                AS BIGINT) AS energy
    FROM smp, (SELECT unnest(range(0, 4)) AS f)
    ORDER BY doc_id, frame_idx
    """,
)
def mm_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing + energy (the VAD/silence-trim primitive): fake PCM16
    payloads (8 chained md5 digests = 64 LE int16 samples) framed at 16
    samples, integer |sample| energy per frame via Arrow-batched
    mapInPandas. The oracle re-derives the exact PCM bytes from md5 hex in
    DuckDB list comprehensions — the decode plumbing (schema, batch shape,
    framing math) is what's under test; a real codec swaps into
    ``audio_frame_energy``'s format branch. Map-side only at 100 TB."""
    from ..functions.multimodalfns import attach_fake_audio, audio_frame_energy

    d = load(spark, sf_dir, "documents")
    return audio_frame_energy(attach_fake_audio(d)).orderBy("doc_id", "frame_idx")


@query(
    "mm_phash_clusters",
    oracle="""
    WITH RECURSIVE b AS (
      SELECT doc_id,
             [CAST('0x' || substr(md5(text), 2*j + 1, 2) AS BIGINT)
              for j in range(0, 16)] AS px
      FROM documents
    ),
    p AS (
      SELECT doc_id,
             list_sum([CASE WHEN px[j + 1] > list_sum(px) / 16.0
                            THEN 2**j ELSE 0 END
                       for j in range(0, 16)]) AS pattern
      FROM b
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, c.doc_id AS id_b
      FROM p a JOIN p c ON a.pattern = c.pattern AND a.doc_id < c.doc_id
    ),
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
def mm_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup end-to-end: perceptual-hash near-dup pairs (mm_phash_pairs'
    decode -> 8x8 resize -> mean-threshold -> pigeonhole banding) fed into
    the SAME hash-min label propagation the text pipeline uses (x12h) —
    one dedup clustering engine across modalities, pairs being the only
    modality-specific stage. The oracle recomputes the full path plus
    connected components with a recursive CTE."""
    from ..functions.dedupfns import dup_clusters
    from ..functions.multimodalfns import attach_fake_media, perceptual_hash, phash_near_dup_pairs

    d = load(spark, sf_dir, "documents")
    hashes = perceptual_hash(attach_fake_media(d))
    pairs = phash_near_dup_pairs(hashes, max_hamming=3, bands=4).select("id_a", "id_b")
    return dup_clusters(pairs).orderBy("doc_id")


@query(
    "x135_crossmodal_agreement",
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
    tpairs AS (SELECT id_a, id_b FROM inter
               JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
               WHERE {{J}} >= 0.5),
    b AS (SELECT doc_id,
             [CAST('0x' || substr(md5(text), 2*j + 1, 2) AS BIGINT)
              for j in range(0, 16)] AS px
          FROM documents),
    p AS (SELECT doc_id,
             list_sum([CASE WHEN px[j + 1] > list_sum(px) / 16.0
                            THEN 2**j ELSE 0 END
                       for j in range(0, 16)]) AS pattern
          FROM b),
    ipairs AS (SELECT a.doc_id AS id_a, c.doc_id AS id_b
               FROM p a JOIN p c ON a.pattern = c.pattern AND a.doc_id < c.doc_id),
    u AS (SELECT id_a, id_b,
                 CASE WHEN t.ta IS NOT NULL THEN 1 ELSE 0 END AS in_text,
                 CASE WHEN i.ia IS NOT NULL THEN 1 ELSE 0 END AS in_image
          FROM (SELECT id_a, id_b FROM tpairs UNION SELECT id_a, id_b FROM ipairs) pr
          LEFT JOIN (SELECT id_a AS ta, id_b AS tb FROM tpairs) t
            ON t.ta = pr.id_a AND t.tb = pr.id_b
          LEFT JOIN (SELECT id_a AS ia, id_b AS ib FROM ipairs) i
            ON i.ia = pr.id_a AND i.ib = pr.id_b)
    SELECT CAST(sum(CASE WHEN in_text = 1 AND in_image = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_both,
           CAST(sum(CASE WHEN in_text = 1 AND in_image = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_text_only,
           CAST(sum(CASE WHEN in_text = 0 AND in_image = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_image_only
    FROM u
    """.replace("{J}", dround_sql("inter / (sa.n + sb.n - inter)", 6)),
)
def x135_crossmodal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality dedup consistency: of all near-dup pairs found by
    EITHER modality, how many agree (text shingle-Jaccard >= 0.5 AND
    image pHash band match) vs are single-modality only — the audit
    that catches a drifting image pipeline (text-only pairs rising) or
    caption-swapped images (image-only pairs rising). On this fixture
    the report itself demonstrates the failure mode it exists to catch:
    the fake codec derives pixels from EXACT text bytes, so textual
    near-dups (edited copies) get unrelated images and the modalities
    disagree completely (n_both = 0) — exactly the divergence signature
    a real caption-image mismatch produces. Full outer union of the two
    pair sets + one conditional agg."""
    from ..functions.dedupfns import ngram_jaccard_pairs

    d = load_parallel(spark, sf_dir, "documents")
    tp = ngram_jaccard_pairs(d, n=3, threshold=0.5).select("id_a", "id_b")
    from ..functions.multimodalfns import perceptual_hash, phash_near_dup_pairs

    hashes = perceptual_hash(attach_fake_media(d))
    ip = phash_near_dup_pairs(hashes, max_hamming=3, bands=4).select("id_a", "id_b")
    # r15 optimization (guide §2.4): the former distinct-union + two left
    # joins referenced tp and ip TWICE each, so both pair pipelines (the
    # shingle self-join and the pHash band join) executed twice per run.
    # Tag each pipeline's rows with its modality flag, union once, and
    # max() the flags per pair — the same presence semantics (the union's
    # distinct and both left joins collapse into one groupBy), each
    # pipeline evaluated exactly once.
    u = (
        tp.select(
            "id_a",
            "id_b",
            F.lit(1).alias("in_text"),
            F.lit(0).alias("in_image"),
        )
        .unionByName(
            ip.select(
                "id_a",
                "id_b",
                F.lit(0).alias("in_text"),
                F.lit(1).alias("in_image"),
            )
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.max("in_text").alias("in_text"),
            F.max("in_image").alias("in_image"),
        )
    )
    return u.agg(
        F.sum(((F.col("in_text") == 1) & (F.col("in_image") == 1)).cast("long")).alias("n_both"),
        F.sum(((F.col("in_text") == 1) & (F.col("in_image") == 0)).cast("long")).alias("n_text_only"),
        F.sum(((F.col("in_text") == 0) & (F.col("in_image") == 1)).cast("long")).alias("n_image_only"),
    )
