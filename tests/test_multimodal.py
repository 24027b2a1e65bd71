"""Multimodal plumbing: schema contract, Arrow batch flow, stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.functions.multimodalfns import (
    FEATURE_SCHEMA,
    attach_fake_media,
    extract_features,
    sample_frames,
)


def test_media_schema(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    assert dict(media.dtypes)["media"] == "binary"
    assert "struct" in dict(media.dtypes)["media_meta"]


def test_extract_features_values(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(20)
    feats = extract_features(attach_fake_media(docs))
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 20
    assert all(r["byte_len"] == 16 for r in rows)  # md5 digest payload
    assert all(0 <= r["head_u32"] < 2**32 for r in rows)


def test_unknown_format_raises(spark):
    df = spark.createDataFrame([(1, b"\x00\x01", ("video/mp4", 1, 1, 10))],
                               "doc_id long, media binary, media_meta struct<format:string,width:int,height:int,n_frames:int>")
    with pytest.raises(Exception, match="no decoder for format"):
        extract_features(df).collect()


def test_frame_sampling(spark):
    df = spark.createDataFrame(
        [(1, b"", ("fake/raw", 1, 1, 10))],
        "doc_id long, media binary, media_meta struct<format:string,width:int,height:int,n_frames:int>",
    )
    frames = [r["frame_idx"] for r in sample_frames(df, every_n=3).collect()]
    assert frames == [0, 3, 6, 9]


def test_resize_composes_with_extract(spark, sf_dir):
    """resize keeps the storage contract, so it chains into feature
    extraction; fake resample hits the exact target byte count."""
    from kafka_connect_spark.catalog import load
    from kafka_connect_spark.functions.multimodalfns import (
        attach_fake_media,
        extract_features,
        resize_media,
    )

    d = load(spark, sf_dir, "documents").limit(20)
    feats = extract_features(resize_media(attach_fake_media(d), 8, 4)).collect()
    assert len(feats) == 20
    assert all(r["byte_len"] == 32 for r in feats)
    assert all(r["width"] == 8 and r["height"] == 4 for r in feats)


def test_resize_unknown_format_raises(spark):
    import pandas as pd
    import pytest
    from kafka_connect_spark.functions.multimodalfns import resize_media

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00"), ("video/mp4", 1, 1, 10))],
        "doc_id long, media binary, media_meta struct<format:string,width:int,height:int,n_frames:int>",
    )
    with pytest.raises(Exception, match="NotImplementedError|no resizer"):
        resize_media(df, 4, 4).collect()


def test_phash_hamming_and_pigeonhole_recall(spark):
    """Crafted 64-byte payloads: a near-dup (one flipped pixel) lands at
    Hamming 1 and is found; an unrelated payload is not. The pigeonhole
    banding must find EVERY pair the brute-force all-pairs check finds
    (recall 1.0 by construction, not probabilistic)."""
    import random

    from kafka_connect_spark.functions.dedupfns import hamming
    from kafka_connect_spark.functions.multimodalfns import (
        perceptual_hash,
        phash_near_dup_pairs,
    )
    from pyspark.sql import functions as F

    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(64))
    near = bytearray(base)
    near[5] = (base[5] + 200) % 256  # flip one pixel across the mean
    rows = [(1, bytearray(base)), (2, bytes(near))]
    for i in range(3, 40):
        rows.append((i, bytes(rng.randrange(256) for _ in range(64))))
    df = spark.createDataFrame(
        [(i, m, ("fake/raw", 8, 8, 1)) for i, m in rows],
        "doc_id long, media binary, media_meta struct<format:string,width:int,height:int,n_frames:int>",
    )
    hashes = perceptual_hash(df)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(hashes, max_hamming=3, bands=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    # brute-force ground truth: banding must find every qualifying pair
    a = hashes.select(F.col("doc_id").alias("id_a"), F.col("phash").alias("ha"))
    b = hashes.select(F.col("doc_id").alias("id_b"), F.col("phash").alias("hb"))
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(hamming(F.col("ha"), F.col("hb")) <= 3)
        .collect()
    }
    assert set(pairs) == brute
