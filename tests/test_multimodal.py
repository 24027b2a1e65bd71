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
