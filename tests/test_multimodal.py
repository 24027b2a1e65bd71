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
