"""Round-10 streaming twins pinned to their batch registry rows:
streaming_ewma (stateful, trailing-window state) == x216, and brier_bins
(mergeable agg, complete mode) == x227's bin table."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.queries import QUERIES
from kafka_connect_spark.sources.replay import (
    file_replay_stream,
    write_replay_files,
)
from kafka_connect_spark.streaming.drift import brier_bins, streaming_ewma


def test_streaming_ewma_equals_x216(spark, sf_dir, tmp_path):
    """Replaying the day-count series through the stateful trailing-window
    recursion must emit exactly x216's scored rows (same integer weights,
    same two int->double roundings, same 6-dp round)."""
    e = load(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    d = str(tmp_path / "ewma-replay")
    write_replay_files(day, d, 3, "day")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        streaming_ewma(sdf)
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-ewma"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        pd.concat(out, ignore_index=True)
        .sort_values(["event_type", "day"], ignore_index=True)
    )
    want = (
        QUERIES["x216_ewma_anomaly"](spark, sf_dir)
        .toPandas()
        .sort_values(["event_type", "day"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _batch_bins(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    sc = d.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        F.least(
            F.expr(
                "cast(size(filter(split(text, ' '),"
                " t -> array_contains(array('a','the','of','and','to','in'), t)))"
                " as bigint) * 5000000 div size(split(text, ' '))"
            ),
            F.lit(1_000_000).cast("bigint"),
        ).alias("p"),
    )
    return brier_bins(sc)


def test_streaming_brier_bins_equal_batch(spark, sf_dir, tmp_path):
    """brier_bins is one mergeable aggregation: complete-mode streaming
    over a replay must land on exactly the batch bin table, with state
    bounded by the 10-bin domain."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    d = str(tmp_path / "brier-replay")
    write_replay_files(docs, d, 4, "doc_id")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    sc = sdf.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        F.least(
            F.expr(
                "cast(size(filter(split(text, ' '),"
                " t -> array_contains(array('a','the','of','and','to','in'), t)))"
                " as bigint) * 5000000 div size(split(text, ' '))"
            ),
            F.lit(1_000_000).cast("bigint"),
        ).alias("p"),
    )
    out: list[pd.DataFrame] = []
    q = (
        brier_bins(sc)
        .writeStream.foreachBatch(
            lambda df, bid: out.append(df.toPandas())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt-brier"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = out[-1].sort_values("b", ignore_index=True)
    want = (
        _batch_bins(spark, sf_dir).toPandas().sort_values("b", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
