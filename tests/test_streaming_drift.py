"""Streaming drift/sketch twins (streaming/drift.py) pinned to their
batch registry queries."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.sources.replay import file_replay_stream, write_replay_files
from kafka_connect_spark.streaming.drift import hll_registers, streaming_cusum


def _user_days(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_type",
        F.concat(
            F.col("user_id").cast("string"),
            F.lit(":"),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("entity"),
    )


def test_streaming_hll_registers_equal_batch_and_ignore_duplicates(
    spark, sf_dir, tmp_path
):
    """The streaming register table after replaying the RAW (duplicated)
    entity stream must equal the batch registers over the DISTINCT
    entities — sketch idempotence is what lets the stream skip the
    unbounded-state dropDuplicates a naive distinct-count would need."""
    raw = _user_days(spark, sf_dir)
    batch = (
        hll_registers(raw.distinct(), "event_type", "entity")
        .toPandas()
        .sort_values(["scope", "bucket"], ignore_index=True)
    )
    d = str(tmp_path / "hll-replay")
    write_replay_files(raw, d, 4, "entity")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        hll_registers(sdf, "event_type", "entity")
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-hll"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = out[-1].sort_values(["scope", "bucket"], ignore_index=True)
    pd.testing.assert_frame_equal(final, batch, check_dtype=False)
    # bounded state: <= 1024 registers per scope
    assert final.groupby("scope").size().max() <= 1024


def test_streaming_cusum_alarms_equal_x172(spark, sf_dir, tmp_path):
    """Replaying the day-count series through the stateful recursion with
    x172's own calibration must emit exactly x172's alarm rows."""
    from kafka_connect_spark.queries.metrics import x172_cusum_changepoint

    e = load(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    cal = {}
    for r in (
        day.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n_events").alias("s"),
            F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
        )
        .collect()
    ):
        thresh2 = 16 * (r["n_days"] * r["ss"] - r["s"] * r["s"])
        cal[r["event_type"]] = (r["n_days"], r["s"], thresh2)

    d = str(tmp_path / "cusum-replay")
    write_replay_files(day, d, 3, "day")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        streaming_cusum(sdf, cal)
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-cusum"))
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
        x172_cusum_changepoint(spark, sf_dir)
        .toPandas()
        .sort_values(["event_type", "day"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_quantile_histogram_equals_batch(spark, sf_dir, tmp_path):
    """The streaming (source, n_chars) histogram after a 4-chunk replay
    must equal the batch histogram x200 reads — counting is mergeable, so
    the complete-mode state is the histogram itself, bounded by the value
    domain rather than the stream length."""
    from kafka_connect_spark.streaming.drift import quantile_histogram

    d0 = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    batch = (
        quantile_histogram(d0, "source", "n_chars", "doc_id")
        .toPandas()
        .sort_values(["grp", "val"], ignore_index=True)
    )
    d = str(tmp_path / "qh-replay")
    write_replay_files(d0, d, 4, "doc_id")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        quantile_histogram(sdf, "source", "n_chars", "doc_id")
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-qh"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = out[-1].sort_values(["grp", "val"], ignore_index=True)
    pd.testing.assert_frame_equal(final, batch, check_dtype=False)
    # state bound: one row per (group, value) — the value domain
    assert len(final) == d0.select("source", "n_chars").distinct().count()


def test_streaming_interarrival_gaps_equal_batch_multiset(
    spark, sf_dir, tmp_path
):
    """Replaying events in time order, streaming_interarrival's emitted
    gap multiset must equal the batch day-sharded x202 gap union exactly:
    the one-timestamp-per-type state replaces the global lag window."""
    from kafka_connect_spark.streaming.stateful import streaming_interarrival

    e = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", F.to_date("ts").alias("day")
    )
    # batch gaps: x202's within-day + boundary union (inlined)
    from pyspark.sql import Window

    wd = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    within = (
        e.withColumn("prev_ts", F.lag("ts").over(wd))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "event_type",
            F.expr("(unix_micros(ts) - unix_micros(prev_ts)) div 1000000").alias(
                "gap_s"
            ),
        )
    )
    daily = e.groupBy("event_type", "day").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    wb = Window.partitionBy("event_type").orderBy("day")
    boundary = (
        daily.withColumn("prev_last", F.lag("last_ts").over(wb))
        .filter(F.col("prev_last").isNotNull())
        .select(
            "event_type",
            F.expr(
                "(unix_micros(first_ts) - unix_micros(prev_last)) div 1000000"
            ).alias("gap_s"),
        )
    )
    batch = sorted(
        (r["event_type"], r["gap_s"])
        for r in within.unionByName(boundary).collect()
    )

    d = str(tmp_path / "ia-replay")
    write_replay_files(e.select("event_type", "ts", "event_id"), d, 4, "ts")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        streaming_interarrival(sdf)
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-ia"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.event_type, int(r.gap_s))
        for df in out
        for r in df.itertuples(index=False)
    )
    assert got == batch


def test_streaming_skyline_staircase_equals_batch_front(
    spark, sf_dir, tmp_path
):
    """The streaming (length -> max vocab) table after a 4-chunk replay
    must equal the batch table, and the front selected from it must equal
    x210's output exactly — incremental skyline maintenance on bounded
    state."""
    from pyspark.sql import Window

    from kafka_connect_spark.queries.text import x210_skyline_docs
    from kafka_connect_spark.streaming.drift import skyline_staircase

    d0 = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("a"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("b"),
    )
    batch = (
        skyline_staircase(d0, "a", "b")
        .toPandas()
        .sort_values("a", ignore_index=True)
    )
    d = str(tmp_path / "sky-replay")
    write_replay_files(d0, d, 4, "doc_id")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        skyline_staircase(sdf, "a", "b")
        .writeStream.foreachBatch(lambda df, bid: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-sky"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = out[-1].sort_values("a", ignore_index=True)
    pd.testing.assert_frame_equal(final, batch, check_dtype=False)

    # select the front from the final streamed staircase and pin it to
    # the batch skyline's (n_chars, vocab) set
    fdf = spark.createDataFrame(final)
    wsk = Window.orderBy(F.col("a").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    front = (
        fdf.select("a", "mb", F.max("mb").over(wsk).alias("better"))
        .filter(F.col("better").isNull() | (F.col("mb") > F.col("better")))
        .select("a", "mb")
        .collect()
    )
    got = sorted((r["a"], r["mb"]) for r in front)
    want = sorted(
        (r["n_chars"], r["vocab"])
        for r in x210_skyline_docs(spark, sf_dir).collect()
    )
    assert got == want
