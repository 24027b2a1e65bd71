"""applyInPandasWithState custom stateful operator + streaming pipeline
specs (the herder's 'config in -> StreamingQuery out' path)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.plans import Pipeline
from kafka_connect_spark.sources.replay import write_replay_files
from kafka_connect_spark.streaming.stateful import running_totals


def test_running_totals_state_across_microbatches(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    d = str(tmp_path / "replay")
    write_replay_files(events, d, 3, "ts")

    schema = spark.read.parquet(d).schema
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    out: list[pd.DataFrame] = []
    q = (
        running_totals(sdf)
        .writeStream.foreachBatch(lambda b, i: out.append(b.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = pd.concat(out, ignore_index=True)
    assert len(out) >= 3  # state really crossed microbatches
    # final emitted total per key == batch aggregate
    final = got.groupby("key").last()
    batch = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("t"))
        .toPandas()
        .set_index("user_id")
    )
    for key, row in batch.iterrows():
        assert final.loc[key, "n_events"] == row["n"]
        assert abs(final.loc[key, "total_value"] - row["t"]) < 1e-3


def test_emit_on_change_streaming_equals_batch(spark, sf_dir, tmp_path):
    """CDC compaction equivalence: the stateful streaming emit_on_change
    (last-value state per key, crossing microbatches) emits exactly the
    rows the x31 batch lag-window query keeps."""
    from kafka_connect_spark.streaming.stateful import emit_on_change

    events = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    d = str(tmp_path / "replay")
    write_replay_files(events, d, 3, "ts")
    schema = spark.read.parquet(d).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .withColumn("value", F.floor(F.col("value") / 100).cast("double"))
    )
    out: list[pd.DataFrame] = []
    q = (
        emit_on_change(sdf)
        .writeStream.foreachBatch(lambda b, i: out.append(b.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-eoc"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = pd.concat(out, ignore_index=True)
    assert len(out) >= 3  # last-value state really crossed microbatches

    # batch twin (the x31 plan) over the SAME filtered slice — the
    # registered query runs the full table, so recompute it here
    from pyspark.sql import Window

    g = events.select(
        "user_id", "ts", "event_id", F.floor(F.col("value") / 100).alias("gauge")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (
        g.withColumn("pv", F.lag("gauge").over(w))
        .filter(F.col("pv").isNull() | (F.col("gauge") != F.col("pv")))
        .select("event_id")
        .toPandas()
    )
    assert set(got["event_id"]) == set(want["event_id"])
    assert len(got) == len(want)


def test_emit_on_change_key_spanning_arrow_chunks(spark, tmp_path):
    """applyInPandasWithState delivers one key's microbatch as MULTIPLE
    Arrow chunks (split at arrow.maxRecordsPerBatch) in arbitrary upstream
    order — suppression must sort the whole group once, not per chunk, or
    the emitted set silently diverges from the x31 batch twin."""
    import random

    from kafka_connect_spark.streaming.stateful import emit_on_change

    n = 300
    rows = [(1, i, i, float(i // 10)) for i in range(n)]  # change every 10th
    random.Random(7).shuffle(rows)  # scramble file order
    df = spark.createDataFrame(rows, ["user_id", "tsec", "event_id", "value"])
    df = df.withColumn("ts", F.timestamp_seconds(F.col("tsec"))).drop("tsec")
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "25")  # 300-row group -> 12 chunks
    out: list[pd.DataFrame] = []
    try:
        sdf = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = (
            emit_on_change(sdf)
            .writeStream.foreachBatch(lambda b, i: out.append(b.toPandas()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set(key, old)
    got = pd.concat(out, ignore_index=True)
    assert sorted(got["event_id"]) == [i * 10 for i in range(30)]


def test_streaming_pipeline_spec(spark, sf_dir, tmp_path):
    """streaming: true spec compiles to a StreamingQuery: file stream ->
    mask -> parquet sink with checkpoint; a second start drains nothing new."""
    src = str(tmp_path / "src")
    load(spark, sf_dir, "customer").limit(50).write.parquet(src)
    spec = {
        "name": "stream-mask",
        "streaming": True,
        "source": {"type": "file_stream", "path": src, "max.files.per.trigger": 1},
        "transforms": [{"type": "mask_field", "fields": ["c_mktsegment"]}],
        "sink": {
            "type": "parquet_stream",
            "path": str(tmp_path / "out"),
            "checkpoint": str(tmp_path / "ckpt"),
        },
    }
    q = Pipeline(spec).start_stream(spark)
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 50
    assert out.select("c_mktsegment").distinct().collect()[0][0] == "CENSORED"

    # restart from checkpoint: no duplicate output
    q2 = Pipeline(spec).start_stream(spark)
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 50


def test_streaming_incremental_table_spec(spark, tmp_path):
    """The native incremental_table stream source as a spec-addressable
    streaming pipeline: offsets checkpoint with the sink, executor-side
    partition reads."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(1, 6)], ["id", "name"]
    ).write.parquet(src)
    spec = {
        "name": "stream-incremental",
        "streaming": True,
        "source": {"type": "incremental_table", "path": src, "offset.column": "id"},
        "transforms": [{"type": "mask_field", "fields": ["name"]}],
        "sink": {
            "type": "parquet_stream",
            "path": str(tmp_path / "out"),
            "checkpoint": str(tmp_path / "ckpt"),
        },
    }
    q = Pipeline(spec).start_stream(spark)
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 5
    assert out.select("name").distinct().collect()[0][0] == "CENSORED"

    # append + restart: only the new rows flow
    spark.createDataFrame([(6, "n6")], ["id", "name"]).write.mode("append").parquet(src)
    q2 = Pipeline(spec).start_stream(spark)
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 6


def test_streaming_upsert_spec(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "a2"), (2, 1, "b")], ["id", "ver", "v"]
    ).write.parquet(src)
    spec = {
        "streaming": True,
        "source": {"type": "file_stream", "path": src},
        "sink": {
            "type": "foreach_upsert",
            "path": str(tmp_path / "tbl"),
            "key.fields": ["id"],
            "order.column": "ver",
            "checkpoint": str(tmp_path / "ckpt"),
        },
    }
    q = Pipeline(spec).start_stream(spark)
    q.awaitTermination(120)
    got = {r["id"]: r["v"] for r in spark.read.parquet(str(tmp_path / "tbl")).collect()}
    assert got == {1: "a2", 2: "b"}


def test_streaming_dlq_requires_validate_condition():
    """Streaming DLQ is supported (foreachBatch split, test_pipeline.py);
    a spec without a validate.condition has nothing to split on and must
    fail fast at compile time."""
    with pytest.raises(ValueError, match="validate.condition"):
        Pipeline(
            {
                "streaming": True,
                "source": {"type": "rate"},
                "sink": {"type": "parquet", "path": "x", "checkpoint": "y"},
                "errors": {"tolerance": "all", "dlq": {"type": "parquet", "path": "z"}},
            }
        )


def test_session_totals_timeout_closes_sessions(spark, tmp_path):
    """EventTimeTimeout sessions: a key inactive past the gap emits exactly
    one closed-session record (after the watermark passes) and frees its
    state; an active key emits nothing."""
    from kafka_connect_spark.streaming.stateful import session_totals

    d = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def mk(rows):
        return spark.createDataFrame(rows, ["user_id", "ts_s", "value"]).select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        )

    def drain(out):
        schema = spark.read.parquet(d).schema
        sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
        q = (
            session_totals(sdf, gap_sec=600, watermark="5 minutes")
            .writeStream.foreachBatch(lambda b, i: out.append(b.toPandas()))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # session for user 1: two events within the gap
    mk(
        [(1, "2024-01-01 10:00:00", 2.0), (1, "2024-01-01 10:02:00", 3.0)]
    ).coalesce(1).write.parquet(d)
    out1: list[pd.DataFrame] = []
    drain(out1)
    assert sum(len(p) for p in out1) == 0  # session still open

    # two hours later: watermark passes 10:02+gap, closing user 1's session;
    # user 2's new session stays open
    mk([(2, "2024-01-01 12:00:00", 7.0)]).coalesce(1).write.mode("append").parquet(d)
    out2: list[pd.DataFrame] = []
    drain(out2)
    # one more drain so the timeout fires in a microbatch AFTER the
    # watermark advanced (timeouts are evaluated at batch start)
    mk([(2, "2024-01-01 12:01:00", 1.0)]).coalesce(1).write.mode("append").parquet(d)
    out3: list[pd.DataFrame] = []
    drain(out3)

    closed = pd.concat(out2 + out3, ignore_index=True)
    closed = closed[closed["key"] == 1]
    assert len(closed) == 1
    r = closed.iloc[0]
    assert r["n_events"] == 2 and abs(r["total_value"] - 5.0) < 1e-6
    assert r["session_start_ms"] == 1704103200000  # 2024-01-01 10:00:00 UTC
    assert r["session_end_ms"] == 1704103320000  # 10:02:00
