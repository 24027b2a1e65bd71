"""Streaming semantics (SURVEY.md §5.3): replay the events fixture as a
file stream and assert streaming == batch for windows, watermark late-data
drops, and exactly-once across a kill/restart with the idempotent upsert
sink."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.sinks.upsert import UpsertParquetSink
from kafka_connect_spark.sources.replay import file_replay_stream, write_replay_files
from kafka_connect_spark.streaming.windows import (
    dedup_within_watermark,
    session_agg,
    tumbling_agg,
)


def _replay_dir(spark, sf_dir, tmp_path, n_files=4):
    events = load(spark, sf_dir, "events")
    d = str(tmp_path / "replay")
    write_replay_files(events, d, n_files, "ts")
    return d, events


def _run_available_now(sdf, checkpoint, sink_fn):
    q = (
        sdf.writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    d, events = _replay_dir(spark, sf_dir, tmp_path)
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    agg = tumbling_agg(sdf, watermark="10 minutes")

    out: list[pd.DataFrame] = []
    q = (
        agg.writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = pd.concat(out, ignore_index=True) if out else pd.DataFrame()

    # append mode only emits closed windows: the final (unclosed-by-watermark)
    # windows are withheld, everything emitted must match the batch run.
    batch = tumbling_agg(events).toPandas()
    merged = got.merge(batch, on=["w", "event_type"], suffixes=("_s", "_b"))
    assert len(merged) == len(got) > 0
    assert (merged["cnt_s"] == merged["cnt_b"]).all()
    assert (abs(merged["sum_value_s"] - merged["sum_value_b"]) < 1e-6).all()


def test_streaming_rate_equals_batch(spark, sf_dir, tmp_path):
    """The dashboard's headline rate(counter[1m]) panels run on LIVE
    streams (connect.json:1722,1825): the windowed rate operator must
    produce on a replayed stream exactly what the batch algebra (the
    p3-shape query) computes — tumbling AND sliding."""
    from kafka_connect_spark.streaming.windows import rate_agg

    d, events = _replay_dir(spark, sf_dir, tmp_path)
    clicks = events.filter(F.col("event_type") == "click")

    for slide, ckpt in ((None, "ckpt-rate-t"), ("30 seconds", "ckpt-rate-s")):
        sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema).filter(
            F.col("event_type") == "click"
        )
        agg = rate_agg(sdf, slide=slide, watermark="10 minutes")
        out: list[pd.DataFrame] = []
        q = (
            agg.writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = pd.concat(out, ignore_index=True) if out else pd.DataFrame()

        batch = rate_agg(clicks, slide=slide).toPandas()
        merged = got.merge(batch, on="w", suffixes=("_s", "_b"))
        # append emits only watermark-closed windows; all of them must match
        assert len(merged) == len(got) > 0
        assert (abs(merged["rate_per_sec_s"] - merged["rate_per_sec_b"]) < 1e-9).all()


def test_streaming_session_equals_batch(spark, sf_dir, tmp_path):
    d, events = _replay_dir(spark, sf_dir, tmp_path)
    # restrict to a few users to keep session state small
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema).filter(
        F.col("user_id") < 5
    )
    agg = session_agg(sdf, watermark="30 minutes")
    out: list[pd.DataFrame] = []
    q = (
        agg.writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = pd.concat(out, ignore_index=True)
    batch = session_agg(events.filter(F.col("user_id") < 5)).toPandas()
    merged = got.merge(batch, on=["user_id", "session_start"], suffixes=("_s", "_b"))
    assert len(merged) == len(got) > 0
    assert (merged["cnt_s"] == merged["cnt_b"]).all()


def test_watermark_drops_late_data(spark, tmp_path):
    """Phase 1 advances the watermark past the 10:00 window; phase 2 (same
    checkpoint — the watermark survives restart) delivers an event 2 hours
    late. Update mode must drop it: the 10:00 window never updates again.
    (Complete mode intentionally disables watermark late-row filtering, so
    the test runs in update mode like a production windowed pipeline.)"""
    d = str(tmp_path / "late")
    ckpt = str(tmp_path / "ckpt")

    def mk(rows):
        return spark.createDataFrame(rows, ["ts_s", "value"]).select(
            F.col("ts_s").cast("timestamp").alias("ts"),
            F.lit("e").alias("event_type"),
            "value",
        )

    def drain(out):
        schema = spark.read.parquet(d).schema
        sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
        agg = tumbling_agg(sdf, window="10 minutes", watermark="10 minutes")
        q = (
            agg.writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    on_time = [
        ("2024-01-01 10:00:00", 1.0),
        ("2024-01-01 10:05:00", 1.0),
        ("2024-01-01 12:00:00", 1.0),  # advances watermark far past 10:xx
    ]
    mk(on_time).coalesce(1).write.parquet(d)
    phase1: list[pd.DataFrame] = []
    drain(phase1)
    got1 = pd.concat(phase1, ignore_index=True)
    w10 = got1[got1["w"].astype(str) == "2024-01-01 10:00:00"]
    assert list(w10["sum_value"]) == [2.0]

    # late arrival: 10:01 event when the persisted watermark is ~11:50
    mk([("2024-01-01 10:01:00", 100.0)]).coalesce(1).write.mode("append").parquet(d)
    phase2: list[pd.DataFrame] = []
    drain(phase2)
    got2 = pd.concat(phase2, ignore_index=True) if phase2 else pd.DataFrame(columns=["w"])
    assert (got2["w"].astype(str) != "2024-01-01 10:00:00").all()  # dropped, no update


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Streaming dropDuplicatesWithinWatermark == batch dropDuplicates on
    the emitted keys: redelivered keys within the watermark are suppressed
    even across microbatches, and a duplicate arriving beyond the
    watermark is dropped by the watermark itself."""
    d = str(tmp_path / "dup")
    ckpt = str(tmp_path / "ckpt")

    def mk(rows):
        return spark.createDataFrame(rows, ["id", "ts_s"]).select(
            "id", F.col("ts_s").cast("timestamp").alias("ts")
        )

    def drain(out):
        schema = spark.read.parquet(d).schema
        sdf = file_replay_stream(spark, d, schema)
        deduped = dedup_within_watermark(sdf, ["id"], watermark="10 minutes")
        q = (
            deduped.writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1 = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:01:00"),  # in-batch redelivery
        (2, "2024-01-01 10:02:00"),
    ]
    mk(batch1).coalesce(1).write.parquet(d)
    out1: list[pd.DataFrame] = []
    drain(out1)
    got1 = pd.concat(out1, ignore_index=True)
    assert sorted(got1["id"]) == [1, 2]  # == batch dropDuplicates(["id"])

    # phase 2, same checkpoint: a cross-batch redelivery of id=2 inside the
    # watermark is suppressed by state; id=1 redelivered 2 hours late
    # (beyond the persisted watermark) is dropped; id=3 is new
    mk(
        [
            (2, "2024-01-01 10:03:00"),
            (1, "2024-01-01 08:00:00"),
            (3, "2024-01-01 10:04:00"),
        ]
    ).coalesce(1).write.mode("append").parquet(d)
    out2: list[pd.DataFrame] = []
    drain(out2)
    got2 = pd.concat(out2, ignore_index=True) if out2 else pd.DataFrame(columns=["id"])
    assert sorted(got2["id"]) == [3]

    # end-to-end: every key exactly once — the batch-dedup result
    all_ids = sorted(pd.concat([got1, got2], ignore_index=True)["id"])
    assert all_ids == [1, 2, 3]


def test_stream_static_join(spark, sf_dir, tmp_path):
    """Streaming events enriched against a static dimension table — the
    broadcast-per-microbatch pattern; result equals the batch join."""
    d, events = _replay_dir(spark, sf_dir, tmp_path, n_files=3)
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue")],
        ["event_type", "category"],
    )
    joined = sdf.join(F.broadcast(dim), "event_type")
    out: list[pd.DataFrame] = []
    q = (
        joined.writeStream.foreachBatch(lambda b, i: out.append(b.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = pd.concat(out, ignore_index=True)
    batch = events.join(dim, "event_type").toPandas()
    assert len(got) == len(batch)
    assert got.groupby("category")["event_id"].count().to_dict() == \
        batch.groupby("category")["event_id"].count().to_dict()


def test_stream_stream_join(spark, sf_dir, tmp_path):
    """Stream-stream inner join with watermarks: clicks joined to the same
    user's purchases within [0, 10 min] — state-bounded on both sides;
    result equals the batch interval join."""
    d, events = _replay_dir(spark, sf_dir, tmp_path, n_files=3)
    schema = spark.read.parquet(d).schema

    def side(kind, alias_ts, alias_uid):
        s = (
            file_replay_stream(spark, d, schema)
            .filter(F.col("event_type") == kind)
            .withWatermark("ts", "30 minutes")
        )
        return s.select(
            F.col("user_id").alias(alias_uid),
            F.col("ts").alias(alias_ts),
            F.col("event_id").alias(f"{kind}_id"),
        )

    clicks = side("click", "click_ts", "c_uid")
    buys = side("purchase", "buy_ts", "b_uid")
    joined = clicks.join(
        buys,
        (F.col("c_uid") == F.col("b_uid"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    out: list[pd.DataFrame] = []
    q = (
        joined.writeStream.foreachBatch(lambda b, i: out.append(b.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = pd.concat(out, ignore_index=True) if out else pd.DataFrame()

    e = events
    bc = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    bb = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_uid"), F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = bc.join(
        bb,
        (F.col("c_uid") == F.col("b_uid"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).toPandas()
    assert len(got) == len(batch) > 0
    assert set(zip(got["click_id"], got["purchase_id"])) == set(
        zip(batch["click_id"], batch["purchase_id"])
    )


def test_exactly_once_restart_with_upsert_sink(spark, sf_dir, tmp_path):
    """Kill after the first microbatch, restart from the checkpoint, compare
    to the batch run: at-least-once replay + idempotent MERGE == exactly-once."""
    d, events = _replay_dir(spark, sf_dir, tmp_path, n_files=4)
    schema = spark.read.parquet(d).schema
    sink = UpsertParquetSink(str(tmp_path / "tbl"), ["event_id"], "ts")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: process exactly one file, then stop (simulated crash)
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    seen = []
    q = (
        sdf.writeStream.foreachBatch(
            lambda df, i: (sink.apply_batch(df), seen.append(i))
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    import time

    while not seen:
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(60)
    partial = sink.read(spark).count()

    # phase 2: restart from the same checkpoint, drain the rest
    sdf2 = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    q2 = (
        sdf2.writeStream.foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    total_expected = events.count()
    got = sink.read(spark)
    assert partial < total_expected  # the crash really was mid-stream
    assert got.count() == total_expected  # no loss
    assert got.select("event_id").distinct().count() == total_expected  # no dupes


def test_stream_stream_left_outer_join(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream join: clicks with no purchase in [0,10min]
    must still emit, null-padded, once the watermark passes their join
    window. A far-future sentinel file pushes the watermark at the end so
    the unmatched tail isn't withheld (outer results emit only on
    watermark advance). Result equals the batch left join."""
    import pandas as pd

    d, events = _replay_dir(spark, sf_dir, tmp_path, n_files=3)
    # sentinel: one click a year past the data, in its own LAST-ordered file
    schema = spark.read.parquet(d).schema
    sent = (
        spark.read.parquet(d).limit(1)
        .withColumn("event_id", F.lit(-1).cast("long"))
        .withColumn("user_id", F.lit(-1).cast("long"))
        .withColumn("event_type", F.lit("click"))
        .withColumn("ts", F.lit("2025-06-01 00:00:00").cast("timestamp"))
    )
    sent_path = str(tmp_path / "sentinel")
    sent.select([f.name for f in schema.fields]).coalesce(1).write.parquet(sent_path)
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import time as _time

    for f in _glob.glob(f"{sent_path}/part-*.parquet"):
        dst = _os.path.join(d, "zz-" + _os.path.basename(f))
        _shutil.copy(f, dst)
        t = _time.time() + 60
        _os.utime(dst, (t, t))

    def side(kind, ts_alias, uid_alias, id_alias):
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .filter(F.col("event_type") == kind)
            .withWatermark("ts", "30 minutes")
        )
        return s.select(
            F.col("user_id").alias(uid_alias),
            F.col("ts").alias(ts_alias),
            F.col("event_id").alias(id_alias),
        )

    clicks = side("click", "click_ts", "c_uid", "click_id")
    buys = side("purchase", "buy_ts", "b_uid", "purchase_id")
    joined = clicks.join(
        buys,
        (F.col("c_uid") == F.col("b_uid"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    )
    out: list[pd.DataFrame] = []
    q = (
        joined.writeStream.foreachBatch(lambda b, i: out.append(b.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ck-lo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = pd.concat(out, ignore_index=True)
    got = got[got["click_id"] != -1]  # drop the sentinel itself

    bc = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    bb = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_uid"), F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = bc.join(
        bb,
        (F.col("c_uid") == F.col("b_uid"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    ).toPandas()
    key = lambda df: sorted(  # noqa: E731
        zip(df["click_id"], df["purchase_id"].fillna(-9).astype(int))
    )
    assert key(got) == key(batch)
    # the join is genuinely outer: some clicks emitted null-padded
    assert got["purchase_id"].isna().any()


def test_streaming_deriv_and_predict_linear_equal_batch(spark, sf_dir, tmp_path):
    """p14/p15's streaming twins (verdict r4 #9): the windowed least-squares
    estimators on a replayed stream must equal the same operator run in
    batch — completing the PromQL family's batch<->streaming parity story
    begun with p3/rate. Watermark-closed windows only (append mode)."""
    from kafka_connect_spark.streaming.windows import deriv_agg, predict_linear_agg

    d, events = _replay_dir(spark, sf_dir, tmp_path)
    # a few series keeps sliding-window state small in the test
    batch_src = events.filter(F.col("user_id") < 8)

    for op, val_col, ckpt in (
        (deriv_agg, "deriv_per_sec", "ckpt-deriv"),
        (predict_linear_agg, "predicted", "ckpt-predict"),
    ):
        sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema).filter(
            F.col("user_id") < 8
        )
        agg = op(sdf, window="30 minutes", slide="10 minutes", watermark="30 minutes")
        out: list[pd.DataFrame] = []
        q = (
            agg.writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = pd.concat(out, ignore_index=True) if out else pd.DataFrame()

        batch = op(batch_src, window="30 minutes", slide="10 minutes").toPandas()
        merged = got.merge(batch, on=["w", "user_id"], suffixes=("_s", "_b"))
        # every emitted (closed) window must match the batch value exactly
        assert len(merged) == len(got) > 0
        assert (abs(merged[f"{val_col}_s"] - merged[f"{val_col}_b"]) < 1e-9).all()


def test_streaming_incremental_dedup_equals_batch(spark, sf_dir, tmp_path):
    """x37's live-ingest shape: the NEW crawl arrives as a stream, is
    anti-joined per microbatch against the STATIC corpus fingerprint index
    (stream-static join), and deduped within the stream. The set of kept
    fingerprints — and hence the kept-doc count — must equal the batch x37
    run. (Which representative doc survives a dup group is arrival-order
    in streaming vs min-id in batch; sets, not ids, are the invariant.)"""
    from kafka_connect_spark.catalog import load
    from kafka_connect_spark.functions.textfns import fingerprint
    from kafka_connect_spark.queries import QUERIES

    docs = load(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("source") == "src0")
    d = str(tmp_path / "replay-docs")
    write_replay_files(new_batch, d, 3, "doc_id")

    ref = (
        docs.filter(F.col("source") != "src0")
        .select(fingerprint("text").alias("h"))
        .distinct()
    )

    sdf = (
        file_replay_stream(spark, d, spark.read.parquet(d).schema)
        .select("doc_id", fingerprint("text").alias("h"))
        .join(ref, "h", "left_anti")
        .dropDuplicates(["h"])
    )
    kept: list[tuple] = []
    q = (
        sdf.writeStream.foreachBatch(
            lambda df, i: kept.extend((r["doc_id"], r["h"]) for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt-incdedup"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = QUERIES["x37_incremental_dedup"](spark, sf_dir)
    batch_ids = {r["doc_id"] for r in batch.collect()}
    batch_hashes = {
        r["h"]
        for r in new_batch.select("doc_id", fingerprint("text").alias("h"))
        .join(ref, "h", "left_anti")
        .select("h")
        .distinct()
        .collect()
    }
    assert len(kept) == len(batch_ids) > 0
    assert {h for _, h in kept} == batch_hashes


def test_streaming_session_funnel_equals_batch(spark, sf_dir, tmp_path):
    """x41's live shape: funnel flags as conditional min/max aggregates
    inside session_window on a replayed stream. Session boundaries are the
    same 5-minute gap as x41's lag+cumsum sessionization (proven equivalent
    by the x11c oracle), so per-user converting-session counts must match
    the batch x41 run for users whose sessions all closed under the
    watermark."""
    from kafka_connect_spark.queries import QUERIES

    d, events = _replay_dir(spark, sf_dir, tmp_path)
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema).filter(
        F.col("user_id") < 8
    )
    agg = (
        sdf.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "5 minutes").alias("sw"), "user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
                "first_click"
            ),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "last_purchase"
            ),
        )
    )
    out: list[pd.DataFrame] = []
    q = (
        agg.writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-funnel"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = pd.concat(out, ignore_index=True)
    got["converting"] = got["first_click"].notna() & (
        got["last_purchase"] > got["first_click"]
    )
    stream_conv = got.groupby("user_id")["converting"].sum()

    batch = (
        QUERIES["x41_session_funnel"](spark, sf_dir)
        .filter(F.col("user_id") < 8)
        .toPandas()
        .set_index("user_id")
    )
    # append mode withholds sessions still open at end-of-stream; every
    # user whose stream emitted ALL their sessions must match exactly
    sessions_emitted = got.groupby("user_id").size()
    full = sessions_emitted[sessions_emitted == batch["n_sessions"]].index
    assert len(full) > 0
    for uid in full:
        assert int(stream_conv[uid]) == int(batch.loc[uid, "n_converting"])


def test_streaming_downsample_tier_equals_batch(spark, sf_dir, tmp_path):
    """Continuous-aggregate maintenance: the streamed 5m tier (closed
    windows only) matches the batch 5m aggregation exactly, and the 1h
    tier ROLLED UP FROM THE STREAMED TIER matches the 1h aggregation
    computed from raw — the decomposable-partials property x73 relies on,
    proven across the batch/streaming boundary."""
    from kafka_connect_spark.streaming.windows import (
        downsample_tier_stream,
        rollup_tier,
    )

    d, events = _replay_dir(spark, sf_dir, tmp_path)
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    tier_path = str(tmp_path / "tier5m")

    q = (
        downsample_tier_stream(sdf)
        .writeStream.format("parquet")
        .option("path", tier_path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(tier_path)
    batch5 = (
        events.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .select(F.col("win.start").alias("bucket_start"), "event_type",
                "n", "s", "min_v", "max_v")
    )
    sp = streamed.toPandas().sort_values(["bucket_start", "event_type"], ignore_index=True)
    bp = batch5.toPandas().sort_values(["bucket_start", "event_type"], ignore_index=True)
    # closed-window subset: every streamed row must equal its batch twin
    assert len(sp) > 0
    merged = sp.merge(bp, on=["bucket_start", "event_type"], suffixes=("_s", "_b"))
    assert len(merged) == len(sp)
    for c in ("n", "s", "min_v", "max_v"):
        assert (merged[f"{c}_s"] == merged[f"{c}_b"]).all(), c

    # coarser tier from streamed partials == coarser tier from raw, over the
    # hours whose 5m windows all closed
    r1h = rollup_tier(streamed, "hour").toPandas()
    b1h = rollup_tier(batch5, "hour").toPandas()
    m = r1h.merge(b1h, on=["bucket_start", "event_type"], suffixes=("_s", "_b"))
    closed_hours = set(
        sp.groupby([sp["bucket_start"].dt.floor("h"), "event_type"])["bucket_start"].count().index
    )
    full = m[[(r["bucket_start"], r["event_type"]) in closed_hours
              and r["n_s"] == r["n_b"] for _, r in m.iterrows()]]
    assert len(full) > 0
    assert (full["s_s"] == full["s_b"]).all()


def test_streaming_mg_heavy_hitters_equals_batch(spark, sf_dir, tmp_path):
    """x76's streaming twin: sharded Misra-Gries summaries in checkpointed
    state over a replayed token stream. The final per-shard summaries must
    (a) stay within the bounded-state budget, (b) form a superset of the
    true heavy hitters, and (c) after the exact rescore, equal the batch
    operator's output exactly."""
    from kafka_connect_spark.functions.sketchfns import frequent_terms_exact
    from kafka_connect_spark.streaming.stateful import streaming_mg_candidates

    docs = load(spark, sf_dir, "documents")
    terms_batch = docs.select(F.explode(F.split("text", " ")).alias("term"))
    d = str(tmp_path / "mg-replay")
    # replay the exploded token stream in 4 files => >= 4 microbatches
    write_replay_files(terms_batch.withColumn("ts", F.lit(0).cast("timestamp")), d, 4, "term")

    capacity, n_shards = 8, 4  # vocab 31 > total capacity pressure per shard
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []

    def sink(df, bid):
        pdf = df.toPandas()
        pdf["bid"] = bid
        out.append(pdf)

    q = (
        streaming_mg_candidates(sdf, "term", capacity=capacity, n_shards=n_shards)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt-mg"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = pd.concat(out, ignore_index=True)
    # latest emission per shard is its current summary
    last_bid = emitted.groupby("shard")["bid"].max()
    final = emitted[
        emitted["bid"] == emitted["shard"].map(last_bid)
    ]
    assert final.groupby("shard").size().max() <= capacity  # bounded state
    cands = set(final["term"])

    n = terms_batch.count()
    denom = 9  # threshold n/9 ~ 3018: guarantee covers > N_shard/(cap+1)
    truth = (
        terms_batch.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * denom > F.lit(n))
        .toPandas()
    )
    assert set(truth["term"]) <= cands  # superset guarantee held on the stream

    # exact rescore of streaming candidates == batch operator output
    cand_df = spark.createDataFrame([(t,) for t in sorted(cands)], "term string")
    rescored = (
        terms_batch.join(F.broadcast(cand_df), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * denom > F.lit(n))
        .orderBy("term")
        .toPandas()
    )
    batch = (
        frequent_terms_exact(terms_batch, "term", denom=denom, capacity=capacity * n_shards)
        .toPandas()
    )
    assert rescored.reset_index(drop=True).equals(batch.reset_index(drop=True))


def test_transform_with_state_gaps_equal_batch(spark, sf_dir, tmp_path):
    """Spark 4 state-v2 (transformWithStateInPandas): per-key inter-arrival
    gaps with the last-seen timestamp in a ValueState must equal the batch
    lag() computation row-for-row across microbatch boundaries. The
    integration needs protobuf (state-server protocol) — gated like the
    live-Kafka paths; the processor logic itself is tested unconditionally
    below."""
    import pytest
    from pyspark.sql import Window

    from kafka_connect_spark.streaming.stateful_v2 import (
        HAS_TRANSFORM_WITH_STATE,
        inter_arrival_gaps,
    )

    if not HAS_TRANSFORM_WITH_STATE:
        pytest.skip("protobuf not available: transformWithStateInPandas state server cannot start")

    d, events = _replay_dir(spark, sf_dir, tmp_path)
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema).filter(
        F.col("user_id") < 10
    )
    out: list[pd.DataFrame] = []
    q = (
        inter_arrival_gaps(sdf)
        .writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-tws"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        pd.concat(out, ignore_index=True)
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )

    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    want = (
        events.filter(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
        )
        .toPandas()
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )
    assert len(got) == len(want) > 0
    assert got["event_id"].equals(want["event_id"].astype("int64"))
    g = got["gap_us"].astype("float64")
    wv = want["gap_us"].astype("float64")
    assert ((g == wv) | (g.isna() & wv.isna())).all()


def test_gap_processor_logic_carries_state_across_batches():
    """Unit-level: _GapProcessor's per-batch logic (sort, diff, carry the
    last-seen ordinal in ValueState) — runs with a stub state handle, no
    state server needed."""
    import pandas as pd

    from kafka_connect_spark.streaming.stateful_v2 import _GapProcessor

    class StubState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, t):
            self.v = tuple(t)

    class StubHandle:
        def getValueState(self, name, schema):
            return StubState()

    p = _GapProcessor()
    p.init(StubHandle())
    b1 = pd.DataFrame({"ts_us": [300, 100], "event_id": [3, 1]})  # out of order
    out1 = next(p.handleInputRows((7,), iter([b1]), None))
    assert list(out1["event_id"]) == [1, 3]
    assert out1["gap_us"].isna().iloc[0] and out1["gap_us"].iloc[1] == 200
    b2 = pd.DataFrame({"ts_us": [450], "event_id": [9]})
    out2 = next(p.handleInputRows((7,), iter([b2]), None))
    assert out2["gap_us"].iloc[0] == 150  # state carried: 450 - 300


def test_streaming_ordered_funnel_equals_batch(spark, sf_dir, tmp_path):
    """x82's streaming twin: the greedy earliest-chain funnel is
    prefix-monotone, so per-user (pk1, pk2, pk3) state fed chronological
    microbatches must end exactly where the batch operator lands —
    reached flags AND conversion seconds."""
    from kafka_connect_spark.queries.metrics import x82_ordered_funnel
    from kafka_connect_spark.streaming.stateful import streaming_ordered_funnel

    d, events = _replay_dir(spark, sf_dir, tmp_path)
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []

    def sink(df, bid):
        pdf = df.toPandas()
        pdf["bid"] = bid
        out.append(pdf)

    q = (
        streaming_ordered_funnel(sdf)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt-funnel"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = pd.concat(out, ignore_index=True)
    # last emission per user = final funnel state
    last = emitted.loc[emitted.groupby("user_id")["bid"].idxmax()].set_index("user_id")

    batch = x82_ordered_funnel(spark, sf_dir).toPandas().set_index("user_id")
    assert set(last.index) == set(batch.index)
    for uid in batch.index:
        b, s = batch.loc[uid], last.loc[uid]
        assert int(b["reached_view"]) == int(pd.notna(s["pk1"]))
        assert int(b["reached_click"]) == int(pd.notna(s["pk2"]))
        assert int(b["reached_purchase"]) == int(pd.notna(s["pk3"]))
        if int(b["reached_purchase"]):
            # unpack: ordinal // 1e4 = epoch_us - base (base cancels in diff)
            secs = (int(s["pk3"]) // 10_000 - int(s["pk1"]) // 10_000) // 1_000_000
            assert secs == int(b["secs_to_convert"])


def test_streaming_alert_firing_equals_batch(spark, sf_dir, tmp_path):
    """p29's streaming twin: replaying per-bucket counts through the
    stateful for-duration evaluator must fire exactly the runs the batch
    gaps-and-islands construction reports, at the same firing bucket.
    (Thresholds are scaled to the test fixture; the registry query pins
    the sf0.01 parameters.)"""
    from pyspark.sql import Window

    from kafka_connect_spark.streaming.stateful import streaming_alert_for_duration

    THRESH, FOR_N = 1, 3

    events = load(spark, sf_dir, "events")
    buckets = (
        events.select(
            F.col("event_type").alias("et"),
            F.floor(F.unix_millis("ts") / F.lit(600_000)).cast("long").alias("bk"),
        )
        .groupBy("et", "bk")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    d = str(tmp_path / "alert-replay")
    write_replay_files(buckets.withColumn("ts", F.lit(0).cast("timestamp")), d, 4, "bk")
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    out: list[pd.DataFrame] = []
    q = (
        streaming_alert_for_duration(sdf, threshold=THRESH, for_buckets=FOR_N)
        .writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt-alert"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = pd.concat(out, ignore_index=True)
    fires = {
        (r.et, r.pending_since, r.bk)
        for r in emitted[emitted["status"] == "firing"].itertuples()
    }
    breach = buckets.filter(F.col("n") >= THRESH)
    wdw = Window.partitionBy("et").orderBy("bk")
    runs = breach.select("et", "bk", (F.col("bk") - F.row_number().over(wdw)).alias("grp"))
    batch = (
        runs.groupBy("et", "grp")
        .agg(F.min("bk").alias("pending_since"), F.count(F.lit(1)).alias("run_len"))
        .filter(F.col("run_len") >= FOR_N)
        .toPandas()
    )
    want = {
        (r.et, r.pending_since, r.pending_since + FOR_N - 1)
        for r in batch.itertuples()
    }
    assert fires == want and len(want) > 0


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream INNER interval join (streaming/joins.py)
    == the batch range join (x158), row-for-row: replay the events fixture
    in event order (zero lateness), join views to purchases within 30
    minutes per user on two streaming readers over the same replay dir,
    and compare the emitted pair set to the registered batch twin."""
    from kafka_connect_spark.queries.relational import x158_view_purchase_attribution
    from kafka_connect_spark.streaming.joins import interval_join_attribution

    d, _ = _replay_dir(spark, sf_dir, tmp_path, n_files=6)
    schema = spark.read.parquet(d).schema
    views = file_replay_stream(spark, d, schema).filter(
        F.col("event_type") == "view"
    )
    purchases = file_replay_stream(spark, d, schema).filter(
        F.col("event_type") == "purchase"
    )
    joined = interval_join_attribution(
        views, purchases, window_minutes=30, watermark="60 minutes"
    )

    out: list[pd.DataFrame] = []
    q = (
        joined.writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        pd.concat(out, ignore_index=True)
        .sort_values(["purchase_id", "view_id"], ignore_index=True)
        if out
        else pd.DataFrame()
    )
    want = x158_view_purchase_attribution(spark, sf_dir).toPandas()
    assert len(got) == len(want) > 0
    for col in ["user_id", "view_id", "purchase_id", "gap_sec"]:
        assert (
            got[col].astype("int64").values == want[col].astype("int64").values
        ).all(), col


def test_stream_stream_outer_join_nulls_are_unattributed(spark, sf_dir, tmp_path):
    """Stream-stream OUTER interval join: matched rows must equal the inner
    join (x158) exactly, and every NULL-view row emitted must be a true
    unattributed purchase (x162). Outer rows for the stream's tail may be
    withheld (the final watermark never passes them) — the emitted set
    must still cover most of the batch answer on this multi-day replay."""
    from kafka_connect_spark.queries.relational import (
        x158_view_purchase_attribution,
        x162_unattributed_purchases,
    )
    from kafka_connect_spark.streaming.joins import interval_join_attribution

    d, _ = _replay_dir(spark, sf_dir, tmp_path, n_files=6)
    schema = spark.read.parquet(d).schema
    views = file_replay_stream(spark, d, schema).filter(F.col("event_type") == "view")
    purchases = file_replay_stream(spark, d, schema).filter(
        F.col("event_type") == "purchase"
    )
    joined = interval_join_attribution(
        views, purchases, window_minutes=30, watermark="60 minutes", how="right_outer"
    )
    out: list[pd.DataFrame] = []
    q = (
        joined.writeStream.foreachBatch(lambda df, i: out.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt_ssoj"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = pd.concat(out, ignore_index=True)
    matched = got[got["view_id"].notna()]
    nulls = got[got["view_id"].isna()]

    want_pairs = x158_view_purchase_attribution(spark, sf_dir).toPandas()
    assert len(matched) == len(want_pairs)
    got_keys = set(zip(matched["view_id"].astype("int64"),
                       matched["purchase_id"].astype("int64")))
    want_keys = set(zip(want_pairs["view_id"], want_pairs["purchase_id"]))
    assert got_keys == want_keys

    want_un = set(x162_unattributed_purchases(spark, sf_dir).toPandas()["purchase_id"])
    null_ids = set(nulls["purchase_id"].astype("int64"))
    assert null_ids <= want_un          # no false unattributed rows, ever
    assert len(null_ids) > 0.8 * len(want_un)  # tail-withholding only
