"""Sustained-replay state bounds for the stateful streaming twins.

The batch twins are scale-probed in docs/SCALING.md; these tests close the
OTHER loop the round-7 verdict asked for (#7): drive 100+ microbatches
through each stateful operator and assert the state-store row count stays
at its documented bound for EVERY microbatch — i.e. the streaming state is
bounded by the key space, never by stream length or batch count.

Method: replay the fixture through ``write_replay_files(n_files=128)`` /
``maxFilesPerTrigger=1`` (128 real microbatches against one checkpoint),
capture ``stateOperators[0].numRowsTotal`` from every
StreamingQueryProgress, and check bound + plateau.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.catalog import load
from kafka_connect_spark.sources.replay import file_replay_stream, write_replay_files

N_FILES = 128


def _state_rows_per_batch(spark, tmp_path, name, src, order_col, build, mode):
    """Run ``build(stream)`` over a 128-file replay of ``src``; return the
    [(batchId, state numRowsTotal), ...] trace."""
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")
    d = str(tmp_path / f"{name}-replay")
    write_replay_files(src, d, N_FILES, order_col)
    sdf = file_replay_stream(spark, d, spark.read.parquet(d).schema)
    sink: list = []
    q = (
        build(sdf)
        .writeStream.foreachBatch(lambda df, bid: sink.append(df.count()))
        .option("checkpointLocation", str(tmp_path / f"{name}-ckpt"))
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    trace = [
        (p["batchId"], p["stateOperators"][0]["numRowsTotal"])
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    assert len(trace) >= 100, f"only {len(trace)} microbatches recorded"
    return trace, sink


def test_cusum_state_bounded_over_128_microbatches(spark, sf_dir, tmp_path):
    """CUSUM state is 2 BIGINTs per event_type: numRowsTotal must sit at
    <= n_types for all 128 microbatches — O(1) per key, O(keys) total,
    independent of how many days stream through."""
    from kafka_connect_spark.streaming.drift import streaming_cusum

    e = load(spark, sf_dir, "events")
    # hour-granularity periods: the fixture spans ~30 calendar days, which
    # caps day-level replay below the 100-microbatch bar; the recursion is
    # agnostic to what the period string means
    day = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd HH").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    n_types = day.select("event_type").distinct().count()
    cal = {
        r["event_type"]: (1, 0, 1 << 62)  # quiet calibration; bound test only
        for r in day.select("event_type").distinct().collect()
    }
    trace, _ = _state_rows_per_batch(
        spark,
        tmp_path,
        "cusum",
        day,
        "day",
        lambda sdf: streaming_cusum(sdf, cal),
        "update",
    )
    assert max(rows for _, rows in trace) <= n_types
    # plateau: once every type has appeared the state never grows again
    assert trace[-1][1] == max(rows for _, rows in trace)


def test_hll_register_state_bounded_over_128_microbatches(
    spark, sf_dir, tmp_path
):
    """HLL register state is <= 1024 rows per scope regardless of entity
    volume: the whole point of the sketch twin is that streaming distinct
    tracking does NOT need dropDuplicates' unbounded key state."""
    from kafka_connect_spark.streaming.drift import hll_registers

    e = load(spark, sf_dir, "events")
    # the sf0.001 fixture has only 1000 events, below the 1024-register
    # cap; fan each event into 4 sub-entities so the entity volume (4000)
    # clearly exceeds what naive dropDuplicates state would hold
    raw = e.select(
        "event_type",
        "user_id",
        "ts",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("sub"),
    ).select(
        "event_type",
        F.concat_ws(
            ":",
            F.col("user_id").cast("string"),
            F.col("ts").cast("string"),
            F.col("sub").cast("string"),
        ).alias("entity"),
        "ts",
    )
    n_scopes = raw.select("event_type").distinct().count()
    n_entities = raw.select("entity").distinct().count()
    assert n_entities > 1024  # the bound must actually bind vs naive state
    trace, _ = _state_rows_per_batch(
        spark,
        tmp_path,
        "hll",
        raw,
        "ts",
        lambda sdf: hll_registers(sdf, "event_type", "entity"),
        "complete",
    )
    assert max(rows for _, rows in trace) <= 1024 * n_scopes
    assert trace[-1][1] == max(rows for _, rows in trace)


def test_mg_state_bounded_over_128_microbatches(spark, sf_dir, tmp_path):
    """Misra-Gries heavy-hitter state is one row per SHARD (the whole
    summary rides in that row's two array columns, itself compacted to
    <= capacity counters every microbatch): numRowsTotal must sit at
    <= n_shards for all 128 microbatches even though the streamed
    vocabulary is far larger than n_shards x capacity — the unbounded
    wordcount-state case the operator exists to avoid. The emitted
    survivor rows per batch are likewise <= n_shards x capacity."""
    from kafka_connect_spark.streaming.stateful import streaming_mg_candidates

    # the sf0.001 synthetic text has a ~31-term vocabulary; keep
    # n_shards x capacity well below it so the MG compaction actually
    # binds (asserted below) instead of degenerating to exact wordcount
    capacity, n_shards = 3, 4
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    vocab = toks.select("term").distinct().count()
    assert vocab > capacity * n_shards  # the cap must actually bind
    trace, sink = _state_rows_per_batch(
        spark,
        tmp_path,
        "mg",
        toks,
        "doc_id",
        lambda sdf: streaming_mg_candidates(
            sdf, capacity=capacity, n_shards=n_shards
        ),
        "update",
    )
    assert max(rows for _, rows in trace) <= n_shards
    assert trace[-1][1] == max(rows for _, rows in trace)
    # each batch's emission is the current summaries: <= shards x capacity
    assert max(sink) <= n_shards * capacity


def test_funnel_state_bounded_over_128_microbatches(spark, sf_dir, tmp_path):
    """Ordered-funnel state is exactly three int64 ordinals per user:
    numRowsTotal must sit at <= distinct users across a 128-microbatch
    replay and plateau once every user has appeared — stream length and
    per-user event volume never grow it."""
    from kafka_connect_spark.streaming.stateful import streaming_ordered_funnel

    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts"
    )
    n_users = e.select("user_id").distinct().count()
    trace, _ = _state_rows_per_batch(
        spark,
        tmp_path,
        "funnel",
        e,
        "ts",
        streaming_ordered_funnel,
        "update",
    )
    assert max(rows for _, rows in trace) <= n_users
    assert trace[-1][1] == max(rows for _, rows in trace)


def test_session_state_tracks_active_keys_only(spark, sf_dir, tmp_path):
    """session_totals state must EVICT on event-time timeout: across a
    128-microbatch replay the state row count stays <= distinct users and
    visibly shrinks when the watermark closes sessions — the growing-key-
    space case the round-7 verdict flagged."""
    from kafka_connect_spark.streaming.stateful import session_totals

    e = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    n_users = e.select("user_id").distinct().count()
    trace, sink = _state_rows_per_batch(
        spark,
        tmp_path,
        "session",
        e,
        "ts",
        lambda sdf: session_totals(sdf, gap_sec=600),
        "append",
    )
    rows = [r for _, r in trace]
    assert max(rows) <= n_users
    # eviction observed: some batch's state is smaller than a prior one
    assert any(b < a for a, b in zip(rows, rows[1:]))
    # closed sessions were actually emitted by the timeout path
    assert sum(sink) > 0


def test_interarrival_state_bounded_over_128_microbatches(
    spark, sf_dir, tmp_path
):
    """streaming_interarrival's state is ONE int64 clock per event type:
    numRowsTotal must sit at <= n_types across a 128-microbatch replay —
    gap extraction needs no window state and no event buffering."""
    from kafka_connect_spark.streaming.stateful import streaming_interarrival

    e = load(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    n_types = e.select("event_type").distinct().count()
    trace, sink = _state_rows_per_batch(
        spark,
        tmp_path,
        "interarrival",
        e,
        "ts",
        streaming_interarrival,
        "update",
    )
    assert max(rows for _, rows in trace) <= n_types
    assert trace[-1][1] == max(rows for _, rows in trace)
    # every event except each type's first yields exactly one gap
    assert sum(sink) == e.count() - n_types


def test_mcnemar_state_bounded_over_128_microbatches(spark, sf_dir, tmp_path):
    """The McNemar/confusion complete-mode aggregate is ONE global group:
    numRowsTotal must sit at exactly 1 for all 128 microbatches — online
    eval over an unbounded prediction stream costs five counters, ever
    (the row-exactness pin lives in tests/test_streaming_eval.py; this is
    the sustained-replay bound)."""
    from kafka_connect_spark.functions.evalfns import (
        confusion_mcnemar,
        lid_labels,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    trace, _ = _state_rows_per_batch(
        spark,
        tmp_path,
        "mcnemar",
        docs,
        "doc_id",
        lambda sdf: confusion_mcnemar(lid_labels(sdf)),
        "complete",
    )
    assert max(rows for _, rows in trace) == 1


def test_ewma_state_bounded_over_128_microbatches(spark, sf_dir, tmp_path):
    """streaming_ewma state is one row per event_type holding a <=30-entry
    trailing window in its array columns: numRowsTotal must sit at
    <= n_types for all 128 microbatches — bounded by the WINDOW x keys,
    never by how many days stream through. Hour-granularity periods keep
    the replay above the 100-microbatch bar (the fixture spans ~30
    calendar days); the ordinal parse uses the date PREFIX, so the 30-day
    eviction horizon still caps the state arrays at window x 24 entries
    inside the one row per type."""
    from kafka_connect_spark.streaming.drift import streaming_ewma

    e = load(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd HH").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    n_types = day.select("event_type").distinct().count()
    trace, _ = _state_rows_per_batch(
        spark, tmp_path, "ewma", day, "day", streaming_ewma, "update"
    )
    assert max(rows for _, rows in trace) <= n_types
    assert trace[-1][1] == max(rows for _, rows in trace)


def test_brier_bins_state_bounded_over_128_microbatches(
    spark, sf_dir, tmp_path
):
    """brier_bins is a plain streaming aggregation keyed by the 10-bin
    forecast domain: numRowsTotal must sit at <= 10 for all 128
    microbatches regardless of document volume."""
    from kafka_connect_spark.streaming.drift import brier_bins

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    trace, _ = _state_rows_per_batch(
        spark,
        tmp_path,
        "brierbins",
        docs,
        "doc_id",
        lambda sdf: brier_bins(
            sdf.select(
                (F.col("lang") == "en").cast("long").alias("y"),
                F.least(
                    F.expr(
                        "cast(size(filter(split(text, ' '), t ->"
                        " array_contains(array('a','the','of','and','to','in'), t)))"
                        " as bigint) * 5000000 div size(split(text, ' '))"
                    ),
                    F.lit(1_000_000).cast("bigint"),
                ).alias("p"),
            )
        ),
        "complete",
    )
    assert max(rows for _, rows in trace) <= 10
    assert trace[-1][1] == max(rows for _, rows in trace)
