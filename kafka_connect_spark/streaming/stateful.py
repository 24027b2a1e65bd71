"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for operator semantics Spark's built-in stateful ops
(windows, dedup, stream joins) can't express — per-key accumulators that
survive across microbatches, backed by the same checkpointed state store
as the built-ins. The reference's analog is connector-task state persisted
in connect-offset-storage (SURVEY.md §2.1 offset/state store row).

``running_totals``: per-key event count + value sum, emitting the updated
total every microbatch — the streaming version of the dashboard's
cumulative counter (SURVEY.md §2.5 P6). State is one tiny tuple per key,
partitioned by the grouping key => scales with |keys|, not |events|."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 6)))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [round(total, 6)]})


SESSION_OUTPUT = StructType(
    [
        StructField("key", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
    ]
)


def session_totals(
    sdf: DataFrame,
    gap_sec: int = 600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Custom SESSION operator with an explicit inactivity timeout —
    ``session_window`` (X11) emits sessions only via the aggregation path;
    this is the applyInPandasWithState version for when a session close
    must RUN CODE (flush to a sink, emit exactly one summary record — the
    connector-task-flush analog). State = one (n, total, start, last)
    tuple per key; EventTimeTimeout fires when the watermark passes
    last_event + gap, emitting the closed session and freeing the state —
    so state size tracks ACTIVE keys only."""
    from pyspark.sql import functions as F

    gap_ms = gap_sec * 1000

    def update(key, pdfs, state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total, start_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                    "session_start_ms": [start_ms],
                    "session_end_ms": [last_ms],
                }
            )
            return
        n, total, start_ms, last_ms = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            lo = int(pdf["ts"].min().value // 1_000_000)
            hi = int(pdf["ts"].max().value // 1_000_000)
            start_ms = lo if start_ms is None else min(start_ms, lo)
            last_ms = hi if last_ms is None else max(last_ms, hi)
        state.update((n, round(total, 6), start_ms, last_ms))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        return
        yield  # pragma: no cover — makes the function a generator

    return (
        sdf.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_totals(sdf: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Checkpointed per-key running totals over a streaming DataFrame."""
    from pyspark.sql import functions as F

    return (
        sdf.select(F.col(key_col).alias("key"), F.col(value_col).alias("value"))
        .groupBy("key")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CHANGE_OUTPUT = StructType(
    [
        StructField("key", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)

CHANGE_STATE = StructType([StructField("last", DoubleType())])


def emit_on_change(
    sdf: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """CDC compaction / change detection: per key, emit a row only when its
    value DIFFERS from the previously emitted one — consecutive repeats are
    suppressed (Kafka Connect users run this to thin chatty poll sources;
    Debezium calls the batch analog 'drop unchanged'). State per key is a
    single last-value double, so the store scales with |keys|. Rows inside
    a microbatch are processed in (ts, id) order, making the operator
    deterministic under replay; batch-vs-streaming equivalence is asserted
    in tests (the batch twin is the x31 lag-window query)."""
    from pyspark.sql import functions as F

    def update(key, pdfs, state: GroupState) -> Iterator[pd.DataFrame]:
        prev = state.get[0] if state.exists else None
        # A key's microbatch arrives as MULTIPLE Arrow chunks (split at
        # spark.sql.execution.arrow.maxRecordsPerBatch) in arbitrary
        # upstream order — materialize them all before the single sort, or
        # the (ts, id) ordering only holds within a chunk.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((prev,))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        values = pdf["value"].astype("float64")
        # After each row, the last-emitted value ALWAYS equals that row's
        # value (emitted: trivially; suppressed: equality was why) — so
        # suppression reduces to one vectorized compare against the
        # previous row, seeded with the carried state.
        keep = values.ne(values.shift(1)) if prev is None else values.ne(
            values.shift(1, fill_value=float(prev))
        )
        if prev is None:
            keep.iloc[0] = True
        state.update((float(values.iloc[-1]),))
        out = pdf.loc[keep]
        if len(out):
            yield pd.DataFrame(
                {
                    "key": key[0],
                    "event_id": out["event_id"].astype("int64"),
                    "value": out["value"].astype("float64"),
                }
            )

    return (
        sdf.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("event_id"),
            F.col(value_col).alias("value"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=CHANGE_OUTPUT,
            stateStructType=CHANGE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


MG_OUTPUT = StructType(
    [
        StructField("shard", LongType()),
        StructField("term", StringType()),
        StructField("lb", LongType()),
    ]
)

MG_STATE = StructType(
    [
        StructField("terms", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def streaming_mg_candidates(
    sdf: DataFrame,
    term_col: str = "term",
    capacity: int = 64,
    n_shards: int = 16,
) -> DataFrame:
    """Streaming heavy-hitter candidates with BOUNDED state: the
    continuous twin of functions/sketchfns.py (x76).

    Terms are sharded by hash so each term lives wholly in one shard;
    every shard keeps one Misra-Gries summary of at most ``capacity``
    counters in checkpointed state (mergeable-summaries compaction on
    each microbatch). A streaming wordcount's state grows with the
    vocabulary — unbounded on a web-scale stream; this keeps exactly
    n_shards x capacity counters total while preserving the MG guarantee
    per shard: any term whose global count exceeds N_shard/(capacity+1)
    is in that shard's survivors, and since a term's shard sees ALL its
    occurrences, every global heavy hitter survives. Each microbatch
    emits the owning shard's current survivors with their lower-bound
    counts (update mode); the latest emission per shard IS its current
    summary. Exact counts come from a rescore pass over the stored raw
    stream, as in the batch operator."""
    from pyspark.sql import functions as F

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            terms, counts = state.get
            counters = dict(zip(terms, counts))
        else:
            counters = {}
        for pdf in pdfs:
            for t, c in pdf[term_col].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > capacity:
                delta = sorted(counters.values(), reverse=True)[capacity]
                counters = {t: c - delta for t, c in counters.items() if c - delta > 0}
        state.update((list(counters.keys()), [int(v) for v in counters.values()]))
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(counters),
                "term": list(counters.keys()),
                "lb": [int(v) for v in counters.values()],
            }
        )

    return (
        sdf.select(
            F.pmod(F.xxhash64(F.col(term_col)), F.lit(n_shards)).alias("shard"),
            F.col(term_col).alias(term_col),
        )
        .groupBy("shard")
        .applyInPandasWithState(
            update,
            outputStructType=MG_OUTPUT,
            stateStructType=MG_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_ordered_funnel(sdf, steps=("view", "click", "purchase")):
    """Streaming twin of x82's three-step ordered funnel: per user, the
    state is just the three earliest step ordinals found so far (pk1 <=
    pk2 <= pk3, later steps only accepted strictly after the earlier
    ones). Greedy earliest-chain is PREFIX-MONOTONE: feeding events in
    chronological chunks can only ever fill a later slot, never change a
    filled one, so the final state equals the batch answer regardless of
    how the stream is micro-batched (the twin test replays the fixture
    in 4 chunks and asserts exact equality with x82).

    State per user: three int64s (ordinals stored as exact integers in
    the state tuple). Emits the user's current (pk1, pk2, pk3) snapshot
    every time it changes (update mode)."""
    import pandas as pd

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("pk1", LongType()),
            StructField("pk2", LongType()),
            StructField("pk3", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("pk1", LongType()),
            StructField("pk2", LongType()),
            StructField("pk3", LongType()),
        ]
    )
    s1, s2, s3 = steps

    def update(key, pdfs, state: GroupState):
        pk1, pk2, pk3 = state.get if state.exists else (None, None, None)
        frames = [p for p in pdfs]
        pdf = pd.concat(frames, ignore_index=True).sort_values(
            ["pk", "event_type"], ignore_index=True
        )
        for _, row in pdf.iterrows():
            et, pk = row["event_type"], int(row["pk"])
            if et == s1 and pk1 is None:
                pk1 = pk
            elif et == s2 and pk1 is not None and pk2 is None and pk > pk1:
                pk2 = pk
            elif et == s3 and pk2 is not None and pk3 is None and pk > pk2:
                pk3 = pk
        state.update((pk1, pk2, pk3))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "pk1": pd.array([pk1], dtype="Int64"),
                "pk2": pd.array([pk2], dtype="Int64"),
                "pk3": pd.array([pk3], dtype="Int64"),
            }
        )

    from pyspark.sql import functions as F

    prepared = sdf.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        # int64-safe packed ordinal: (epoch_us - base2020) * 10^4 +
        # event_id % 10^4 — the base offset keeps the product < 2^63
        # through ~2049; the mod only matters if one user logs two events
        # in the same MICROSECOND with ids 10^4 apart
        (
            (F.unix_micros("ts") - F.lit(1_600_000_000_000_000)) * F.lit(10_000)
            + F.pmod(F.col("event_id"), F.lit(10_000))
        )
        .cast("long")
        .alias("pk"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_alert_for_duration(
    sdf: DataFrame, threshold: int = 3, for_buckets: int = 4
):
    """Streaming twin of p29's alert 'for:' semantics — the form alerting
    actually runs in. Input: a stream of per-(series, bucket) counts in
    chronological order (the downsample-tier shape). State per series:
    the current breach run (start bucket, last bucket, length). Emits a
    'firing' row the moment a run reaches ``for_buckets`` consecutive
    breached buckets, and a 'resolved' row when a run of any length ends
    (non-breach bucket or bucket gap). State is three int64s per series;
    the twin test replays batch-computed buckets in chunks and asserts
    the fire log matches the batch gaps-and-islands runs exactly."""
    import pandas as pd
    from pyspark.sql import functions as F

    out_schema = StructType(
        [
            StructField("et", StringType()),
            StructField("bk", LongType()),
            StructField("status", StringType()),
            StructField("run_len", LongType()),
            StructField("pending_since", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start", LongType()),
            StructField("last", LongType()),
            StructField("len", LongType()),
            StructField("fired", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        start, last, length, fired = (
            state.get if state.exists else (None, None, 0, 0)
        )
        out = {"et": [], "bk": [], "status": [], "run_len": [], "pending_since": []}

        def emit(bk, status, run_len, since):
            out["et"].append(key[0])
            out["bk"].append(int(bk))
            out["status"].append(status)
            out["run_len"].append(int(run_len))
            out["pending_since"].append(int(since))

        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("bk")
        for _, row in pdf.iterrows():
            bk, n = int(row["bk"]), int(row["n"])
            breach = n >= threshold
            contiguous = last is not None and bk == last + 1
            if breach and contiguous:
                last, length = bk, length + 1
            elif breach:
                if start is not None:
                    emit(last, "resolved", length, start)
                start, last, length, fired = bk, bk, 1, 0
            else:
                if start is not None:
                    emit(last, "resolved", length, start)
                start, last, length, fired = None, None, 0, 0
                continue
            if length == for_buckets and not fired:
                emit(bk, "firing", length, start)
                fired = 1
        state.update((start, last, length, fired))
        yield pd.DataFrame(out)

    return sdf.groupBy("et").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_interarrival(sdf: DataFrame) -> DataFrame:
    """Streaming twin of x202's inter-arrival gap extraction: per
    event_type the ONLY state is the last-seen event's microsecond clock
    (one int64 per key — bounded by |types| forever), and each microbatch
    emits the whole-second gaps between consecutive events, including the
    gap that straddles the microbatch boundary via the stored clock.

    Exactness contract (pinned in tests/test_streaming_drift.py): replayed
    in event-time order, the emitted gap MULTISET equals the batch x202
    gap union exactly — the stored last_ts plays the same role as x202's
    previous-day last event in the day-sharded decomposition, just at
    microbatch rather than calendar granularity. Equal timestamps yield
    zero gaps in any order, so intra-batch tie order never changes the
    multiset (the same argument x202's oracle relies on)."""
    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("gap_s", LongType()),
        ]
    )
    state_schema = StructType([StructField("last_us", LongType())])

    def update(key, pdfs, state: GroupState):
        (last_us,) = state.get if state.exists else (None,)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["us", "event_id"], ignore_index=True
        )
        gaps = []
        for us in pdf["us"]:
            us = int(us)
            if last_us is not None:
                gaps.append((us - last_us) // 1_000_000)
            last_us = us
        state.update((last_us,))
        yield pd.DataFrame(
            {"event_type": [key[0]] * len(gaps), "gap_s": gaps}
        )

    from pyspark.sql import functions as F

    prepared = sdf.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
