"""Store-backed segment keeper (round-14 item 7): x272's keep-first
dedup on the state-v2 API (transformWithStateInPandas) with one keyed
ValueState row per distinct block in the state STORE — the
bounded-memory production form the complete-mode twin's docstring
promises. The update rule is factored pure (_fold_keeper) so its
order-free min semantics are pinned without a state server; the full
integration is protobuf-gated like its state-v2 siblings."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kafka_connect_spark.streaming.stateful_v2 import (
    HAS_TRANSFORM_WITH_STATE,
    _BlockKeeperProcessor,
    _fold_keeper,
    _time_mode_for,
)


def _pdf(rows):
    return pd.DataFrame(rows, columns=["clock", "source", "n_tok"])


def test_fold_keeper_no_prior_takes_batch_min():
    clock, source, n_tok = _fold_keeper(
        None, _pdf([(2_000_005, "b", 20), (1_000_001, "a", 20), (3_000_000, "c", 7)])
    )
    assert (clock, source, n_tok) == (1_000_001, "a", 20)


def test_fold_keeper_prior_wins_ties_and_smaller():
    prev = (1_000_001, "a", 20)
    # prior smaller than batch min: unchanged
    assert _fold_keeper(prev, _pdf([(5_000_002, "d", 20)])) == prev
    # prior equal to batch min: unchanged (<=, idempotent replay)
    assert _fold_keeper(prev, _pdf([(1_000_001, "a", 20)])) == prev
    # batch strictly smaller: re-elected
    assert _fold_keeper(prev, _pdf([(7, "e", 20)])) == (7, "e", 20)


def test_fold_keeper_is_chunking_invariant():
    """Any microbatch split of the same rows folds to the same keeper —
    the replay-exactness argument, exercised over every 2-way split."""
    rows = [
        (4_000_002, "d", 20),
        (1_000_003, "a", 20),
        (2_000_000, "b", 14),
        (1_000_000, "a", 20),
        (9_000_009, "z", 3),
    ]
    want = _fold_keeper(None, _pdf(rows))
    for cut in range(1, len(rows)):
        st = _fold_keeper(None, _pdf(rows[:cut]))
        st = _fold_keeper(st, _pdf(rows[cut:]))
        assert st == want, f"cut={cut}"


class _StubState:
    def __init__(self):
        self.v = None

    def get(self):
        return self.v

    def update(self, t):
        self.v = tuple(t)


class _StubHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, **kw):
        return self.states.setdefault(name, _StubState())


def test_block_keeper_processor_emits_current_keeper_per_batch():
    p = _BlockKeeperProcessor()
    h = _StubHandle()
    p.init(h)
    out1 = next(
        p.handleInputRows(
            ("abc",), iter([_pdf([(2_000_001, "b", 20), (1_000_000, "a", 20)])]), None
        )
    )
    assert out1.iloc[0].tolist() == ["abc", 1_000_000, "a", 20]
    # later batch with only larger clocks: keeper row re-emitted unchanged
    out2 = next(
        p.handleInputRows(("abc",), iter([_pdf([(8_000_000, "q", 20)])]), None)
    )
    assert out2.iloc[0].tolist() == ["abc", 1_000_000, "a", 20]
    assert h.states["keeper"].v == (1_000_000, "a", 20)


@pytest.mark.skipif(
    not HAS_TRANSFORM_WITH_STATE,
    reason="protobuf not available: state-v2 state server cannot start",
)
def test_block_keeper_stream_replays_to_complete_mode_state(
    spark, sf_dir, tmp_path
):
    """Integration (gated): the LAST update-mode emission per h across a
    multi-file replay must equal drift.block_keeper_state's complete-mode
    row for that h — store-backed and agg-backed keepers agree on every
    block."""
    from kafka_connect_spark.catalog import load
    from kafka_connect_spark.sources.replay import (
        file_replay_stream,
        write_replay_files,
    )
    from kafka_connect_spark.streaming.drift import block_keeper_state
    from kafka_connect_spark.streaming.stateful_v2 import block_keeper_stream

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    rd = str(tmp_path / "keeper-replay")
    write_replay_files(docs, rd, 16, "doc_id")
    sdf = file_replay_stream(spark, rd, spark.read.parquet(rd).schema)
    out: list[pd.DataFrame] = []

    def sink(df, bid):
        p = df.toPandas()
        p["batch_id"] = bid
        out.append(p)

    q = (
        block_keeper_stream(sdf)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "keeper-ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = pd.concat(out, ignore_index=True)
    last = (
        emitted.sort_values("batch_id")
        .groupby("h")
        .tail(1)
        .drop(columns=["batch_id"])
        .sort_values("h", ignore_index=True)
    )
    want = (
        block_keeper_state(docs)
        .select("h", "keep_clock", "keep_source", "n_tok")
        .toPandas()
        .sort_values("h", ignore_index=True)
    )
    pd.testing.assert_frame_equal(last, want, check_dtype=False)


def test_time_mode_follows_ttl():
    """TTL'd ValueState under timeMode="none" raises
    STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL at query start
    on Spark 4.1 — the advertised crawl-window TTL therefore implies
    processingTime mode (r14 ADVICE, medium)."""
    assert _time_mode_for(None) == "none"
    assert _time_mode_for(3_600_000) == "processingTime"
    assert _time_mode_for(0) == "processingTime"


@pytest.mark.skipif(
    not HAS_TRANSFORM_WITH_STATE,
    reason="protobuf not available: state-v2 state server cannot start",
)
def test_block_keeper_stream_ttl_starts_and_keeps(spark, sf_dir, tmp_path):
    """Integration (gated): with a generous TTL the stream must START
    (the timeMode wiring — the r14 ADVICE bug made query start raise)
    and, within one availableNow replay, keep the same keepers as the
    un-TTL'd run (nothing ages out inside a single replay window)."""
    from kafka_connect_spark.catalog import load
    from kafka_connect_spark.sources.replay import (
        file_replay_stream,
        write_replay_files,
    )
    from kafka_connect_spark.streaming.stateful_v2 import block_keeper_stream

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    rd = str(tmp_path / "keeper-ttl-replay")
    write_replay_files(docs, rd, 4, "doc_id")
    sdf = file_replay_stream(spark, rd, spark.read.parquet(rd).schema)
    out: list[pd.DataFrame] = []

    def sink(df, bid):
        p = df.toPandas()
        p["batch_id"] = bid
        out.append(p)

    q = (
        block_keeper_stream(sdf, ttl_ms=24 * 3_600_000)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "keeper-ttl-ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = pd.concat(out, ignore_index=True)
    assert emitted["h"].nunique() > 0


def test_block_keeper_ttl_forwarded_to_state_handle():
    """The TTL knob must reach the ValueState registration (the
    crawl-window semantics the docstring sells) — pinned via a recording
    stub so the wiring can't silently drop the kwarg."""
    calls = {}

    class RecordingHandle:
        def getValueState(self, name, schema, **kw):
            calls[name] = kw
            return _StubState()

    p = _BlockKeeperProcessor(ttl_ms=3_600_000)
    p.init(RecordingHandle())
    assert calls["keeper"] == {"ttlDurationMs": 3_600_000}
    p2 = _BlockKeeperProcessor()
    calls.clear()
    p2.init(RecordingHandle())
    assert calls["keeper"] == {}
