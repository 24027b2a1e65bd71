"""Stateful streaming on the Spark 4 ``transformWithStateInPandas`` API
(the state-v2 successor of ``applyInPandasWithState``): typed per-key state
handles (ValueState/ListState/MapState), timers, and multiple state
variables per processor — the engine-side analog of a Connect task's
per-partition offset/position state (SURVEY.md §2.1), on the modern API.

``inter_arrival_gaps`` is the sessionization primitive: for every event,
the microseconds elapsed since the SAME key's previous event, with the
last-seen timestamp carried across microbatches in a ValueState. The
batch twin is one ``lag()`` window; the streaming version never re-reads
history — state is one BIGINT per key regardless of stream length, and
the replay test asserts stream == batch row-for-row."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

# transformWithStateInPandas speaks protobuf to its per-query state server;
# without the protobuf wheel the driver-side pre-init crashes. Gate the
# integration path (same policy as live-Kafka paths): the processor LOGIC
# is environment-free and unit-tested either way. (r15 probe: package
# installs are disallowed in this sandbox and no vendored pure-Python
# protobuf exists on the image — `import google.protobuf` still fails —
# so the gate stays; the two gated integrations remain pytest skips.)
try:  # pragma: no cover - environment probe
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover
    HAS_TRANSFORM_WITH_STATE = False

GAP_OUTPUT = "user_id BIGINT, event_id BIGINT, gap_us BIGINT"


class _GapProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        # one BIGINT of state per key: the last-seen ts_us only. event_id is
        # NOT kept: the gap depends only on the previous timestamp, and rows
        # emitted in earlier microbatches are immutable (append mode) — so
        # row-for-row equality with the batch lag((ts, event_id)) twin holds
        # exactly when the replay source delivers equal-ts events in
        # event_id order across batch boundaries (which file_replay_stream
        # does; an adversarial chunking that splits ties out of order would
        # diverge on the tied rows in ANY online evaluator).
        self._last = handle.getValueState("last", "last BIGINT")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True)
        # deterministic processing order within the batch
        pdf = pdf.sort_values(["ts_us", "event_id"], ignore_index=True)
        prev = self._last.get()
        prev_us = int(prev[0]) if prev is not None else None
        ts = pdf["ts_us"].astype("int64")
        gaps = ts.diff()
        if prev_us is not None:
            gaps.iloc[0] = ts.iloc[0] - prev_us
        self._last.update((int(ts.iloc[-1]),))
        out = pd.DataFrame(
            {
                "user_id": [int(key[0])] * len(pdf),
                "event_id": pdf["event_id"].astype("int64"),
                # first-ever event of a key: no gap (NULL)
                "gap_us": gaps.astype("Int64"),
            }
        )
        yield out

    def close(self) -> None:
        pass


def inter_arrival_gaps(sdf: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key event gaps over a stream: ``transformWithStateInPandas``
    with a single ValueState BIGINT per key. Scales with |keys|, not
    |events|; the batch twin is lag() over (ts, event_id)."""
    from pyspark.sql import functions as F

    if not HAS_TRANSFORM_WITH_STATE:
        raise RuntimeError(
            "transformWithStateInPandas requires the protobuf package "
            "(state-server protocol); not available in this environment"
        )
    prepared = sdf.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros("ts").alias("ts_us"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_GapProcessor(),
        outputStructType=GAP_OUTPUT,
        outputMode="append",
        timeMode="none",
    )


BLOCK_KEEPER_OUTPUT = (
    "h STRING, keep_clock BIGINT, keep_source STRING, n_tok BIGINT"
)


def _fold_keeper(
    prev: tuple | None, pdf: pd.DataFrame
) -> tuple[int, str, int]:
    """The keeper update rule, factored pure so the unit test drives it
    without a state server: new keeper = min over (stored keeper if any)
    + this batch's (clock, source, n_tok) rows. min is order-free, so
    any microbatch chunking folds to the same final keeper — the same
    argument that makes the complete-mode twin replay-exact."""
    i = int(pdf["clock"].astype("int64").idxmin())
    clock = int(pdf["clock"].iloc[i])
    source = str(pdf["source"].iloc[i])
    n_tok = int(pdf["n_tok"].iloc[i])
    if prev is not None and int(prev[0]) <= clock:
        return int(prev[0]), str(prev[1]), int(prev[2])
    return clock, source, n_tok


class _BlockKeeperProcessor(StatefulProcessor):
    """Store-backed segment keep-first dedup (the production form of
    drift.block_keeper_state): keyed by the block hash ``h``, each key
    holds ONE ValueState row (keep_clock, keep_source, n_tok) in the
    state store — so the 'state grows with distinct content' bound of
    the complete-mode twin becomes a RocksDB-resident keyed store that
    never lives in executor memory as one aggregation, and an optional
    TTL ages out blocks not re-seen (the crawl-window semantics a
    100 TB stream actually wants: a block counts as boilerplate only
    while it keeps recurring).

    Emits, per microbatch, the CURRENT keeper row for every key touched
    in that batch (update-style): the last emission per h equals the
    complete-mode state row, which is what the replay-equality test
    folds and compares."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        schema = "keep_clock BIGINT, keep_source STRING, n_tok BIGINT"
        if self._ttl_ms is not None:
            self._keeper = handle.getValueState(
                "keeper", schema, ttlDurationMs=self._ttl_ms
            )
        else:
            self._keeper = handle.getValueState("keeper", schema)

    def handleInputRows(
        self, key: tuple, rows, timerValues
    ) -> "Iterator[pd.DataFrame]":
        pdf = pd.concat(list(rows), ignore_index=True)
        prev = self._keeper.get()
        clock, source, n_tok = _fold_keeper(prev, pdf)
        self._keeper.update((clock, source, n_tok))
        yield pd.DataFrame(
            {
                "h": [str(key[0])],
                "keep_clock": [clock],
                "keep_source": [source],
                "n_tok": [n_tok],
            }
        )

    def close(self) -> None:
        pass


def _time_mode_for(ttl_ms: int | None) -> str:
    """TTL'd state REQUIRES a clock: Spark 4 raises
    STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL when a state
    variable registers ttlDurationMs under timeMode="none", so the TTL
    crawl-window feature implies processingTime mode. Factored pure so
    the wiring is pinned without a state server."""
    return "none" if ttl_ms is None else "processingTime"


def block_keeper_stream(
    docs: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """x272's segment keep-first dedup on the state-v2 API: segmentation
    shared verbatim with the batch plan (dedupfns.segment_blocks), one
    keyed ValueState row per distinct block hash in the state STORE
    (optionally TTL'd), update-style keeper emissions per microbatch.
    The complete-mode twin (drift.block_keeper_state) remains the
    replay-equality reference; this is the bounded-memory production
    form its docstring promises. With ``ttl_ms`` set the query runs in
    processingTime mode (TTL'd state is illegal under timeMode="none" —
    see ``_time_mode_for``)."""
    from ..functions.dedupfns import segment_blocks

    if not HAS_TRANSFORM_WITH_STATE:
        raise RuntimeError(
            "transformWithStateInPandas requires the protobuf package "
            "(state-server protocol); not available in this environment"
        )
    blocks = segment_blocks(docs).select("h", "clock", "source", "n_tok")
    return blocks.groupBy("h").transformWithStateInPandas(
        statefulProcessor=_BlockKeeperProcessor(ttl_ms),
        outputStructType=BLOCK_KEEPER_OUTPUT,
        outputMode="update",
        timeMode=_time_mode_for(ttl_ms),
    )
