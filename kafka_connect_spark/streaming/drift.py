"""Streaming twins of the drift/sketch operators (x171/x178 registers,
x172 CUSUM).

Reference parity: the reference's runtime is a continuously-polling
connector (JdbcSourceTask poll loop); our batch registry computes these
statistics over a full table, and these operators compute the SAME values
incrementally over the stream, with bounded state — pinned row-for-row to
their batch twins by tests/test_streaming_drift.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.dedupfns import token_hash60

CUSUM_OUTPUT = (
    "event_type STRING, day STRING, n_events BIGINT, "
    "cusum_up BIGINT, cusum_down BIGINT, alarm_up BIGINT, alarm_down BIGINT"
)
CUSUM_STATE = "su BIGINT, sd BIGINT"


def hll_registers(df: DataFrame, scope_col: str, entity_col: str) -> DataFrame:
    """p=10 HLL registers as ONE aggregation — (scope, bucket) -> max rho.

    Works identically on a batch frame and a streaming frame: max is the
    canonical mergeable sketch update, so the streaming state is exactly
    the register table (<= 1024 BIGINTs per scope — bounded regardless of
    stream length), every microbatch folds its rows in by the same MAX,
    and the final streaming state equals the batch registers bit-for-bit.
    This is the incremental path behind x171/x178: at 100 TB the stream
    maintains registers forever and any window/union answer is a register
    merge, never a recount of entities."""
    hv = token_hash60(F.col(entity_col))
    w = F.expr("hv div 1024")
    return (
        df.select(F.col(scope_col).alias("scope"), hv.alias("hv"))
        .select(
            "scope",
            (F.col("hv") % 1024).alias("bucket"),
            F.when(w == 0, F.lit(51))
            .otherwise(F.lit(51) - F.length(F.bin(w)))
            .alias("rho"),
        )
        .groupBy("scope", "bucket")
        .agg(F.max("rho").cast("long").alias("m"))
    )


def streaming_cusum(
    day_counts: DataFrame,
    calibration: dict[str, tuple[int, int, int]],
) -> DataFrame:
    """Continuous CUSUM over a per-day count stream, the online twin of
    x172: the textbook recursion S_up = max(0, S_up + y),
    S_down = max(0, S_down - y) carried in two BIGINTs of checkpointed
    state per type — which is why CUSUM (not the z-test) is the detector
    you can actually RUN on a stream: state is O(1) and each day folds in
    once.

    ``calibration`` maps event_type -> (n_days, s, thresh2) frozen from a
    historical window (production CUSUM always runs against a calibrated
    reference; x172's batch form self-calibrates because it sees the whole
    series). With the calibration x172 derives from the same data, the
    emitted alarm rows match x172 exactly (tests pin this). Input rows
    must arrive day-ordered across microbatches, which the replay harness
    guarantees and an event-time-sorted upstream window provides in
    production."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        etype = key[0]
        n_days, s, thresh2 = calibration.get(etype, (0, 0, 0))
        su, sd = state.get if state.exists else (0, 0)
        out = []
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("day")
        for _, r in rows.iterrows():
            n = int(r["n_events"])
            y = n * n_days - s
            su = max(0, su + y)
            sd = max(0, sd - y)
            au, ad = int(su * su > thresh2), int(sd * sd > thresh2)
            if au or ad:
                out.append((etype, r["day"], n, su, sd, au, ad))
        state.update((int(su), int(sd)))
        yield pd.DataFrame(
            out,
            columns=[
                "event_type", "day", "n_events",
                "cusum_up", "cusum_down", "alarm_up", "alarm_down",
            ],
        )

    return day_counts.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT,
        stateStructType=CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quantile_histogram(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """x200's shared value histogram as ONE aggregation — (group, value)
    -> (total count, md5-threshold-sampled count).

    Works identically on a batch frame and a streaming frame: counting is
    mergeable, so the streaming state IS the histogram — bounded by
    |groups| x |distinct values| (the VALUE DOMAIN), never by stream
    length — and the final streaming state equals the batch histogram
    row-for-row. Quantile answers (exact and sketch-estimated, x200's
    cumulative-selection closed form) then read this table without
    touching the stream again: the incremental path to streaming
    percentiles with no per-row state, the same contract as
    hll_registers for distinct counts."""
    thresh = 144115188075855872  # 2^60 / 8: the x177/x200 md5 clock rate
    hv = F.expr(
        f"CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT)"
    )
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(value_col).alias("val"),
            hv.alias("hv"),
        )
        .groupBy("grp", "val")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(F.when(F.col("hv") < thresh, 1).otherwise(0))
            .cast("long")
            .alias("sc"),
        )
    )


def skyline_staircase(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """x210's per-length max-vocab table as ONE aggregation — (a) ->
    max(b). MAX is the canonical mergeable update (the hll_registers
    argument), so on a stream the complete-mode state IS the staircase
    input, bounded by |distinct a| (the value domain) regardless of
    stream length, and the final streaming state equals the batch table
    row-for-row. The Pareto front then falls out of the same cumulative-
    max selection x210 runs — incremental skyline maintenance with no
    per-row state and no corpus replay."""
    return (
        df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .groupBy("a")
        .agg(F.max("b").cast("long").alias("mb"))
    )
