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
    DoubleType,
    LongType,
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
