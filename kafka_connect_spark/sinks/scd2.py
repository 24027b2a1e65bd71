"""SCD Type-2 dimension-history sink: each applied batch of change events
folds into the versioned parquet table via
``queries.cdc.scd2_apply_increment`` (the CDC-topic -> warehouse
dimension-history materialization; x59 is the full-recompute twin).

Storage rides :class:`~kafka_connect_spark.sinks.upsert.UpsertParquetSink`'s
crash-safe versioned layout (write new version dir, atomic symlink flip),
so a crash mid-fold leaves the previous complete history readable and the
next poll re-applies — with the incremental source's offset committed only
AFTER the flip, replay re-folds the same chronological chunk onto the same
base version: the fold is deterministic, so re-application converges."""

from __future__ import annotations

from pyspark.sql import DataFrame

from .upsert import UpsertParquetSink

_SCD2_SCHEMA = (
    "user_id long, version long, event_type string, "
    "effective_from timestamp, effective_to timestamp, is_current boolean"
)


class Scd2ParquetSink(UpsertParquetSink):
    def __init__(self, path: str, keep_versions: int = 1) -> None:
        super().__init__(
            path,
            key_cols=["user_id", "version"],
            order_col="version",
            keep_versions=keep_versions,
        )

    def apply_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        from ..queries.cdc import scd2_apply_increment

        spark = batch.sparkSession
        if self._recover():
            existing = spark.read.parquet(self.path)
        else:
            existing = spark.createDataFrame([], _SCD2_SCHEMA)
        folded = scd2_apply_increment(existing, batch)
        new_v = self._next_version_dir()
        folded.write.mode("overwrite").parquet(new_v)
        self._flip(new_v)
