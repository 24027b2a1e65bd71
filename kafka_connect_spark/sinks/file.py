"""K1 — FileStreamSink analog (reference README.md:37-39,
FileStreamSinkConnector.class: FILE_CONFIG + flush on offset commit).

Batch: ``df.write``; streaming: ``writeStream`` with a checkpoint — the
checkpoint IS the offset-commit/flush contract (exactly-once for file
sinks: output files are recorded per epoch and readers see only committed
epochs via the sink metadata log)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def file_sink(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "append") -> None:
    df.write.format(fmt).mode(mode).save(path)


def streaming_file_sink(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    trigger_available_now: bool = True,
):
    """Returns the started StreamingQuery."""
    w = (
        sdf.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
