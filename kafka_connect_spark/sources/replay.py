"""Fixture -> stream replay (S5 FileStreamSource analog + test harness for
the streaming surface).

The reference's FileStreamSource tails a file with a (filename, position)
offset (FileStreamSourceTask.class: FILENAME_FIELD/POSITION_FIELD). Spark's
file streaming source is the per-file analog: new files in a directory are
the increments, offsets live in the checkpoint. ``write_replay_files``
splits a fixture table into N files so ``maxFilesPerTrigger=1`` replays it
as N microbatches — the harness used by tests/test_streaming.py to verify
windows/watermarks/exactly-once against batch results."""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession


def write_replay_files(df: DataFrame, out_dir: str, n_files: int, order_col: str) -> None:
    """Split ``df`` into ``n_files`` parquet files in event order so file
    arrival approximates event-time order during replay.

    FileStreamSource picks up files by MODIFICATION TIME, and one parquet
    write stamps every part file with the same mtime — leaving the replay
    order nondeterministic (a latest-range file read first advances the
    watermark past everything else, dropping the rest as late). Re-stamp
    part files with increasing mtimes in range order (part file name order
    == range order) so replay is deterministic and event-ordered."""
    (
        df.repartitionByRange(n_files, order_col)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    parts = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    base = time.time() - 10.0 * len(parts)
    for i, f in enumerate(parts):
        t = base + 10.0 * i
        os.utime(os.path.join(out_dir, f), (t, t))


def file_replay_stream(
    spark: SparkSession, dir_: str, schema, files_per_trigger: int = 1
) -> DataFrame:
    """Streaming DataFrame replaying the directory one file per microbatch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(dir_)
    )
