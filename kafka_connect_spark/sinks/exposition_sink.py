"""Custom Python DataSource STREAM WRITER: metric rows -> Prometheus
exposition files, one atomically-committed file per microbatch.

Completes the plugin symmetry with sources/exposition_datasource.py (the
reader): the Connect SinkConnector API maps to DataSourceStreamWriter —
``write`` runs per partition on executors and returns a commit message;
``commit`` runs once on the driver per epoch, making the batch's file
visible atomically (write-to-temp + rename), which is exactly the
offset-commit/flush contract of the reference's FileStreamSink
(FileStreamSinkTask.flush, SURVEY.md §2.2 K1). ``abort`` drops the
epoch's temp files, so failed batches leave nothing visible.

Input schema: name string, labels string ('k="v",...'), value double.

Usage:
    spark.dataSource.register(ExpositionSinkDataSource)
    df.writeStream.format("exposition_sink").option("path", dir)
      .option("checkpointLocation", ckpt).start()
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _PartFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class ExpositionStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("exposition_sink requires option 'path'")
        os.makedirs(self.path, exist_ok=True)
        os.makedirs(os.path.join(self.path, "_tmp"), exist_ok=True)

    def write(self, iterator) -> _PartFile:
        """Executor-side: serialize the partition to a temp file."""
        tmp = os.path.join(self.path, "_tmp", f"part-{uuid.uuid4().hex}.prom")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                labels = f"{{{row.labels}}}" if row.labels else ""
                fh.write(f"{row.name}{labels} {row.value}\n")
                n += 1
        return _PartFile(tmp, n)

    def commit(self, messages, batch_id: int) -> None:
        """Driver-side, once per epoch: concatenate parts and publish the
        batch file atomically. Re-running the same batch after a crash
        overwrites the same name => idempotent (exactly-once visible data)."""
        final = os.path.join(self.path, f"batch-{batch_id:010d}.prom")
        tmp = final + ".inprogress"
        with open(tmp, "w") as out:
            for m in messages:
                if m is None or m.rows == 0:
                    continue
                with open(m.path) as fh:
                    out.write(fh.read())
                os.remove(m.path)
        os.replace(tmp, final)

    def abort(self, messages, batch_id: int) -> None:
        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class ExpositionBatchWriter(DataSourceWriter):
    """Batch twin of the stream writer (``df.write.format("exposition_sink")``):
    same executor-write / driver-commit / abort contract, publishing one
    ``snapshot.prom`` atomically — the one-shot scrape-file export."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self._w = ExpositionStreamWriter(options)
        self.path = self._w.path
        self.overwrite = overwrite

    def write(self, iterator) -> _PartFile:
        return self._w.write(iterator)

    def commit(self, messages) -> None:
        final = os.path.join(self.path, "snapshot.prom")
        if not self.overwrite and os.path.exists(final):
            raise FileExistsError(f"{final} exists; use mode('overwrite')")
        tmp = final + ".inprogress"
        with open(tmp, "w") as out:
            for m in messages:
                if m is None or m.rows == 0:
                    continue
                with open(m.path) as fh:
                    out.write(fh.read())
                os.remove(m.path)
        os.replace(tmp, final)

    def abort(self, messages) -> None:
        self._w.abort(messages, -1)


class ExpositionSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "exposition_sink"

    def schema(self) -> str:
        return "name string, labels string, value double"

    def writer(self, schema, overwrite: bool):
        return ExpositionBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):  # noqa: N802
        return ExpositionStreamWriter(self.options)
