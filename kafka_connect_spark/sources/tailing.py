"""S5 with the reference's EXACT offset semantics: tail ONE growing text
file by byte position (readStream.format("tailing_file")).

The reference's FileStreamSourceTask keeps a ``{FILENAME_FIELD: file,
POSITION_FIELD: byte-position}`` offset and emits one record per appended
line (org.apache.kafka.connect.file.FileStreamSourceConnector, reference
README.md:47; the per-new-file Spark source in ``sources/replay.py`` is
the directory-level analog). This source reproduces the per-append shape:

- offsets are ``{"file": path, "position": N}`` byte pairs persisted in
  the query checkpoint, so a kill/restart resumes mid-file with no loss
  and no duplicates;
- only COMPLETE lines are announced: ``latestOffset`` advances to the
  byte after the last newline, so a partially-flushed trailing line is
  never emitted (FileStreamSourceTask buffers the same way);
- a batch is one contiguous byte range of one file — planned as a single
  partition (tailing a single file is inherently sequential, matching
  the reference's one-connection poll); the DRIVER only stats the file
  and locates the last newline, the record split happens in ``read``;
- ``batch.max.bytes`` caps a trigger's range, cut back to a line
  boundary;
- truncation/rotation (current size < committed position) restarts from
  byte 0 — the rotated file is a new stream.

Output schema: ``value string`` — one row per line, like the reference's
FileStreamSource records.

Options: path, batch.max.bytes (optional).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

_UNKNOWN = object()
_CHUNK = 64 * 1024


def _last_newline_before(path: str, limit: int) -> int:
    """Byte offset just AFTER the last ``\\n`` at or before ``limit`` in
    the file, or 0 if none — scanning backwards in bounded chunks, so the
    probe cost is independent of file size."""
    with open(path, "rb") as fh:
        end = limit
        while end > 0:
            start = max(0, end - _CHUNK)
            fh.seek(start)
            chunk = fh.read(end - start)
            idx = chunk.rfind(b"\n")
            if idx >= 0:
                return start + idx + 1
            end = start
    return 0


class _TailPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int) -> None:
        self.path = path
        self.start = start
        self.end = end


class _TailingFileStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.batch_max_bytes = (
            int(options["batch.max.bytes"]) if "batch.max.bytes" in options else None
        )
        self._cursor = _UNKNOWN

    def initialOffset(self) -> dict:  # noqa: N802
        self._cursor = 0
        return {"file": self.path, "position": 0}

    def latestOffset(self) -> dict:  # noqa: N802
        try:
            size = os.stat(self.path).st_size
        except FileNotFoundError:
            size = 0
        pos = self._cursor if self._cursor is not _UNKNOWN else None
        if pos is not None and size < pos:
            # rotation/truncation: the tail restarts from the top
            pos = 0
        limit = size
        if self.batch_max_bytes is not None and pos is not None:
            limit = min(size, pos + self.batch_max_bytes)
        bound = _last_newline_before(self.path, limit) if limit > 0 else 0
        if pos is not None and bound < pos:
            bound = pos  # no complete new line yet -> no batch
        self._cursor = bound
        return {"file": self.path, "position": bound}

    def partitions(self, start: dict, end: dict):  # noqa: N802
        lower, upper = start["position"], end["position"]
        self._cursor = upper
        if upper <= lower:
            return []
        return [_TailPartition(self.path, lower, upper)]

    def read(self, partition: _TailPartition):
        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            data = fh.read(partition.end - partition.start)
        for line in data.split(b"\n"):
            if line:
                yield (line.decode("utf-8", errors="replace"),)

    def commit(self, end: dict) -> None:
        self._cursor = end["position"]


class TailingFileDataSource(DataSource):
    """Usage:
        spark.dataSource.register(TailingFileDataSource)
        spark.readStream.format("tailing_file").option("path", f).load()
    """

    @classmethod
    def name(cls) -> str:
        return "tailing_file"

    def schema(self) -> str:
        return "value string"

    def streamReader(self, schema):  # noqa: N802
        return _TailingFileStreamReader(self.options)
