"""S5 with the reference's EXACT offset semantics: tail ONE growing text
file by byte position (readStream.format("tailing_file")).

The reference's FileStreamSourceTask keeps a ``{FILENAME_FIELD: file,
POSITION_FIELD: byte-position}`` offset and emits one record per appended
line (org.apache.kafka.connect.file.FileStreamSourceConnector, reference
README.md:47; the per-new-file Spark source in ``sources/replay.py`` is
the directory-level analog). This source reproduces the per-append shape:

- offsets are ``{"file": path, "position": N, "gen": G}`` persisted in
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
- rotation/truncation (inode change, or current size < committed
  position) bumps the offset's GENERATION: ``partitions`` treats a
  generation bump as "new file, effective lower bound 0", so the rotated
  file's first bytes are read — never skipped by the upper<=lower guard;
- with ``rotation.glob`` set (e.g. ``app.log.1`` / ``app.log-*``), the
  renamed old file's UNREAD TAIL is emitted first (same generation, the
  offset's ``file`` field points at the rotated path), then the stream
  switches to the new file at byte 0 — logrotate with no loss.

Output schema: ``value string`` — one row per line, like the reference's
FileStreamSource records.

Options: path, batch.max.bytes (optional), rotation.glob (optional).
"""

from __future__ import annotations

import glob as _glob
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


def _stat(path: str) -> tuple[int, int | None]:
    """(size, inode) — (0, None) when the file does not exist."""
    try:
        st = os.stat(path)
        return st.st_size, st.st_ino
    except FileNotFoundError:
        return 0, None


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
        self.rotation_glob = options.get("rotation.glob")
        self._cursor = _UNKNOWN  # (gen, file, position, ino)

    # -- offset codec ------------------------------------------------------

    def _to_offset(self, cur: tuple) -> dict:
        gen, file, pos, ino = cur
        return {"file": file, "position": pos, "gen": gen, "ino": ino}

    def _from_offset(self, d: dict) -> tuple:
        return (
            d.get("gen", 0),
            d.get("file", self.path),
            d["position"],
            d.get("ino"),
        )

    # -- driver probe ------------------------------------------------------

    def _probe(self, path: str, pos: int) -> int:
        """Bound of complete lines in ``path`` above ``pos``, honoring the
        byte cap; never below ``pos``."""
        size, _ = _stat(path)
        limit = size
        if self.batch_max_bytes is not None:
            limit = min(size, pos + self.batch_max_bytes)
        bound = _last_newline_before(path, limit) if limit > 0 else 0
        return max(bound, pos)

    def _find_rotated(self, pos: int) -> str | None:
        """Most recent rotation candidate that plausibly IS the old file:
        matches the glob, is not the live path, and holds >= the committed
        position's bytes."""
        best, best_mtime = None, None
        for cand in _glob.glob(self.rotation_glob):
            if os.path.abspath(cand) == os.path.abspath(self.path):
                continue
            try:
                st = os.stat(cand)
            except FileNotFoundError:
                continue
            if st.st_size >= pos and (best_mtime is None or st.st_mtime > best_mtime):
                best, best_mtime = cand, st.st_mtime
        return best

    def initialOffset(self) -> dict:  # noqa: N802
        _, ino = _stat(self.path)
        self._cursor = (0, self.path, 0, ino)
        return self._to_offset(self._cursor)

    def latestOffset(self) -> dict:  # noqa: N802
        if self._cursor is _UNKNOWN:
            # Restarted query: the committed offset lives in the checkpoint
            # (learned at the next partitions()/commit()). Announce a gen-0
            # probe of the live file; if it trails the committed offset,
            # partitions() returns no work and syncs the cursor.
            _, ino = _stat(self.path)
            self._cursor = (0, self.path, self._probe(self.path, 0), ino)
            return self._to_offset(self._cursor)

        gen, file, pos, ino = self._cursor
        if file != self.path:
            # Draining a rotated file's tail: finish its complete lines,
            # then switch to the live file as a new generation at byte 0.
            bound = self._probe(file, pos)
            if bound > pos:
                self._cursor = (gen, file, bound, ino)
                return self._to_offset(self._cursor)
            size, live_ino = _stat(self.path)
            self._cursor = (gen + 1, self.path, self._probe(self.path, 0), live_ino)
            return self._to_offset(self._cursor)

        size, cur_ino = _stat(self.path)
        rotated = size < pos or (
            ino is not None and cur_ino is not None and cur_ino != ino
        )
        if rotated:
            old = self._find_rotated(pos) if self.rotation_glob else None
            if old is not None:
                tail_bound = self._probe(old, pos)
                if tail_bound > pos:
                    # same generation — the rotated file IS the old file,
                    # renamed; positions carry over
                    _, old_ino = _stat(old)
                    self._cursor = (gen, old, tail_bound, old_ino)
                    return self._to_offset(self._cursor)
            # no recoverable tail: new generation, restart from byte 0
            self._cursor = (gen + 1, self.path, self._probe(self.path, 0), cur_ino)
            return self._to_offset(self._cursor)

        self._cursor = (gen, file, self._probe(file, pos), cur_ino)
        return self._to_offset(self._cursor)

    # -- batch planning ----------------------------------------------------

    def partitions(self, start: dict, end: dict):  # noqa: N802
        sgen, _sfile, spos, _sino = self._from_offset(start)
        egen, efile, epos, _eino = self._from_offset(end)
        if egen < sgen or (egen == sgen and epos <= spos):
            # stale announcement (restart raced the cursor sync): the
            # checkpointed start is authoritative — no work, don't regress
            self._cursor = self._from_offset(start)
            return []
        self._cursor = self._from_offset(end)
        # generation bump = new file: its bytes start at 0, NEVER at the
        # old file's position (the pre-gen bug skipped 0..epos entirely)
        lower = spos if egen == sgen else 0
        if epos <= lower:
            return []
        return [_TailPartition(efile, lower, epos)]

    # -- executor read -----------------------------------------------------

    def read(self, partition: _TailPartition):
        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            data = fh.read(partition.end - partition.start)
        for line in data.split(b"\n"):
            if line:
                yield (line.decode("utf-8", errors="replace"),)

    def commit(self, end: dict) -> None:
        new = self._from_offset(end)
        if self._cursor is not _UNKNOWN:
            cur = self._cursor
            if (new[0], new[2]) < (cur[0], cur[2]):
                return  # never regress past a synced cursor
        self._cursor = new


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
