"""S1/S2 as a NATIVE streaming source: the incremental polled table as a
Spark Python DataSource stream (readStream.format("incremental_table")).

Where ``sources.incremental`` drives the poll loop itself (offsets in a
side file), this variant hands offset management to Structured Streaming:
``initialOffset``/``latestOffset`` return offset dicts that Spark persists
in the query CHECKPOINT, so offset commit is transactional with the sink
epoch — the checkpointed analog of connect-offset-storage (reference
docker-compose.yaml:133-135), with restart/replay handled by the engine.

Execution shape (the 100 TB story):
- the DRIVER only probes offsets: ``latestOffset`` scans the offset COLUMN
  alone (column-pruned, predicate pushed into the parquet scan so row
  groups outside the increment are skipped by min/max stats) and picks the
  next batch bound — a few KB of I/O per trigger regardless of table size;
- DATA is read on EXECUTORS: ``partitions(start, end)`` prunes parquet
  fragments by row-group statistics and emits one ``InputPartition`` per
  surviving file; ``read(partition)`` runs executor-side and yields Arrow
  record batches straight from a filtered pyarrow scan — no driver
  materialization, no per-row Python objects on the driver.

The reference's analog polls ≤ batch.max.rows rows per trigger through one
connection (README.md:100-101) — same increment semantics, but reads
parallelize across the cluster instead of serializing on one node.

Options: path, offset.column, batch.max.rows (optional cap per trigger),
offset.mirror.dir (optional; give each query its own dir, like
checkpointLocation — lets a restarted query honor batch.max.rows on its
first post-restart batch instead of announcing the global max).
"""

from __future__ import annotations

import json
import os
import tempfile
from datetime import datetime

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

_PA_TO_DDL = {
    "int64": "bigint",
    "int32": "int",
    "int16": "smallint",
    "double": "double",
    "float": "float",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
}

# Cursor sentinel for a reader that has not yet learned the committed
# offset (query restarted from checkpoint: Spark calls latestOffset before
# the reader has seen partitions()/commit()). Distinct from None, which
# means "fresh query, nothing consumed yet".
_UNKNOWN = object()


def _ddl_of(field) -> str:
    t = str(field.type)
    if t.startswith("timestamp"):
        spark_t = "timestamp"
    else:
        spark_t = _PA_TO_DDL.get(t)
    if spark_t is None:
        raise ValueError(f"unsupported parquet type for incremental stream: {t}")
    return f"{field.name} {spark_t}"


class _ScanPartition(InputPartition):
    """One parquet file with the increment's offset range — everything the
    executor needs to scan independently (picklable plain values)."""

    def __init__(self, path: str, offset_column: str, lower, upper) -> None:
        self.path = path
        self.offset_column = offset_column
        self.lower = lower
        self.upper = upper


class _IncrementalStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.offset_column = options["offset.column"]
        self.batch_max_rows = (
            int(options["batch.max.rows"]) if "batch.max.rows" in options else None
        )
        self.mirror_dir = options.get("offset.mirror.dir")
        self._cursor = _UNKNOWN
        self._is_ts: bool | None = None

    # -- offset value codec (offsets round-trip through Spark's JSON
    #    checkpoint, so timestamps travel as isoformat strings) ------------

    def _timestamp_offsets(self) -> bool:
        if self._is_ts is None:
            import pyarrow.dataset as pads

            schema = pads.dataset(self.path, format="parquet").schema
            self._is_ts = str(schema.field(self.offset_column).type).startswith(
                "timestamp"
            )
        return self._is_ts

    def _decode(self, v):
        if v is not None and self._timestamp_offsets() and isinstance(v, str):
            return datetime.fromisoformat(v)
        return v

    @staticmethod
    def _encode(v):
        return v.isoformat() if hasattr(v, "isoformat") else v

    # -- driver side: offset probing only ---------------------------------

    def _fragment_min_max(self, fragment):
        """(min, max) of the offset column over a fragment's row-group
        statistics, or (None, None) when stats are absent/unreadable."""
        try:
            fragment.ensure_complete_metadata()
            row_groups = fragment.row_groups
            if not row_groups:
                return None, None
            mins, maxs = [], []
            for rg in row_groups:
                stats = (rg.statistics or {}).get(self.offset_column)
                if not stats or stats.get("min") is None or stats.get("max") is None:
                    return None, None
                mins.append(stats["min"])
                maxs.append(stats["max"])
            return min(mins), max(maxs)
        except Exception:  # noqa: BLE001 - stats are an optimization only
            return None, None

    def _probe_bound(self, lower, cap: int | None):
        """Next batch's end offset: the cap-th smallest offset value above
        ``lower`` (ties beyond the cap join the batch via the inclusive
        <= bound filter downstream), or the global max when uncapped.

        Reads ONLY the offset column, and NEVER materializes it whole: the
        scan streams Arrow batches and folds them into O(1) driver state —
        a running max when uncapped, a sorted candidate array of ≤ cap
        values when capped. Fragments are visited in ascending stat-min
        order so the capped scan stops as soon as every remaining
        fragment's minimum can no longer beat the current cap-th smallest
        (steady state: one fragment touched per trigger)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        ds = pads.dataset(self.path, format="parquet")
        filt = pc.field(self.offset_column) > lower if lower is not None else None

        if cap is None:
            best = None
            for batch in ds.to_batches(columns=[self.offset_column], filter=filt):
                if batch.num_rows == 0:
                    continue
                m = pc.max(batch.column(0)).as_py()
                if m is not None and (best is None or m > best):
                    best = m
            return best

        # Order fragments: stat-less ones first (must scan), then by min.
        unknown, known = [], []
        for frag in ds.get_fragments():
            fmin, fmax = self._fragment_min_max(frag)
            if lower is not None and fmax is not None:
                try:
                    if not fmax > lower:
                        continue  # wholly consumed increment
                except TypeError:
                    pass  # incomparable stats (tz mismatch) -> keep
            (known if fmin is not None else unknown).append((fmin, frag))
        known.sort(key=lambda t: t[0])

        cand = None  # sorted pa.Array of the ≤ cap smallest values seen
        total = 0
        for fmin, frag in unknown + known:
            if cand is not None and len(cand) >= cap and fmin is not None:
                try:
                    if fmin >= cand[cap - 1].as_py():
                        break  # nothing left can beat the cap-th smallest
                except TypeError:
                    pass
            for batch in frag.to_batches(
                columns=[self.offset_column], filter=filt
            ):
                arr = batch.column(0).drop_null()
                if len(arr) == 0:
                    continue
                total += len(arr)
                merged = pa.chunked_array([cand, arr] if cand is not None else [arr])
                idx = pc.sort_indices(merged)
                cand = pc.take(merged, idx[: min(cap, len(merged))]).combine_chunks()
        if total == 0:
            return None
        return cand[min(cap, len(cand)) - 1].as_py()

    def initialOffset(self) -> dict:  # noqa: N802
        self._cursor = None
        return {"offset": None}

    # -- committed-offset mirror (restart rate-cap support) ----------------

    def _mirror_path(self) -> str:
        return os.path.join(self.mirror_dir, "committed.json")

    def _read_mirror(self):
        """Last committed offset as mirrored at commit(), or _UNKNOWN when
        no usable mirror exists. The mirror may trail the checkpoint by at
        most one batch (crash between epoch commit and commit()): using a
        stale-low bound only yields one empty batch, never wrong data —
        the data range always comes from the checkpointed (start, end]."""
        if not self.mirror_dir:
            return _UNKNOWN
        try:
            with open(self._mirror_path()) as f:
                return json.load(f)["offset"]
        except (OSError, ValueError, KeyError):
            return _UNKNOWN

    def _write_mirror(self, encoded_offset) -> None:
        if not self.mirror_dir or encoded_offset is _UNKNOWN:
            return
        try:
            os.makedirs(self.mirror_dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=self.mirror_dir, suffix=".tmp")
            with os.fdopen(fd, "w") as f:
                json.dump({"offset": encoded_offset}, f)
            os.replace(tmp, self._mirror_path())
        except OSError:
            pass  # mirror is best-effort; the checkpoint stays authoritative

    def latestOffset(self) -> dict:  # noqa: N802
        if self._cursor is _UNKNOWN:
            # Restarted query: the authoritative committed offset lives in
            # the checkpoint (we learn it at the next partitions()/commit()
            # call). If a commit-time mirror exists, resume capped from it;
            # otherwise announce the uncapped global max — correct, merely
            # skipping the rate cap for this one batch.
            mirrored = self._read_mirror()
            if mirrored is not _UNKNOWN:
                self._cursor = mirrored
            else:
                bound = self._probe_bound(None, cap=None)
                if bound is None:
                    return {"offset": None}
                self._cursor = self._encode(bound)
                return {"offset": self._cursor}
        lower = self._decode(self._cursor)
        bound = self._probe_bound(lower, cap=self.batch_max_rows)
        if bound is None:
            return {"offset": self._cursor}  # no new rows -> no batch
        self._cursor = self._encode(bound)
        return {"offset": self._cursor}

    # -- batch planning: fragment pruning by row-group stats ---------------

    @staticmethod
    def _overlaps(fragment, offset_column: str, lower, upper) -> bool:
        """True if any row group's [min, max] for the offset column
        intersects (lower, upper]; missing statistics => keep (correctness
        over pruning)."""
        try:
            fragment.ensure_complete_metadata()
            row_groups = fragment.row_groups
        except Exception:  # noqa: BLE001 - stats are an optimization only
            return True
        if not row_groups:
            return True
        for rg in row_groups:
            stats = (rg.statistics or {}).get(offset_column)
            if not stats or stats.get("min") is None or stats.get("max") is None:
                return True
            try:
                above = lower is None or stats["max"] > lower
                below = upper is None or stats["min"] <= upper
            except TypeError:
                # incomparable stats (e.g. tz-aware stats vs naive bound):
                # degrade to scanning the fragment, never to a planning error
                return True
            if above and below:
                return True
        return False

    def partitions(self, start: dict, end: dict):  # noqa: N802
        import pyarrow.dataset as pads

        lower = self._decode(start.get("offset"))
        upper = self._decode(end.get("offset"))
        # partitions() always carries the authoritative checkpointed range —
        # sync the cursor to the LARGER bound (covers the restart path where
        # latestOffset ran before the reader knew the committed offset, and
        # the stale-mirror case where the announced end trails the
        # checkpoint's committed start).
        try:
            behind = upper is not None and lower is not None and upper < lower
        except TypeError:
            behind = False
        self._cursor = start.get("offset") if behind else end.get("offset")
        if upper is None or behind or lower == upper:
            return []
        return [
            _ScanPartition(frag.path, self.offset_column, lower, upper)
            for frag in pads.dataset(self.path, format="parquet").get_fragments()
            if self._overlaps(frag, self.offset_column, lower, upper)
        ]

    # -- executor side: filtered Arrow scan, no driver involvement ---------

    def read(self, partition: _ScanPartition):
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        filt = pc.field(partition.offset_column) <= partition.upper
        if partition.lower is not None:
            filt = (pc.field(partition.offset_column) > partition.lower) & filt
        ds = pads.dataset(partition.path, format="parquet")
        for batch in ds.to_batches(filter=filt):
            if batch.num_rows:
                yield batch

    def commit(self, end: dict) -> None:
        # Never move the cursor backwards: after a stale-mirror restart,
        # partitions() may have synced it past this batch's (trailing) end.
        cur = None if self._cursor is _UNKNOWN else self._decode(self._cursor)
        new = self._decode(end.get("offset"))
        try:
            regress = cur is not None and new is not None and new < cur
        except TypeError:
            regress = False
        if not regress:
            self._cursor = end.get("offset")
        self._write_mirror(self._cursor)


class IncrementalTableDataSource(DataSource):
    """Usage:
        spark.dataSource.register(IncrementalTableDataSource)
        spark.readStream.format("incremental_table")
             .option("path", dir).option("offset.column", "id").load()
    """

    @classmethod
    def name(cls) -> str:
        return "incremental_table"

    def schema(self) -> str:
        import pyarrow.dataset as pads

        dataset = pads.dataset(self.options["path"], format="parquet")
        return ", ".join(_ddl_of(f) for f in dataset.schema)

    def streamReader(self, schema):  # noqa: N802
        return _IncrementalStreamReader(self.options)
