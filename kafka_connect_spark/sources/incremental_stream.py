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

Options: path, offset.column, batch.max.rows (optional cap per trigger).
"""

from __future__ import annotations

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

    def _probe_bound(self, lower, cap: int | None):
        """Next batch's end offset: the cap-th smallest offset value above
        ``lower`` (ties beyond the cap join the batch via the inclusive
        <= bound filter downstream), or the global max when uncapped.
        Reads ONLY the offset column; the pushdown filter prunes row groups
        whose stats lie at or below ``lower``."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        ds = pads.dataset(self.path, format="parquet")
        filt = pc.field(self.offset_column) > lower if lower is not None else None
        tbl = ds.to_table(columns=[self.offset_column], filter=filt)
        if tbl.num_rows == 0:
            return None
        vals = tbl.column(0).combine_chunks()
        if cap is not None and tbl.num_rows > cap:
            idx = pc.sort_indices(vals)
            return vals[idx[cap - 1].as_py()].as_py()
        return pc.max(vals).as_py()

    def initialOffset(self) -> dict:  # noqa: N802
        self._cursor = None
        return {"offset": None}

    def latestOffset(self) -> dict:  # noqa: N802
        if self._cursor is _UNKNOWN:
            # Restarted query: the committed offset lives in the checkpoint
            # (we learn it at the next partitions()/commit() call). Announce
            # the uncapped global max — correct, merely skipping the rate
            # cap for this one batch.
            bound = self._probe_bound(None, cap=None)
            if bound is None:
                return {"offset": None}
        else:
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
            above = lower is None or stats["max"] > lower
            below = upper is None or stats["min"] <= upper
            if above and below:
                return True
        return False

    def partitions(self, start: dict, end: dict):  # noqa: N802
        import pyarrow.dataset as pads

        lower = self._decode(start.get("offset"))
        upper = self._decode(end.get("offset"))
        # partitions() always carries the authoritative checkpointed range —
        # sync the cursor (covers the restart path where latestOffset ran
        # before the reader knew the committed offset).
        self._cursor = end.get("offset")
        if upper is None or lower == upper:
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
        self._cursor = end.get("offset")


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
