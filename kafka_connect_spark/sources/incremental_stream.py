"""S1/S2 as a NATIVE streaming source: the incremental polled table as a
Spark Python DataSource stream (readStream.format("incremental_table")).

Where ``sources.incremental`` drives the poll loop itself (offsets in a
side file), this variant hands offset management to Structured Streaming:
``initialOffset``/``read`` return offset dicts that Spark persists in the
query CHECKPOINT, so offset commit is transactional with the sink epoch —
the checkpointed analog of connect-offset-storage (reference
docker-compose.yaml:133-135), with restart/replay handled by the engine.

The reader polls on the driver via pyarrow (the reference's JDBC source
polls ≤ batch.max.rows=100 rows per trigger through one connection,
README.md:100-101 — same shape: small increments, not table scans; the
predicate prunes row groups by the offset column's min/max stats).

Options: path, offset.column, batch.max.rows (optional cap per trigger).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

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


def _ddl_of(field) -> str:
    t = str(field.type)
    if t.startswith("timestamp"):
        spark_t = "timestamp"
    else:
        spark_t = _PA_TO_DDL.get(t)
    if spark_t is None:
        raise ValueError(f"unsupported parquet type for incremental stream: {t}")
    return f"{field.name} {spark_t}"


class _IncrementalStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.offset_column = options["offset.column"]
        self.batch_max_rows = (
            int(options["batch.max.rows"]) if "batch.max.rows" in options else None
        )

    def _scan(self, lower, upper=None) -> tuple[list[tuple], object]:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        dataset = pads.dataset(self.path, format="parquet")
        # offsets round-trip through Spark's JSON checkpoint as strings for
        # timestamp columns — parse back before building the pushdown filter
        if str(dataset.schema.field(self.offset_column).type).startswith("timestamp"):
            from datetime import datetime

            lower = datetime.fromisoformat(lower) if isinstance(lower, str) else lower
            upper = datetime.fromisoformat(upper) if isinstance(upper, str) else upper
        filt = None
        if lower is not None:
            filt = pc.field(self.offset_column) > lower
        if upper is not None:
            up = pc.field(self.offset_column) <= upper
            filt = up if filt is None else (filt & up)
        table = dataset.to_table(filter=filt)
        if table.num_rows == 0:
            return [], lower
        names = table.schema.names
        idx = names.index(self.offset_column)
        rows = sorted(
            (tuple(r) for r in zip(*(table.column(n).to_pylist() for n in names))),
            key=lambda r: r[idx],
        )
        if self.batch_max_rows is not None and upper is None and len(rows) > self.batch_max_rows:
            # Cut at an offset boundary, ties included: committing the max of
            # a mid-tie-group truncation would skip the tied rows past the
            # cap forever (next poll filters offset > committed max).
            bound = rows[self.batch_max_rows - 1][idx]
            j = self.batch_max_rows
            while j < len(rows) and rows[j][idx] == bound:
                j += 1
            rows = rows[:j]
        new_max = max(r[idx] for r in rows)
        return rows, new_max

    @staticmethod
    def _encode(v):
        return v.isoformat() if hasattr(v, "isoformat") else v

    def initialOffset(self) -> dict:  # noqa: N802
        return {"offset": None}

    def read(self, start: dict) -> tuple:
        rows, new_max = self._scan(start.get("offset"))
        if not rows:
            return iter([]), start
        return iter(rows), {"offset": self._encode(new_max)}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        """Deterministic replay after restart: exactly the rows in
        (start, end] by the offset column."""
        rows, _ = self._scan(start.get("offset"), end.get("offset"))
        return iter(rows)


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

    def simpleStreamReader(self, schema):  # noqa: N802
        return _IncrementalStreamReader(self.options)
