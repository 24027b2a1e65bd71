"""S1/S2 — incremental polled source with durable offset bookkeeping.

The reference's JDBC source polls a table every ``poll.interval.ms``,
emitting rows whose offset column (``timestamp`` mode: updated_at;
``incrementing`` mode: id) exceeds the last committed offset, at most
``batch.max.rows`` per poll (reference README.md:91-109,
source-quickstart-sqlite.properties:27-29). Spark has no streaming JDBC
source, so this is the one genuinely custom source (SURVEY.md §4): a
microbatch driver loop around ``spark.read`` with the predicate pushed
into the scan, offsets persisted via atomic file rename.

Delivery semantics: the offset is committed AFTER the sink write returns
=> at-least-once (exactly the reference's contract, README.md:285); pair
with an idempotent sink (sinks.upsert) for effective exactly-once.

Scale: each poll is one pushed-down range scan (``offset > last``), so
cost tracks the increment, not the table. ``batch_max_rows`` bounds a poll
by probing the n-th smallest offset (an ascending TakeOrdered: per-partition
top-k, k-row driver merge — no global sort) and cutting the batch at that
OFFSET BOUNDARY, inclusive of ties. The emitted batch is therefore a pure
range predicate ``last < offset <= bound``: deterministic under
re-evaluation, and a tie group sharing the boundary timestamp is always
emitted whole — truncating mid-tie-group and committing the boundary would
silently skip the tied rows past the cap forever.

``timestamp+incrementing`` is the reference JDBC source's dual-offset
mode: the committed offset is the composite (timestamp, id), unique per
row, so capped polls page through timestamp tie groups exactly (cut
anywhere, disambiguated by id) instead of emitting them whole."""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalTableSource:
    def __init__(
        self,
        path: str,
        offset_column: str,
        mode: str = "incrementing",
        state_dir: str | None = None,
        batch_max_rows: int | None = None,
        fmt: str = "parquet",
        table: str | None = None,
        jdbc_options: dict | None = None,
        incrementing_column: str | None = None,
    ) -> None:
        """``fmt="jdbc"`` polls a live database: ``path`` is the JDBC url
        (reference README.md:93 ``connection.url``), ``table`` the remote
        table, and ``jdbc_options`` passes reader options through — notably
        ``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``
        for a parallel scan and ``user``/``password``/``driver``. The offset
        range predicates are pushed into the remote WHERE clause by
        Catalyst (verified in tests/test_jdbc.py), so each poll ships only
        the increment over the wire — the reference JDBC connector's
        query shape (README.md:100-101)."""
        if mode not in ("incrementing", "timestamp", "timestamp+incrementing"):
            raise ValueError(f"unknown mode: {mode}")
        if fmt == "jdbc" and not table:
            raise ValueError("fmt='jdbc' requires table=")
        if mode == "timestamp+incrementing" and not incrementing_column:
            raise ValueError("timestamp+incrementing requires incrementing_column=")
        self.path = path
        self.offset_column = offset_column
        self.incrementing_column = incrementing_column
        self.mode = mode
        self.batch_max_rows = batch_max_rows
        self.fmt = fmt
        self.table = table
        self.jdbc_options = dict(jdbc_options or {})
        self.state_dir = state_dir or tempfile.mkdtemp(prefix="inc-source-")
        os.makedirs(self.state_dir, exist_ok=True)
        self._state_file = os.path.join(self.state_dir, "offset.json")
        # per-instance parquet schema memo (see _base_df)
        self._schema = None
        self._schema_key: tuple | None = None

    # -- offset store (atomic write-then-rename, survives restart) ---------

    def last_offset(self):
        if not os.path.exists(self._state_file):
            return None
        with open(self._state_file) as fh:
            return json.load(fh)["offset"]

    def commit(self, offset) -> None:
        tmp = self._state_file + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"offset": offset, "column": self.offset_column}, fh)
        os.replace(tmp, self._state_file)

    # -- polling ------------------------------------------------------------

    def _base_df(self, spark: SparkSession) -> DataFrame:
        if self.fmt == "jdbc":
            reader = (
                spark.read.format("jdbc")
                .option("url", self.path)
                .option("dbtable", self.table)
            )
            for k, v in self.jdbc_options.items():
                reader = reader.option(k, str(v))
            return reader.load()
        # r16 (guide §1.4/§6, the catalog._read discipline): a bare
        # format().load() submits a one-task schema-inference job on EVERY
        # poll (~0.2-0.3 s — the footer read), so a caught-up poll loop
        # paid more for schema re-inference than for the increment scan.
        # The schema is memoized per source instance, keyed on the file's
        # mtime+size so an upstream schema EVOLUTION (file rewritten with
        # new columns) still re-infers on the next poll — the JDBC-source
        # behavior the reference documents. Metadata only: every poll
        # still scans the parquet increment in full.
        try:
            st = os.stat(self.path)
            key = (st.st_mtime_ns, st.st_size)
        except OSError:
            key = None  # directory-backed / remote: fall back per-poll
        if key is not None and self._schema_key == key:
            return spark.read.format(self.fmt).schema(self._schema).load(
                self.path
            )
        df = spark.read.format(self.fmt).load(self.path)
        if key is not None:
            self._schema, self._schema_key = df.schema, key
        return df

    def read_increment(self, spark: SparkSession) -> DataFrame:
        """One poll: rows with offset column > last committed offset, capped
        near batch_max_rows at an offset-boundary cut (ties included). The
        filters land in the scan (PushedFilters) — for a JDBC backend
        Catalyst pushes the same predicates into the remote query.

        The returned DataFrame is a deterministic range filter (no LIMIT),
        so offset snapshot, count, and sink write agree on the row set even
        if each triggers a separate evaluation."""
        batch, _, _ = self._poll(spark)
        return batch

    def _poll(self, spark: SparkSession):
        """One poll, probe folded: returns ``(batch_df, commit_offset,
        exact_n)``.

        The capped probe (ascending TakeOrdered over the increment + one
        agg) yields the page's boundary offset — and because the batch is
        exactly ``last < offset <= boundary`` with the boundary row
        included, the probe's max IS the batch's max offset. Committing it
        directly removes the separate ``max_offset_of`` job the poll loop
        used to run per page (4 driver jobs/page -> 2 for unique-offset
        modes). The same probe agg counts the prefix; in ``incrementing``
        and dual mode offsets are unique, so that count is the exact batch
        size (``exact_n``) and the caller can skip its count job too. In
        single-``timestamp`` mode boundary ties can inflate the batch past
        the prefix, so ``exact_n`` is None and the caller counts.
        """
        df = self._base_df(spark)
        last = self.last_offset()
        if self.mode == "timestamp+incrementing":
            return self._poll_dual(df, last)
        if last is not None:
            lower = (
                F.lit(last).cast("timestamp")
                if self.mode == "timestamp"
                else F.lit(last)
            )
            df = df.filter(F.col(self.offset_column) > lower)
        if self.batch_max_rows is None:
            return df, None, None
        # Probe the n-th smallest offset (1-row driver scalar), then cut
        # the batch at that boundary INCLUSIVE — rows tied with the
        # boundary are all emitted now, never stranded past a truncation.
        probe = (
            df.orderBy(self.offset_column)
            .limit(self.batch_max_rows)
            .agg(
                F.max(self.offset_column).alias("b"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        if probe["b"] is None:
            return df.limit(0), None, 0
        batch = df.filter(F.col(self.offset_column) <= F.lit(probe["b"]))
        commit = self._fmt_offset(probe["b"])
        exact_n = int(probe["n"]) if self.mode == "incrementing" else None
        return batch, commit, exact_n

    def _poll_dual(self, df: DataFrame, last):
        """``timestamp+incrementing`` (the reference JDBC source's dual
        mode): the offset is the COMPOSITE (timestamp, id), which is unique
        per row — so a capped poll can cut anywhere without the tie-group
        inflation the single-timestamp mode needs (rows sharing the boundary
        timestamp are disambiguated by id; the exact failure mode the dual
        mode exists to fix). Filter shape stays a pushdown-friendly
        OR-of-ranges: ts > last_ts OR (ts = last_ts AND id > last_id)."""
        tsc = F.col(self.offset_column)
        idc = F.col(self.incrementing_column)
        if last is not None:
            lts = F.lit(last["ts"]).cast("timestamp")
            df = df.filter((tsc > lts) | ((tsc == lts) & (idc > F.lit(last["id"]))))
        if self.batch_max_rows is None:
            return df, None, None
        probe = (
            df.orderBy(self.offset_column, self.incrementing_column)
            .limit(self.batch_max_rows)
            .agg(
                F.max(F.struct(tsc.alias("ts"), idc.alias("id"))).alias("b"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        b = probe["b"]
        if b is None:
            return df.limit(0), None, 0
        bts = F.lit(b["ts"]).cast("timestamp")
        batch = df.filter((tsc < bts) | ((tsc == bts) & (idc <= F.lit(b["id"]))))
        ts = b["ts"]
        commit = {
            "ts": ts.isoformat(sep=" ") if hasattr(ts, "isoformat") else ts,
            "id": b["id"],
        }
        return batch, commit, int(probe["n"])

    def _fmt_offset(self, m):
        return m.isoformat(sep=" ") if hasattr(m, "isoformat") else m

    def max_offset_of(self, batch: DataFrame):
        if self.mode == "timestamp+incrementing":
            row = batch.agg(
                F.max(
                    F.struct(
                        F.col(self.offset_column).alias("ts"),
                        F.col(self.incrementing_column).alias("id"),
                    )
                ).alias("m")
            ).collect()[0]["m"]
            if row is None:
                return None
            ts = row["ts"]
            return {
                "ts": ts.isoformat(sep=" ") if hasattr(ts, "isoformat") else ts,
                "id": row["id"],
            }
        row = batch.agg(F.max(self.offset_column).alias("m")).collect()[0]
        m = row["m"]
        if m is None:
            return None
        return self._fmt_offset(m)

    def run_once(
        self,
        spark: SparkSession,
        sink: Callable[[DataFrame], None],
        transform: Callable[[DataFrame], DataFrame] | None = None,
    ) -> int:
        """poll -> transform chain -> sink -> commit offset. Returns rows
        emitted (0 = caught up).

        Driver-job budget per capped page (the legacy S1/S2 poll loop's
        scale cost): ONE probe job + ONE sink job when the offset is unique
        (``incrementing`` / dual mode, no transform) — the probe already
        yields both the commit offset and the exact batch size (see
        ``_poll``). Single-``timestamp`` mode (tie inflation) or a
        cardinality-changing ``transform`` adds one count job over the
        cached batch."""
        batch, commit, exact_n = self._poll(spark)
        if commit is None and self.batch_max_rows is not None:
            return 0  # capped poll, empty probe: caught up
        need_count = exact_n is None or transform is not None
        cache = need_count  # only multi-consumer batches benefit
        if cache:
            batch = batch.cache()
        if commit is None:
            commit = self.max_offset_of(batch)
            if commit is None:
                if cache:
                    batch.unpersist()
                return 0
        out = transform(batch) if transform is not None else batch
        n = out.count() if need_count else exact_n
        sink(out)
        self.commit(commit)  # commit AFTER sink => at-least-once
        if cache:
            batch.unpersist()
        return n
