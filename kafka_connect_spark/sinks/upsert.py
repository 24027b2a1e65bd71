"""K2 — idempotent keyed upsert sink (JdbcSinkConnector analog).

The reference's JDBC sink does idempotent upserts with auto.create
(sink-quickstart-sqlite.properties:19-29; manifest.json:5 'idempotent
writes with upserts'). Spark-side realization: a ``foreachBatch`` MERGE —
each microbatch is first deduped last-writer-wins WITHIN the batch, then
merged into the base table keyed on the primary key.

This implementation merges into a parquet directory by rewriting the union
(read base -> anti-join replaced keys -> union new -> overwrite), which is
the format-agnostic fallback. On a transactional table format (Delta/
Iceberg) the same ``apply_batch`` body becomes a real ``MERGE INTO`` and
the rewrite cost drops to touched files — the class isolates exactly that
swap point. Combined with at-least-once replay (sources.incremental /
streaming checkpoints), idempotent MERGE gives effective exactly-once —
verified by the kill-and-restart test in tests/test_streaming.py."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class UpsertParquetSink:
    def __init__(
        self,
        path: str,
        key_cols: list[str],
        order_col: str,
        auto_create: bool = True,
        auto_evolve: bool = True,
        delete_col: str | None = None,
        keep_versions: int = 1,
    ) -> None:
        self.path = path
        self.key_cols = key_cols
        self.order_col = order_col
        self.auto_create = auto_create
        self.auto_evolve = auto_evolve
        # >1 retains that many superseded table versions for time-travel
        # reads / rollback after a bad batch (the Delta/Iceberg snapshot
        # retention analog); 1 = current only.
        self.keep_versions = max(1, keep_versions)
        # CDC materialization: rows whose ``delete_col`` == 'true' (the
        # Debezium rewrite marker, transforms.extract_new_record_state)
        # REMOVE their key from the table instead of upserting. Within a
        # batch, order_col decides (delete-then-reinsert works); ACROSS
        # batches correctness relies on in-order delivery per key — the
        # guarantee Kafka's per-partition ordering provides upstream.
        self.delete_col = delete_col

    def _dedup_batch(self, batch: DataFrame) -> DataFrame:
        """Last-writer-wins within the batch (PK uniqueness — the failure the
        reference hits manually at README.md:151-158 becomes a dedup here)."""
        w = Window.partitionBy(*self.key_cols).orderBy(F.col(self.order_col).desc())
        return (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    # -- crash-safe versioned storage ---------------------------------------
    #
    # Parquet has no transactions, so each merge writes a NEW version
    # directory (<path>.data.vN) and atomically flips a symlink at
    # ``self.path`` onto it (symlink create + os.replace = one rename).
    # A crash mid-write leaves the pointer on the previous complete version
    # — readers never see a half-written table — and ``_recover`` repoints
    # a missing/dangling pointer to the newest complete (_SUCCESS-marked)
    # version on the next call. Superseded versions are deleted after the
    # flip. This is the poor-man's Delta/Iceberg commit protocol; on a real
    # table format the whole block becomes MERGE INTO.

    def _pointer(self) -> str:
        return self.path.rstrip("/")

    def _version_dirs(self) -> list[str]:
        ptr = os.path.abspath(self._pointer())
        parent, base = os.path.dirname(ptr), os.path.basename(ptr)
        prefix = base + ".data.v"
        if not os.path.isdir(parent):
            return []
        vers = [
            os.path.join(parent, f)
            for f in os.listdir(parent)
            if f.startswith(prefix) and f[len(prefix):].isdigit()
        ]
        return sorted(vers, key=lambda p: int(p.rsplit(".v", 1)[1]))

    def _next_version_dir(self) -> str:
        vers = self._version_dirs()
        n = int(vers[-1].rsplit(".v", 1)[1]) + 1 if vers else 0
        return os.path.abspath(self._pointer()) + f".data.v{n}"

    def _flip(self, target: str) -> None:
        """Atomically point ``self.path`` at ``target``, then GC superseded
        version dirs and any legacy staging leftovers."""
        ptr = self._pointer()
        tmp = ptr + ".lnk.tmp"
        if os.path.lexists(tmp):
            os.unlink(tmp)
        os.symlink(os.path.abspath(target), tmp)
        if os.path.isdir(ptr) and not os.path.islink(ptr):
            os.rmdir(ptr)  # empty placeholder dir (e.g. pre-created by mktemp)
        os.replace(tmp, ptr)  # atomic rename over the old symlink
        vers = self._version_dirs()
        current = os.path.abspath(target)
        keep = {current}
        for d in reversed(vers):  # newest first, retain up to keep_versions
            if len(keep) >= self.keep_versions:
                break
            keep.add(os.path.abspath(d))
        for d in vers:
            if os.path.abspath(d) not in keep:
                shutil.rmtree(d, ignore_errors=True)
        legacy_staging = ptr + ".staging"
        if os.path.isdir(legacy_staging):
            shutil.rmtree(legacy_staging, ignore_errors=True)

    def _recover(self) -> bool:
        """True if a readable base table exists (repairing the pointer from
        the newest complete version dir if a crash stranded it)."""
        ptr = self._pointer()
        if os.path.islink(ptr):
            if os.path.isdir(ptr):
                return True
            os.unlink(ptr)  # dangling: crashed between GC start and flip? repoint
        elif os.path.isdir(ptr):
            return any(f.endswith(".parquet") for f in os.listdir(ptr))
        complete = [
            d for d in self._version_dirs()
            if os.path.exists(os.path.join(d, "_SUCCESS"))
        ]
        if complete:
            self._flip(complete[-1])
            return True
        return False

    def apply_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        """MERGE semantics: delete keys present in the batch, insert the
        batch's last-writer rows. Safe to re-apply the same batch (idempotent),
        and crash-safe at every step (see versioned-storage note above)."""
        spark = batch.sparkSession
        incoming = self._dedup_batch(batch)
        deletes = None
        if self.delete_col is not None and self.delete_col in incoming.columns:
            # last writer decides: if the key's final event is a delete, the
            # key disappears; otherwise the final state lands (minus marker)
            deletes = incoming.filter(F.col(self.delete_col) == "true")
            incoming = incoming.filter(
                (F.col(self.delete_col) != "true") | F.col(self.delete_col).isNull()
            ).drop(self.delete_col)
        if not self._recover():
            if not self.auto_create:
                raise FileNotFoundError(self.path)
            v0 = self._next_version_dir()
            incoming.write.mode("overwrite").parquet(v0)
            self._flip(v0)
            return
        ptr = self._pointer()
        if not os.path.islink(ptr):
            # migrate a legacy plain-directory table into the versioned
            # layout: one atomic rename, then the pointer flip (a crash
            # between the two is healed by _recover from the version dir)
            v0 = self._next_version_dir()
            os.rename(ptr, v0)
            self._flip(v0)
        base = spark.read.option("mergeSchema", "true").parquet(self.path)
        new_cols = set(incoming.columns) - set(base.columns)
        if new_cols and not self.auto_evolve:
            raise ValueError(f"schema evolution disabled; new columns: {sorted(new_cols)}")
        touched = incoming.select(*self.key_cols)
        if deletes is not None:
            touched = touched.unionByName(deletes.select(*self.key_cols)).distinct()
        keep = base.join(touched, self.key_cols, "left_anti")
        # 'limited auto-evolution' (reference manifest.json:5): adding
        # columns is allowed — missing sides fill with NULL; drops/renames
        # are not silently applied
        merged = keep.unionByName(incoming, allowMissingColumns=True)
        new_v = self._next_version_dir()
        merged.write.mode("overwrite").parquet(new_v)  # reads old version via symlink
        self._flip(new_v)

    def read(self, spark: SparkSession) -> DataFrame:
        self._recover()
        return spark.read.parquet(self.path)

    def versions(self) -> list[int]:
        """Retained version numbers, oldest first (time-travel surface)."""
        return [int(d.rsplit(".v", 1)[1]) for d in self._version_dirs()]

    def read_version(self, spark: SparkSession, version: int) -> DataFrame:
        """Time-travel read of a retained version (``keep_versions`` > 1
        keeps superseded snapshots — rollback = re-apply an old version's
        rows, or point a reader at it for an audit diff)."""
        for d in self._version_dirs():
            if int(d.rsplit(".v", 1)[1]) == version:
                return spark.read.parquet(d)
        raise ValueError(
            f"version {version} not retained (have {self.versions()})"
        )

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``."""
        return lambda df, batch_id: self.apply_batch(df, batch_id)
