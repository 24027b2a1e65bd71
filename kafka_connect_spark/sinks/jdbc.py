"""K2 — JDBC upsert sink against a live database (JdbcSinkConnector).

The reference's JDBC sink upserts into a relational table with
``auto.create``/``auto.evolve`` (confluentinc-kafka-connect-jdbc
sink-quickstart-sqlite.properties:19-29; manifest.json:5 'idempotent
writes with upserts'). Spark-side realization:

1. dedup the batch last-writer-wins on the key (window, distributed);
2. bulk-load it into a STAGING table with the distributed ``df.write``
   JDBC path (executors stream rows over parallel connections — the only
   data-volume transfer, so it scales with executor count);
3. one driver-side ``MERGE INTO target USING staging`` statement — set
   semantics, size-independent, executed inside the database;
4. drop the staging table.

``auto_create`` derives CREATE TABLE DDL (with a primary key) from the
DataFrame schema; ``auto_evolve`` issues ALTER TABLE ADD COLUMN for new
columns (adds only — drops/renames never applied, mirroring the
reference's 'limited auto-evolution'). With ``delete_col`` set, rows
whose marker is 'true' DELETE their key (Debezium rewrite-mode tombstone
materialization, as in sinks.upsert).

Identifiers are double-quoted throughout, so table/column names are
case-exact; pass the same quoted-exact table name Spark's JDBC writer
uses. Tested live against the embedded Derby engine that ships with
Spark (tests/test_jdbc.py) — the SQL is ANSI MERGE, the same statement
PostgreSQL 15+ accepts.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def quiet_derby(spark: SparkSession) -> None:
    """Point embedded Derby's boot log at the temp dir instead of cwd (it
    writes ``derby.log`` into the working directory otherwise). No-op for
    other databases."""
    spark._jvm.System.setProperty(
        "derby.stream.error.file", os.path.join(tempfile.gettempdir(), "derby.log")
    )


def _qi(name: str) -> str:
    """Quote an SQL identifier (ANSI double quotes, case-exact)."""
    return '"' + name.replace('"', '""') + '"'


def sql_type_of(dt: T.DataType, varchar_len: int = 4000) -> str:
    """Spark type -> ANSI DDL type (the auto.create mapping)."""
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "INTEGER"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.FloatType):
        return "REAL"
    if isinstance(dt, T.StringType):
        return f"VARCHAR({varchar_len})"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    raise ValueError(f"no JDBC DDL mapping for {dt.simpleString()}")


class UpsertJdbcSink:
    def __init__(
        self,
        url: str,
        table: str,
        key_cols: list[str],
        order_col: str,
        auto_create: bool = True,
        auto_evolve: bool = True,
        delete_col: str | None = None,
        options: dict | None = None,
        varchar_len: int = 4000,
    ) -> None:
        self.url = url
        self.table = table
        self.key_cols = key_cols
        self.order_col = order_col
        self.auto_create = auto_create
        self.auto_evolve = auto_evolve
        self.delete_col = delete_col
        self.options = dict(options or {})  # user/password/driver/... passthrough
        self.varchar_len = varchar_len

    # -- driver-side statement channel --------------------------------------

    def _connection(self, spark: SparkSession):
        quiet_derby(spark)
        jvm = spark._jvm
        driver = self.options.get("driver")
        if driver:
            jvm.java.lang.Class.forName(driver)
        user, pwd = self.options.get("user"), self.options.get("password")
        if user is not None:
            return jvm.java.sql.DriverManager.getConnection(self.url, user, pwd or "")
        return jvm.java.sql.DriverManager.getConnection(self.url)

    def _execute(self, spark: SparkSession, *statements: str) -> None:
        conn = self._connection(spark)
        try:
            st = conn.createStatement()
            for sql in statements:
                st.executeUpdate(sql)
            st.close()
        finally:
            conn.close()

    def existing_columns(self, spark: SparkSession) -> list[str] | None:
        """Column names of the target table, or None if it doesn't exist.

        ``getColumns`` treats the table name as a LIKE pattern ('_'/'%' are
        wildcards), so 'user_events' would also match 'userXevents' and
        auto_create/auto_evolve would mis-detect. The pattern is escaped
        with the driver's search-string escape AND results are filtered by
        exact TABLE_NAME match (belt and braces — some drivers ignore the
        escape in metadata patterns)."""
        conn = self._connection(spark)
        try:
            md = conn.getMetaData()
            esc = md.getSearchStringEscape()
            if esc:
                pattern = (
                    self.table.replace(esc, esc + esc)
                    .replace("_", esc + "_")
                    .replace("%", esc + "%")
                )
            else:
                # Derby reports NO metadata escape ('' — injecting one
                # matches nothing); leave wildcards live and let the exact
                # TABLE_NAME filter below discard over-matches.
                pattern = self.table
            rs = md.getColumns(None, None, pattern, None)
            cols = []
            while rs.next():
                if rs.getString("TABLE_NAME") == self.table:
                    cols.append(rs.getString("COLUMN_NAME"))
            rs.close()
            return cols or None
        finally:
            conn.close()

    # -- DDL ----------------------------------------------------------------

    def create_table_ddl(self, schema: T.StructType) -> str:
        """auto.create: CREATE TABLE with a primary key, from the batch
        schema (reference sink-quickstart-sqlite.properties:28 auto.create)."""
        cols = [
            f"{_qi(f.name)} {sql_type_of(f.dataType, self.varchar_len)}"
            + (" NOT NULL" if f.name in self.key_cols else "")
            for f in schema.fields
        ]
        pk = ", ".join(_qi(c) for c in self.key_cols)
        return (
            f"CREATE TABLE {_qi(self.table)} ("
            + ", ".join(cols)
            + f", PRIMARY KEY ({pk}))"
        )

    def merge_sql(self, staging: str, schema: T.StructType) -> str:
        """ANSI MERGE from the staging table; with ``delete_col``, a
        matched 'true' marker deletes the key instead of updating it.

        String columns from staging are referenced through an explicit
        CAST(... AS VARCHAR(n)): some dialects (Derby) create StringType
        staging columns as CLOB, which can be neither compared nor assigned
        to VARCHAR without the cast. The cast is a no-op elsewhere."""
        cols = [f.name for f in schema.fields]
        strings = {f.name for f in schema.fields if isinstance(f.dataType, T.StringType)}

        def sref(c: str) -> str:
            ref = f"s.{_qi(c)}"
            return f"CAST({ref} AS VARCHAR({self.varchar_len}))" if c in strings else ref

        t, s = _qi(self.table), _qi(staging)
        on = " AND ".join(f"t.{_qi(c)} = {sref(c)}" for c in self.key_cols)
        data_cols = [c for c in cols if c not in self.key_cols and c != self.delete_col]
        insert_cols = [c for c in cols if c != self.delete_col]
        sets = ", ".join(f"{_qi(c)} = {sref(c)}" for c in data_cols)
        ins = ", ".join(_qi(c) for c in insert_cols)
        vals = ", ".join(sref(c) for c in insert_cols)
        parts = [f"MERGE INTO {t} t USING {s} s ON {on}"]
        if self.delete_col is not None and self.delete_col in cols:
            d = sref(self.delete_col)
            parts.append(f"WHEN MATCHED AND {d} = 'true' THEN DELETE")
            if sets:
                parts.append(f"WHEN MATCHED AND ({d} IS NULL OR {d} <> 'true') THEN UPDATE SET {sets}")
            parts.append(
                f"WHEN NOT MATCHED AND ({d} IS NULL OR {d} <> 'true') "
                f"THEN INSERT ({ins}) VALUES ({vals})"
            )
        else:
            if sets:
                parts.append(f"WHEN MATCHED THEN UPDATE SET {sets}")
            parts.append(f"WHEN NOT MATCHED THEN INSERT ({ins}) VALUES ({vals})")
        return "\n".join(parts)

    # -- the sink -----------------------------------------------------------

    def _dedup_batch(self, batch: DataFrame) -> DataFrame:
        w = Window.partitionBy(*self.key_cols).orderBy(F.col(self.order_col).desc())
        return (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def _write_staging(self, df: DataFrame, staging: str) -> None:
        writer = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", _qi(staging))
            .mode("overwrite")
        )
        for k, v in self.options.items():
            writer = writer.option(k, str(v))
        writer.save()

    def apply_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        spark = batch.sparkSession
        incoming = self._dedup_batch(batch)
        existing = self.existing_columns(spark)
        if existing is None:
            if not self.auto_create:
                raise RuntimeError(f"table {self.table} missing and auto_create=False")
            schema = T.StructType(
                [f for f in incoming.schema.fields if f.name != self.delete_col]
            )
            self._execute(spark, self.create_table_ddl(schema))
            existing = [f.name for f in schema.fields]
        new_cols = [
            c for c in incoming.columns if c not in existing and c != self.delete_col
        ]
        if new_cols:
            if not self.auto_evolve:
                raise ValueError(f"schema evolution disabled; new columns: {new_cols}")
            ddl = [
                f"ALTER TABLE {_qi(self.table)} ADD COLUMN "
                f"{_qi(c)} {sql_type_of(incoming.schema[c].dataType, self.varchar_len)}"
                for c in new_cols
            ]
            self._execute(spark, *ddl)
        staging = f"{self.table}__stage"
        self._write_staging(incoming, staging)
        try:
            self._execute(spark, self.merge_sql(staging, incoming.schema))
        finally:
            self._execute(spark, f"DROP TABLE {_qi(staging)}")

    def read(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", _qi(self.table))
        )
        for k, v in self.options.items():
            reader = reader.option(k, str(v))
        return reader.load()

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch`` — streaming CDC
        materialization straight into the database."""
        return lambda df, batch_id: self.apply_batch(df, batch_id)
