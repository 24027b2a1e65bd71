"""Real JDBC wiring, exercised LIVE against the embedded Derby engine that
ships with Spark: incremental source polls with pushed-down offset
predicates (S1/S2 over an actual database), and the MERGE-based upsert sink
with auto.create / auto.evolve / tombstone deletes (K2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_spark.sinks.jdbc import UpsertJdbcSink, quiet_derby
from kafka_connect_spark.sources.incremental import IncrementalTableSource


def _url(tmp_path, name: str = "db") -> str:
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def _seed(spark, url, table, rows, cols):
    quiet_derby(spark)
    (
        spark.createDataFrame(rows, cols)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode("append")
        .save()
    )


def test_jdbc_incremental_source_pushes_offset_predicate(spark, tmp_path):
    url = _url(tmp_path)
    _seed(spark, url, "USERS", [(1, "a"), (2, "b")], ["id", "name"])
    src = IncrementalTableSource(
        url, "id", "incrementing", str(tmp_path / "state"), fmt="jdbc", table="USERS"
    )
    sunk: list[set] = []
    assert src.run_once(spark, lambda df: sunk.append({r["id"] for r in df.collect()})) == 2
    assert src.last_offset() == 2

    # the next poll's range predicate must reach the remote scan
    plan = src.read_increment(spark)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(id,2)" in plan.replace(" ", "")

    _seed(spark, url, "USERS", [(3, "c")], ["id", "name"])
    assert src.run_once(spark, lambda df: sunk.append({r["id"] for r in df.collect()})) == 1
    assert sunk == [{1, 2}, {3}]
    assert src.run_once(spark, lambda df: None) == 0  # caught up


def test_jdbc_upsert_sink_auto_create_merge_idempotent(spark, tmp_path):
    url = _url(tmp_path)
    sink = UpsertJdbcSink(url, "users", ["id"], "ver")
    b1 = spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], ["id", "ver", "v"])
    sink.apply_batch(b1)  # auto.create fires here
    b2 = spark.createDataFrame([(2, 2, "b2"), (2, 3, "b3"), (3, 1, "c")], ["id", "ver", "v"])
    sink.apply_batch(b2)  # in-batch last-writer-wins, then MERGE
    got = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert got == {1: "a", 2: "b3", 3: "c"}
    sink.apply_batch(b2)  # at-least-once replay: MERGE is idempotent
    assert {r["id"]: r["v"] for r in sink.read(spark).collect()} == got


def test_jdbc_upsert_sink_auto_evolve_adds_column(spark, tmp_path):
    url = _url(tmp_path)
    sink = UpsertJdbcSink(url, "users", ["id"], "ver")
    sink.apply_batch(spark.createDataFrame([(1, 1, "a")], ["id", "ver", "v"]))
    sink.apply_batch(spark.createDataFrame([(2, 1, "b", "x")], ["id", "ver", "v", "w"]))
    got = {r["id"]: (r["v"], r["w"]) for r in sink.read(spark).collect()}
    assert got == {1: ("a", None), 2: ("b", "x")}

    strict = UpsertJdbcSink(url, "users", ["id"], "ver", auto_evolve=False)
    import pytest

    with pytest.raises(ValueError, match="schema evolution disabled"):
        strict.apply_batch(
            spark.createDataFrame([(3, 1, "c", "y", 1.0)], ["id", "ver", "v", "w", "z"])
        )


def test_jdbc_upsert_sink_tombstone_delete(spark, tmp_path):
    url = _url(tmp_path)
    sink = UpsertJdbcSink(url, "users", ["id"], "ver", delete_col="__deleted")
    sink.apply_batch(
        spark.createDataFrame(
            [(1, 1, "a", None), (2, 1, "b", "false")], ["id", "ver", "v", "__deleted"]
        )
    )
    # delete id=1, upsert id=2, insert id=3; a delete for an absent key (9)
    # is a no-op, not an error
    sink.apply_batch(
        spark.createDataFrame(
            [(1, 2, "a", "true"), (2, 2, "b2", None), (3, 1, "c", None), (9, 1, "x", "true")],
            ["id", "ver", "v", "__deleted"],
        )
    )
    got = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert got == {2: "b2", 3: "c"}


def test_jdbc_pipeline_spec_end_to_end(spark, tmp_path):
    """Spec-driven: JDBC incremental source -> mask -> JDBC upsert sink, the
    reference's postgres->jdbc-sink topology on a live database."""
    from kafka_connect_spark.plans.pipeline import Pipeline

    url = _url(tmp_path)
    _seed(spark, url, "SRC", [(1, "alice", "s1"), (2, "bob", "s2")], ["id", "name", "ssn"])
    spec = {
        "source": {
            "type": "jdbc_incremental",
            "connection.url": url,
            "table": "SRC",
            "offset.column": "id",
            "state.dir": str(tmp_path / "state"),
        },
        "transforms": [{"type": "mask_field", "fields": ["ssn"]}],
        "sink": {
            "type": "upsert_jdbc",
            "connection.url": url,
            "table": "dst",
            "key.fields": ["id"],
            "order.column": "id",
        },
    }
    p = Pipeline(spec)
    assert p.run(spark) == 2
    out = UpsertJdbcSink(url, "dst", ["id"], "id").read(spark)
    got = {r["id"]: (r["name"], r["ssn"]) for r in out.collect()}
    assert got == {1: ("alice", "CENSORED"), 2: ("bob", "CENSORED")}
    assert p.run(spark) == 0  # caught up; offset survived


def test_jdbc_schema_evolution_mid_stream(spark, tmp_path):
    """Widen the target table on a LIVE streaming pipeline: phase 1 streams
    schema-A microbatches into the Derby upsert sink, the connector restarts
    (same checkpoint) with schema A+B, and the sink's auto.evolve must ALTER
    the live table in place — old rows NULL-padded, an existing key UPDATEd
    with a value for the new column, new keys inserted. Mirrors the vendored
    JDBC sink's 'limited auto-evolution'
    (confluentinc-kafka-connect-jdbc-10.8.0/manifest.json:5)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    url = _url(tmp_path)
    sink = UpsertJdbcSink(url, "evolve_t", ["id"], "ver")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: two microbatch files, original schema
    d1 = tmp_path / "in_v1"
    d1.mkdir()
    for i, rows in enumerate([[(1, 1, "a")], [(2, 1, "b")]]):
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([r[0] for r in rows], pa.int64()),
                    "ver": pa.array([r[1] for r in rows], pa.int64()),
                    "v": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            str(d1 / f"f{i}.parquet"),
        )
    schema_v1 = spark.read.parquet(str(d1)).schema
    q = (
        spark.readStream.schema(schema_v1)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d1))
        .writeStream.foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {r["id"]: r["v"] for r in sink.read(spark).collect()} == {1: "a", 2: "b"}

    # phase 2: connector restart with a widened record schema — id=2 updated
    # WITH a new-column value, id=3 inserted
    d2 = tmp_path / "in_v2"
    d2.mkdir()
    pq.write_table(
        pa.table(
            {
                "id": pa.array([2, 3], pa.int64()),
                "ver": pa.array([2, 1], pa.int64()),
                "v": pa.array(["b2", "c"], pa.string()),
                "w": pa.array(["x2", "x3"], pa.string()),
            }
        ),
        str(d2 / "f0.parquet"),
    )
    schema_v2 = spark.read.parquet(str(d2)).schema
    q2 = (
        spark.readStream.schema(schema_v2)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d2))
        .writeStream.foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    got = {r["id"]: (r["v"], r["w"]) for r in sink.read(spark).collect()}
    assert got == {
        1: ("a", None),  # pre-evolution row NULL-padded
        2: ("b2", "x2"),  # existing key UPDATEd including the new column
        3: ("c", "x3"),  # post-evolution insert
    }
