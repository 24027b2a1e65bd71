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
