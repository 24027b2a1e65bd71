"""§3.2 end-to-end: Debezium-style CDC stream -> unwrap(rewrite) ->
foreachBatch MERGE -> current-state table, deletes removing keys."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import types as T

from kafka_connect_spark.sinks.upsert import UpsertParquetSink
from kafka_connect_spark.sources.kafka import KAFKA_RECORD_SCHEMA, read_cdc_stream
from kafka_connect_spark.transforms import extract_new_record_state

ROW = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)


def _event(offset, op, id_, before=None, after=None):
    import datetime

    env = {
        "before": {"id": id_, "name": before} if before else None,
        "after": {"id": id_, "name": after} if after else None,
        "op": op,
        "ts_ms": offset,
        "source": {"db": "d", "schema": "public", "table": "users"},
    }
    return (
        b"k",
        json.dumps(env).encode(),
        "customers.public.users",
        0,
        offset,
        datetime.datetime(2024, 1, 1),
        [],
    )


def test_cdc_stream_materializes_current_state(spark, tmp_path):
    """insert a, insert b, update a, delete b, insert c  =>  {a(v2), c}."""
    events = [
        _event(0, "c", 1, after="a1"),
        _event(1, "c", 2, after="b1"),
        _event(2, "u", 1, before="a1", after="a2"),
        _event(3, "d", 2, before="b1"),
        _event(4, "c", 3, after="c1"),
    ]
    records = spark.createDataFrame(events, KAFKA_RECORD_SCHEMA)
    env = read_cdc_stream(records, ROW)
    flat = extract_new_record_state(
        env.select("before", "after", "op", "offset"), drop_tombstones=True
    )
    # carry the log offset for last-writer ordering
    sink = UpsertParquetSink(
        str(tmp_path / "state"), ["id"], "offset", delete_col="__deleted"
    )
    sink.apply_batch(flat)
    got = {r["id"]: r["name"] for r in sink.read(spark).collect()}
    assert got == {1: "a2", 3: "c1"}

    # late redelivery of the delete (at-least-once) is a no-op
    redelivery = spark.createDataFrame([_event(3, "d", 2, before="b1")], KAFKA_RECORD_SCHEMA)
    env2 = read_cdc_stream(redelivery, ROW)
    flat2 = extract_new_record_state(
        env2.select("before", "after", "op", "offset"), drop_tombstones=True
    )
    sink.apply_batch(flat2)
    got2 = {r["id"]: r["name"] for r in sink.read(spark).collect()}
    assert got2 == got


def test_delete_then_reinsert_across_batches(spark, tmp_path):
    sink = UpsertParquetSink(str(tmp_path / "s"), ["id"], "off", delete_col="__deleted")
    b1 = spark.createDataFrame(
        [(1, 0, "x", "false"), (2, 1, "y", "false")], ["id", "off", "v", "__deleted"]
    )
    sink.apply_batch(b1)
    b2 = spark.createDataFrame([(1, 2, "x", "true")], ["id", "off", "v", "__deleted"])
    sink.apply_batch(b2)
    assert {r["id"] for r in sink.read(spark).collect()} == {2}
    b3 = spark.createDataFrame([(1, 3, "x2", "false")], ["id", "off", "v", "__deleted"])
    sink.apply_batch(b3)
    got = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert got == {1: "x2", 2: "y"}
