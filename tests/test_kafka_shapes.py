"""S4/S6 — Kafka record-shape contracts without a broker: mirror
passthrough, CDC bytes -> envelope -> unwrap end-to-end, source options."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from kafka_connect_spark.sources.kafka import (
    KAFKA_RECORD_SCHEMA,
    kafka_source_options,
    mirror,
    read_cdc_stream,
)
from kafka_connect_spark.transforms import extract_new_record_state


def _record(topic: str, value: bytes | None, key: bytes = b"k") -> Row:
    return Row(
        key=key,
        value=value,
        topic=topic,
        partition=0,
        offset=0,
        timestamp=datetime.datetime(2024, 1, 1),
        headers=[Row(key="h", value=b"v")],
    )


def test_mirror_preserves_payload_and_prefixes_topic(spark):
    df = spark.createDataFrame([_record("users", b"payload")], KAFKA_RECORD_SCHEMA)
    out = mirror(df, "primary").collect()[0]
    assert out["topic"] == "primary.users"
    assert bytes(out["value"]) == b"payload"
    assert bytes(out["key"]) == b"k"
    assert out["headers"][0]["key"] == "h"


def test_cdc_bytes_to_unwrap_end_to_end(spark):
    """The reference's task-3 path (SURVEY.md §3.2): CDC JSON on a Kafka
    topic -> typed envelope -> ExtractNewRecordState rewrite."""
    row_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    events = [
        {"before": None, "after": {"id": 1, "name": "a"}, "op": "c", "ts_ms": 1,
         "source": {"db": "d", "schema": "public", "table": "users"}},
        {"before": {"id": 1, "name": "a"}, "after": None, "op": "d", "ts_ms": 2,
         "source": {"db": "d", "schema": "public", "table": "users"}},
    ]
    records = [
        _record("customers.public.users", json.dumps(e).encode()) for e in events
    ] + [_record("customers.public.users", None)]  # tombstone
    df = spark.createDataFrame(records, KAFKA_RECORD_SCHEMA)
    env = read_cdc_stream(df, row_schema)
    out = extract_new_record_state(env.drop("topic"), drop_tombstones=False).collect()
    got = {(r["id"], r["__deleted"]) for r in out}
    assert (1, "false") in got and (1, "true") in got
    assert any(r["id"] is None for r in out)  # tombstone passed through


def test_source_options_validation():
    opts = kafka_source_options(
        "b:9092", subscribe_pattern="customers\\..*", max_offsets_per_trigger=100
    )
    assert opts["subscribePattern"] == "customers\\..*"
    assert opts["maxOffsetsPerTrigger"] == "100"
    assert opts["includeHeaders"] == "true"
    with pytest.raises(ValueError):
        kafka_source_options("b:9092")
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", subscribe="a", subscribe_pattern="b")
