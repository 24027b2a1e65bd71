"""Observability (S7/§3.3): exposition format roundtrip, listener capture
from a real streaming query, HTTP endpoint."""

from __future__ import annotations

import time
import urllib.request

from kafka_connect_spark.streaming.metrics import (
    MetricsListener,
    MetricsServer,
    parse_exposition,
    to_exposition,
)


def test_exposition_roundtrip():
    samples = [
        {"name": "num_input_rows", "labels": {"query": "q1"}, "value": 100.0},
        {"name": "num_input_rows", "labels": {"query": "q2"}, "value": 50.0},
        {"name": "batch_duration_ms", "labels": {"query": "q1"}, "value": 12.5},
    ]
    text = to_exposition(samples)
    assert "# HELP num_input_rows" in text and "# TYPE num_input_rows counter" in text
    back = parse_exposition(text)
    assert [(s["name"], s["labels"], s["value"]) for s in back] == [
        (s["name"], s["labels"], s["value"]) for s in samples
    ]


def test_listener_captures_progress(spark, tmp_path):
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        df = spark.readStream.format("rate").option("rowsPerSecond", 50).load()
        q = (
            df.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        deadline = time.time() + 60
        while not listener.samples and time.time() < deadline:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
    finally:
        spark.streams.removeListener(listener)
    names = {s["name"] for s in listener.samples}
    assert "num_input_rows" in names
    assert all("query" in s["labels"] for s in listener.samples)


def test_metrics_http_endpoint():
    listener = MetricsListener()
    listener.samples.append(
        {"name": "num_input_rows", "labels": {"query": "q"}, "value": 7.0}
    )
    server = MetricsServer(listener)
    server.start()
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/metrics", timeout=10
        ).read().decode()
    finally:
        server.stop()
    assert 'num_input_rows{query="q"} 7.0' in body


def test_jmx_style_rename_rules():
    """The jmx-exporter rule surface (reference kafka-connect.yml:1-106):
    regex pattern -> $n name/label templates, valueFactor, lowercase."""
    from kafka_connect_spark.streaming.metrics import (
        CONNECT_RENAME_RULES,
        MetricRenameRule,
        relabel,
        to_exposition,
    )

    samples = [
        {"name": "input_rows_per_second", "labels": {"query": "pg-orders"}, "value": 120.0},
        {"name": "processed_rows_per_second", "labels": {"query": "pg-orders"}, "value": 118.0},
        {"name": "batch_duration_ms", "labels": {"query": "pg-orders"}, "value": 2500.0},
        {"name": "unmatched_metric", "labels": {}, "value": 1.0},
    ]
    out = relabel(samples, CONNECT_RENAME_RULES)
    by_name = {s["name"]: s for s in out}
    poll = by_name["kafka_connect_source_task_source_record_poll_rate"]
    assert poll["labels"] == {"connector": "pg-orders"} and poll["value"] == 120.0
    assert "kafka_connect_source_task_source_record_write_rate" in by_name
    secs = by_name["kafka_connect_connector_task_batch_time_seconds"]
    assert secs["value"] == 2.5  # valueFactor 0.001, like the reference's ms->s rule
    assert by_name["unmatched_metric"]["value"] == 1.0  # pass-through

    text = to_exposition(out)
    assert (
        'kafka_connect_source_task_source_record_poll_rate{connector="pg-orders"} 120.0'
        in text
    )
    assert "# TYPE kafka_connect_connector_task_batch_time_seconds gauge" in text


def test_rename_rule_from_dict_jmx_exporter_keys():
    from kafka_connect_spark.streaming.metrics import MetricRenameRule, relabel

    rule = MetricRenameRule.from_dict(
        {
            "pattern": r"spark\.streaming<query=(.+)><>num_input_rows",
            "name": "Kafka_Connect_$1_Rows",
            "labels": {"task": "$1"},
            "valueFactor": 2.0,
            "type": "COUNTER",
        }
    )
    out = relabel(
        [{"name": "num_input_rows", "labels": {"query": "T0"}, "value": 3.0}], [rule]
    )
    assert out == [
        {
            "name": "kafka_connect_t0_rows",  # lowercaseOutputName
            "labels": {"task": "T0"},
            "value": 6.0,
            "type": "counter",
        }
    ]
